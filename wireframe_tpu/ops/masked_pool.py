"""Mask-aware pooling over the point axis.

Reference semantics (models/PointNetEncoder.py:85-111):
- validity mask: a point is valid iff |sum of its features| > 1e-9,
- masked mean: sum of valid rows / max(valid_count, 1),
- masked max: -inf fill on invalid rows, then max; non-finite results
  (all-invalid cloud) are replaced by 0.

These are associative reductions, so under point-axis sharding they
compose with `jax.lax.psum` / `pmax` over ICI (see
wireframe_tpu.parallel.sharded_pool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -jnp.inf


def point_validity_mask(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """(..., N, C) -> (..., N) bool. Matches PointNetEncoder.py:85."""
    return jnp.abs(jnp.sum(x, axis=-1)) > eps


def masked_mean(features: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over axis -2 of rows where mask is True.

    features: (..., N, C); mask: (..., N) -> (..., C).
    """
    m = mask[..., None].astype(features.dtype)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return jnp.sum(features * m, axis=-2) / count


def masked_max(features: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Max over axis -2 of rows where mask is True; 0 where no row is valid."""
    filled = jnp.where(mask[..., None], features, _NEG_INF)
    out = jnp.max(filled, axis=-2)
    return jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))


def window_max_pool(features: jnp.ndarray, mask: jnp.ndarray,
                    window: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked non-overlapping window max-pool along the point axis.

    features: (B, N, C); mask: (B, N) bool; -> ((B, ceil(N/w), C) pooled,
    (B, ceil(N/w)) bool window mask).  A window is valid iff it contains
    at least one valid point; invalid points contribute -inf to the max
    and fully-invalid windows pool to 0 (matching `masked_max`).  N is
    padded up to a multiple of `window` with invalid rows, so any bucket
    size works.

    Differentiation uses a custom VJP (argmax saved in forward, one
    fused scatter pass in backward) instead of `jnp.max`'s tie-splitting
    rule, whose XLA backward re-reads the inputs and materializes the
    (B, N/w, w, C) array several times (~7 ms/step at the B=64 recipe —
    the round-3 trace's biggest non-encoder cost).  Semantics differ
    only on exact ties, where the full cotangent goes to the lowest-index
    tied row instead of being split.  For the ties that actually occur —
    duplicated points from sampling-with-replacement — parameter
    gradients are unchanged: tied rows have identical activations, and
    every weight gradient depends only on the SUM of their cotangents.
    """
    if window <= 1:
        return features, mask
    b, n, c = features.shape
    pad = (-n) % window
    if pad:
        features = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nw = features.shape[1] // window
    m = mask.reshape(b, nw, window)
    win_mask = jnp.any(m, axis=2)
    pooled = _window_max(features, mask, window, win_mask)
    return pooled, win_mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _window_max(features, mask, window, win_mask):
    pooled, _ = _window_max_fwd_impl(features, mask, window, win_mask)
    return pooled


def _window_max_fwd_impl(features, mask, window, win_mask):
    b, n, c = features.shape
    nw = n // window
    f = features.reshape(b, nw, window, c)
    m = mask.reshape(b, nw, window)
    filled = jnp.where(m[..., None], f, _NEG_INF)
    pooled = jnp.max(filled, axis=2)
    # Lowest tied window offset.  int8 keeps the saved residual small
    # but is only exact for offsets < 128 — wider windows would wrap
    # mod 256 and double-route cotangents in the backward hit-mask.
    idx_dtype = jnp.int8 if window <= 128 else jnp.int32
    idx = jnp.argmax(filled, axis=2).astype(idx_dtype)
    pooled = jnp.where(win_mask[..., None], pooled, jnp.zeros_like(pooled))
    return pooled, idx


def _window_max_fwd(features, mask, window, win_mask):
    pooled, idx = _window_max_fwd_impl(features, mask, window, win_mask)
    return pooled, (idx, win_mask)


def _window_max_bwd(window, residuals, g):
    idx, win_mask = residuals
    b, nw, c = idx.shape
    n = nw * window
    # Kill cotangents of fully-invalid windows (forward's final `where`),
    # then route each window's cotangent to its argmax row.  Written as
    # one expression over the (B, N, C) output so XLA emits a single
    # fused pass in the features' native layout: each output row n reads
    # g/idx row n // window (no (B, N/w, w, C) relayout, no re-read of
    # the forward inputs).
    g = jnp.where(win_mask[..., None], g, jnp.zeros_like(g))
    gather = jnp.repeat(g, window, axis=1)              # (B, N, C)
    idx_full = jnp.repeat(idx, window, axis=1)          # (B, N, C)
    offs = (jnp.arange(n, dtype=jnp.int32) % window).astype(idx.dtype)
    hit = idx_full == offs[None, :, None]
    df = jnp.where(hit, gather, jnp.zeros_like(gather))
    return df, None, None


_window_max.defvjp(_window_max_fwd, _window_max_bwd)
