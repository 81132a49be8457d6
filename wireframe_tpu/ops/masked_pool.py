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
    """
    if window <= 1:
        return features, mask
    b, n, c = features.shape
    pad = (-n) % window
    if pad:
        features = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nw = features.shape[1] // window
    f = features.reshape(b, nw, window, c)
    m = mask.reshape(b, nw, window)
    filled = jnp.where(m[..., None], f, _NEG_INF)
    pooled = jnp.max(filled, axis=2)
    win_mask = jnp.any(m, axis=2)
    pooled = jnp.where(win_mask[..., None], pooled, jnp.zeros_like(pooled))
    return pooled, win_mask
