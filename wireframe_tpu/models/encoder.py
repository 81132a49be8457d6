"""PointNet-style point-cloud encoder, TPU-native.

Capability parity with the reference encoder (models/PointNetEncoder.py):
  per-point shared MLP  input_dim -> 512 -> 1024 -> 2048 -> 1024 -> 512
  (Linear + LayerNorm + ReLU per stage, plain Linear final projection),
  mask-aware mean + max pooling over points, and a fusion MLP
  1024 -> 2048 -> 1024 -> 512 over the concatenated pools.

TPU-first differences:
- one batched matmul chain — points never leave the device, no
  per-sample Python;
- two interchangeable compute paths over a SINGLE parameter layout:
  the plain-XLA chain (`ops.pallas_encoder.point_encoder_reference`,
  used for training/autodiff and on CPU) and the fused Pallas kernel
  (`ops.pallas_encoder.fused_point_encoder`) that keeps weights and
  activations in VMEM and fuses the pooling reductions;
- besides the masked pools, the encoder returns the *unmasked* mean/max
  over point features, because the downstream vertex head pools point
  features without a mask (reference VertexPredictor.py:86-87); with the
  fused kernel the (B, N, 512) point-feature tensor is never written to
  HBM unless explicitly requested.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from wireframe_tpu.ops.masked_pool import (
    masked_max,
    masked_mean,
    point_validity_mask,
)
from wireframe_tpu.ops.pallas_encoder import (
    fused_point_encoder,
    point_encoder_reference,
)


_kv_pool_warned: set = set()


def _warn_kv_pool_fallback(kv_pool: int, tile: int) -> None:
    """Warn (once per (kv_pool, tile)) when a configured decoder_kv_pool
    cannot be fused into the Pallas kernel and silently demotes to the
    slower XLA window pool."""
    key = (kv_pool, tile)
    if key in _kv_pool_warned:
        return
    _kv_pool_warned.add(key)
    import logging

    logging.getLogger(__name__).warning(
        "decoder_kv_pool=%d cannot be fused into the Pallas encoder at "
        "tile=%d (needs tile %% kv_pool == 0 and a pooled tile that is a "
        "multiple of 8 rows or single-tile); falling back to the slower "
        "XLA window pool", kv_pool, tile)


class FusionMLP(nn.Module):
    """2C -> 4C -> 2C -> C fusion over concatenated (max ‖ mean) pools."""

    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.output_dim
        x = nn.Dense(4 * c, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(2 * c, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Dense(c, dtype=self.dtype)(x)


class PointNetEncoder(nn.Module):
    """Returns (global_features, pooled_stats, point_features?).

    pooled_stats holds the four reductions downstream consumers need
    (masked_mean/masked_max for the fusion MLP, mean/max for the vertex
    head); `point_features` is None unless `return_point_features`.
    """

    input_dim: int = 8
    hidden_dims: Tuple[int, ...] = (512, 1024, 2048, 1024)
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    return_point_features: bool = False
    use_pallas: bool = False
    # With use_pallas, pick the kernel flavor: the fully fused
    # inference kernel (pools in-kernel, no autodiff) or the
    # custom-VJP chain (ops.pallas_chain_grad) whose backward
    # rematerializes activations in VMEM — the training path.
    differentiable: bool = False
    # 512 measured fastest on v5e at N=2560 (tile sweep: 128 -> 2666,
    # 256 -> 5763, 512 -> 6015 clouds/s encoder-only at B=128); N must
    # divide by the tile or the encoder falls back to the XLA path.
    pallas_tile: int = 512
    # Tile for the differentiable training chain only (0 = pallas_tile).
    # The train chain prefers a SMALLER tile than the inference kernel
    # (256 vs 512 on v5e, ~5% step win — ModelConfig.pallas_chain_tile).
    chain_tile: int = 0
    # Custom-VJP backward flavor: "remat" (recompute activations in the
    # backward kernel) or "stash" (forward stores pre-LN activations,
    # backward skips the recompute matmuls) — ops/pallas_chain_grad.py.
    chain_backward: str = "remat"
    # kv_pool=p > 1 on the pallas paths additionally emits the decoder's
    # KV window max-pool from inside the kernel (pooled["kv"]
    # (B, N/p, C) + pooled["kv_mask"] (B, N/p)) — saves the XLA pool's
    # (B, N, C) HBM relayout passes.  Callers must feed z-sorted points
    # for the windows to be spatially coherent.
    kv_pool: int = 0
    # The caller needs point features ONLY as the decoder-KV source: if
    # the kernel emits pooled KV itself, skip materializing them (on the
    # fused inference kernel that skips the whole (B, N, C) HBM write).
    point_features_for_kv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: (B, N, input_dim); all-zero rows are padding.
        kernel_init = nn.initializers.lecun_normal()
        stage_params = []
        prev = self.input_dim
        for i, h in enumerate(self.hidden_dims):
            w = self.param(f"stage{i}_w", kernel_init, (prev, h))
            b = self.param(f"stage{i}_b", nn.initializers.zeros, (h,))
            g = self.param(f"stage{i}_ln_scale", nn.initializers.ones, (h,))
            be = self.param(f"stage{i}_ln_bias", nn.initializers.zeros, (h,))
            stage_params.append((w, b, g, be))
            prev = h
        final_w = self.param("proj_w", kernel_init, (prev, self.output_dim))
        final_b = self.param("proj_b", nn.initializers.zeros,
                             (self.output_dim,))

        n = x.shape[1]
        tile = (self.chain_tile or self.pallas_tile) if self.differentiable \
            else self.pallas_tile
        use_pallas = self.use_pallas and (n % tile == 0)
        # In-kernel KV pooling eligibility — mirrors the kernels' own
        # asserts (ops/pallas_encoder.py:102-104): the pooled tile must
        # keep the second-minor dim a multiple of 8 (Mosaic block rule)
        # OR be the whole pooled axis (single-tile grids lower fine).
        kv_pool = self.kv_pool if (
            self.kv_pool > 1 and tile % self.kv_pool == 0
            and ((tile // self.kv_pool) % 8 == 0
                 or tile // self.kv_pool == n // self.kv_pool)) else 0
        if self.kv_pool > 1 and not kv_pool and use_pallas:
            # A configured decoder_kv_pool that cannot fuse falls back to
            # the slower XLA window pool — make the perf cliff visible.
            _warn_kv_pool_fallback(self.kv_pool, tile)
        point_features = None
        if use_pallas and self.differentiable:
            # Training: fused custom-VJP chain for the point MLP.
            # Without kv_pool the pooling reductions stay in XLA, so
            # their gradients (incl. max tie-splitting) are identical to
            # the plain-XLA path; with kv_pool the window/global pools
            # come from the kernel and max ties route lowest-index —
            # parameter-gradient-equivalent for ties from duplicated
            # points (see ops.masked_pool.window_max_pool).
            from wireframe_tpu.ops.pallas_chain_grad import (
                make_differentiable_chain,
            )

            # With kv_pool the decoder consumes ONLY the pooled KV: the
            # full (B, N, C) features are dead downstream unless the
            # caller explicitly asked for them, so the slim chain skips
            # the 335 MB-at-recipe-shape HBM write in the forward AND
            # the materialized-zeros cotangent in the backward
            # (ROADMAP #27's trace oddity).
            need_feats = bool(self.return_point_features) or not kv_pool
            chain = make_differentiable_chain(
                tile=tile, compute_dtype=self.dtype,
                backward=self.chain_backward, kv_pool=kv_pool,
                emit_features=need_feats)
            xf = x.astype(jnp.float32)
            mask = point_validity_mask(x)
            if kv_pool:
                if need_feats:
                    feats, pooled_kv, kv_sums = chain(
                        xf, tuple(stage_params), final_w, final_b)
                else:
                    pooled_kv, kv_sums = chain(
                        xf, tuple(stage_params), final_w, final_b)
                    feats = None
                b_, n_ = mask.shape
                kv_mask = jnp.any(
                    mask.reshape(b_, n_ // kv_pool, kv_pool), axis=-1)
                # Global masked pools from the kernel's window outputs
                # instead of (B, N, C) passes: max of window maxes is the
                # masked max exactly (same argmax row, so the gradient
                # scatters to the same place), and the window sums total
                # to the masked sum.
                count = jnp.maximum(
                    jnp.sum(mask.astype(jnp.float32), axis=-1), 1.0)
                pooled = {
                    "masked_max": masked_max(pooled_kv, kv_mask),
                    "masked_mean": (jnp.sum(kv_sums, axis=-2)
                                    / count[:, None]),
                    "kv": pooled_kv,
                    "kv_mask": kv_mask,
                }
                if feats is not None:
                    # Unmasked pools: only the legacy MLP vertex head
                    # consumes these (never with kv_pool); XLA removes
                    # them when unused.
                    pooled["mean"] = jnp.mean(feats, axis=-2)
                    pooled["max"] = jnp.max(feats, axis=-2)
            else:
                feats = chain(xf, tuple(stage_params),
                              final_w, final_b)            # (B, N, C) f32
                pooled = {
                    "masked_max": masked_max(feats, mask),
                    "masked_mean": masked_mean(feats, mask),
                    "mean": jnp.mean(feats, axis=-2),
                    "max": jnp.max(feats, axis=-2),
                }
            if self.return_point_features or (self.point_features_for_kv
                                              and not kv_pool):
                point_features = feats
        elif use_pallas:
            need_pf = self.return_point_features or (
                self.point_features_for_kv and not kv_pool)
            pooled = fused_point_encoder(
                x.astype(jnp.float32), stage_params, final_w, final_b,
                tile=tile,
                return_point_features=need_pf,
                compute_dtype=self.dtype,
                kv_pool=kv_pool)
            point_features = pooled.pop("point_features", None)
            if kv_pool:
                mask = point_validity_mask(x)
                b_, n_ = mask.shape
                pooled["kv"] = pooled.pop("kv_features")
                pooled["kv_mask"] = jnp.any(
                    mask.reshape(b_, n_ // kv_pool, kv_pool), axis=-1)
        else:
            # Validity mask from the RAW input (PointNetEncoder.py:85):
            # an all-zero row — padding by convention — is invalid.
            mask = point_validity_mask(x)
            feats = point_encoder_reference(
                x, stage_params, final_w, final_b,
                compute_dtype=self.dtype)            # (B, N, C) f32
            pooled = {
                "masked_max": masked_max(feats, mask),
                "masked_mean": masked_mean(feats, mask),
                # Unmasked pools consumed by the vertex head
                # (reference pools point features without a mask).
                "mean": jnp.mean(feats, axis=-2),
                "max": jnp.max(feats, axis=-2),
            }
            if self.return_point_features or self.point_features_for_kv:
                point_features = feats

        combined = jnp.concatenate(
            [pooled["masked_max"], pooled["masked_mean"]], axis=-1)
        global_features = FusionMLP(self.output_dim, dtype=self.dtype,
                                    name="fusion")(combined)
        return global_features.astype(jnp.float32), pooled, point_features
