"""PointNet-style point-cloud encoder, TPU-native.

Capability parity with the reference encoder (models/PointNetEncoder.py):
  per-point shared MLP  input_dim -> 512 -> 1024 -> 2048 -> 1024 -> 512
  (Dense + LayerNorm + ReLU per stage, plain Dense final projection),
  mask-aware mean + max pooling over points, and a fusion MLP
  1024 -> 2048 -> 1024 -> 512 over the concatenated pools.

TPU-first differences:
- the whole thing is one batched einsum chain — points never leave the
  device and there is no per-sample Python,
- pooling is expressed through `wireframe_tpu.ops.masked_pool` so it can
  run sharded over the point axis (associative reductions -> psum/pmax),
- optional fused Pallas kernel (`ops/pallas_encoder.py`) keeps the
  (B*N, 2048) intermediates in VMEM instead of HBM,
- in addition to the masked pools the encoder returns the *unmasked*
  mean/max over point features, because the downstream vertex head pools
  point features without a mask (reference VertexPredictor.py:86-87);
  returning the pooled stats lets callers skip materializing the
  (B, N, 512) point-feature tensor in HBM entirely.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wireframe_tpu.ops.masked_pool import (
    masked_max,
    masked_mean,
    point_validity_mask,
)


class PointMLP(nn.Module):
    """Shared per-point MLP: [Dense+LN+ReLU]*len(hidden) + Dense(out)."""

    hidden_dims: Sequence[int]
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{h}_{x.shape[-1]}")(x)
            x = nn.LayerNorm(dtype=jnp.float32)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(x)


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

    pooled_stats is a dict with the four reductions downstream consumers
    need; `point_features` is None unless `return_point_features`.
    """

    input_dim: int = 8
    hidden_dims: Tuple[int, ...] = (512, 1024, 2048, 1024)
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    return_point_features: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: (B, N, input_dim).  Validity mask from the RAW input, matching
        # PointNetEncoder.py:85 (an all-zero row — real or padding — is
        # invalid; padding in this framework is all-zero rows).
        mask = point_validity_mask(x)  # (B, N)

        feats = PointMLP(self.hidden_dims, self.output_dim,
                         dtype=self.dtype, name="point_mlp")(
            x.astype(self.dtype))  # (B, N, C)

        f32 = feats.astype(jnp.float32)
        pooled = {
            "masked_max": masked_max(f32, mask),
            "masked_mean": masked_mean(f32, mask),
            # Unmasked pools consumed by the vertex head
            # (reference pools point features without a mask).
            "mean": jnp.mean(f32, axis=-2),
            "max": jnp.max(f32, axis=-2),
        }

        combined = jnp.concatenate(
            [pooled["masked_max"], pooled["masked_mean"]], axis=-1)
        global_features = FusionMLP(self.output_dim, dtype=self.dtype,
                                    name="fusion")(combined)
        global_features = global_features.astype(jnp.float32)

        point_features = feats if self.return_point_features else None
        return global_features, pooled, point_features
