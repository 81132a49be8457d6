"""Vertex prediction head.

Capability parity with models/VertexPredictor.py: a deep MLP over the
global feature (512 -> 4096 -> 2048 -> 2048(+res1) -> 1024(+res2) ->
max_vertices*4), fusing pooled point features into the global feature by
a projected residual add, then splitting the output into per-slot 3D
coordinates and a sigmoid existence probability.

Intentional divergence (SURVEY.md §7 quirk 1): the reference creates its
`point_pool_proj` Linear lazily inside forward (VertexPredictor.py:94-97)
*after* the optimizer captured the parameter list, so that layer is a
frozen random projection there.  Here it is a real trained parameter.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp


class MLPBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return nn.relu(x)


class VertexPredictor(nn.Module):
    global_feature_dim: int = 512
    max_vertices: int = 64
    vertex_dim: int = 4
    existence_thresh: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, global_features: jnp.ndarray,
                 pooled_point_feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """
        Args:
          global_features: (B, global_feature_dim)
          pooled_point_feats: dict with pooled point features (each
            (B, C)); pass the encoder's pooled_stats.  The reference
            pools the full point-feature tensor here with an UNMASKED
            mean/max (VertexPredictor.py:86-87); its inputs are never
            padded, so masked and unmasked pooling coincide there.  We
            consume the MASKED pools, which preserves that behavior on
            unpadded clouds AND keeps bucketed zero-padded inference
            padding-invariant (padding rows' post-MLP features are
            nonzero and would otherwise dilute the mean).  Consuming
            pre-pooled stats also avoids materializing (B, N, C) in HBM.
        Returns dict: vertices (B, V, 3), existence_logits (B, V),
          existence_probabilities (B, V), actual_vertex_counts (B,).
        """
        g = global_features.astype(self.dtype)
        pooled = jnp.concatenate(
            [pooled_point_feats["masked_mean"],
             pooled_point_feats["masked_max"]],
            axis=-1).astype(self.dtype)  # (B, 2C)
        point_global = nn.Dense(self.global_feature_dim, dtype=self.dtype,
                                name="point_pool_proj")(pooled)
        enhanced = g + point_global

        x = MLPBlock(4096, dtype=self.dtype, name="mlp1")(enhanced)
        x = MLPBlock(2048, dtype=self.dtype, name="mlp2")(x)
        res1 = nn.Dense(2048, dtype=self.dtype, name="residual_proj1")(enhanced)
        x = MLPBlock(2048, dtype=self.dtype, name="mlp3")(x) + res1
        res2 = nn.Dense(1024, dtype=self.dtype, name="residual_proj2")(enhanced)
        x = MLPBlock(1024, dtype=self.dtype, name="mlp4")(x) + res2

        out = nn.Dense(self.max_vertices * self.vertex_dim,
                       dtype=self.dtype, name="final_layer")(x)
        out = out.astype(jnp.float32).reshape(
            (-1, self.max_vertices, self.vertex_dim))

        coords = out[:, :, :3]
        existence_logits = out[:, :, 3]
        existence_probs = nn.sigmoid(existence_logits)
        counts = jnp.sum(
            (existence_probs > self.existence_thresh).astype(jnp.int32),
            axis=-1)
        return {
            "vertices": coords,
            "existence_logits": existence_logits,
            "existence_probabilities": existence_probs,
            "actual_vertex_counts": counts,
        }
