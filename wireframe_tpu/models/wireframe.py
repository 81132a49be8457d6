"""End-to-end point-cloud -> wireframe model.

Capability parity with models/PointCloudToWireframe.py: encoder -> vertex
head -> edge head.  During training the edge head sees the ground-truth
vertex counts; during inference it uses the dynamic counts derived from
the existence probabilities (threshold 0.5), exactly like the reference's
two branches (PointCloudToWireframe.py:77-97) — but as ONE batched,
fixed-shape call instead of a per-sample Python loop with `.item()` host
syncs.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from wireframe_tpu.config import ModelConfig
from wireframe_tpu.models.edge_head import EdgePredictor
from wireframe_tpu.models.encoder import PointNetEncoder
from wireframe_tpu.models.vertex_head import VertexPredictor


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class PointCloudToWireframe(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, point_cloud: jnp.ndarray,
                 target_vertex_counts: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """
        Args:
          point_cloud: (B, N, input_dim) — zero rows are padding.
          target_vertex_counts: (B,) GT counts; used for the edge head when
            `train=True` (reference behavior).
          train: training mode (dropout active, GT counts drive edges).
        """
        cfg = self.config
        dt = _dtype(cfg.compute_dtype)
        use_query_head = cfg.vertex_head == "query"

        if (use_query_head and cfg.decoder_kv_pool > 1
                and not cfg.points_z_sorted):
            # KV pooling maxes over windows of CONSECUTIVE rows, but the
            # sampler shuffles point order — unsorted windows would mix
            # arbitrary far-apart points and scramble the positional
            # signal each KV token carries.  Sort the cloud by z first
            # (invalid rows last) so windows are spatially coherent.
            # Every other consumer is permutation-invariant (pointwise
            # encoder MLP, masked pools, cross-attention over KV), and a
            # z-key is stable under the device augmentations (z-rotation
            # and x/y flips preserve z).  Cost: one (B, N) sort + one
            # (B, N, 8) gather before the encoder.
            from wireframe_tpu.ops.masked_pool import point_validity_mask

            valid = point_validity_mask(point_cloud)
            zkey = jnp.where(valid, point_cloud[..., 2], jnp.inf)
            order = jnp.argsort(zkey, axis=1)
            point_cloud = jnp.take_along_axis(
                point_cloud, order[..., None], axis=1)

        encoder = PointNetEncoder(
            input_dim=cfg.input_dim,
            hidden_dims=tuple(cfg.encoder_hidden_dims),
            output_dim=cfg.encoder_output_dim,
            dtype=dt,
            return_point_features=cfg.return_point_features,
            # The query head cross-attends to per-point features — but
            # when the kernel emits pooled KV itself, the full (B, N, C)
            # tensor need not be materialized at all.
            point_features_for_kv=use_query_head,
            # Inference takes the fully fused kernel (pools in-kernel);
            # training takes the custom-VJP chain kernel whose backward
            # rematerializes activations in VMEM (VERDICT r1 #4).
            use_pallas=cfg.use_pallas_encoder,
            differentiable=train,
            pallas_tile=cfg.pallas_tile,
            chain_tile=getattr(cfg, "pallas_chain_tile", 0),
            chain_backward=cfg.chain_backward,
            # Training chain emits the decoder's pooled KV in-kernel
            # (points are z-sorted above, so windows are coherent).
            kv_pool=(cfg.decoder_kv_pool if use_query_head else 0),
            name="encoder",
        )
        global_features, pooled, point_features = encoder(point_cloud)

        if use_query_head:
            from wireframe_tpu.models.vertex_query_head import (
                QueryVertexDecoder,
            )
            from wireframe_tpu.ops.masked_pool import point_validity_mask

            kv_feats = point_features
            kv_mask = point_validity_mask(point_cloud)
            kv_pre_pooled = "kv" in pooled
            if kv_pre_pooled:
                kv_feats = pooled["kv"]
                kv_mask = pooled["kv_mask"]
            vertex_out = QueryVertexDecoder(
                max_vertices=cfg.max_vertices,
                dim=cfg.decoder_dim,
                num_layers=cfg.decoder_layers,
                num_heads=cfg.decoder_heads,
                ffn_dim=cfg.decoder_ffn_dim,
                dropout=cfg.decoder_dropout,
                dtype=dt,
                remat=cfg.decoder_remat,
                kv_pool=cfg.decoder_kv_pool,
                fused_cross_kv=cfg.decoder_fused_cross_kv,
                scan=cfg.decoder_scan,
                name="vertex_decoder",
            )(kv_feats, kv_mask,
              global_features, deterministic=not train,
              kv_pre_pooled=kv_pre_pooled)
        else:
            vertex_out = VertexPredictor(
                global_feature_dim=cfg.encoder_output_dim,
                max_vertices=cfg.max_vertices,
                vertex_dim=cfg.vertex_dim,
                dtype=dt,
                name="vertex_predictor",
            )(global_features, pooled)

        if cfg.slot_mask_mode == "existence":
            # Live slots come from per-slot existence, not a count prefix
            # (Hungarian-matched existence labels leave live slots
            # scattered).  The edge head attends over ALL slots — the
            # pair-validity mask alone gates the outputs — so training
            # does not churn the attention pattern through early noisy
            # existence estimates, and a sample with zero live slots
            # cannot produce an all-masked (NaN) softmax.
            slot_mask = vertex_out["existence_probabilities"] > 0.5
            attn_slot_mask = jnp.ones_like(slot_mask, dtype=bool)
            used_counts = jnp.sum(slot_mask.astype(jnp.int32), axis=-1)
        else:
            if train and target_vertex_counts is not None:
                used_counts = target_vertex_counts.astype(jnp.int32)
            else:
                used_counts = vertex_out["actual_vertex_counts"]
            slot_ids = jnp.arange(cfg.max_vertices, dtype=jnp.int32)
            slot_mask = slot_ids[None, :] < used_counts[:, None]  # (B, V)
            attn_slot_mask = slot_mask

        edge_probs, edge_logits, pair_mask = EdgePredictor(
            vertex_dim=3,
            hidden_dim=cfg.edge_hidden_dim,
            num_heads=cfg.edge_num_heads,
            attn_dropout=cfg.attn_dropout,
            mlp_dropout=cfg.edge_dropout,
            max_vertices=cfg.max_vertices,
            dtype=dt,
            name="edge_predictor",
        )(vertex_out["vertices"], slot_mask,
          deterministic=not train,
          attn_slot_mask=attn_slot_mask,
          slot_features=(vertex_out.get("slot_features")
                         if cfg.edge_use_slot_features else None))

        out = {
            "vertices": vertex_out["vertices"],
            "existence_logits": vertex_out["existence_logits"],
            "existence_probabilities": vertex_out["existence_probabilities"],
            "actual_vertex_counts": vertex_out["actual_vertex_counts"],
            "used_vertex_counts": used_counts,
            "slot_mask": slot_mask,
            "edge_probs": edge_probs,
            "edge_logits": edge_logits,
            "pair_mask": pair_mask,
            "global_features": global_features,
        }
        if point_features is not None:
            out["point_features"] = point_features
        return out
