"""Query-based vertex decoder (DETR-style), the anti-collapse vertex head.

Round-1 finding (QUALITY.md §3): trained under the reference regime, the
MLP vertex head — which sees the cloud only through one 512-d global
feature (reference models/VertexPredictor.py:63-118) — converges to an
input-INDEPENDENT "average wireframe".  This head removes the bottleneck
structurally: `max_vertices` learned slot queries cross-attend to the
per-point features, so every slot's coordinates are a direct function of
the input points, not of a single pooled vector.

Capability it replaces: models/VertexPredictor.py (same outputs —
per-slot 3D coords + sigmoid existence + dynamic counts); architecture is
original (pre-LN transformer decoder, TPU-friendly static shapes, one
batched call).  Select with `model.vertex_head="query"`; the default
"mlp" head keeps reference parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class DecoderBlock(nn.Module):
    """Pre-LN: self-attention over queries, cross-attention to points, FFN.

    When `fused_kv` is on, the block receives its cross-attention K/V
    PRE-PROJECTED (computed for all layers in one batched matmul by the
    parent — the dispatch-tail lever `model.decoder_fused_cross_kv`) and
    runs the cross-attention manually; otherwise it projects kv itself
    via flax attention (the round-2 layout, checkpoint-compatible with
    the shipped recipe)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_kv: bool = False

    @nn.compact
    def __call__(self, q: jnp.ndarray, kv, kv_mask: Optional[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        # q: (B, V, D) slot queries; kv: (B, N, D) projected point
        # features, or a ((B, N, H, hd), (B, N, H, hd)) pre-projected
        # (key, value) pair when fused_kv.
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_self")(q)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="self_attn")(h, h, h)
        q = q + h

        h = nn.LayerNorm(dtype=jnp.float32, name="ln_cross")(q)
        if self.fused_kv:
            k_i, v_i = kv
            head_dim = self.dim // self.num_heads
            qh = nn.DenseGeneral((self.num_heads, head_dim),
                                 dtype=self.dtype,
                                 name="cross_q")(h)          # (B,V,H,hd)
            logits = jnp.einsum("bvhd,bnhd->bhvn",
                                qh / jnp.sqrt(head_dim).astype(self.dtype),
                                k_i)
            if kv_mask is not None:
                logits = jnp.where(kv_mask[:, None, None, :], logits,
                                   jnp.finfo(logits.dtype).min)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            w = w.astype(self.dtype)
            # Same attention-weight dropout the flax path applies
            # (MultiHeadDotProductAttention drops softmax weights with
            # inverted scaling) — the fused layout must not silently
            # change training regularization.
            w = nn.Dropout(self.dropout, deterministic=deterministic,
                           name="cross_drop")(w)
            ctx = jnp.einsum("bhvn,bnhd->bvhd", w, v_i)
            h = nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                                name="cross_out")(ctx)
        else:
            mask = None
            if kv_mask is not None:
                # (B, 1, V, N): every query attends only to valid points.
                mask = jnp.broadcast_to(
                    kv_mask[:, None, None, :],
                    (q.shape[0], 1, q.shape[1], kv.shape[1]))
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=deterministic,
                name="cross_attn")(h, kv, kv, mask=mask)
        q = q + h

        h = nn.LayerNorm(dtype=jnp.float32, name="ln_ffn")(q)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_in")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn_out")(h)
        return q + h


class _ScanBlock(nn.Module):
    """DecoderBlock adapted to `nn.scan`'s (carry, *xs) -> (carry, ys)
    contract: carry is the query stream, xs carry the per-layer K/V
    slices when `fused_kv` (otherwise the shared kv is broadcast).

    `deterministic` is a module field (static at trace time) rather than
    a call argument so the scanned signature stays pure-array."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype
    fused_kv: bool
    remat_inner: bool
    deterministic: bool

    @nn.compact
    def __call__(self, q, kv_scan, kv, kv_mask):
        block_cls = DecoderBlock
        if self.remat_inner:
            block_cls = nn.remat(DecoderBlock, static_argnums=(4,))
        blk = block_cls(
            dim=self.dim, num_heads=self.num_heads, ffn_dim=self.ffn_dim,
            dropout=self.dropout, dtype=self.dtype,
            fused_kv=self.fused_kv, name="block")
        kv_arg = kv_scan if self.fused_kv else kv
        return blk(q, kv_arg, kv_mask, self.deterministic), None


class QueryVertexDecoder(nn.Module):
    """max_vertices learned queries -> cross-attend to points -> per-slot
    coords + existence.

    Returns the same dict contract as VertexPredictor plus
    `slot_features` (B, V, dim) for the edge head
    (`model.edge_use_slot_features`).
    """

    max_vertices: int = 64
    dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 1024
    dropout: float = 0.0
    existence_thresh: float = 0.5
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    kv_pool: int = 1
    # Project every layer's cross-attention K/V from the shared KV tokens
    # in ONE batched matmul pair instead of 2 matmuls per layer (the
    # round-4 dispatch-tail lever, model.decoder_fused_cross_kv).  Same
    # parameter count/function class, different param layout — NOT
    # checkpoint-compatible with the per-layer layout, so it is a config
    # flag recorded in checkpoint metadata.
    fused_cross_kv: bool = False
    # Roll the layer stack into one `nn.scan`ed block (stacked params,
    # axis 0 = layer) instead of `num_layers` unrolled block subgraphs —
    # the dispatch-tail lever the r3 VERDICT asked to measure (ROADMAP
    # #19's ~4.3k fused ops/step).  Same math per layer; DIFFERENT param
    # layout (vertex_decoder/blocks/block/... stacked) — checkpoints do
    # not interchange across this flag (recorded in metadata).
    scan: bool = False

    @nn.compact
    def __call__(self, point_features: jnp.ndarray,
                 point_mask: jnp.ndarray,
                 global_features: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 kv_pre_pooled: bool = False) -> Dict[str, jnp.ndarray]:
        """
        Args:
          point_features: (B, N, C) per-point encoder features.
          point_mask: (B, N) bool — True for valid (non-padding) points.
          global_features: optional (B, G) pooled feature, added to every
            query after projection (gives slots a scene-level prior
            without being their only input).
          kv_pre_pooled: the caller already window-pooled
            (point_features, point_mask) — e.g. the encoder chain kernel
            emitted them (encoder.kv_pool) — so skip the in-module pool.
        """
        if self.kv_pool > 1 and not kv_pre_pooled:
            # Shrink the KV axis before any projection: every decoder
            # layer's K/V matmuls and (B, H, V, N) attention then run at
            # N/kv_pool tokens (ROADMAP #17 train-step tail).  Max-pool
            # in encoder-feature space — the encoder's own global pool is
            # a max over these same features, so a window max is a local
            # version of a reduction the representation already supports.
            from wireframe_tpu.ops.masked_pool import window_max_pool

            point_features, point_mask = window_max_pool(
                point_features, point_mask, self.kv_pool)
        b, n, _ = point_features.shape
        v = self.max_vertices

        kv = nn.Dense(self.dim, dtype=self.dtype,
                      name="point_proj")(point_features.astype(self.dtype))
        kv = nn.LayerNorm(dtype=jnp.float32, name="point_ln")(kv)

        queries = self.param(
            "slot_queries",
            nn.initializers.normal(stddev=0.02), (v, self.dim))
        q = jnp.broadcast_to(queries[None], (b, v, self.dim)).astype(self.dtype)
        if global_features is not None:
            g = nn.Dense(self.dim, dtype=self.dtype, name="global_proj")(
                global_features.astype(self.dtype))
            q = q + g[:, None, :]

        k_all = v_all = None
        if self.fused_cross_kv:
            head_dim = self.dim // self.num_heads
            # (B, N, L, H, hd): all layers' cross K/V in one matmul pair.
            k_all = nn.DenseGeneral(
                (self.num_layers, self.num_heads, head_dim),
                dtype=self.dtype, name="cross_k_all")(kv)
            v_all = nn.DenseGeneral(
                (self.num_layers, self.num_heads, head_dim),
                dtype=self.dtype, name="cross_v_all")(kv)

        if self.scan:
            # (B, N, L, H, hd) -> (L, B, N, H, hd): layer axis leads for
            # the scan; None (non-fused) has no leaves so any in_axes is
            # fine.
            kv_scan = None
            if self.fused_cross_kv:
                kv_scan = (jnp.moveaxis(k_all, 2, 0),
                           jnp.moveaxis(v_all, 2, 0))
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(dim=self.dim, num_heads=self.num_heads,
              ffn_dim=self.ffn_dim, dropout=self.dropout,
              dtype=self.dtype, fused_kv=self.fused_cross_kv,
              remat_inner=self.remat, deterministic=deterministic,
              name="blocks")
            q, _ = scanned(q, kv_scan, kv, point_mask)
        else:
            block_cls = DecoderBlock
            if self.remat:
                # Backward recomputes each block from its inputs instead
                # of stashing per-layer K/V projections and (B, H, V, N)
                # attention weights to HBM (train-step tail lever;
                # gradients are numerically identical).  static_argnums
                # pins `deterministic`.
                block_cls = nn.remat(DecoderBlock, static_argnums=(4,))
            for i in range(self.num_layers):
                kv_arg = ((k_all[:, :, i], v_all[:, :, i])
                          if self.fused_cross_kv else kv)
                q = block_cls(
                    dim=self.dim, num_heads=self.num_heads,
                    ffn_dim=self.ffn_dim, dropout=self.dropout,
                    dtype=self.dtype, fused_kv=self.fused_cross_kv,
                    name=f"block{i}")(q, kv_arg, point_mask, deterministic)

        feats = nn.LayerNorm(dtype=jnp.float32, name="out_ln")(q)
        coords = nn.Dense(3, dtype=self.dtype, name="coord_head")(feats)
        existence_logits = nn.Dense(
            1, dtype=self.dtype, name="exist_head")(feats)[..., 0]

        coords = coords.astype(jnp.float32)
        existence_logits = existence_logits.astype(jnp.float32)
        existence_probs = nn.sigmoid(existence_logits)
        counts = jnp.sum(
            (existence_probs > self.existence_thresh).astype(jnp.int32),
            axis=-1)
        return {
            "vertices": coords,
            "existence_logits": existence_logits,
            "existence_probabilities": existence_probs,
            "actual_vertex_counts": counts,
            "slot_features": feats.astype(jnp.float32),
        }
