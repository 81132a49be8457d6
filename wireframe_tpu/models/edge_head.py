"""Attention-based edge prediction head.

Capability parity with models/EdgePredictor.py: embed vertex coordinates
(3 -> 256 -> 512 with LayerNorm/GELU/Dropout), one multi-head
self-attention layer (8 heads, dropout 0.1) with a residual connection,
then per-pair features [f_i ‖ f_j ‖ x_i ‖ x_j ‖ dist] (1031-d) through an
MLP 1031 -> 512 -> 256 -> 128 -> 1 with sigmoid.

TPU-first differences:
- the reference re-enumerates vertex pairs with a Python double loop on
  every forward and runs one sample at a time over a dynamic vertex
  prefix (EdgePredictor.py:82-89, PointCloudToWireframe.py:77-97).  Here
  the pair table is a static (E, 2) constant over all `max_vertices`
  slots and the whole batch is one gather + one batched MLP;
- variable vertex counts become a key mask on the attention (slots
  >= count can't be attended to, reproducing the reference's
  prefix-slice attention for the live slots) and a pair-validity mask
  zeroing probabilities outside the prefix (reproducing its zero padding
  at PointCloudToWireframe.py:107-110).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wireframe_tpu.ops.pairs import triu_pairs


class PairDense(nn.Module):
    """First edge-MLP layer, computed distributively (ROADMAP #6).

    A Dense over the concatenated pair features [f_i ‖ f_j ‖ x_i ‖ x_j ‖
    dist] distributes over the concatenation:

        W @ [f_i ‖ f_j ‖ x_i ‖ x_j ‖ d]
          = (f W1 + x W3)[i] + (f W2 + x W4)[j] + d w5 + b

    so the 1031-wide matmul runs over the V=64 vertex rows instead of the
    E=V(V-1)/2=2016 pair rows (~32x fewer layer-1 FLOPs) and the
    (B, E, 1031) concatenated tensor — ~1 GB at B=128 — is never
    materialized; only the (B, E, F) layer output exists, which the old
    formulation produced anyway.  Exact same math as nn.Dense modulo
    float reassociation; the kernel/bias params keep nn.Dense's exact
    shape, names, and init, so reference-checkpoint transplantation
    (train/checkpoint.py: edge_mlp.0 -> Dense_2) is unchanged.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f: jnp.ndarray, x: jnp.ndarray, dist: jnp.ndarray,
                 i_idx: jnp.ndarray, j_idx: jnp.ndarray) -> jnp.ndarray:
        h = f.shape[-1]
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * h + 2 * c + 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        f = f.astype(self.dtype)
        x = x.astype(self.dtype)
        w_fi, w_fj = k[:h], k[h:2 * h]
        w_ci, w_cj = k[2 * h:2 * h + c], k[2 * h + c:2 * h + 2 * c]
        w_d = k[2 * h + 2 * c]                       # (F,)
        u_i = jnp.dot(f, w_fi) + jnp.dot(x, w_ci)    # (B, V, F)
        u_j = jnp.dot(f, w_fj) + jnp.dot(x, w_cj)
        return (u_i[:, i_idx] + u_j[:, j_idx]
                + dist.astype(self.dtype) * w_d + bias.astype(self.dtype))


class EdgePredictor(nn.Module):
    vertex_dim: int = 3
    hidden_dim: int = 512
    num_heads: int = 8
    attn_dropout: float = 0.1
    mlp_dropout: float = 0.1
    max_vertices: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vertices: jnp.ndarray, slot_mask: jnp.ndarray,
                 deterministic: bool = True,
                 attn_slot_mask: Optional[jnp.ndarray] = None,
                 slot_features: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
          vertices: (B, V, 3) predicted coordinates for ALL slots.
          slot_mask: (B, V) bool — True for live vertex slots; gates the
            pair-validity mask and the output probabilities.
          deterministic: disables dropout (eval).
          attn_slot_mask: (B, V) bool mask for the self-attention keys;
            defaults to slot_mask (reference prefix semantics).  The
            existence slot-mask mode passes all-True here so the
            attention pattern is independent of early noisy existence
            estimates.
          slot_features: optional (B, V, F) per-slot decoder features,
            concatenated with the coordinates before the vertex embedding
            (model.edge_use_slot_features; the reference embeds coords
            only, EdgePredictor.py:31-38).
        Returns:
          edge_probs: (B, E) sigmoid probabilities, zeroed outside the
            pair-validity mask.
          edge_logits: (B, E) raw logits (for numerically-stable BCE).
          pair_mask: (B, E) bool validity mask.
        """
        b, v, _ = vertices.shape
        h = self.hidden_dim
        x = vertices.astype(self.dtype)
        if attn_slot_mask is None:
            attn_slot_mask = slot_mask

        embed_in = x
        if slot_features is not None:
            embed_in = jnp.concatenate(
                [x, slot_features.astype(self.dtype)], axis=-1)

        # Vertex embedding (EdgePredictor.py:31-38).
        f = nn.Dense(h // 2, dtype=self.dtype)(embed_in)
        f = nn.LayerNorm(dtype=jnp.float32)(f)
        f = nn.gelu(f)
        f = nn.Dense(h, dtype=self.dtype)(f)
        f = nn.LayerNorm(dtype=jnp.float32)(f)
        f = nn.Dropout(self.mlp_dropout, deterministic=deterministic)(f)

        # Self-attention over live slots only: key mask keeps dead slots
        # out of every softmax, so live-slot outputs equal the reference's
        # prefix-sliced attention.
        attn_mask = attn_slot_mask[:, None, None, :]  # (B, 1, Q=1->V, K=V)
        attn_mask = jnp.broadcast_to(attn_mask, (b, 1, v, v))
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.attn_dropout,
            deterministic=deterministic,
            name="attention",
        )(f, f, f, mask=attn_mask)
        f = f + attended  # residual (EdgePredictor.py:114)

        # Static pair table; coordinate pair terms.
        pairs = triu_pairs(v)  # (E, 2) int32
        i_idx, j_idx = pairs[:, 0], pairs[:, 1]
        c1 = x[:, i_idx, :]       # (B, E, 3)
        c2 = x[:, j_idx, :]
        # Safe norm: d(sqrt(x))/dx blows up at 0, and two predicted
        # vertices CAN coincide exactly (especially after bfloat16
        # rounding early in training) — the bare jnp.linalg.norm gradient
        # is NaN there, which poisoned grad_norm and, through NaN params,
        # sent NaN costs into the LSA while_loop (a device hang).
        d2 = jnp.sum(jnp.square(c1 - c2), axis=-1, keepdims=True)
        dist = jnp.sqrt(d2 + 1e-12)

        # Edge MLP (EdgePredictor.py:56-68).  Layer 1 = Dense over the
        # implicit concat [f_i ‖ f_j ‖ x_i ‖ x_j ‖ dist], computed
        # distributively at V rows instead of E (see PairDense).
        y = PairDense(h, dtype=self.dtype, name="Dense_2")(
            f, x, dist, i_idx, j_idx)
        y = nn.LayerNorm(dtype=jnp.float32)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.mlp_dropout, deterministic=deterministic)(y)
        # Names pinned: the explicit "Dense_2" above doesn't advance
        # flax's anonymous-Dense counter, so auto-naming would collide.
        y = nn.Dense(h // 2, dtype=self.dtype, name="Dense_3")(y)
        y = nn.LayerNorm(dtype=jnp.float32)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.mlp_dropout, deterministic=deterministic)(y)
        y = nn.Dense(h // 4, dtype=self.dtype, name="Dense_4")(y)
        y = nn.gelu(y)
        logits = nn.Dense(1, dtype=self.dtype, name="Dense_5")(y)[..., 0]
        logits = logits.astype(jnp.float32)

        # Both endpoints must be live.  (Under the prefix convention j > i
        # makes the i-term redundant; scattered existence masks need both.)
        pair_mask = slot_mask[:, i_idx] & slot_mask[:, j_idx]
        probs = nn.sigmoid(logits) * pair_mask.astype(jnp.float32)
        return probs, logits, pair_mask
