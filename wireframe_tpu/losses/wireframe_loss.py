"""Hungarian-matched wireframe loss — fully batched, fully on device.

Reference semantics (losses/WireframeLoss.py, train.py:90-94), reproduced
exactly in masked fixed-shape form:

1. Vertex position loss: Smooth-L1 over Hungarian-matched (pred, target)
   vertex pairs.  Cost matrix per sample (WireframeLoss.py:200-232):
     - to a real target j:   L1(pred_i, target_j) + |p_exist_i - 1|
     - to a dummy column:    p_exist_i
   Rows = all `max_vertices` prediction slots, columns = real targets then
   dummies (square).  Matches to dummy columns are dropped.  The per-batch
   reduction is the reference's match-count-weighted mean
   (WireframeLoss.py:248-283), which algebraically equals
     sum(elementwise smooth_l1 over matched coords) / (3 * total_matches).

2. Existence loss: BCE over ALL (B, max_vertices) slots vs binary prefix
   labels (WireframeLoss.py:72-73).  NOTE the denominator depends on
   `max_vertices`; the reference sizes it to the batch-max GT count, so
   exact value parity requires configuring the same max_vertices.

3. Edge loss: BCE over candidate pairs.  The reference zero-pads per-sample
   edge probs AND labels to the batch-max pair count and averages over
   B * max_pairs, where padded entries contribute 0 (BCE(0,0)=0) but DO
   count in the denominator (WireframeLoss.py:80-86 + BCELoss 'mean').
   Equivalent masked form: masked BCE sum / (B * max_b C(count_b, 2)).

total = vertex_weight * (1) + existence_weight * (2) + edge_weight * (3)
(weights 3.0 / 1.5 / 1.0 per train.py:91-93).

The assignment is solved ON DEVICE (`ops/lsa.py`); `matcher="scipy"`
routes through a pure_callback for oracle parity runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp

import jax

from wireframe_tpu.ops.lsa import solve_lsa_callback, solve_lsa_rows_batch


@dataclass(frozen=True)
class WireframeLossConfig:
    vertex_weight: float = 3.0
    edge_weight: float = 1.0
    existence_weight: float = 1.5
    # "device": vmapped XLA while-loop JV (ops/lsa.py) — portable.
    # "pallas": batched lockstep JV in one Pallas program
    #   (ops/pallas_lsa.py) — the TPU production path (~20x less loop
    #   overhead than "device"; same optimal assignment cost).
    # "scipy": host callback oracle (parity runs only).
    # "auto": "pallas" on TPU backends, else "device".
    matcher: str = "device"
    # Reference behavior (False): edge labels indexed by GT vertex order
    # are compared POSITIONALLY against pair probs indexed by prediction
    # slot order (train.py:61-88 vs WireframeLoss.py:80-86, quirk 4) —
    # only consistent when the matching happens to be the identity.
    # True: permute the labels through the Hungarian matching each step,
    # so pair (slot_a, slot_b) is supervised by the GT edge between the
    # targets those slots are matched to (documented improvement).
    matched_edge_labels: bool = False
    # DETR-style existence supervision: slot i's existence label is
    # "matched to a real target" instead of the reference's positional
    # prefix label (train.py:51-59).  Prefix labels pull live slots to a
    # prefix while the matched vertex loss permutes freely — a collapse
    # driver (QUALITY.md §3).
    matched_existence_labels: bool = False


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Smooth-L1 (huber, beta=1) as in torch nn.SmoothL1Loss."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy from logits (stable)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def matching_cost_matrix(pred_vertices: jnp.ndarray,
                         pred_existence: jnp.ndarray,
                         target_vertices: jnp.ndarray,
                         vertex_counts: jnp.ndarray) -> jnp.ndarray:
    """Batched (B, V, V) assignment cost.

    Columns j < count are real targets (L1 + |p-1|); columns j >= count are
    dummies (cost p).  All entries finite by construction.
    """
    v = pred_vertices.shape[1]
    # L1 distances pred_i -> target_j: (B, V, V)
    l1 = jnp.sum(
        jnp.abs(pred_vertices[:, :, None, :] - target_vertices[:, None, :, :]),
        axis=-1)
    p = pred_existence[:, :, None]                      # (B, V, 1)
    cost_real = l1 + jnp.abs(p - 1.0)
    cost_dummy = jnp.broadcast_to(p, l1.shape)
    col_is_real = (jnp.arange(v, dtype=jnp.int32)[None, None, :]
                   < vertex_counts[:, None, None])
    return jnp.where(col_is_real, cost_real, cost_dummy)


def wireframe_loss(predictions: Dict[str, jnp.ndarray],
                   targets: Dict[str, jnp.ndarray],
                   cfg: WireframeLossConfig = WireframeLossConfig()
                   ) -> Dict[str, jnp.ndarray]:
    """
    predictions: vertices (B,V,3), existence_logits (B,V),
      existence_probabilities (B,V), edge_logits (B,E), pair_mask (B,E).
    targets: vertices (B,V,3) zero-padded, vertex_existence (B,V),
      edge_labels (B,E) on the global pair axis, vertex_counts (B,).
    """
    pred_v = predictions["vertices"]
    pred_p = predictions["existence_probabilities"]
    tgt_v = targets["vertices"]
    counts = targets["vertex_counts"].astype(jnp.int32)
    b, v, _ = pred_v.shape

    # ---- 1. Hungarian-matched vertex loss --------------------------------
    if cfg.matcher == "scipy":
        # stop_gradient mirrors the reference's .detach() before scipy
        # (WireframeLoss.py:235) and is REQUIRED: pure_callback has no JVP
        # rule, so an undetached cost would break value_and_grad.
        cost = jax.lax.stop_gradient(
            matching_cost_matrix(pred_v, pred_p, tgt_v, counts))
        col4row = solve_lsa_callback(cost)
    else:
        # Rectangular reduction of the square padded problem: with dummy
        # columns all costing p_i, the optimum equals (up to the constant
        # sum_i p_i) the c x V assignment of real targets to pred slots
        # with cost L1(i,j) + 1 - 2*p_i.  +1 keeps entries non-negative
        # (constant shifts per assigned row preserve the argmin).  This
        # runs c augmentations instead of V on device.
        l1 = jnp.sum(
            jnp.abs(pred_v[:, :, None, :] - tgt_v[:, None, :, :]),
            axis=-1)                                    # (B, Vpred, Vtgt)
        cost_t = jnp.transpose(l1, (0, 2, 1)) + (
            2.0 - 2.0 * pred_p)[:, None, :]             # (B, Vtgt, Vpred)
        # Enforce the matchers' padded-column contract (ADVICE r2): real
        # costs must stay far below PAD_COST, or a diverged/NaN cost could
        # make a padded column win and the out-of-range slot index would
        # be silently dropped by the scatter in invert(), corrupting the
        # match.  Clamp to the documented safe ceiling; map NaNs there too
        # (a NaN row would otherwise poison the dual updates).
        from wireframe_tpu.ops.pallas_lsa import max_safe_cost

        ceil = max_safe_cost()
        cost_t = jnp.where(jnp.isnan(cost_t), ceil,
                           jnp.minimum(cost_t, ceil))
        cost_t = jax.lax.stop_gradient(cost_t)          # matching is
        matcher = cfg.matcher                           # non-diff'able
        if matcher == "auto":
            matcher = ("pallas" if jax.default_backend() == "tpu"
                       else "device")
        if matcher == "pallas":
            from wireframe_tpu.ops.pallas_lsa import solve_lsa_rows_pallas

            # Off-TPU (tests picking "pallas" explicitly) the kernel runs
            # in interpret mode; numerics are identical.
            slot4target = solve_lsa_rows_pallas(
                cost_t, counts,
                interpret=jax.default_backend() != "tpu")
        else:
            slot4target = solve_lsa_rows_batch(cost_t, counts)

        # Invert target->slot into the square-problem convention
        # (col4row[b, i] = target index matched to pred slot i, or a
        # >=count sentinel for unmatched slots).
        def invert(slots, c):
            tgt_idx = jnp.arange(v, dtype=jnp.int32)
            idx = jnp.where(tgt_idx < c, slots, v)
            out = jnp.full((v + 1,), v, jnp.int32).at[idx].set(tgt_idx)
            return out[:v]

        col4row = jax.vmap(invert)(slot4target, counts)
    # pred slot i matched to real target col4row[i] iff col4row[i] < count.
    matched = col4row < counts[:, None]                         # (B, V)
    tgt_matched = jnp.take_along_axis(
        tgt_v, jnp.where(matched, col4row, 0)[..., None].astype(jnp.int32),
        axis=1)                                                 # (B, V, 3)
    per_coord = smooth_l1(pred_v - tgt_matched)                 # (B, V, 3)
    per_coord = per_coord * matched[..., None].astype(per_coord.dtype)
    total_matches = jnp.sum(matched.astype(jnp.float32))
    vertex_loss = jnp.where(
        total_matches > 0,
        jnp.sum(per_coord) / (3.0 * jnp.maximum(total_matches, 1.0)),
        0.0)

    # ---- 2. Vertex existence BCE -----------------------------------------
    if cfg.matched_existence_labels:
        existence_labels = matched.astype(jnp.float32)
    else:
        existence_labels = targets["vertex_existence"].astype(jnp.float32)
    existence_loss = jnp.mean(
        bce_with_logits(predictions["existence_logits"], existence_labels))

    # ---- 3. Edge BCE (reference padded-mean semantics) --------------------
    edge_labels = targets["edge_labels"].astype(jnp.float32)
    pair_mask = predictions["pair_mask"].astype(jnp.float32)     # (B, E)
    if cfg.matched_edge_labels:
        # Permute labels through the matching: supervise pair (i, j) of
        # prediction slots with the GT edge between their matched targets.
        from wireframe_tpu.ops.pairs import triu_pairs

        e_pairs = triu_pairs(v)                                  # (E, 2)
        adj = jnp.zeros((b, v, v), jnp.float32)
        adj = adj.at[:, e_pairs[:, 0], e_pairs[:, 1]].set(edge_labels)
        adj = adj + jnp.swapaxes(adj, 1, 2)
        safe = jnp.where(matched, col4row, 0).astype(jnp.int32)  # (B, V)
        ti = jnp.take_along_axis(safe, e_pairs[None, :, 0], axis=1)
        tj = jnp.take_along_axis(safe, e_pairs[None, :, 1], axis=1)
        edge_labels = adj[jnp.arange(b)[:, None], ti, tj]
        both_matched = (
            jnp.take_along_axis(matched, e_pairs[None, :, 0], axis=1)
            & jnp.take_along_axis(matched, e_pairs[None, :, 1], axis=1))
        pair_mask = both_matched.astype(jnp.float32)
        edge_labels = edge_labels * pair_mask
    edge_bce = bce_with_logits(predictions["edge_logits"], edge_labels)
    masked_sum = jnp.sum(edge_bce * pair_mask)
    # Denominator: B * max_b C(count_b, 2), the reference's padded width.
    max_pairs = jnp.max(counts * (counts - 1) // 2).astype(jnp.float32)
    denom = jnp.maximum(b * max_pairs, 1.0)
    edge_loss = jnp.where(max_pairs > 0, masked_sum / denom, 0.0)

    total = (cfg.vertex_weight * vertex_loss
             + cfg.existence_weight * existence_loss
             + cfg.edge_weight * edge_loss)
    return {
        "total_loss": total,
        "vertex_loss": vertex_loss,
        "existence_loss": existence_loss,
        "edge_loss": edge_loss,
        "matched_cols": col4row,
        # The labels/mask the edge BCE actually used (post-matching when
        # matched_edge_labels) — lets the train step report an in-graph
        # edge P/R/F1 consistent with the supervision.
        "edge_labels_eff": edge_labels,
        "pair_mask_eff": pair_mask,
    }
