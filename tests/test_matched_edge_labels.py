"""matched_edge_labels mode: label permutation through the matching."""

import numpy as np
import jax.numpy as jnp

from wireframe_tpu.losses.wireframe_loss import (
    WireframeLossConfig,
    wireframe_loss,
)
from wireframe_tpu.ops.pairs import (
    edge_labels_from_edges,
    num_pairs,
    pair_validity_mask,
)


def _build(rng, b, v, identity_alignment):
    """Targets placed so the matcher recovers a KNOWN slot->target map:
    identity (slots == GT order) or a fixed permutation."""
    e = num_pairs(v)
    c = v - 2
    counts = np.full((b,), c, np.int32)
    tgt_v = np.zeros((b, v, 3), np.float32)
    tgt_v[:, :c] = rng.normal(size=(b, c, 3)) * 5
    tgt_exist = (np.arange(v)[None, :] < c).astype(np.float32)

    gt_edges = np.array([[0, 1], [1, 2], [2, 3]])
    edge_labels = np.stack(
        [edge_labels_from_edges(gt_edges, v) for _ in range(b)])

    if identity_alignment:
        perm = np.arange(c)
    else:
        perm = np.roll(np.arange(c), 1)  # slot i holds target perm[i]
    pred_v = np.zeros((b, v, 3), np.float32)
    pred_v[:, :c] = tgt_v[:, :c][:, np.argsort(perm)] \
        if False else tgt_v[np.arange(b)[:, None], perm[None, :]]
    pred_v[:, c:] = 50.0  # far away, unmatched slots
    exist_logits = np.full((b, v), 4.0, np.float32)
    exist_logits[:, c:] = -4.0
    edge_logits = rng.normal(size=(b, e)).astype(np.float32)
    return (pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
            edge_labels, counts, perm, gt_edges)


def _loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist, edge_labels,
          counts, v, matched):
    pmask = np.asarray(pair_validity_mask(counts, v))
    preds = {
        "vertices": jnp.asarray(pred_v),
        "existence_logits": jnp.asarray(exist_logits),
        "existence_probabilities": jnp.asarray(
            1 / (1 + np.exp(-exist_logits))),
        "edge_logits": jnp.asarray(edge_logits),
        "pair_mask": jnp.asarray(pmask),
    }
    targets = {
        "vertices": jnp.asarray(tgt_v),
        "vertex_existence": jnp.asarray(tgt_exist),
        "edge_labels": jnp.asarray(edge_labels),
        "vertex_counts": jnp.asarray(counts),
    }
    return wireframe_loss(preds, targets,
                          WireframeLossConfig(matched_edge_labels=matched))


def test_identity_alignment_matches_reference_mode(rng):
    """When slots ARE GT-ordered, matched mode == reference mode."""
    v = 8
    (pred_v, exist_logits, edge_logits, tgt_v, tgt_exist, edge_labels,
     counts, _, _) = _build(rng, 2, v, identity_alignment=True)
    a = _loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
              edge_labels, counts, v, matched=False)
    m = _loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
              edge_labels, counts, v, matched=True)
    np.testing.assert_allclose(float(a["edge_loss"]), float(m["edge_loss"]),
                               rtol=1e-5)


def test_permuted_slots_get_permuted_labels(rng):
    """With slots holding a PERMUTATION of the targets, matched mode must
    supervise the permuted pairs — different from positional labels, and
    exactly computable."""
    v = 8
    (pred_v, exist_logits, edge_logits, tgt_v, tgt_exist, edge_labels,
     counts, perm, gt_edges) = _build(rng, 1, v, identity_alignment=False)
    a = _loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
              edge_labels, counts, v, matched=False)
    m = _loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
              edge_labels, counts, v, matched=True)
    assert not np.isclose(float(a["edge_loss"]), float(m["edge_loss"]))

    # Oracle: slot i is matched to target perm[i]; pair (i, j) label is
    # whether (perm[i], perm[j]) is a GT edge.
    from wireframe_tpu.losses.wireframe_loss import bce_with_logits
    from wireframe_tpu.ops.pairs import triu_pairs_np

    c = counts[0]
    gt = {tuple(sorted(e)) for e in gt_edges.tolist()}
    pairs = triu_pairs_np(v)
    want_sum, n_valid = 0.0, 0
    for k, (i, j) in enumerate(pairs):
        if i < c and j < c:
            lab = 1.0 if tuple(sorted((perm[i], perm[j]))) in gt else 0.0
            z = edge_logits[0, k]
            want_sum += max(z, 0) - z * lab + np.log1p(np.exp(-abs(z)))
            n_valid += 1
    want = want_sum / (1 * (c * (c - 1) // 2))
    np.testing.assert_allclose(float(m["edge_loss"]), want, rtol=1e-4)
