"""Wireframe loss vs an independent numpy oracle implementing the
reference's per-sample semantics (scipy matching, match-count-weighted
Smooth-L1, padded-mean BCEs)."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from wireframe_tpu.losses.wireframe_loss import (
    WireframeLossConfig,
    matching_cost_matrix,
    wireframe_loss,
)
from wireframe_tpu.ops.pairs import num_pairs, pair_validity_mask, triu_pairs_np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _bce(p, y):
    eps = 1e-12
    return -(y * np.log(np.maximum(p, eps))
             + (1 - y) * np.log(np.maximum(1 - p, eps)))


def _smooth_l1(x):
    ax = np.abs(x)
    return np.where(ax < 1, 0.5 * x * x, ax - 0.5)


def _oracle_loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
                 edge_labels, counts, v):
    """Reference semantics, per-sample numpy + scipy."""
    b = pred_v.shape[0]
    p_exist = _sigmoid(exist_logits)

    # vertex loss: per-sample scipy LSA on the padded cost matrix
    total_sl1, total_matches = 0.0, 0
    for i in range(b):
        c = int(counts[i])
        l1 = np.abs(pred_v[i][:, None, :] - tgt_v[i][None, :c, :]).sum(-1)
        cost_real = l1 + np.abs(p_exist[i][:, None] - 1.0)
        cost_dummy = np.repeat(p_exist[i][:, None], v - c, axis=1)
        cost = np.concatenate([cost_real, cost_dummy], axis=1)
        ri, ci = linear_sum_assignment(cost)
        keep = ci < c
        matched_pred = pred_v[i][ri[keep]]
        matched_tgt = tgt_v[i][ci[keep]]
        total_sl1 += _smooth_l1(matched_pred - matched_tgt).sum()
        total_matches += keep.sum()
    vertex_loss = total_sl1 / (3 * total_matches) if total_matches else 0.0

    existence_loss = _bce(p_exist, tgt_exist).mean()

    # edge loss: masked sum / (B * max C(c,2))
    pmask = np.zeros((b, num_pairs(v)), bool)
    pairs = triu_pairs_np(v)
    for i in range(b):
        pmask[i] = pairs[:, 1] < counts[i]
    p_edge = _sigmoid(edge_logits)
    bce = _bce(p_edge, edge_labels) * pmask
    max_pairs = max(int(c) * (int(c) - 1) // 2 for c in counts)
    edge_loss = bce.sum() / (b * max_pairs) if max_pairs else 0.0

    return (3.0 * vertex_loss + 1.5 * existence_loss + 1.0 * edge_loss,
            vertex_loss, existence_loss, edge_loss)


def make_inputs(rng, b=3, v=12):
    e = num_pairs(v)
    counts = rng.integers(3, v + 1, size=b).astype(np.int32)
    pred_v = rng.normal(size=(b, v, 3)).astype(np.float32)
    exist_logits = rng.normal(size=(b, v)).astype(np.float32)
    edge_logits = rng.normal(size=(b, e)).astype(np.float32)
    tgt_v = np.zeros((b, v, 3), np.float32)
    tgt_exist = np.zeros((b, v), np.float32)
    edge_labels = np.zeros((b, e), np.float32)
    pairs = triu_pairs_np(v)
    for i in range(b):
        c = counts[i]
        tgt_v[i, :c] = rng.normal(size=(c, 3))
        tgt_exist[i, :c] = 1.0
        valid = pairs[:, 1] < c
        edge_labels[i, valid] = (rng.random(valid.sum()) < 0.3)
    return pred_v, exist_logits, edge_logits, tgt_v, tgt_exist, edge_labels, counts


def test_loss_matches_reference_oracle(rng):
    """Exact value parity using the scipy matcher (identical tie-breaks).

    With matcher='device' the assignment COST is identical but a cost tie
    may pick a different optimal permutation, which legitimately changes
    the Smooth-L1 value (see test_device_matcher_cost_optimal)."""
    b, v = 3, 12
    (pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
     edge_labels, counts) = make_inputs(rng, b, v)

    pmask = np.asarray(pair_validity_mask(counts, v))
    preds = {
        "vertices": jnp.asarray(pred_v),
        "existence_logits": jnp.asarray(exist_logits),
        "existence_probabilities": jnp.asarray(_sigmoid(exist_logits)),
        "edge_logits": jnp.asarray(edge_logits),
        "pair_mask": jnp.asarray(pmask),
    }
    targets = {
        "vertices": jnp.asarray(tgt_v),
        "vertex_existence": jnp.asarray(tgt_exist),
        "edge_labels": jnp.asarray(edge_labels),
        "vertex_counts": jnp.asarray(counts),
    }
    got = wireframe_loss(preds, targets, WireframeLossConfig(matcher="scipy"))
    want = _oracle_loss(pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
                        edge_labels, counts, v)
    np.testing.assert_allclose(float(got["vertex_loss"]), want[1], rtol=2e-4)
    np.testing.assert_allclose(float(got["existence_loss"]), want[2], rtol=1e-4)
    np.testing.assert_allclose(float(got["edge_loss"]), want[3], rtol=1e-4)
    np.testing.assert_allclose(float(got["total_loss"]), want[0], rtol=2e-4)


def test_device_matcher_cost_optimal(rng):
    """The on-device matcher must achieve the scipy-optimal assignment
    cost on the real loss cost matrices (permutation may differ on ties)."""
    from scipy.optimize import linear_sum_assignment as lsa

    from wireframe_tpu.losses.wireframe_loss import matching_cost_matrix
    from wireframe_tpu.ops.lsa import solve_lsa_batch

    b, v = 3, 12
    (pred_v, exist_logits, _, tgt_v, _, _, counts) = make_inputs(rng, b, v)
    cost = np.asarray(matching_cost_matrix(
        jnp.asarray(pred_v), jnp.asarray(_sigmoid(exist_logits)),
        jnp.asarray(tgt_v), jnp.asarray(counts)))
    col = np.asarray(solve_lsa_batch(jnp.asarray(cost)))
    for i in range(b):
        ri, ci = lsa(cost[i].astype(np.float64))
        c_ref = cost[i][ri, ci].sum()
        c_dev = cost[i][np.arange(v), col[i]].sum()
        np.testing.assert_allclose(c_dev, c_ref, rtol=1e-5)


def test_loss_scipy_matcher_agrees_with_device(rng):
    b, v = 2, 10
    (pred_v, exist_logits, edge_logits, tgt_v, tgt_exist,
     edge_labels, counts) = make_inputs(rng, b, v)
    pmask = np.asarray(pair_validity_mask(counts, v))
    preds = {
        "vertices": jnp.asarray(pred_v),
        "existence_logits": jnp.asarray(exist_logits),
        "existence_probabilities": jnp.asarray(_sigmoid(exist_logits)),
        "edge_logits": jnp.asarray(edge_logits),
        "pair_mask": jnp.asarray(pmask),
    }
    targets = {
        "vertices": jnp.asarray(tgt_v),
        "vertex_existence": jnp.asarray(tgt_exist),
        "edge_labels": jnp.asarray(edge_labels),
        "vertex_counts": jnp.asarray(counts),
    }
    a = wireframe_loss(preds, targets, WireframeLossConfig(matcher="device"))
    c = wireframe_loss(preds, targets, WireframeLossConfig(matcher="scipy"))
    # The device path's rectangular reduction can pick a different
    # cost-equal assignment on near-ties; assert optimality via the
    # square-problem assignment cost, and near-equality of the loss.
    cost = np.asarray(matching_cost_matrix(
        preds["vertices"], preds["existence_probabilities"],
        targets["vertices"], targets["vertex_counts"]))
    for i in range(b):
        cnt = int(np.asarray(targets["vertex_counts"])[i])
        cost_scipy = 0.0
        cost_device = 0.0
        for path, total in ((np.asarray(c["matched_cols"])[i], "s"),
                            (np.asarray(a["matched_cols"])[i], "d")):
            # matched rows pay their real-column cost; unmatched rows pay
            # the dummy cost p_i (any dummy column — use column cnt).
            val = 0.0
            for r_ in range(v):
                j = path[r_]
                if j < cnt:
                    val += cost[i, r_, j]
                else:
                    val += cost[i, r_, min(cnt, v - 1)] if cnt < v else 0.0
            if total == "s":
                cost_scipy = val
            else:
                cost_device = val
        np.testing.assert_allclose(cost_device, cost_scipy,
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        float(a["total_loss"]), float(c["total_loss"]), rtol=1e-2)


def test_cost_matrix_structure(rng):
    b, v = 2, 8
    pred_v = rng.normal(size=(b, v, 3)).astype(np.float32)
    p = rng.random((b, v)).astype(np.float32)
    tgt = rng.normal(size=(b, v, 3)).astype(np.float32)
    counts = np.array([3, 8], np.int32)
    cost = np.asarray(matching_cost_matrix(
        jnp.asarray(pred_v), jnp.asarray(p), jnp.asarray(tgt),
        jnp.asarray(counts)))
    # dummy columns = existence prob
    np.testing.assert_allclose(cost[0][:, 3:], np.repeat(p[0][:, None], 5, 1),
                               rtol=1e-6)
    # real columns = L1 + (1 - p)
    l1 = np.abs(pred_v[0][:, None] - tgt[0][None, :3]).sum(-1)
    np.testing.assert_allclose(cost[0][:, :3], l1 + (1 - p[0][:, None]),
                               rtol=1e-5)


def test_train_edge_prf_metric(rng):
    """_edge_prf reports 1.0 for predictions matching the effective
    labels, and respects the pair mask."""
    import jax

    from wireframe_tpu.losses.wireframe_loss import (
        WireframeLossConfig,
        wireframe_loss,
    )
    from wireframe_tpu.ops.pairs import num_pairs
    from wireframe_tpu.train.step import _edge_prf

    b, v = 2, 6
    e = num_pairs(v)
    counts = np.array([4, 6], np.int32)
    tgt = (rng.normal(size=(b, v, 3))
           * (np.arange(v)[None, :, None] < counts[:, None, None])
           ).astype(np.float32)
    labels = (rng.random((b, e)) < 0.3).astype(np.float32)
    preds = {
        "vertices": jnp.asarray(tgt),  # identity matching
        "existence_logits": jnp.asarray(
            np.where(np.arange(v)[None] < counts[:, None], 10.0, -10.0)
            .astype(np.float32)),
        "existence_probabilities": jax.nn.sigmoid(jnp.asarray(
            np.where(np.arange(v)[None] < counts[:, None], 10.0, -10.0)
            .astype(np.float32))),
        "edge_logits": jnp.asarray(np.where(labels > 0, 10.0, -10.0)
                                   .astype(np.float32)),
        "pair_mask": jnp.ones((b, e), bool),
    }
    targets = {
        "vertices": jnp.asarray(tgt),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None] < counts[:, None]).astype(np.float32)),
        "edge_labels": jnp.asarray(labels),
        "vertex_counts": jnp.asarray(counts),
    }
    losses = wireframe_loss(preds, targets, WireframeLossConfig())
    edge_probs = jax.nn.sigmoid(preds["edge_logits"])
    m = _edge_prf(edge_probs, losses)
    assert float(m["train_edge_f1"]) == 1.0
    assert float(m["train_edge_precision"]) == 1.0
    assert float(m["train_edge_recall"]) == 1.0
    # Flipping every prediction kills precision and recall.
    m0 = _edge_prf(1.0 - edge_probs, losses)
    assert float(m0["train_edge_f1"]) < 0.5
