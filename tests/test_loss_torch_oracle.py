"""Cross-framework oracle: our loss vs torch's own SmoothL1Loss/BCELoss
reductions composed per the reference's recipe (scipy matching, padded
means).  This pins the exact torch semantics — including BCELoss 'mean'
counting padded zero-entries in the denominator — rather than our numpy
re-derivation alone."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from scipy.optimize import linear_sum_assignment  # noqa: E402

from wireframe_tpu.losses.wireframe_loss import (  # noqa: E402
    WireframeLossConfig,
    wireframe_loss,
)
from wireframe_tpu.ops.pairs import (  # noqa: E402
    num_pairs,
    pair_validity_mask,
    triu_pairs_np,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def torch_reference_loss(pred_v, p_exist, edge_probs, tgt_v, tgt_exist,
                         edge_labels_padded, counts, v):
    """The reference's loss computed with torch ops on ragged per-sample
    data (dynamic widths, per-sample scipy LSA), as train.py wires it."""
    b = pred_v.shape[0]
    smooth = torch.nn.SmoothL1Loss()
    bce = torch.nn.BCELoss()

    # vertex: per-sample matching, match-count-weighted mean
    total, matches = 0.0, 0
    for i in range(b):
        c = int(counts[i])
        pv = torch.tensor(pred_v[i])
        tv = torch.tensor(tgt_v[i][:c])
        pe = torch.tensor(p_exist[i])
        cost_real = torch.cdist(pv, tv, p=1) + (pe[:, None] - 1.0).abs()
        cost_dummy = pe[:, None].expand(-1, v - c)
        cost = torch.cat([cost_real, cost_dummy], dim=1)
        ri, ci = linear_sum_assignment(cost.numpy())
        keep = ci < c
        loss_i = smooth(pv[ri[keep]], tv[ci[keep]])
        total = total + loss_i * keep.sum()
        matches += keep.sum()
    vertex_loss = (total / matches).item()

    existence_loss = bce(torch.tensor(p_exist),
                         torch.tensor(tgt_exist)).item()

    # edge: per-sample dynamic widths zero-padded to the batch max
    # (train.py:81-88 + PointCloudToWireframe.py:102-112), then plain
    # BCELoss over the padded rectangle (WireframeLoss.py:80-86).
    pairs = triu_pairs_np(v)
    max_pairs = max(int(c) * (int(c) - 1) // 2 for c in counts)
    pred_rect = np.zeros((b, max_pairs), np.float32)
    label_rect = np.zeros((b, max_pairs), np.float32)
    for i in range(b):
        valid = pairs[:, 1] < counts[i]
        k = valid.sum()
        pred_rect[i, :k] = edge_probs[i, valid]
        label_rect[i, :k] = edge_labels_padded[i, valid]
    edge_loss = bce(torch.tensor(pred_rect), torch.tensor(label_rect)).item()

    return (3.0 * vertex_loss + 1.5 * existence_loss + 1.0 * edge_loss,
            vertex_loss, existence_loss, edge_loss)


def test_loss_matches_torch_reference(rng):
    b, v = 3, 10
    e = num_pairs(v)
    counts = rng.integers(4, v + 1, size=b).astype(np.int32)
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

    p_exist = _sigmoid(exist_logits)
    edge_probs = _sigmoid(edge_logits)

    want = torch_reference_loss(pred_v, p_exist, edge_probs, tgt_v,
                                tgt_exist, edge_labels, counts, v)

    pmask = np.asarray(pair_validity_mask(counts, v))
    preds = {
        "vertices": jnp.asarray(pred_v),
        "existence_logits": jnp.asarray(exist_logits),
        "existence_probabilities": jnp.asarray(p_exist),
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
    np.testing.assert_allclose(float(got["vertex_loss"]), want[1], rtol=1e-4)
    np.testing.assert_allclose(float(got["existence_loss"]), want[2],
                               rtol=1e-4)
    np.testing.assert_allclose(float(got["edge_loss"]), want[3], rtol=1e-4)
    np.testing.assert_allclose(float(got["total_loss"]), want[0], rtol=1e-4)
