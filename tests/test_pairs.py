"""Static pair-table machinery: the fixed-shape replacement for the
reference's Python pair loops must agree with a nested-loop oracle."""

import numpy as np

from wireframe_tpu.ops.pairs import (
    edge_labels_from_edges,
    num_pairs,
    pair_slot,
    pair_validity_mask,
    pairs_from_mask,
    triu_pairs_np,
)


def _loop_pairs(v):
    return [(i, j) for i in range(v) for j in range(i + 1, v)]


def test_triu_pairs_lexicographic():
    for v in (2, 5, 16, 64):
        got = triu_pairs_np(v)
        ref = np.array(_loop_pairs(v))
        assert got.shape == (num_pairs(v), 2)
        np.testing.assert_array_equal(got, ref)


def test_pair_slot_inverts_table():
    v = 64
    pairs = triu_pairs_np(v)
    slots = np.asarray(pair_slot(pairs[:, 0], pairs[:, 1], v))
    np.testing.assert_array_equal(slots, np.arange(num_pairs(v)))


def test_prefix_order_is_subsequence():
    # The reference's C(c,2) prefix enumeration must be exactly the global
    # pairs with j < c, in order — the property the loss parity rests on.
    v, c = 16, 7
    pairs = triu_pairs_np(v)
    sub = pairs[pairs[:, 1] < c]
    ref = np.array(_loop_pairs(c))
    np.testing.assert_array_equal(sub, ref)


def test_pair_validity_mask():
    v = 8
    counts = np.array([0, 2, 5, 8])
    mask = np.asarray(pair_validity_mask(counts, v))
    pairs = triu_pairs_np(v)
    for b, c in enumerate(counts):
        ref = pairs[:, 1] < c
        np.testing.assert_array_equal(mask[b], ref)
        assert mask[b].sum() == num_pairs(int(c))


def test_edge_labels_round_trip(rng):
    v = 16
    edges = np.array([[0, 1], [3, 2], [5, 9], [14, 15]])
    labels = edge_labels_from_edges(edges, v)
    assert labels.sum() == 4
    # decode back via threshold
    decoded = pairs_from_mask(labels, v, v, thresh=0.5)
    want = np.sort(edges, axis=1)
    np.testing.assert_array_equal(
        sorted(map(tuple, decoded.tolist())),
        sorted(map(tuple, want.tolist())))


def test_pairs_from_mask_respects_count():
    v = 8
    probs = np.ones(num_pairs(v))
    out = pairs_from_mask(probs, 3, v)
    np.testing.assert_array_equal(out, [[0, 1], [0, 2], [1, 2]])
