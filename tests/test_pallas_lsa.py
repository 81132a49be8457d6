"""Lockstep Pallas JV solver vs the scipy oracle and the XLA-loop JV.

The lockstep solver (ops/pallas_lsa.py) must produce assignments with
EXACTLY optimal total cost (scipy's optimum) for every sample, including
zero active rows, rectangular shapes, ties, and lane-padding; and the
Pallas interpret path must be bit-identical to the plain-XLA lockstep
path (same code, two lowerings).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from wireframe_tpu.losses.wireframe_loss import (
    WireframeLossConfig,
    wireframe_loss,
)
from wireframe_tpu.ops.lsa import solve_lsa_rows_batch
from wireframe_tpu.ops.pallas_lsa import (
    solve_lsa_rows_lockstep,
    solve_lsa_rows_pallas,
)


def _check_optimal(cost, nr, got):
    b = cost.shape[0]
    for i in range(b):
        k = int(nr[i])
        if k == 0:
            assert (got[i] == -1).all()
            continue
        g = got[i, :k]
        assert (g >= 0).all() and (g < cost.shape[2]).all()
        assert len(set(g.tolist())) == k, f"sample {i}: duplicate columns"
        assert (got[i, k:] == -1).all()
        ri, ci = linear_sum_assignment(cost[i, :k])
        want = cost[i, ri, ci].sum()
        have = cost[i, np.arange(k), g].sum()
        np.testing.assert_allclose(have, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape,seed", [
    ((8, 10, 10), 0),     # square
    ((6, 12, 40), 1),     # wide rectangular
    ((16, 40, 40), 2),    # the wireframe V=40 case
    ((3, 5, 7), 3),
])
def test_lockstep_matches_scipy(shape, seed):
    b, r, c = shape
    rng = np.random.default_rng(seed)
    cost = (rng.random((b, r, c)) * 10).astype(np.float32)
    nr = rng.integers(0, r + 1, size=b).astype(np.int32)
    nr[0] = 0                       # explicit zero-row sample
    got = np.asarray(solve_lsa_rows_lockstep(jnp.asarray(cost),
                                             jnp.asarray(nr)))
    _check_optimal(cost, nr, got)


def test_lockstep_with_ties():
    # Quantized costs force many ties; optimum must still be exact.
    rng = np.random.default_rng(7)
    cost = (rng.integers(0, 4, size=(8, 12, 16)) * 0.5).astype(np.float32)
    nr = np.full(8, 12, np.int32)
    got = np.asarray(solve_lsa_rows_lockstep(jnp.asarray(cost),
                                             jnp.asarray(nr)))
    _check_optimal(cost, nr, got)


def test_pallas_interpret_equals_lockstep():
    rng = np.random.default_rng(11)
    cost = (rng.random((10, 14, 30)) * 5).astype(np.float32)
    nr = rng.integers(0, 15, size=10).astype(np.int32)
    a = np.asarray(solve_lsa_rows_lockstep(jnp.asarray(cost),
                                           jnp.asarray(nr)))
    b = np.asarray(solve_lsa_rows_pallas(jnp.asarray(cost), jnp.asarray(nr),
                                         interpret=True))
    np.testing.assert_array_equal(a, b)
    _check_optimal(cost, nr, b)


def test_pallas_chunking_padding():
    # Batch not divisible by chunk; R not a sublane multiple; C far from
    # a lane multiple — padding must not leak into results.
    rng = np.random.default_rng(13)
    cost = (rng.random((5, 11, 13)) * 3).astype(np.float32)
    nr = np.array([11, 0, 5, 11, 1], np.int32)
    got = np.asarray(solve_lsa_rows_pallas(jnp.asarray(cost),
                                           jnp.asarray(nr),
                                           chunk=2, interpret=True))
    _check_optimal(cost, nr, got)


def test_same_assignment_cost_as_xla_loop_jv():
    # Both solvers are exact: equal total assignment cost on the same
    # problems (tie-breaking may differ).
    rng = np.random.default_rng(17)
    cost = (rng.random((6, 20, 20)) * 8).astype(np.float32)
    nr = rng.integers(1, 21, size=6).astype(np.int32)
    a = np.asarray(solve_lsa_rows_lockstep(jnp.asarray(cost),
                                           jnp.asarray(nr)))
    b = np.asarray(solve_lsa_rows_batch(jnp.asarray(cost), jnp.asarray(nr)))
    for i in range(6):
        k = int(nr[i])
        ca = cost[i, np.arange(k), a[i, :k]].sum()
        cb = cost[i, np.arange(k), b[i, :k]].sum()
        np.testing.assert_allclose(ca, cb, rtol=1e-5)


def _rand_loss_inputs(rng, b=4, v=12):
    e = v * (v - 1) // 2
    counts = rng.integers(1, v + 1, size=b).astype(np.int32)
    preds = {
        "vertices": rng.normal(size=(b, v, 3)).astype(np.float32),
        "existence_logits": rng.normal(size=(b, v)).astype(np.float32),
        "edge_logits": rng.normal(size=(b, e)).astype(np.float32),
        "pair_mask": np.ones((b, e), np.float32),
    }
    preds["existence_probabilities"] = 1 / (1 + np.exp(
        -preds["existence_logits"]))
    targets = {
        "vertices": (rng.normal(size=(b, v, 3))
                     * (np.arange(v)[None, :, None]
                        < counts[:, None, None])).astype(np.float32),
        "vertex_existence": (np.arange(v)[None, :]
                             < counts[:, None]).astype(np.float32),
        "edge_labels": (rng.random((b, e)) < 0.2).astype(np.float32),
        "vertex_counts": counts,
    }
    return ({k: jnp.asarray(x) for k, x in preds.items()},
            {k: jnp.asarray(x) for k, x in targets.items()})


def test_loss_pallas_matcher_matches_device():
    rng = np.random.default_rng(23)
    preds, targets = _rand_loss_inputs(rng)
    dev = wireframe_loss(preds, targets,
                         WireframeLossConfig(matcher="device"))
    pal = wireframe_loss(preds, targets,
                         WireframeLossConfig(matcher="pallas"))
    for k in ("total_loss", "vertex_loss", "existence_loss", "edge_loss"):
        np.testing.assert_allclose(np.asarray(dev[k]), np.asarray(pal[k]),
                                   rtol=1e-5, atol=1e-6)


def test_loss_auto_resolves_off_tpu():
    # On the CPU test platform "auto" must take the XLA-loop path and
    # produce identical results to explicit "device".
    rng = np.random.default_rng(29)
    preds, targets = _rand_loss_inputs(rng)
    dev = wireframe_loss(preds, targets,
                         WireframeLossConfig(matcher="device"))
    auto = wireframe_loss(preds, targets,
                          WireframeLossConfig(matcher="auto"))
    np.testing.assert_allclose(np.asarray(dev["total_loss"]),
                               np.asarray(auto["total_loss"]), rtol=1e-6)
