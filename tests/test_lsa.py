"""On-device LSA vs the scipy oracle: assignment cost must match exactly
(up to float tolerance) on random, tied, and structured cost matrices."""

import numpy as np
import jax.numpy as jnp
import pytest

from wireframe_tpu.ops.lsa import (
    assignment_cost,
    solve_lsa_batch,
    solve_lsa_callback,
    solve_lsa_scipy,
)


@pytest.mark.parametrize("n", [1, 2, 3, 8, 17])
def test_lsa_matches_scipy_cost(n, rng):
    cost = rng.random((6, n, n)).astype(np.float32) * 10.0
    got = np.asarray(solve_lsa_batch(jnp.asarray(cost)))
    for b in range(cost.shape[0]):
        assert sorted(got[b].tolist()) == list(range(n))
        ref = solve_lsa_scipy(cost[b])
        c_got = cost[b][np.arange(n), got[b]].sum()
        c_ref = cost[b][np.arange(n), ref].sum()
        np.testing.assert_allclose(c_got, c_ref, rtol=1e-5, atol=1e-5)


def test_lsa_with_ties(rng):
    # Many equal entries — any optimal permutation is acceptable.
    cost = rng.integers(0, 3, size=(4, 16, 16)).astype(np.float32)
    got = np.asarray(solve_lsa_batch(jnp.asarray(cost)))
    for b in range(4):
        ref = solve_lsa_scipy(cost[b])
        c_got = cost[b][np.arange(16), got[b]].sum()
        c_ref = cost[b][np.arange(16), ref].sum()
        np.testing.assert_allclose(c_got, c_ref, atol=1e-6)


def test_lsa_structured_dummy_columns(rng):
    # Shape of the wireframe matching problem: c real columns + dummies.
    n, c = 24, 9
    l1 = rng.random((n, c)).astype(np.float32) * 4
    p = rng.random((n, 1)).astype(np.float32)
    cost = np.concatenate([l1 + (1 - p), np.repeat(p, n - c, 1)], axis=1)
    got = np.asarray(solve_lsa_batch(jnp.asarray(cost[None])))[0]
    ref = solve_lsa_scipy(cost)
    c_got = cost[np.arange(n), got].sum()
    c_ref = cost[np.arange(n), ref].sum()
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-5, atol=1e-5)


def test_rectangular_dynamic_rows(rng):
    """solve_lsa_rows with dynamic active-row counts must match scipy on
    the corresponding submatrix."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from wireframe_tpu.ops.lsa import solve_lsa_rows_batch

    r_dim, c_dim, b = 12, 20, 4
    cost = rng.random((b, r_dim, c_dim)).astype(np.float32) * 5
    counts = rng.integers(0, r_dim + 1, size=b).astype(np.int32)
    got = np.asarray(solve_lsa_rows_batch(jnp.asarray(cost),
                                          jnp.asarray(counts)))
    for i in range(b):
        c = counts[i]
        assert (got[i, c:] == -1).all()
        if c == 0:
            continue
        active = got[i, :c]
        assert len(set(active.tolist())) == c  # distinct columns
        ri, ci = linear_sum_assignment(cost[i, :c])
        c_ref = cost[i, :c][ri, ci].sum()
        c_got = cost[i, np.arange(c), active].sum()
        np.testing.assert_allclose(c_got, c_ref, rtol=1e-5, atol=1e-5)


def test_callback_matcher_matches(rng):
    cost = rng.random((3, 12, 12)).astype(np.float32)
    a = np.asarray(solve_lsa_callback(jnp.asarray(cost)))
    b = np.asarray(solve_lsa_batch(jnp.asarray(cost)))
    ca = np.asarray(assignment_cost(jnp.asarray(cost), jnp.asarray(a)))
    cb = np.asarray(assignment_cost(jnp.asarray(cost), jnp.asarray(b)))
    np.testing.assert_allclose(ca, cb, rtol=1e-5, atol=1e-5)


def test_nan_cost_terminates():
    """NaN costs must NOT hang the solver: unbounded, the Dijkstra
    while_loop re-picks the same column forever (observed as a TPU
    watchdog kill when bf16 training produced NaN params).  The bounded
    loops return a garbage-but-finite assignment instead."""
    import jax.numpy as jnp

    from wireframe_tpu.ops.lsa import solve_lsa, solve_lsa_rows

    nan_cost = jnp.full((6, 6), jnp.nan, jnp.float32)
    out = np.asarray(solve_lsa(nan_cost))          # must return, not hang
    assert out.shape == (6,)
    mixed = jnp.asarray(
        np.where(np.eye(6, 8) > 0, np.nan, 1.0).astype(np.float32))
    out2 = np.asarray(solve_lsa_rows(mixed, jnp.asarray(4)))
    assert out2.shape == (6,)
