"""Exact batched linear-sum-assignment (Hungarian) ON DEVICE.

The reference solves an LSA per sample per train step by shipping the cost
matrix to the CPU and calling `scipy.optimize.linear_sum_assignment`
(losses/WireframeLoss.py:235-236) — a host round-trip in the hot loop.
Here the solver is a JAX implementation of the shortest-augmenting-path
(Jonker-Volgenant) algorithm, jittable and `vmap`-able, so the whole train
step stays on TPU.

Algorithm: for each row, run a Dijkstra-style search over columns with
dual potentials (u, v), then augment along the found path.  This is the
same algorithm scipy uses (Crouse 2016); the returned assignment may
differ on cost ties, but the total assignment cost is optimal and equal.

Costs must be finite.  Callers encoding "forbidden" entries should use a
large finite penalty (see `BIG`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def _augmenting_path_scan(cost, u, v, row4col, cur_row):
    """One Dijkstra pass from `cur_row`.

    Returns (sink, min_val, SR, SC, shortest_path_costs, path).
    Implemented as a bounded `fori_loop` over at-most-n column selections —
    static trip count keeps this trivially vmap-able and avoids
    while-loop batching overhead for small n.
    """
    n = cost.shape[0]
    inf = jnp.asarray(jnp.inf, cost.dtype)

    SR = jnp.zeros((n,), jnp.bool_)
    SC = jnp.zeros((n,), jnp.bool_)
    spc = jnp.full((n,), inf, cost.dtype)       # shortest path cost per col
    path = jnp.full((n,), -1, jnp.int32)        # predecessor row per col
    min_val = jnp.asarray(0.0, cost.dtype)
    i = jnp.asarray(cur_row, jnp.int32)
    sink = jnp.asarray(-1, jnp.int32)

    def body(_, state):
        SR, SC, spc, path, min_val, i, sink = state
        done = sink >= 0

        SR2 = SR.at[i].set(True)
        # Relax edges out of row i.
        r = min_val + cost[i] - u[i] - v
        better = (r < spc) & (~SC)
        spc2 = jnp.where(better, r, spc)
        path2 = jnp.where(better, i, path)

        # Pick the lowest-cost unscanned column, preferring unassigned
        # columns on ties (any optimal tie-break is valid).
        cand = jnp.where(SC, inf, spc2)
        lowest = jnp.min(cand)
        is_lowest = cand == lowest
        unassigned_low = is_lowest & (row4col == -1)
        j = jnp.where(jnp.any(unassigned_low),
                      jnp.argmax(unassigned_low),
                      jnp.argmax(is_lowest)).astype(jnp.int32)

        new_sink = jnp.where(row4col[j] == -1, j, -1)
        new_i = jnp.where(new_sink < 0, row4col[j], i)
        SC2 = SC.at[j].set(True)

        return (
            jnp.where(done, SR, SR2),
            jnp.where(done, SC, SC2),
            jnp.where(done, spc, spc2),
            jnp.where(done, path, path2),
            jnp.where(done, min_val, lowest),
            jnp.where(done, i, new_i),
            jnp.where(done, sink, new_sink),
        )

    SR, SC, spc, path, min_val, i, sink = jax.lax.fori_loop(
        0, n, body, (SR, SC, spc, path, min_val, i, sink))
    return sink, min_val, SR, SC, spc, path


def solve_lsa(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve square LSA. cost: (n, n) finite. Returns col4row: (n,) int32,
    the column assigned to each row (a permutation of 0..n-1), minimizing
    sum_i cost[i, col4row[i]].
    """
    n = cost.shape[0]
    assert cost.shape == (n, n), "solve_lsa requires a square cost matrix"
    dtype = cost.dtype

    u0 = jnp.zeros((n,), dtype)
    v0 = jnp.zeros((n,), dtype)
    col4row0 = jnp.full((n,), -1, jnp.int32)
    row4col0 = jnp.full((n,), -1, jnp.int32)

    def outer(cur_row, state):
        u, v, col4row, row4col = state
        sink, min_val, SR, SC, spc, path = _augmenting_path_scan(
            cost, u, v, row4col, cur_row)

        # Dual updates (keeps reduced costs non-negative).
        idx = jnp.arange(n)
        u = u.at[cur_row].add(min_val)
        other = SR & (idx != cur_row)
        # col4row[i] is valid for every i in SR except cur_row.
        safe_cols = jnp.where(col4row >= 0, col4row, 0)
        u = jnp.where(other, u + min_val - spc[safe_cols], u)
        v = jnp.where(SC, v - (min_val - spc), v)

        # Augment: walk predecessors from sink back to cur_row.
        def aug_cond(s):
            _, _, _, done = s
            return jnp.logical_not(done)

        def aug_body(s):
            j, c4r, r4c, _ = s
            i = path[j]
            r4c = r4c.at[j].set(i)
            nxt = c4r[i]
            c4r = c4r.at[i].set(j)
            return nxt, c4r, r4c, i == cur_row

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, False))
        return u, v, col4row, row4col

    _, _, col4row, _ = jax.lax.fori_loop(
        0, n, outer, (u0, v0, col4row0, row4col0))
    return col4row


@functools.partial(jax.jit, static_argnames=())
def solve_lsa_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched LSA: (B, n, n) -> (B, n) col4row."""
    return jax.vmap(solve_lsa)(cost)


def solve_lsa_scipy(cost) -> np.ndarray:
    """Host oracle/fallback via scipy (used in tests and `matcher='scipy'`).

    Same contract as solve_lsa (square input, returns col4row).
    """
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(np.asarray(cost))
    out = np.empty(cost.shape[0], dtype=np.int32)
    out[rows] = cols
    return out


def solve_lsa_callback(cost: jnp.ndarray) -> jnp.ndarray:
    """scipy solver wrapped for use inside jit via pure_callback.

    cost: (B, n, n) -> (B, n).  Numerically the anchor for parity tests;
    slower (device->host sync every step, like the reference).
    """
    b, n, _ = cost.shape

    def host_fn(c):
        return np.stack([solve_lsa_scipy(c[i]) for i in range(c.shape[0])])

    return jax.pure_callback(
        host_fn,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def assignment_cost(cost: jnp.ndarray, col4row: jnp.ndarray) -> jnp.ndarray:
    """Total cost of an assignment; works batched ((..., n, n), (..., n))."""
    return jnp.sum(
        jnp.take_along_axis(cost, col4row[..., None].astype(jnp.int32),
                            axis=-1)[..., 0], axis=-1)
