"""Exact batched linear-sum-assignment (Hungarian) ON DEVICE.

The reference solves an LSA per sample per train step by shipping the cost
matrix to the CPU and calling `scipy.optimize.linear_sum_assignment`
(losses/WireframeLoss.py:235-236) — a host round-trip in the hot loop.
Here the solver is a JAX implementation of the shortest-augmenting-path
(Jonker-Volgenant) algorithm, jittable and `vmap`-able, so the whole train
step stays on TPU.

Algorithm: one augmentation per active row — a Dijkstra-style search over
columns with dual potentials (u, v), early-exiting the moment an
unassigned column becomes the frontier minimum, then augmenting along the
predecessor path.  This is the same algorithm scipy uses (Crouse 2016);
the returned assignment may differ on cost ties, but the total assignment
cost is optimal and equal.

Shapes are static; the number of ACTIVE rows can be dynamic
(`solve_lsa_rows`), which the wireframe loss exploits: its square
V x V problem (real columns + p_i-valued dummy columns) reduces to a
rectangular c x V problem over the c real targets only — c
augmentations instead of V (SURVEY.md §7 "on-device Hungarian").

Costs must be finite and NON-NEGATIVE (zero initial duals are only
feasible for non-negative costs; shift by a constant per fully-assigned
row if needed — constant shifts don't change the argmin).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _augment_row(cost, u, v, col4row, row4col, cur_row):
    """One augmentation starting from row `cur_row`.

    Returns updated (u, v, col4row, row4col).
    cost: (R, C); u: (R,); v: (C,); col4row: (R,); row4col: (C,).
    """
    n_rows, n_cols = cost.shape
    inf = jnp.asarray(jnp.inf, cost.dtype)

    SR0 = jnp.zeros((n_rows,), jnp.bool_)
    SC0 = jnp.zeros((n_cols,), jnp.bool_)
    spc0 = jnp.full((n_cols,), inf, cost.dtype)
    path0 = jnp.full((n_cols,), -1, jnp.int32)

    # HARD ITERATION BOUND: each legitimate iteration marks a new column
    # scanned, so > n_cols iterations means the costs are NaN (every
    # comparison false -> the same column re-picked forever).  Unbounded,
    # that spins the while_loop until the TPU watchdog kills the worker
    # process (observed with NaN params); bounded, a garbage assignment
    # comes back and the NaN surfaces in the loss where it is debuggable.
    def cond(s):
        _, _, _, _, _, _, sink, k = s
        return (sink < 0) & (k <= n_cols)

    def body(s):
        SR, SC, spc, path, min_val, i, _, k = s
        SR = SR.at[i].set(True)
        r = min_val + cost[i] - u[i] - v
        better = (r < spc) & (~SC)
        spc = jnp.where(better, r, spc)
        path = jnp.where(better, i, path)

        cand = jnp.where(SC, inf, spc)
        lowest = jnp.min(cand)
        is_lowest = cand == lowest
        unassigned_low = is_lowest & (row4col == -1)
        j = jnp.where(jnp.any(unassigned_low),
                      jnp.argmax(unassigned_low),
                      jnp.argmax(is_lowest)).astype(jnp.int32)

        sink = jnp.where(row4col[j] == -1, j, -1)
        i_next = jnp.where(sink < 0, row4col[j], i)
        SC = SC.at[j].set(True)
        return SR, SC, spc, path, lowest, i_next, sink, k + 1

    init = (SR0, SC0, spc0, path0, jnp.asarray(0.0, cost.dtype),
            jnp.asarray(cur_row, jnp.int32), jnp.asarray(-1, jnp.int32),
            jnp.asarray(0, jnp.int32))
    SR, SC, spc, path, min_val, _, sink, _ = jax.lax.while_loop(
        cond, body, init)
    # NaN escape: pretend the sink is column 0 so augmentation stays
    # bounded; the assignment is garbage but finite-shaped.
    sink = jnp.where(sink < 0, 0, sink)

    # Dual updates keep reduced costs non-negative for later rows.
    idx = jnp.arange(n_rows)
    u = u.at[cur_row].add(min_val)
    other = SR & (idx != cur_row)
    safe_cols = jnp.where(col4row >= 0, col4row, 0)
    u = jnp.where(other, u + min_val - spc[safe_cols], u)
    v = jnp.where(SC, v - (min_val - spc), v)

    # Augment along predecessors from sink back to cur_row.  The
    # alternating path visits each row at most once, so bound at n_rows
    # steps (same NaN defense as the search loop above).
    def aug_cond(s):
        _, _, _, done, k = s
        return jnp.logical_not(done) & (k <= n_rows)

    def aug_body(s):
        j, c4r, r4c, _, k = s
        i = path[j]
        safe_i = jnp.maximum(i, 0)  # path[j] == -1 only on NaN escape
        r4c = r4c.at[j].set(safe_i)
        nxt = c4r[safe_i]
        c4r = c4r.at[safe_i].set(j)
        return nxt, c4r, r4c, i == cur_row, k + 1

    _, col4row, row4col, _, _ = jax.lax.while_loop(
        aug_cond, aug_body,
        (sink, col4row, row4col, jnp.asarray(False),
         jnp.asarray(0, jnp.int32)))
    return u, v, col4row, row4col


def solve_lsa_rows(cost: jnp.ndarray,
                   num_rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rectangular LSA: assign the first `num_rows` rows of a (R, C)
    non-negative cost matrix (num_rows <= R <= C) to distinct columns.

    Returns col4row (R,) int32 — the column per row, -1 for inactive rows.
    """
    n_rows, n_cols = cost.shape
    assert n_rows <= n_cols, "need rows <= cols; transpose the problem"
    dtype = cost.dtype
    if num_rows is None:
        num_rows = jnp.asarray(n_rows, jnp.int32)
    else:
        num_rows = jnp.asarray(num_rows, jnp.int32)

    def outer_cond(s):
        row, *_ = s
        return row < num_rows

    def outer_body(s):
        row, u, v, col4row, row4col = s
        u, v, col4row, row4col = _augment_row(
            cost, u, v, col4row, row4col, row)
        return row + 1, u, v, col4row, row4col

    init = (jnp.asarray(0, jnp.int32),
            jnp.zeros((n_rows,), dtype),
            jnp.zeros((n_cols,), dtype),
            jnp.full((n_rows,), -1, jnp.int32),
            jnp.full((n_cols,), -1, jnp.int32))
    _, _, _, col4row, _ = jax.lax.while_loop(outer_cond, outer_body, init)
    return col4row


def solve_lsa(cost: jnp.ndarray) -> jnp.ndarray:
    """Square LSA. cost: (n, n) finite, non-negative.  Returns col4row
    (n,) int32, a permutation minimizing sum_i cost[i, col4row[i]]."""
    n = cost.shape[0]
    assert cost.shape == (n, n), "solve_lsa requires a square cost matrix"
    return solve_lsa_rows(cost, None)


@jax.jit
def solve_lsa_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched square LSA: (B, n, n) -> (B, n) col4row."""
    return jax.vmap(solve_lsa)(cost)


@jax.jit
def solve_lsa_rows_batch(cost: jnp.ndarray,
                         num_rows: jnp.ndarray) -> jnp.ndarray:
    """Batched rectangular LSA: (B, R, C), (B,) -> (B, R)."""
    return jax.vmap(solve_lsa_rows)(cost, num_rows)


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
    slower (device->host sync every step, like the reference).  NOTE:
    unsupported on tunneled TPU platforms without host callbacks.
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
    """Total cost of an assignment; works batched ((..., n, n), (..., n)).
    Rows with col4row == -1 contribute 0."""
    safe = jnp.maximum(col4row, 0)
    picked = jnp.take_along_axis(
        cost, safe[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(jnp.where(col4row >= 0, picked, 0.0), axis=-1)
