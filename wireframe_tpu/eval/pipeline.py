"""Fused corpus-scale eval pipeline (r3 VERDICT #1).

Round-3 measurement of the 500-building eval (SCALE_EVAL_r03.json:
1.28 buildings/s plain, sharded *slower*) blamed the per-sample host
Hungarian solves — but profiling shows the host metric math costs only
~3.7 ms/sample once the Hausdorff matrices are precomputed (scipy LSA on
the ≤(780, 48) matrices is microseconds; np.unique dominates).  The real
costs were structural, and this module removes them:

1. **Tiny eval batches**: the legacy path inherits the reference's
   batch_size=3 (evaluate.py:33-39), so 500 buildings = 167 chunks, each
   paying device dispatch + several separate host readbacks over the
   tunnel.  Here one chunk is 64 clouds and ALL device results come back
   in a single `jax.device_get`.
2. **Shape-churning recompiles**: `batched_edge_distances` pads the
   per-chunk Hausdorff batch to the chunk maxima (multiples of 8), so
   every new (Qmax, Emax) combination triggered a fresh XLA compile —
   dozens across a 500-building corpus.  Here the pred-edge axis is
   padded to a FIXED `qmax` and the GT axis to a fixed `emax`: exactly
   one compiled program for the whole run.
3. **Serial dispatch**: forward, Hausdorff, and readback ran in lockstep
   per chunk.  Here the forward + edge-selection + Hausdorff pipeline is
   ONE jitted program, and chunks are dispatched `window` ahead of the
   readback cursor, so host accumulation (and the next chunk's sample
   loading) overlaps device compute.

Numerical contract: results are bit-identical to the legacy
`evaluate_model(..., device_hausdorff=True)` path (asserted in
tests/test_eval_pipeline.py).  The on-device edge selection reproduces
`pairs_from_mask` / `pairs_from_slot_mask` (same pair-table order), the
endpoint construction reproduces `edge_endpoint_array`'s descending-z
convention bit-for-bit (f32 gathers, exact f64 upcast on host), and the
per-entry Hausdorff math is elementwise-independent of padding.  Samples
whose kept-pair count overflows `qmax` fall back to the legacy host path
(loudly counted in the returned stats).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wireframe_tpu.config import Config
from wireframe_tpu.data.building3d import Building3DDataset, edge_endpoint_array
from wireframe_tpu.eval.evaluator import _corner_set
from wireframe_tpu.metrics.ap_calculator import APCalculator
from wireframe_tpu.metrics.hausdorff import hausdorff_distance_line_jax
from wireframe_tpu.ops.pairs import triu_pairs, triu_pairs_np
from wireframe_tpu.train.step import make_forward_fn


def make_eval_step(cfg: Config, qmax: int, emax: int, batch: int,
                   group: int = 8):
    """One jitted program: forward -> live-pair selection -> endpoint
    construction -> (qmax, emax) segment-Hausdorff matrices.

    Returns fn(params, clouds (B,N,D), gt_ev (B,emax,2,3)) -> dict of
    device arrays.  `group` bounds the Hausdorff working set: the batch
    is processed in `group`-sample blocks via lax.map (each block
    materializes group x qmax x emax x S x S intermediates).
    """
    forward = make_forward_fn(cfg, train=False)
    v = cfg.model.max_vertices
    mode = cfg.model.slot_mask_mode
    ethresh = cfg.eval.edge_confidence_thresh
    vthresh = cfg.eval.vertex_existence_thresh
    if batch % group != 0:
        group = batch

    def step(params, clouds, gt_ev):
        pairs = triu_pairs(v)                      # (E, 2) i32
        preds = forward(params, clouds, None)
        verts = preds["vertices"]                  # (B, V, 3) f32
        probs = preds["edge_probs"]                # (B, E)
        counts = preds["actual_vertex_counts"]     # (B,)
        exist = preds["existence_probabilities"]   # (B, V)

        if mode == "existence":
            live = exist > vthresh
            pmask = live[:, pairs[:, 0]] & live[:, pairs[:, 1]]
        else:
            # Prefix convention: both endpoints < count (j > i always).
            pmask = pairs[None, :, 1] < counts[:, None]
        keep = pmask & (probs > ethresh)           # (B, E)
        n_keep = jnp.sum(keep, axis=1)             # (B,)

        # First-qmax kept pair rows in pair-table order: a stable argsort
        # of ~keep floats the True entries to the front preserving their
        # relative (= pair-table) order — matching the host decode's
        # `pairs[keep]` ordering exactly.
        order = jnp.argsort(~keep, axis=1, stable=True)
        sel = order[:, :qmax]                      # (B, qmax) i32

        # Endpoint coords, per-edge sorted by DESCENDING z — the
        # edge_endpoint_array convention (argsort(-z) over 2 elements:
        # swap iff z0 < z1; ties keep order).
        pi = pairs[sel]                            # (B, qmax, 2)
        ev = jax.vmap(lambda vt, p: vt[p])(verts, pi)  # (B, qmax, 2, 3)
        swap = ev[:, :, 0, 2] < ev[:, :, 1, 2]     # (B, qmax)
        ev = jnp.where(swap[:, :, None, None], ev[:, :, ::-1, :], ev)

        def block(args):
            ev_b, gt_b = args
            return jax.vmap(hausdorff_distance_line_jax)(ev_b, gt_b)

        dist = jax.lax.map(block, (
            ev.reshape(batch // group, group, qmax, 2, 3),
            gt_ev.reshape(batch // group, group, emax, 2, 3)))
        dist = dist.reshape(batch, qmax, emax)

        return {"vertices": verts, "existence": exist, "counts": counts,
                "edge_probs": probs, "sel": sel, "n_keep": n_keep,
                "dist": dist}

    return jax.jit(step)


def _build_chunk(cfg: Config, dataset: Building3DDataset,
                 chunk: List[int], batch: int, emax: int):
    """Host inputs for one chunk: padded cloud batch + padded GT edge
    endpoints + the ragged GT the accumulator needs.  Per-sample rng is
    keyed (seed, index) exactly like evaluate_model, so counters match
    the legacy path bit-for-bit.  Samples with more GT edges than `emax`
    can't ride the fixed-shape device Hausdorff — they're flagged in the
    returned `em_over` set and their distances come from the same device
    helper the legacy path uses (no fatal error; mirrors the qmax
    overflow fallback)."""
    samples = [dataset.get_sample(i, rng=np.random.default_rng(
        (cfg.data.seed, i)), augment_on_host=False) for i in chunk]
    n_real = len(samples)
    while len(samples) < batch:
        samples.append(samples[-1])
    clouds = np.stack([s["point_clouds"] for s in samples])
    gt = []
    em_over = set()
    gt_ev_pad = np.zeros((batch, emax, 2, 3), np.float32)
    for j, s in enumerate(samples[:n_real]):
        gv = s["wf_vertices"]
        ge = s["wf_edges"].astype(np.int64)
        gev = edge_endpoint_array(np.asarray(gv, np.float64), ge)
        if len(ge) > emax:
            em_over.add(j)
        else:
            gt_ev_pad[j, :len(ge)] = gev
        gt.append((gv, ge, gev))
    return samples[:n_real], clouds, gt_ev_pad, gt, em_over


def evaluate_corpus_pipelined(
        cfg: Config, params, dataset: Building3DDataset,
        indices: Optional[List[int]] = None,
        batch: int = 64, qmax: int = 128, emax: int = 64,
        window: int = 3, ap: Optional[APCalculator] = None,
        eval_step=None, verbose: bool = False,
        stats: Optional[dict] = None,
        ap_router=None) -> Optional[Dict[str, float]]:
    """Corpus eval through the fused fixed-shape pipeline.

    Pass `eval_step` (from make_eval_step with the same shapes) to share
    the compiled program across calls (the sharded path reuses one
    program for every shard).  `stats`, if given, is filled with
    {"qmax_overflows": int, "emax_overflows": int} — samples whose
    kept-pair / GT-edge count exceeded the fixed pads and fell back to
    the legacy helpers (still bit-identical, just off the fused program).

    `ap_router` (callable: dataset index -> APCalculator) accumulates
    each sample into a caller-chosen calculator instead of `ap` — the
    single-process sharded path streams ALL shards through ONE pass
    (full dispatch-ahead overlap, one compiled program) while keeping
    per-shard counters bit-identical to processing each shard alone
    (within a shard, samples still accumulate in ascending index
    order).  With ap_router the caller owns the calculators: returns
    None.
    """
    if ap is None and ap_router is None:
        ap = APCalculator(distance_thresh=cfg.eval.distance_thresh,
                          confidence_thresh=cfg.eval.edge_confidence_thresh)
    if eval_step is None:
        eval_step = make_eval_step(cfg, qmax, emax, batch)
    v = cfg.model.max_vertices
    pair_table = triu_pairs_np(v)
    idxs = list(range(len(dataset))) if indices is None else list(indices)
    q_overflows = 0
    e_overflows = 0

    inflight = deque()

    def drain_one():
        nonlocal q_overflows, e_overflows
        chunk_samples, gt, em_over, chunk_idx, out_dev = inflight.popleft()
        out = jax.device_get(out_dev)
        for j in range(len(chunk_samples)):
            gv, ge, gev = gt[j]
            slot_verts = np.asarray(out["vertices"][j])
            exist = np.asarray(out["existence"][j])
            live = (exist > cfg.eval.vertex_existence_thresh
                    if cfg.model.slot_mask_mode == "existence" else None)
            n = int(out["n_keep"][j])
            if n > qmax:
                # Rare overflow (more kept pairs than the fixed pad):
                # legacy host decode + the same device Hausdorff helper
                # the legacy path uses, so counters stay bit-identical.
                q_overflows += 1
                from wireframe_tpu.eval.distributed import (
                    batched_edge_distances,
                )
                from wireframe_tpu.eval.evaluator import decode_predictions

                dec = decode_predictions(
                    slot_verts, np.asarray(out["edge_probs"][j]),
                    int(out["counts"][j]), v,
                    cfg.eval.edge_confidence_thresh, live_mask=live)
                pd_edges = dec["edges"]
                pd_ev = dec["edges_vertices"]
                dist = batched_edge_distances([pd_ev], [gev])[0]
            else:
                sel = np.asarray(out["sel"][j][:n], np.int64)
                pd_edges = pair_table[sel].astype(np.int64)
                # Endpoints rebuilt on host from the readback f32 slot
                # vertices: an exact f64 upcast, bit-identical to the
                # legacy decode's edge_endpoint_array construction.
                pd_ev = edge_endpoint_array(
                    np.asarray(slot_verts, np.float64), pd_edges)
                if j in em_over:
                    # GT edges overflowed the fixed pad: the device
                    # matrix row was computed against zero padding, so
                    # recompute this sample through the same device
                    # helper the legacy path uses (bit-identical).
                    e_overflows += 1
                    from wireframe_tpu.eval.distributed import (
                        batched_edge_distances,
                    )

                    dist = (batched_edge_distances([pd_ev], [gev])[0]
                            if n else None)
                else:
                    dist = (np.asarray(out["dist"][j][:n, :len(ge)],
                                       np.float64) if n else None)
            corners = _corner_set(cfg, slot_verts, live)
            tgt = ap_router(chunk_idx[j]) if ap_router is not None else ap
            # Dtypes mirror compute_metrics' conversions exactly (GT
            # vertices stay f32 — upcasting here changes WED rounding).
            tgt.accumulate_sample(
                np.asarray(corners).reshape(-1, 3),
                pd_edges.reshape(-1, 2),
                np.asarray(pd_ev).reshape(-1, 2, 3),
                np.asarray(gv).reshape(-1, 3),
                np.asarray(ge).reshape(-1, 2),
                gev.reshape(-1, 2, 3),
                edge_distance=dist)

    for k in range(0, len(idxs), batch):
        chunk = idxs[k:k + batch]
        chunk_samples, clouds, gt_ev_pad, gt, em_over = _build_chunk(
            cfg, dataset, chunk, batch, emax)
        out_dev = eval_step(params, jnp.asarray(clouds),
                            jnp.asarray(gt_ev_pad))
        inflight.append((chunk_samples, gt, em_over, chunk, out_dev))
        while len(inflight) > window:
            drain_one()
    while inflight:
        drain_one()

    if stats is not None:
        stats["qmax_overflows"] = q_overflows
        stats["emax_overflows"] = e_overflows
    if ap_router is not None:
        return None
    return ap.output_accuracy() if verbose else ap.summarize()
