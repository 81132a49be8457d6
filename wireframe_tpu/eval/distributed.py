"""Pod-scale sharded evaluation (VERDICT r1 #8; BASELINE config 5).

Three pieces:

1. `batched_edge_distances` — the pred-vs-GT segment Hausdorff matrices
   for a whole batch computed ON DEVICE (`hausdorff_distance_line_jax`,
   vmapped over a padded batch).  The N x M x 20 x 20 contraction is the
   eval hot spot in the reference (SURVEY.md §3.2); here it is one
   compiled program per padded shape bucket.

2. `gather_merge` — cross-process counter merge.  Each shard's
   APCalculator reduces to a tiny (9,) float64 counter vector;
   `process_allgather` moves the VECTORS (exact — no device arithmetic),
   and the reduction happens on host in a fixed order, so the merged
   counters are BIT-IDENTICAL to a single-host run.  A float psum would
   be the textbook alternative but reduces in f32 in nondeterministic
   order; gather-then-reduce keeps eval bit-exact, which the tests
   assert.

3. `evaluate_model_sharded` — round-robin shards the sample indices
   (same math as `parallel.multihost.host_shard_indices`), accumulates an
   APCalculator per shard (forwards batched on device), merges, and
   returns the standard metric dict.  In a true multi-process pod each
   process runs its own shard and merges via `gather_merge`; the
   single-process form (tested on the 8-virtual-device mesh) runs the
   shards sequentially through the SAME code path.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wireframe_tpu.metrics.ap_calculator import _COUNTER_KEYS, APCalculator
from wireframe_tpu.metrics.hausdorff import hausdorff_distance_line_jax
from wireframe_tpu.parallel.multihost import host_shard_indices

_hd_batch = jax.jit(jax.vmap(hausdorff_distance_line_jax))


def _pad_to(k: int, mult: int = 8) -> int:
    return max(mult, ((k + mult - 1) // mult) * mult)


def batched_edge_distances(pred_evs: List[np.ndarray],
                           gt_evs: List[np.ndarray]
                           ) -> List[Optional[np.ndarray]]:
    """Per-sample (Qi, Ei) Hausdorff matrices, computed in ONE padded
    device batch.  Entries are independent of padding rows, so slicing
    recovers the exact per-sample matrices.  Samples with no predicted
    edges return None (the corners-only fallback path needs no matrix).
    Pad targets round up to multiples of 8 to bound recompilation.
    """
    live = [i for i, p in enumerate(pred_evs) if len(p) > 0]
    out: List[Optional[np.ndarray]] = [None] * len(pred_evs)
    if not live:
        return out
    qm = _pad_to(max(len(pred_evs[i]) for i in live))
    em = _pad_to(max(len(gt_evs[i]) for i in live))
    pp = np.zeros((len(live), qm, 2, 3), np.float32)
    tt = np.zeros((len(live), em, 2, 3), np.float32)
    for j, i in enumerate(live):
        pp[j, :len(pred_evs[i])] = pred_evs[i]
        tt[j, :len(gt_evs[i])] = gt_evs[i]
    d = np.asarray(_hd_batch(jnp.asarray(pp), jnp.asarray(tt)))
    for j, i in enumerate(live):
        out[i] = d[j, :len(pred_evs[i]), :len(gt_evs[i])].astype(np.float64)
    return out


def counters_vector(ap: APCalculator) -> np.ndarray:
    """(len(_COUNTER_KEYS)+1,) float64: raw counters + num_samples."""
    return np.asarray(
        [float(ap.ap_dict[k]) for k in _COUNTER_KEYS] + [ap.num_samples],
        np.float64)


def calculator_from_vector(vec: np.ndarray,
                           distance_thresh: float) -> APCalculator:
    ap = APCalculator(distance_thresh=distance_thresh)
    for i, k in enumerate(_COUNTER_KEYS):
        ap.ap_dict[k] = float(vec[i])
    ap.num_samples = int(vec[-1])
    return ap


def gather_merge(ap: APCalculator) -> APCalculator:
    """Merge this process's counters with every other process's.

    Single-process: identity.  Multi-process (jax.distributed): an
    allgather of the (9,) counter vector followed by a fixed-order host
    sum — exact, unlike an in-flight float reduction.
    """
    if jax.process_count() == 1:
        return ap
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(counters_vector(ap)))
    merged = calculator_from_vector(
        gathered.sum(axis=0), ap.distance_thresh)
    merged.confidence_thresh = ap.confidence_thresh
    return merged


def evaluate_model_sharded(cfg, params, dataset,
                           n_shards: Optional[int] = None,
                           forward_fn=None,
                           device_hausdorff: bool = True,
                           verbose: bool = False,
                           pipelined: bool = False,
                           pipeline_kwargs: Optional[dict] = None
                           ) -> Dict[str, float]:
    """Shard the dataset round-robin, accumulate per-shard APCalculators,
    merge counters, return the standard Building3D metric dict.

    Per-sample metric math is identical to `evaluate_model`; only the
    accumulation is partitioned, so merged counters match the unsharded
    run exactly (asserted in tests/test_distributed_eval.py).

    pipelined=True routes every shard through the fused fixed-shape eval
    pipeline (eval/pipeline.py) — ONE compiled program shared by all
    shards, dispatch-ahead readback — instead of the legacy small-batch
    path (r3 VERDICT #1: the legacy sharded path was slower than plain).
    The pipeline builds its own fused forward+Hausdorff program, so
    `forward_fn` cannot be honored there (passing one raises) and
    `device_hausdorff` is moot — distances always come from the device.
    """
    from wireframe_tpu.eval.evaluator import evaluate_model

    if pipelined and forward_fn is not None:
        raise ValueError(
            "pipelined=True compiles its own fused forward+Hausdorff "
            "program (eval/pipeline.py) and cannot run a caller-supplied "
            "forward_fn; drop forward_fn or use pipelined=False")
    if n_shards is None:
        n_shards = jax.process_count()
    shards = [host_shard_indices(len(dataset), s, n_shards)
              for s in range(n_shards)]
    kw = dict(pipeline_kwargs or {})
    if pipelined:
        from wireframe_tpu.eval.pipeline import (
            evaluate_corpus_pipelined,
            make_eval_step,
        )

        if "eval_step" not in kw:
            kw["eval_step"] = make_eval_step(
                cfg, kw.get("qmax", 128), kw.get("emax", 64),
                kw.get("batch", 64))
        # ONE pipelined pass over every shard's samples, routing each
        # sample to its shard's calculator.  Processing shards as
        # separate pipeline calls would serialize build -> dispatch ->
        # drain per shard (a 500-building/8-shard run is one chunk per
        # shard: zero dispatch-ahead overlap, every tunnel round trip
        # exposed); one pass keeps the full `window` overlap.  Per-shard
        # counters stay bit-identical to per-shard passes: within a
        # shard samples still accumulate in ascending index order.
        aps = {s: APCalculator(
            distance_thresh=cfg.eval.distance_thresh,
            confidence_thresh=cfg.eval.edge_confidence_thresh)
            for s, idxs in enumerate(shards) if idxs}
        evaluate_corpus_pipelined(
            cfg, params, dataset,
            indices=sorted(i for idxs in shards for i in idxs),
            ap_router=lambda i: aps[i % n_shards], **kw)
        calcs = [aps[s] for s in sorted(aps)]
    else:
        calcs = []
        for idxs in shards:
            if not idxs:
                continue
            ap = APCalculator(
                distance_thresh=cfg.eval.distance_thresh,
                confidence_thresh=cfg.eval.edge_confidence_thresh)
            evaluate_model(cfg, params, dataset, forward_fn=forward_fn,
                           indices=idxs, verbose=False,
                           device_hausdorff=device_hausdorff, ap=ap)
            calcs.append(ap)
    merged = calcs[0].merge_counters(calcs[1:])
    merged = gather_merge(merged)
    return merged.output_accuracy() if verbose else merged.summarize()
