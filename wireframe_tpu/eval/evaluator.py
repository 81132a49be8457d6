"""Model evaluation over a dataset split with the Building3D AP stack.

Mirrors evaluate.py:25-116: batched inference (the model's inference
branch derives vertex counts from existence probabilities), edge
thresholding at `edge_confidence_thresh`, z-descending edge endpoint
construction, and streaming APCalculator accumulation.

Reference parity notes:
- ALL `max_vertices` predicted slots are passed as predicted corners
  (evaluate.py:76 does not filter by existence), so corner precision is
  denominated by the slot count — trained behavior, kept.  Opt out with
  `eval.live_corner_filter=true` (existence slot-mask mode only): only
  live slots — the corner set test.py/serve.py actually emit — are
  counted, which reports the model's real corner precision.
- predicted edges are pairs over the first `dynamic_count` slots with
  probability > threshold (PointCloudToWireframe.py:90-92 prefix
  convention on the static pair axis).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wireframe_tpu.config import Config
from wireframe_tpu.data.building3d import (
    Building3DDataset,
    collate_fixed,
    edge_endpoint_array,
)
from wireframe_tpu.metrics.ap_calculator import APCalculator
from wireframe_tpu.ops.pairs import pairs_from_mask, pairs_from_slot_mask
from wireframe_tpu.train.step import make_forward_fn


def decode_predictions(pred_vertices: np.ndarray, edge_probs: np.ndarray,
                       dynamic_count: int, max_vertices: int,
                       thresh: float = 0.5,
                       live_mask: Optional[np.ndarray] = None
                       ) -> Dict[str, np.ndarray]:
    """Decode one sample's raw arrays into wireframe structures.

    live_mask (V,) bool selects live slots directly (the "existence"
    slot-mask mode, where live slots are scattered); without it the
    reference prefix convention applies (first dynamic_count slots).
    """
    if live_mask is not None:
        pd_edges = pairs_from_slot_mask(
            edge_probs, live_mask, max_vertices, thresh)
    else:
        pd_edges = pairs_from_mask(
            edge_probs, dynamic_count, max_vertices, thresh)
    pd_edges_vertices = edge_endpoint_array(
        np.asarray(pred_vertices, np.float64), pd_edges)
    return {
        "vertices": np.asarray(pred_vertices),
        "edges": pd_edges,
        "edges_vertices": pd_edges_vertices,
    }


def _corner_set(cfg: Config, slot_vertices: np.ndarray,
                live: Optional[np.ndarray]) -> np.ndarray:
    """Predicted corners for AP counting: all slots (reference parity) or
    only live slots (`eval.live_corner_filter`, existence mode)."""
    if cfg.eval.live_corner_filter and live is not None:
        return slot_vertices[live]
    return slot_vertices


def predict_bucketed(cfg: Config, params, clouds: List[np.ndarray],
                     forward_fn=None) -> List[Dict[str, np.ndarray]]:
    """Inference over RAW (unsampled, variable-size) clouds.

    Clouds are grouped by point-count bucket (cfg.data.point_buckets),
    zero-padded to the bucket (masked out by the encoder), and batched
    per bucket — at most len(buckets) compiled programs.  Returns
    per-cloud dicts {vertices, edge_probs, count} in input order.
    """
    from wireframe_tpu.data.bucketing import group_by_bucket

    if forward_fn is None:
        forward_fn = jax.jit(make_forward_fn(cfg, train=False))
    rng = np.random.default_rng(cfg.data.seed)
    groups = group_by_bucket(clouds, cfg.data.point_buckets, rng,
                             z_sort=cfg.data.z_sort_points)
    results: List[Optional[dict]] = [None] * len(clouds)
    for bucket, (idxs, stacked) in sorted(groups.items()):
        preds = forward_fn(params, jnp.asarray(stacked), None)
        verts = np.asarray(preds["vertices"])
        probs = np.asarray(preds["edge_probs"])
        counts = np.asarray(preds["actual_vertex_counts"])
        exist = np.asarray(preds["existence_probabilities"])
        for j, i in enumerate(idxs):
            results[i] = {"vertices": verts[j], "edge_probs": probs[j],
                          "count": int(counts[j]), "existence": exist[j]}
    return results


def evaluate_model(cfg: Config, params, dataset: Building3DDataset,
                   forward_fn=None,
                   indices: Optional[List[int]] = None,
                   verbose: bool = True,
                   raw_points: bool = False,
                   device_hausdorff: bool = False,
                   ap: Optional[APCalculator] = None) -> Dict[str, float]:
    """Run inference over `dataset` and return the Building3D metric dict.

    raw_points=True evaluates on the full unsampled clouds via bucketed
    batching instead of the reference's 2560-point random sampling.
    device_hausdorff=True computes the pred-vs-GT edge Hausdorff matrices
    in one padded batch on device (eval/distributed.py) instead of
    per-sample numpy.  Pass `ap` to accumulate into an external
    calculator (sharded eval merges per-shard counters).
    """
    if forward_fn is None:
        forward_fn = jax.jit(make_forward_fn(cfg, train=False))
    if ap is None:
        ap = APCalculator(distance_thresh=cfg.eval.distance_thresh,
                          confidence_thresh=cfg.eval.edge_confidence_thresh)
    v = cfg.model.max_vertices
    bs = cfg.eval.batch_size

    # Per-sample rng derived from (seed, index): point sampling for sample
    # i is identical no matter which order/shard evaluates it — required
    # for sharded-eval counter equality (eval/distributed.py).
    def sample_rng(i):
        return np.random.default_rng((cfg.data.seed, i))

    idxs = list(range(len(dataset))) if indices is None else list(indices)
    for k in range(0, len(idxs), bs):
        chunk = idxs[k:k + bs]
        if raw_points:
            import dataclasses

            raw_cfg = dataclasses.replace(cfg.data, num_points=0)
            saved = dataset.cfg
            dataset.cfg = raw_cfg
            try:
                samples = [dataset.get_sample(i, rng=sample_rng(i),
                                              augment_on_host=False)
                           for i in chunk]
            finally:
                dataset.cfg = saved
            bucketed = predict_bucketed(
                cfg, params, [s["point_clouds"] for s in samples],
                forward_fn)
            # Build the AP batch directly from bucketed predictions.
            ap_batch = {
                "predicted_vertices": [], "predicted_edges": [],
                "pred_edges_vertices": [], "wf_vertices": [],
                "wf_edges": [], "wf_edges_vertices": [],
            }
            for s, pred in zip(samples, bucketed):
                live = (pred["existence"] > cfg.eval.vertex_existence_thresh
                        if cfg.model.slot_mask_mode == "existence" else None)
                dec = decode_predictions(
                    pred["vertices"], pred["edge_probs"], pred["count"],
                    v, cfg.eval.edge_confidence_thresh, live_mask=live)
                gt_vertices = s["wf_vertices"]
                gt_edges = s["wf_edges"].astype(np.int64)
                gt_ev = edge_endpoint_array(
                    np.asarray(gt_vertices, np.float64), gt_edges)
                ap_batch["predicted_vertices"].append(
                    _corner_set(cfg, dec["vertices"], live))
                ap_batch["predicted_edges"].append(dec["edges"])
                ap_batch["pred_edges_vertices"].append(dec["edges_vertices"])
                ap_batch["wf_vertices"].append(gt_vertices)
                ap_batch["wf_edges"].append(gt_edges)
                ap_batch["wf_edges_vertices"].append(gt_ev)
            if device_hausdorff:
                from wireframe_tpu.eval.distributed import (
                    batched_edge_distances,
                )

                ap_batch["edge_distance"] = batched_edge_distances(
                    ap_batch["pred_edges_vertices"],
                    ap_batch["wf_edges_vertices"])
            ap.compute_metrics(ap_batch)
            continue
        samples = [dataset.get_sample(i, rng=sample_rng(i),
                                      augment_on_host=False)
                   for i in chunk]
        # Pad ragged final chunks to the full batch size (repeat the last
        # sample) so every batch hits the SAME compiled program; padded
        # rows are excluded from metric accumulation below.
        n_real = len(samples)
        while len(samples) < bs:
            samples.append(samples[-1])
        batch = collate_fixed(samples, v)
        preds = forward_fn(params, jnp.asarray(batch["point_clouds"]), None)
        pred_vertices = np.asarray(preds["vertices"])[:n_real]
        edge_probs = np.asarray(preds["edge_probs"])[:n_real]
        counts = np.asarray(preds["actual_vertex_counts"])[:n_real]
        existence = np.asarray(preds["existence_probabilities"])[:n_real]

        ap_batch = {
            "predicted_vertices": [], "predicted_edges": [],
            "pred_edges_vertices": [], "wf_vertices": [], "wf_edges": [],
            "wf_edges_vertices": [],
        }
        for i in range(len(chunk)):
            live = (existence[i] > cfg.eval.vertex_existence_thresh
                    if cfg.model.slot_mask_mode == "existence" else None)
            dec = decode_predictions(
                pred_vertices[i], edge_probs[i], int(counts[i]), v,
                cfg.eval.edge_confidence_thresh, live_mask=live)
            gt_vertices = batch["wf_vertices"][i]
            gt_edges = batch["wf_edges"][i].astype(np.int64)
            gt_ev = edge_endpoint_array(
                np.asarray(gt_vertices, np.float64), gt_edges)
            ap_batch["predicted_vertices"].append(
                _corner_set(cfg, dec["vertices"], live))
            ap_batch["predicted_edges"].append(dec["edges"])
            ap_batch["pred_edges_vertices"].append(dec["edges_vertices"])
            ap_batch["wf_vertices"].append(gt_vertices)
            ap_batch["wf_edges"].append(gt_edges)
            ap_batch["wf_edges_vertices"].append(gt_ev)
        if device_hausdorff:
            from wireframe_tpu.eval.distributed import batched_edge_distances

            ap_batch["edge_distance"] = batched_edge_distances(
                ap_batch["pred_edges_vertices"],
                ap_batch["wf_edges_vertices"])
        ap.compute_metrics(ap_batch)

    return ap.output_accuracy() if verbose else ap.summarize()
