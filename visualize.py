#!/usr/bin/env python3
"""Visualization entry point (reference: visualize1.py).

Renders per-sample PNGs under --out-dir: a 3-panel GT-vs-prediction
comparison and an edge-probability plot, plus split-level metrics.
Sample selection is by flags (`--samples 0,3,7` or `--samples all`)
instead of the reference's interactive `input()` prompts; `--interactive`
restores prompt-driven selection.

Usage:
  python visualize.py [--split test] [--samples all] [--out-dir output]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--split", default="test", choices=("train", "test"))
    p.add_argument("--samples", default="all",
                   help="comma-separated indices or 'all'")
    p.add_argument("--out-dir", default="output")
    p.add_argument("--interactive", action="store_true")
    p.add_argument("--loss-curve", action="store_true",
                   help="also render the training loss curves from "
                        "<checkpoint-dir>/train_metrics.jsonl")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE")
    return p.parse_args(argv)


def main(argv=None):
    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from main import resolve_data_root
    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset, collate_fixed
    from wireframe_tpu.data.building3d import edge_endpoint_array
    from wireframe_tpu.eval import decode_predictions
    from wireframe_tpu.metrics.ap_calculator import APCalculator
    from wireframe_tpu.train.checkpoint import load_checkpoint
    from wireframe_tpu.train.step import make_forward_fn
    from wireframe_tpu.viz import (
        plot_edge_probabilities,
        plot_prediction_comparison,
    )

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = resolve_data_root(args.data_root)

    if args.loss_curve:
        import json

        from wireframe_tpu.viz import plot_training_loss

        jsonl = os.path.join(args.checkpoint_dir, "train_metrics.jsonl")
        if os.path.exists(jsonl):
            with open(jsonl) as f:
                history = [json.loads(line) for line in f]
            os.makedirs(args.out_dir, exist_ok=True)
            out = os.path.join(args.out_dir, "training_loss.png")
            plot_training_loss(history, save_path=out)
            print(f"loss curves -> {out}")
        else:
            print(f"no metrics at {jsonl}")

    from wireframe_tpu.train.checkpoint import apply_checkpoint_model_config

    payload, meta = load_checkpoint(args.checkpoint_dir, args.step)
    apply_checkpoint_model_config(cfg, meta)

    if args.interactive:
        args.split = input("dataset split [train/test]: ").strip() or "test"

    dataset = Building3DDataset(cfg.data, args.split)
    if args.interactive:
        raw = input(f"sample indices 0..{len(dataset)-1} (comma) or 'all': ")
        args.samples = raw.strip() or "all"
    if args.samples == "all":
        indices = list(range(len(dataset)))
    else:
        indices = [int(s) for s in args.samples.split(",")]

    forward = jax.jit(make_forward_fn(cfg, train=False))
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(cfg.data.seed)
    v = cfg.model.max_vertices

    for i in indices:
        sample = dataset.get_sample(i, rng=rng, augment_on_host=False)
        batch = collate_fixed([sample], v)
        preds = forward(payload["params"],
                        jnp.asarray(batch["point_clouds"]), None)
        count = int(np.asarray(preds["actual_vertex_counts"])[0])
        probs = np.asarray(preds["edge_probs"])[0]
        live = (np.asarray(preds["existence_probabilities"])[0]
                > cfg.eval.vertex_existence_thresh
                if cfg.model.slot_mask_mode == "existence" else None)
        dec = decode_predictions(
            np.asarray(preds["vertices"])[0], probs, count, v,
            cfg.eval.edge_confidence_thresh, live_mask=live)

        # Per-sample metrics via the same AP stack as evaluate.py.
        ap = APCalculator(distance_thresh=cfg.eval.distance_thresh)
        gt_v = batch["wf_vertices"][0]
        gt_e = batch["wf_edges"][0].astype(np.int64)
        ap.compute_metrics({
            "predicted_vertices": [dec["vertices"]],
            "predicted_edges": [dec["edges"]],
            "pred_edges_vertices": [dec["edges_vertices"]],
            "wf_vertices": [gt_v],
            "wf_edges": [gt_e],
            "wf_edges_vertices": [
                edge_endpoint_array(np.asarray(gt_v, np.float64), gt_e)],
        })
        m = ap.summarize()

        sample_dir = os.path.join(args.out_dir, str(batch["scan_idx"][0]))
        os.makedirs(sample_dir, exist_ok=True)
        plot_prediction_comparison(
            sample["point_clouds"], gt_v, gt_e,
            dec["vertices"][:count], dec["edges"], metrics=m,
            save_path=os.path.join(sample_dir, "comparison.png"))
        plot_edge_probabilities(
            probs[np.asarray(preds["pair_mask"])[0]],
            threshold=cfg.eval.edge_confidence_thresh,
            save_path=os.path.join(sample_dir, "edge_probs.png"))
        print(f"sample {i} (scan {batch['scan_idx'][0]}): "
              f"C-F1 {m['corners_f1']:.3f} E-F1 {m['edges_f1']:.3f} "
              f"-> {sample_dir}/")

    print(f"✓ visualizations written to {args.out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
