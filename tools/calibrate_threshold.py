#!/usr/bin/env python3
"""Calibrate eval.edge_confidence_thresh on the TRAIN split.

The reference hard-codes 0.5 (evaluate.py:81).  This sweeps the
threshold over the train split (never the test split — that would be
test-set fitting), reports the full metric table, and prints the
test-split metrics at the calibrated value.

Usage:
  python tools/calibrate_threshold.py --checkpoint-dir ck \
      [--data-root PATH] [--thresholds 0.2,0.3,...] [--existence 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--data-root", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--thresholds",
                   default="0.2,0.3,0.4,0.5,0.6,0.7")
    p.add_argument("--metric", default="edges_f1",
                   help="selection metric (default edges_f1)")
    p.add_argument("--set", action="append", default=[], dest="overrides")
    args = p.parse_args(argv)

    import jax

    from main import resolve_data_root
    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset
    from wireframe_tpu.eval import evaluate_model
    from wireframe_tpu.train.checkpoint import (
        apply_checkpoint_model_config,
        load_checkpoint,
    )
    from wireframe_tpu.train.step import make_forward_fn

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = resolve_data_root(args.data_root)
    payload, meta = load_checkpoint(args.checkpoint_dir)
    apply_checkpoint_model_config(cfg, meta)

    train_ds = Building3DDataset(cfg.data, "train")
    test_ds = Building3DDataset(cfg.data, "test")
    forward = jax.jit(make_forward_fn(cfg, train=False))
    thresholds = [float(t) for t in args.thresholds.split(",")]

    print(f"Sweeping edge threshold on {len(train_ds)} train samples")
    header = f"{'thresh':>7} {'C-F1':>7} {'ACO':>7} {'E-P':>7} {'E-R':>7} " \
             f"{'E-F1':>7} {'WED':>7}"
    print(header)
    best_t, best_val = None, -1.0
    for t in thresholds:
        cfg.eval.edge_confidence_thresh = t
        m = evaluate_model(cfg, payload["params"], train_ds,
                           forward_fn=forward, verbose=False)
        print(f"{t:7.2f} {m['corners_f1']:7.3f} "
              f"{m['average_corner_offset']:7.3f} {m['edges_precision']:7.3f} "
              f"{m['edges_recall']:7.3f} {m['edges_f1']:7.3f} "
              f"{m['average_wed']:7.3f}")
        if m[args.metric] > best_val:
            best_t, best_val = t, m[args.metric]

    print(f"\nBest train-split {args.metric}: {best_val:.3f} "
          f"at threshold {best_t}")
    print(f"\nTest split at calibrated threshold {best_t}:")
    cfg.eval.edge_confidence_thresh = best_t
    m = evaluate_model(cfg, payload["params"], test_ds,
                       forward_fn=forward, verbose=True)
    print(f"\n(reference hard-coded 0.5 — pass "
          f"`--set eval.edge_confidence_thresh={best_t}` to evaluate.py "
          "to reproduce)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
