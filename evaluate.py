#!/usr/bin/env python3
"""Evaluation entry point (reference: evaluate.py).

Loads the latest checkpoint, runs batched inference on the test split,
and prints the Building3D metrics (ACO, corner P/R/F1, edge P/R/F1, WED)
with the same names/threshold defaults (distance 1.0, edge confidence 0.5).

Usage:
  python evaluate.py [--checkpoint-dir checkpoints] [--data-root PATH]
                     [--set key=val ...]
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--torch-checkpoint", default=None, metavar="PTH",
                   help="evaluate a reference PyTorch trained_model.pth "
                        "via full weight transplantation instead of an "
                        "orbax checkpoint")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--split", default="test", choices=("train", "test"))
    p.add_argument("--raw-points", action="store_true",
                   help="evaluate on full unsampled clouds via bucketed "
                        "batching instead of 2560-point sampling")
    p.add_argument("--sharded", type=int, default=0, metavar="N",
                   help="evaluate via the pod-scale sharded path "
                        "(eval.distributed.evaluate_model_sharded) with N "
                        "shards; counters merge exactly, so metrics match "
                        "the unsharded run")
    p.add_argument("--device-hausdorff", action="store_true",
                   help="compute pred-vs-GT edge Hausdorff matrices in "
                        "batched device programs instead of host numpy "
                        "(the eval hot spot at corpus scale)")
    p.add_argument("--pipelined", action="store_true",
                   help="run the fused fixed-shape eval pipeline "
                        "(eval/pipeline.py): one compiled program, "
                        "dispatch-ahead readback — the corpus-scale fast "
                        "path; counters match the legacy path")
    p.add_argument("--eval-batch", type=int, default=64,
                   help="device batch for --pipelined (default 64)")
    p.add_argument("--qmax", type=int, default=128,
                   help="--pipelined pad for kept predicted edges per "
                        "sample (overflow falls back to the host decode)")
    p.add_argument("--emax", type=int, default=64,
                   help="--pipelined pad for GT edges per sample "
                        "(overflow falls back to the legacy device "
                        "Hausdorff helper)")
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

    from main import resolve_data_root
    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset
    from wireframe_tpu.eval import evaluate_model
    from wireframe_tpu.train.checkpoint import load_checkpoint

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = resolve_data_root(args.data_root)

    from wireframe_tpu.train.checkpoint import apply_checkpoint_model_config

    if args.torch_checkpoint:
        from wireframe_tpu.train.checkpoint import (
            load_torch_checkpoint_as_params,
        )

        params, max_vertices = load_torch_checkpoint_as_params(
            args.torch_checkpoint)
        payload = {"params": params}
        # The reference model's config: MLP head, prefix slots, raw
        # intensity (quirk 3 — it never rescales), V from the final layer.
        cfg.data.max_vertices = max_vertices
        cfg.model.max_vertices = max_vertices
        cfg.model.vertex_head = "mlp"
        cfg.model.slot_mask_mode = "prefix"
        cfg.data.scale_intensity = False
        cfg.__post_init__()
    else:
        payload, meta = load_checkpoint(args.checkpoint_dir, args.step)
        # Restore the architecture from checkpoint metadata (single source
        # of truth — fixes reference quirk 10).
        apply_checkpoint_model_config(cfg, meta)

    dataset = Building3DDataset(cfg.data, args.split)
    print(f"Evaluating {len(dataset)} samples from '{args.split}'"
          + (" (raw clouds, bucketed)" if args.raw_points else ""))
    if args.sharded:
        from wireframe_tpu.eval.distributed import evaluate_model_sharded

        if args.raw_points:
            raise SystemExit("--sharded does not support --raw-points yet")
        evaluate_model_sharded(
            cfg, payload["params"], dataset, n_shards=args.sharded,
            device_hausdorff=args.device_hausdorff, verbose=True,
            pipelined=args.pipelined,
            pipeline_kwargs={"batch": args.eval_batch,
                             "qmax": args.qmax, "emax": args.emax})
    elif args.pipelined:
        from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

        if args.raw_points:
            raise SystemExit("--pipelined does not support --raw-points")
        stats = {}
        evaluate_corpus_pipelined(cfg, payload["params"], dataset,
                                  batch=args.eval_batch, qmax=args.qmax,
                                  emax=args.emax, verbose=True,
                                  stats=stats)
        if stats.get("qmax_overflows") or stats.get("emax_overflows"):
            print(f"pipeline pad overflows (host-helper fallbacks): "
                  f"qmax={stats['qmax_overflows']} "
                  f"emax={stats['emax_overflows']}")
    else:
        evaluate_model(cfg, payload["params"], dataset,
                       raw_points=args.raw_points,
                       device_hausdorff=args.device_hausdorff)
    return 0


if __name__ == "__main__":
    sys.exit(main())
