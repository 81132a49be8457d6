#!/usr/bin/env python3
"""Corpus-scale eval proof (r2 VERDICT weak #5 / BASELINE config 5).

One command that (1) synthesizes an N-building corpus, (2) runs the
sharded pod-eval path (`evaluate_model_sharded`, device-batched
Hausdorff) over it, (3) re-runs the plain unsharded path, (4) asserts
the merged metrics are IDENTICAL, and (5) reports eval throughput
(buildings/sec) for both.

Usage:
  python tools/scale_eval.py --checkpoint-dir /tmp/ck \
      [--n 500] [--shards 8] [--corpus /tmp/corpus_scale] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--corpus", default="/tmp/corpus_scale")
    p.add_argument("--config", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--json", default=None, help="write the report here too")
    p.add_argument("--skip-unsharded", action="store_true",
                   help="only run + time the sharded path")
    p.add_argument("--legacy", action="store_true",
                   help="use the round-3 small-batch eval path instead of "
                        "the fused pipeline (eval/pipeline.py)")
    p.add_argument("--eval-batch", type=int, default=64,
                   help="device batch for the fused pipeline")
    p.add_argument("--reps", type=int, default=2,
                   help="timed passes per path; rep 0 absorbs residual "
                        "first-pass host jits, the LAST rep is the "
                        "headline (both paths warm)")
    args = p.parse_args(argv)

    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    import jax
    import numpy as np

    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset
    from wireframe_tpu.eval.distributed import evaluate_model_sharded
    from wireframe_tpu.eval.evaluator import evaluate_model
    from wireframe_tpu.train.checkpoint import (
        apply_checkpoint_model_config,
        load_checkpoint,
    )

    test_dir = os.path.join(args.corpus, "test", "xyz")
    have = len(os.listdir(test_dir)) if os.path.isdir(test_dir) else 0
    if have != args.n:
        print(f"generating {args.n}-building corpus at {args.corpus} "
              f"(found {have})", file=sys.stderr, flush=True)
        import shutil

        from tools.gen_demo_data import main as gen_main

        shutil.rmtree(args.corpus, ignore_errors=True)
        gen_main(["--out", args.corpus, "--train", "1",
                  "--test", str(args.n)])

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = args.corpus
    payload, meta = load_checkpoint(args.checkpoint_dir)
    apply_checkpoint_model_config(cfg, meta)
    dataset = Building3DDataset(cfg.data, "test")
    print(f"evaluating {len(dataset)} buildings "
          f"({args.shards} shards, device Hausdorff)",
          file=sys.stderr, flush=True)

    pipe_kw = {"batch": args.eval_batch}
    if not args.legacy:
        # One compiled program shared by the sharded AND plain runs (and
        # warmed before either timer starts, so neither pays the cold
        # compile).
        from wireframe_tpu.eval.pipeline import make_eval_step

        pipe_kw["eval_step"] = make_eval_step(cfg, 128, 64,
                                              args.eval_batch)
        warm_clouds = np.zeros(
            (args.eval_batch, cfg.data.num_points, cfg.model.input_dim),
            np.float32)
        warm_gt = np.zeros((args.eval_batch, 64, 2, 3), np.float32)
        jax.block_until_ready(pipe_kw["eval_step"](
            payload["params"], warm_clouds, warm_gt))
    # Warm the dataset's parse cache before EITHER timer: the in-memory
    # cache (Building3DDataset.load_raw) otherwise charges every cold
    # .xyz/.obj parse to whichever path runs first — round-4's first cut
    # blamed 55 s of host parsing on the sharded path.  Parse time is
    # reported on its own line instead.
    t0 = time.perf_counter()
    for i in range(len(dataset)):
        dataset.load_raw(i)
    t_parse = time.perf_counter() - t0

    def run_sharded():
        t0 = time.perf_counter()
        out = evaluate_model_sharded(cfg, payload["params"], dataset,
                                     n_shards=args.shards,
                                     device_hausdorff=True,
                                     pipelined=not args.legacy,
                                     pipeline_kwargs=pipe_kw)
        return out, time.perf_counter() - t0

    q_overflows = None

    def run_plain():
        nonlocal q_overflows
        t0 = time.perf_counter()
        if args.legacy:
            out = evaluate_model(cfg, payload["params"], dataset,
                                 verbose=False, device_hausdorff=True)
        else:
            from wireframe_tpu.eval.pipeline import (
                evaluate_corpus_pipelined,
            )

            stats = {}
            out = evaluate_corpus_pipelined(cfg, payload["params"],
                                            dataset, stats=stats,
                                            **pipe_kw)
            q_overflows = stats["qmax_overflows"]
        return out, time.perf_counter() - t0

    # Timed reps, sharded/plain interleaved.  Rep 0 absorbs the residual
    # first-pass host jits (device-Hausdorff helpers, APCalculator
    # accumulation paths — everything the eval_step warm-up above can't
    # reach); the LAST rep is the headline, with both paths equally warm.
    # Round-4's first cut timed only one pass per path and blamed ~86 s
    # of those one-time costs on whichever ran first.
    sharded_s, plain_s = [], []
    for _ in range(max(1, args.reps)):
        sharded, t = run_sharded()
        sharded_s.append(t)
        if not args.skip_unsharded:
            plain, t = run_plain()
            plain_s.append(t)

    report = {
        "n_buildings": len(dataset),
        "shards": args.shards,
        "pipelined": not args.legacy,
        "device": str(jax.devices()[0]),
        "parse_s": round(t_parse, 1),
        "reps_sharded_s": [round(t, 1) for t in sharded_s],
        "sharded_s": round(sharded_s[-1], 1),
        "sharded_buildings_per_sec": round(len(dataset) / sharded_s[-1], 2),
        "metrics": {k: round(v, 6) for k, v in sharded.items()},
    }
    if q_overflows is not None:
        report["qmax_overflows"] = q_overflows

    if not args.skip_unsharded:
        report["reps_unsharded_s"] = [round(t, 1) for t in plain_s]
        report["unsharded_s"] = round(plain_s[-1], 1)
        report["unsharded_buildings_per_sec"] = round(
            len(dataset) / plain_s[-1], 2)
        # Integer counters must be EXACT; float accumulators may differ
        # by reduction order (host sum over a different shard grouping),
        # so compare those to 1e-9 relative.
        import math

        def same(a, b):
            if float(a).is_integer() and float(b).is_integer():
                return a == b
            return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)

        mismatch = {k: (sharded[k], plain[k]) for k in sharded
                    if not same(sharded[k], plain[k])}
        report["sharded_equals_unsharded"] = not mismatch
        if mismatch:
            report["mismatch"] = {k: list(v) for k, v in mismatch.items()}
            print(f"MISMATCH: {mismatch}", file=sys.stderr)

    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report.get("sharded_equals_unsharded", True) else 1


if __name__ == "__main__":
    sys.exit(main())
