#!/usr/bin/env python3
"""Serving-latency sweep: true p50/p90/p99 per request batch across the
point-bucket grid (r2 VERDICT weak #4: latency existed only at B=128 /
2560 points, and bench.py's docstring cited a BENCH_LATENCY.md that did
not exist).

Each (batch, bucket) cell times individually dispatched forward passes
with a data-dependent host readback per iteration (on tunneled platforms
`block_until_ready` does not await remote completion — a readback does),
i.e. the latency a serving client observes, tunnel round trip included.
Throughput-style pipelining is bench.py's job, not this one's.

Writes/updates BENCH_LATENCY.md at the repo root and prints one JSON
line with the full grid.

Usage (run on the real TPU chip — the default platform):
  python tools/bench_latency.py [--batches 1,8,32,128]
      [--buckets 2048,4096,8192,16384] [--iters 30] [--dtype bfloat16]
      [--config configs/recommended.yaml] [--set k.e.y=v ...]
      [--out BENCH_LATENCY.md]

With --config/--set the grid measures that architecture (e.g. the
recommended query-decoder recipe) instead of the default parity MLP
head; --dtype/--pallas still apply on top.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[lat +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="1,8,32,128")
    p.add_argument("--buckets", default="2048,4096,8192,16384")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--pallas", default="1")
    p.add_argument("--config", default=None,
                   help="optional config yaml (e.g. configs/recommended.yaml)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="k.e.y=v", help="config overrides")
    p.add_argument("--out", default=os.path.join(REPO, "BENCH_LATENCY.md"))
    args = p.parse_args(argv)

    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wireframe_tpu.config import Config
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_forward_fn
    from wireframe_tpu.utils.profiling import StepTimer

    batches = [int(x) for x in args.batches.split(",")]
    buckets = [int(x) for x in args.buckets.split(",")]

    if args.config or args.overrides:
        from wireframe_tpu.config import load_config

        cfg = load_config(args.config, args.overrides)
    else:
        cfg = Config()
    cfg.model.compute_dtype = args.dtype
    cfg.model.use_pallas_encoder = args.pallas == "1"
    cfg.__post_init__()

    dev = jax.devices()[0]
    _log(f"device {dev}; init params")
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               (1, 256, cfg.model.input_dim))
    fwd = jax.jit(make_forward_fn(cfg, train=False))
    r = np.random.default_rng(0)

    grid = {}
    for bucket in buckets:
        for b in batches:
            # Distinct pre-staged inputs: identical repeated dispatches can
            # be content-deduplicated by remote-execution platforms.
            xs = [jax.device_put(jnp.asarray(
                r.normal(size=(b, bucket, cfg.model.input_dim))
                .astype(np.float32))) for _ in range(4)]
            _log(f"bucket {bucket} batch {b}: compile + {args.iters} trips")
            for i in range(2):  # untimed warmup absorbs compile + caches
                o = fwd(state.params, xs[i % len(xs)], None)
                float(np.asarray(o["vertices"]).mean())
            timer = StepTimer(warmup=0)
            for i in range(args.iters):
                timer.tick()
                o = fwd(state.params, xs[i % len(xs)], None)
                float(np.asarray(o["vertices"]).mean()
                      + np.asarray(o["edge_probs"]).mean())
            timer.tick()
            s = timer.summary(items_per_step=b)
            grid[f"{bucket}x{b}"] = {
                "bucket": bucket, "batch": b,
                "p50_ms": round(s["p50_s"] * 1e3, 3),
                "p90_ms": round(s["p90_s"] * 1e3, 3),
                "p99_ms": round(s["p99_s"] * 1e3, 3),
                "per_cloud_p50_ms": round(s["p50_s"] * 1e3 / b, 4),
                "round_trip_clouds_per_sec": round(s["items_per_sec"], 1),
            }

    md = [
        "# BENCH_LATENCY — serving latency grid",
        "",
        f"Measured on `{dev}` ({args.dtype}"
        f"{', fused Pallas encoder' if cfg.model.use_pallas_encoder else ''}"
        f"), `vertex_head={cfg.model.vertex_head}` "
        f"(decoder_kv_pool={cfg.model.decoder_kv_pool}), "
        f"{cfg.data.max_vertices} vertex slots.  Each cell: "
        f"{args.iters} individually timed dispatch->host-readback round "
        "trips of `make_forward_fn` at fixed (batch, bucket) shape — the "
        "latency a serving client observes, tunnel round trip included "
        "(pipelined throughput is `bench.py`'s metric; see BENCH_r*.json).",
        "",
        "| points bucket | batch | p50 ms | p90 ms | p99 ms | "
        "per-cloud p50 ms | round-trip clouds/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for bucket in buckets:
        for b in batches:
            g = grid[f"{bucket}x{b}"]
            md.append(
                f"| {bucket} | {b} | {g['p50_ms']} | {g['p90_ms']} | "
                f"{g['p99_ms']} | {g['per_cloud_p50_ms']} | "
                f"{g['round_trip_clouds_per_sec']} |")
    md += [
        "",
        "Regenerate: `python tools/bench_latency.py` (persistent compile "
        "cache makes reruns fast).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(md))
    _log(f"wrote {args.out}")
    print(json.dumps({"metric": "serving_latency_grid", "device": str(dev),
                      "dtype": args.dtype, "iters": args.iters,
                      "grid": grid}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
