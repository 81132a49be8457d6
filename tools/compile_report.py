#!/usr/bin/env python3
"""Cold-start compile breakdown (r2 VERDICT weak #3: bench warmup was
+157s -> +1272s with nothing measuring where the cold compile goes).

Times trace (jax lowering), XLA/Mosaic compile, and first-execute
separately for each heavy program the CLIs build, against a FRESH
persistent-cache directory (pass --cache to reuse one and measure the
warm path instead).

Usage (real TPU by default):
  python tools/compile_report.py [--programs train,fwd128,lsa,fwd_bucket]
      [--cache DIR] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage(name, fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--programs", default="train,fwd128,lsa")
    p.add_argument("--cache", default=None,
                   help="persistent cache dir (default: fresh tmp dir = "
                        "true cold numbers)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--points", type=int, default=2560)
    p.add_argument("--config", default="configs/recommended.yaml")
    args = p.parse_args(argv)

    from wireframe_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = args.cache or tempfile.mkdtemp(prefix="xla_cold_")
    jax.config.update("jax_compilation_cache_dir", cache)
    print(f"cache dir: {cache}", file=sys.stderr)

    from wireframe_tpu.config import load_config
    from wireframe_tpu.ops.pairs import num_pairs
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_forward_fn, make_train_step
    from wireframe_tpu.utils.synth import make_random_batch

    # Resolve the default config against the repo root so the tool works
    # from any cwd; a missing path fails loudly instead of silently
    # measuring the default model's compile times.
    config_path = args.config
    if not os.path.isabs(config_path) and not os.path.exists(config_path):
        config_path = os.path.join(REPO, args.config)
    if not os.path.exists(config_path):
        p.error(f"config not found: {args.config}")
    cfg = load_config(config_path)
    cfg.data.num_points = args.points
    cfg.train.device_augment = False
    cfg.__post_init__()

    b, n, d = args.batch, args.points, cfg.model.input_dim
    v, e = cfg.model.max_vertices, num_pairs(cfg.model.max_vertices)
    r = np.random.default_rng(0)
    counts = r.integers(4, v + 1, size=b).astype(np.int32)

    state, init_s = _stage("init", lambda: create_train_state(
        cfg, jax.random.PRNGKey(0), (1, 256, d)))
    report = {"device": str(jax.devices()[0]), "cache": cache,
              "init_s": init_s, "programs": {}}

    def measure(name, jitted, *call_args):
        lowered, t_trace = _stage(name, lambda: jitted.lower(*call_args))
        compiled, t_compile = _stage(name, lowered.compile)
        out, t_exec = _stage(name, lambda: jax.block_until_ready(
            compiled(*call_args)))
        # Force a host readback too (tunneled platforms).
        leaf = jax.tree_util.tree_leaves(out)[0]
        _, t_read = _stage(name, lambda: float(np.asarray(leaf).ravel()[0]))
        row = {"trace_s": t_trace, "compile_s": t_compile,
               "first_exec_s": round(t_exec + t_read, 2)}
        report["programs"][name] = row
        print(f"{name:24s} trace {t_trace:7.2f}s  compile "
              f"{t_compile:7.2f}s  first-exec {row['first_exec_s']:7.2f}s",
              file=sys.stderr, flush=True)

    want = set(args.programs.split(","))

    if "train" in want:
        batch = {k: jnp.asarray(a) for k, a in
                 make_random_batch(cfg, b).items()}
        measure(f"train_step_B{b}", jax.jit(make_train_step(cfg)),
                state, batch, jax.random.PRNGKey(1))

    if "fwd128" in want:
        x = jnp.asarray(r.normal(size=(128, n, d)).astype(np.float32))
        measure("forward_B128", jax.jit(make_forward_fn(cfg, train=False)),
                state.params, x, None)

    if "fwd_bucket" in want:
        for bucket in cfg.data.point_buckets:
            x = jnp.asarray(
                r.normal(size=(8, bucket, d)).astype(np.float32))
            measure(f"forward_B8_{bucket}",
                    jax.jit(make_forward_fn(cfg, train=False)),
                    state.params, x, None)

    if "lsa" in want:
        from wireframe_tpu.ops.pallas_lsa import solve_lsa_rows_pallas

        cost = jnp.asarray(r.random((b, v, v)).astype(np.float32))
        cnt = jnp.asarray(counts)
        on_tpu = jax.default_backend() == "tpu"
        measure(f"pallas_lsa_B{b}",
                jax.jit(lambda c, k: solve_lsa_rows_pallas(
                    c, k, interpret=not on_tpu)), cost, cnt)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
