#!/usr/bin/env python3
"""Per-op train-step anatomy from a jax.profiler trace (r2 VERDICT weak
#2/#3 follow-up: the ~21 ms diffuse tail of the 58 ms step was known
only as "decoder attn bwd + edge head + loss + opt").

Captures a device trace of N jitted train steps, parses the xplane
protobuf directly (no tensorboard), aggregates the "XLA Ops" plane by
fusion/op name, and buckets ops into readable groups (encoder fwd/bwd,
decoder attention, edge head, matcher, optimizer, ...) so the step's
milliseconds have names.

Usage (real TPU by default; CPU works via JAX_PLATFORMS=cpu):
  python tools/trace_ops.py [--batch 64] [--config configs/recommended.yaml]
      [--steps 6] [--top 40] [--json OUT]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def aggregate_xla_ops(trace_dir: str):
    """(name -> total_us) over the device 'XLA Ops' line in the trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals = collections.Counter()
    n_events = 0
    seen = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            seen.append((plane.name, [l.name for l in plane.lines]))
            # Device planes: '/device:TPU:0' etc.; host plane excluded.
            if not (plane.name.startswith("/device")
                    or "TPU" in plane.name or "Device" in plane.name):
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e6  # ps -> us
                    n_events += 1
    if n_events == 0:
        print("WARNING: no device 'XLA Ops' line found (CPU traces don't "
              "emit one — run on the TPU).  Planes present:", file=sys.stderr)
        for name, lines in seen:
            print(f"  {name}: {lines}", file=sys.stderr)
    return totals, n_events


GROUPS = (
    # (label, regex over the XLA op/fusion name)
    ("matcher (LSA while)", re.compile(r"while|lsa|lockstep", re.I)),
    ("encoder pallas chain", re.compile(
        r"pallas|chain_fwd|chain_bwd|custom.?vjp", re.I)),
    ("attention softmax/einsum", re.compile(
        r"attention|softmax|attn", re.I)),
    ("convert/transpose/copy", re.compile(
        r"^(convert|transpose|copy|bitcast|reshape)", re.I)),
    ("matmul/fusion (dot)", re.compile(r"dot|conv", re.I)),
    ("reduce/elementwise fusion", re.compile(
        r"^(fusion|reduce|add|multiply|select|loop_)", re.I)),
)


def classify(name: str) -> str:
    for label, pat in GROUPS:
        if pat.search(name):
            return label
    return "other"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--points", type=int, default=2560)
    p.add_argument("--config", default="configs/recommended.yaml")
    p.add_argument("--steps", type=int, default=None,
                   help="steps to capture (default 6) — REQUIRED with "
                        "--trace-dir, where it must state how many steps "
                        "the existing trace holds (per-step numbers are "
                        "totals divided by this)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    p.add_argument("--json", default=None)
    p.add_argument("--trace-dir", default=None,
                   help="parse an existing trace instead of capturing one")
    args = p.parse_args(argv)

    trace_dir = args.trace_dir
    if trace_dir is not None and args.steps is None:
        p.error("--trace-dir needs an explicit --steps (the step count "
                "the trace was captured with); guessing would silently "
                "mis-scale every ms/step number")
    if args.steps is None:
        args.steps = 6
    if trace_dir is None:
        import jax
        import jax.numpy as jnp

        from wireframe_tpu.config import load_config
        from wireframe_tpu.train.state import create_train_state
        from wireframe_tpu.train.step import make_train_step
        from wireframe_tpu.utils.platform import (
            enable_compile_cache,
            honor_env_platform,
        )

        honor_env_platform()
        enable_compile_cache()

        cfg = load_config(args.config, args.overrides)
        cfg.data.num_points = args.points
        cfg.train.device_augment = False
        cfg.__post_init__()

        from wireframe_tpu.utils.synth import make_random_batch

        d = cfg.model.input_dim
        batch = {k: jnp.asarray(a) for k, a in
                 make_random_batch(cfg, args.batch).items()}
        state = create_train_state(cfg, jax.random.PRNGKey(0), (1, 256, d))
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))

        # Warm up (compile) outside the trace window.
        state, m = step(state, batch, jax.random.PRNGKey(1))
        _ = float(m["total_loss"])

        trace_dir = tempfile.mkdtemp(prefix="wf_trace_")
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            s = None
            for i in range(args.steps):
                state, m = step(state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(2), i))
                s = m["total_loss"]
            _ = float(s)  # host readback = real completion barrier
        wall = (time.perf_counter() - t0) / args.steps
        print(f"captured {args.steps} steps, wall {wall * 1e3:.2f} ms/step "
              f"-> {trace_dir}", file=sys.stderr)

    totals, n_events = aggregate_xla_ops(trace_dir)
    per_step = {k: v / max(1, args.steps) for k, v in totals.items()}
    total_us = sum(per_step.values())

    print(f"\n== XLA op time: {total_us / 1e3:.2f} ms/step over "
          f"{n_events} events ==")
    groups = collections.Counter()
    for name, us in per_step.items():
        groups[classify(name)] += us
    for label, us in groups.most_common():
        print(f"  {label:<28} {us / 1e3:8.3f} ms  ({us / total_us * 100:5.1f}%)")

    print(f"\n== top {args.top} ops (ms/step) ==")
    rows = sorted(per_step.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in rows:
        print(f"  {us / 1e3:8.3f}  {name[:110]}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"total_ms": total_us / 1e3,
                       "groups_ms": {k: v / 1e3 for k, v in groups.items()},
                       "ops_ms": {k: v / 1e3 for k, v in rows}}, f, indent=1)
        print(f"\nwrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
