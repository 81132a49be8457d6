#!/usr/bin/env python3
"""Benchmark: point-cloud -> wireframe inference throughput on one chip.

Measures the BASELINE.json north-star metric — clouds/sec/chip at
2k-10k pts/cloud — on the flagship model (64 vertex slots, 8-feature
clouds).  The reference publishes no throughput numbers (its pipeline is
per-sample Python on CPU/GPU); the baseline denominator is the driver's
target of >= 5,000 clouds/sec on a v5e-8, i.e. 625 clouds/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Latency is reported as TRUE percentiles (p50/p90/p99) over individually
timed dispatch->host-readback round trips (each iteration reads back a
scalar data-dependent on the result — on tunneled platforms
block_until_ready does not await remote completion, a readback does).
Throughput is measured separately with the chained-scalar barrier so
latency round trips don't serialize the pipeline.

The HEADLINE number is measured on the architecture users actually
train and serve — configs/recommended.yaml's query-decoder recipe —
not the reference-parity MLP arch (r3 VERDICT weak #1: the r3 headline
cited the parity arch).  The parity arch is still measured and reported
in the same JSON line under "parity_arch".

Env knobs: BENCH_BATCH (default 128), BENCH_POINTS (default 2560),
BENCH_DTYPE (float32|bfloat16, default bfloat16), BENCH_ITERS,
BENCH_LAT_ITERS (default 20), BENCH_TRAIN=1 to benchmark the train step
instead, BENCH_BUCKETS=2048,4096,... to also sweep per-bucket latency
(one extra compile per bucket — minutes each on the tunneled platform,
so opt-in; published numbers live in BENCH_LATENCY.md),
BENCH_CONFIG=<yaml|parity> (default configs/recommended.yaml when it
exists; "parity" benches the reference-parity Config() only),
BENCH_PARITY_SECONDARY=0 to skip the parity-arch secondary pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def model_flops_per_cloud(cfg, n_points: int) -> float:
    """Analytic matmul FLOPs per cloud for the inference forward —
    a LOWER bound (elementwise ops, LayerNorms, pooling and softmax
    excluded; 1 MAC = 2 FLOPs).  Used for the MFU estimate so the "% of
    bf16 peak" claims are one auditable number (r4 VERDICT #3).

    Counted: per-point encoder MLP + fusion MLP (models/encoder.py),
    the query decoder's KV projection, per-layer self/cross attention
    and FFN (models/vertex_query_head.py), and the edge head's PairDense
    + pair MLP (models/edge_head.py).
    """
    m = cfg.model
    dims = [m.input_dim, *m.encoder_hidden_dims, m.encoder_output_dim]
    enc = 2 * n_points * sum(a * b for a, b in zip(dims, dims[1:]))
    c = m.encoder_output_dim
    fusion = 2 * ((2 * c) * (4 * c) + (4 * c) * (2 * c) + (2 * c) * c)
    v = m.max_vertices
    e = v * (v - 1) // 2
    if m.vertex_head == "query":
        d, ffn, nl = m.decoder_dim, m.decoder_ffn_dim, m.decoder_layers
        nk = -(-n_points // max(1, m.decoder_kv_pool))
        dec = 2 * nk * c * d                       # shared KV projection
        per_layer = (
            4 * 2 * v * d * d                      # self-attn qkv + out
            + 2 * v * d * d + 2 * 2 * nk * d * d   # cross q + k/v projs
            + 2 * 2 * v * nk * d                   # scores + AV
            + 2 * 2 * v * d * ffn                  # FFN in + out
        )
        dec += nl * per_layer
        head = 2 * v * (d * 3 + d * 1)             # coord + existence
    else:
        h = 4096
        dec = 2 * (c * h + h * 2048 + 2048 * 1024 + 1024 * v * 4)
        head = 0
    eh = m.edge_hidden_dim
    edge = (2 * v * (3 + 256) * eh                 # embed + PairDense l1
            + 4 * 2 * v * eh * eh                  # slot self-attn
            + 2 * e * (eh * 256 + 256 * 128 + 128))  # pair MLP
    return float(enc + fusion + dec + head + edge)


# Peak dense bf16 matmul throughput of one v5e chip (public spec:
# 197 TFLOP/s bf16).  MFU = analytic model FLOPs / time / peak.
V5E_BF16_PEAK_FLOPS = 197e12


def main() -> int:
    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from wireframe_tpu.config import Config
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_forward_fn, make_train_step

    from wireframe_tpu.config import load_config

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    points = int(os.environ.get("BENCH_POINTS", "2560"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    warmup = 5
    bench_train = os.environ.get("BENCH_TRAIN", "0") == "1"
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"

    # Headline architecture: the shipped recipe (query decoder), unless
    # BENCH_CONFIG overrides (BENCH_CONFIG=parity -> reference-parity
    # Config()).
    cfg_path = os.environ.get("BENCH_CONFIG", "")
    if not cfg_path:
        default_recipe = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", "recommended.yaml")
        cfg_path = default_recipe if os.path.exists(default_recipe) \
            else "parity"

    def build_cfg(path):
        c = Config() if path == "parity" else load_config(path)
        c.data.num_points = points
        c.model.compute_dtype = dtype
        c.model.use_pallas_encoder = use_pallas
        c.train.device_augment = False
        c.__post_init__()
        return c

    cfg = build_cfg(cfg_path)
    arch = "parity-mlp" if cfg_path == "parity" else (
        f"{cfg.model.vertex_head}-head recipe")

    # Persistent compile cache shared with the other CLIs is enabled at
    # the top of main() (utils.platform.enable_compile_cache); honor the
    # legacy JAX_CACHE_DIR override if a caller still sets it.
    if os.environ.get("JAX_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_CACHE_DIR"])
        except Exception:
            pass

    dev = jax.devices()[0]

    def init_state(c, tag):
        _log(f"init params (tiny shape) [{tag}]")
        # Params are independent of batch/point count: init at a tiny
        # shape so the big compile budget goes to the benchmarked
        # program itself.
        init_points = 256 if points % 256 == 0 else points
        return create_train_state(c, jax.random.PRNGKey(0),
                                  (1, init_points, c.model.input_dim))

    state = init_state(cfg, arch)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(batch, points, cfg.model.input_dim))
                    .astype(np.float32))

    if bench_train:
        from wireframe_tpu.ops.pairs import num_pairs
        v, e = cfg.model.max_vertices, num_pairs(cfg.model.max_vertices)
        counts = r.integers(4, v + 1, size=batch).astype(np.int32)
        tb = {
            "point_clouds": x,
            "target_vertices": jnp.asarray(
                (r.normal(size=(batch, v, 3))
                 * (np.arange(v)[None, :, None] < counts[:, None, None]))
                .astype(np.float32)),
            "vertex_existence": jnp.asarray(
                (np.arange(v)[None, :] < counts[:, None]).astype(np.float32)),
            "vertex_counts": jnp.asarray(counts),
            "edge_labels": jnp.asarray(
                (r.random((batch, e)) < 0.1).astype(np.float32)),
        }
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)
        # The state threads through every step, so one final host readback
        # of the loss is a true completion barrier for the whole chain.
        for _ in range(warmup):
            rng, k = jax.random.split(rng)
            state, m = step(state, tb, k)
        float(m["total_loss"])
        _log("train warmup done; timing")
        t0 = time.perf_counter()
        for _ in range(iters):
            rng, k = jax.random.split(rng)
            state, m = step(state, tb, k)
        float(m["total_loss"])
        dt = time.perf_counter() - t0
        metric, unit = "train_clouds_per_sec_per_chip", "clouds/sec/chip"
    else:
        def measure_forward(c, st, tag, profile=None):
            """Pipelined forward throughput for one architecture.

            Completion barrier: accumulate a scalar on device across all
            iterations and read it back ONCE.  On tunneled platforms
            (axon) block_until_ready does not wait for remote completion
            — a host readback of a value data-dependent on every
            dispatch does.  Distinct pre-staged inputs per iteration:
            identical repeated dispatches can be content-deduplicated by
            remote-execution platforms, faking sub-physical latencies.
            """
            f = jax.jit(make_forward_fn(c, train=False))
            inputs = [
                jax.device_put(jnp.asarray(
                    r.normal(size=(batch, points, c.model.input_dim))
                    .astype(np.float32)))
                for _ in range(min(iters, 8))
            ]

            def chained(n_iters):
                s = jnp.zeros((), jnp.float32)
                for i in range(n_iters):
                    o = f(st.params, inputs[i % len(inputs)], None)
                    s = s + o["vertices"].mean() + o["edge_probs"].mean()
                return float(s)  # forces full chain completion

            _log(f"compile+warmup start [{tag}]")
            chained(warmup)
            _log(f"warmup done; timing [{tag}]")
            from wireframe_tpu.utils.profiling import trace

            with trace(profile):
                t0 = time.perf_counter()
                chained(iters)
                elapsed = time.perf_counter() - t0
            _log(f"timed {iters} iters in {elapsed:.3f}s [{tag}]")
            return f, inputs, elapsed

        fwd, xs, dt = measure_forward(cfg, state, arch,
                                      os.environ.get("BENCH_PROFILE"))
        metric, unit = "clouds_per_sec_per_chip", "clouds/sec/chip"

    clouds_per_sec = batch * iters / dt
    # North star: 5,000 clouds/sec on v5e-8 => 625 clouds/sec/chip.
    baseline_per_chip = 625.0
    result = {
        "metric": metric,
        "value": round(clouds_per_sec, 2),
        "unit": unit,
        "vs_baseline": round(clouds_per_sec / baseline_per_chip, 3),
        "arch": arch,
        "config": cfg_path,
        "batch": batch,
        "points": points,
        "dtype": dtype,
        "device": str(dev),
        # Mean batch wall-time over the chained throughput loop — NOT a
        # percentile (ADVICE r1: the old name "p50_latency_ms" lied).
        "mean_batch_ms": round(dt / iters * 1000, 3),
        # Model-FLOP utilization: analytic matmul FLOPs (lower bound) /
        # wall time / one-chip bf16 peak (197 TFLOP/s, v5e spec).
        "mfu": round(model_flops_per_cloud(cfg, points) * batch * iters
                     / dt / V5E_BF16_PEAK_FLOPS, 4),
    }

    if not bench_train:
        def measure_latency(xs_list, bs, n_iters):
            """Individually timed dispatch -> host-readback round trips."""
            from wireframe_tpu.utils.profiling import StepTimer

            for i in range(2):  # untimed warmup absorbs compile + caches
                o = fwd(state.params, xs_list[i % len(xs_list)], None)
                float(o["vertices"].mean())
            timer = StepTimer(warmup=0)
            for i in range(n_iters):
                timer.tick()
                o = fwd(state.params, xs_list[i % len(xs_list)], None)
                # Data-dependent scalar readback = completion barrier.
                float(o["vertices"].mean() + o["edge_probs"].mean())
            timer.tick()
            return timer.summary(items_per_step=bs)

        lat_iters = int(os.environ.get("BENCH_LAT_ITERS", "20"))
        _log(f"latency phase: {lat_iters} timed round trips")
        s = measure_latency(xs, batch, lat_iters)
        result["latency_ms"] = {
            "p50": round(s["p50_s"] * 1e3, 3),
            "p90": round(s["p90_s"] * 1e3, 3),
            "p99": round(s["p99_s"] * 1e3, 3),
            "per_cloud_p50": round(s["p50_s"] * 1e3 / batch, 4),
            "iters": s["steps"],
        }

        if (cfg_path != "parity"
                and os.environ.get("BENCH_PARITY_SECONDARY", "1") == "1"):
            # Secondary pass: the reference-parity MLP arch, so the
            # round's record keeps both numbers side by side.
            pcfg = build_cfg("parity")
            pstate = init_state(pcfg, "parity-mlp")
            _, _, pdt = measure_forward(pcfg, pstate, "parity-mlp")
            result["parity_arch"] = {
                "value": round(batch * iters / pdt, 2),
                "mean_batch_ms": round(pdt / iters * 1000, 3),
                "max_vertices": pcfg.model.max_vertices,
            }

        buckets_env = os.environ.get("BENCH_BUCKETS", "")
        if buckets_env:
            result["buckets"] = {}
            for bucket in (int(t) for t in buckets_env.split(",")):
                # Keep the point budget roughly constant across buckets.
                bb = max(8, min(batch, (batch * points) // bucket))
                xb = [jax.device_put(jnp.asarray(
                    r.normal(size=(bb, bucket, cfg.model.input_dim))
                    .astype(np.float32))) for _ in range(4)]
                _log(f"bucket {bucket}: compile + {lat_iters} round trips "
                     f"(batch {bb})")
                sb = measure_latency(xb, bb, lat_iters)
                result["buckets"][str(bucket)] = {
                    "batch": bb,
                    "p50_ms": round(sb["p50_s"] * 1e3, 3),
                    "p99_ms": round(sb["p99_s"] * 1e3, 3),
                    "per_cloud_p50_ms": round(sb["p50_s"] * 1e3 / bb, 4),
                    # Serialized round trips (each awaits readback), NOT
                    # the pipelined throughput metric above.
                    "round_trip_clouds_per_sec": round(
                        sb["items_per_sec"], 1),
                }

        sweep_env = os.environ.get("BENCH_SWEEP", "")
        if sweep_env:
            # PIPELINED throughput across the 2k-10k point range (r4
            # VERDICT #3: the round-trip bucket grid above is ~99%
            # tunnel readback, so only the chained-barrier protocol is
            # a throughput measurement).  Fixed batch (BENCH_SWEEP_BATCH,
            # default BENCH_BATCH) per point count — the north star is
            # clouds/sec at 2k-10k pts/cloud, not constant point budget.
            sweep_batch = int(os.environ.get("BENCH_SWEEP_BATCH",
                                             str(batch)))
            result["sweep"] = {}
            for n_pts in (int(t) for t in sweep_env.split(",")):
                scfg = build_cfg(cfg_path)
                scfg.data.num_points = n_pts
                scfg.__post_init__()
                sf = jax.jit(make_forward_fn(scfg, train=False))
                try:
                    sx = [jax.device_put(jnp.asarray(
                        r.normal(size=(sweep_batch, n_pts,
                                       scfg.model.input_dim))
                        .astype(np.float32))) for _ in range(4)]

                    def schained(n_iters):
                        s = jnp.zeros((), jnp.float32)
                        for i in range(n_iters):
                            o = sf(state.params, sx[i % len(sx)], None)
                            s = (s + o["vertices"].mean()
                                 + o["edge_probs"].mean())
                        return float(s)

                    _log(f"sweep {n_pts} pts x B={sweep_batch}: "
                         f"compile+warmup")
                    schained(warmup)
                    t0 = time.perf_counter()
                    schained(iters)
                    sdt = time.perf_counter() - t0
                except Exception as exc:  # pragma: no cover - sweep guard
                    _log(f"sweep {n_pts} FAILED: {exc}")
                    result["sweep"][str(n_pts)] = {"error": str(exc)[:200]}
                    continue
                scps = sweep_batch * iters / sdt
                result["sweep"][str(n_pts)] = {
                    "batch": sweep_batch,
                    "clouds_per_sec": round(scps, 1),
                    "mean_batch_ms": round(sdt / iters * 1000, 2),
                    "mfu": round(
                        model_flops_per_cloud(scfg, n_pts) * scps
                        / V5E_BF16_PEAK_FLOPS, 4),
                    "vs_baseline": round(scps / baseline_per_chip, 3),
                }
                _log(f"sweep {n_pts}: {scps:.1f} clouds/s "
                     f"mfu {result['sweep'][str(n_pts)]['mfu']:.3f}")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
