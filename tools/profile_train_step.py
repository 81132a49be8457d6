#!/usr/bin/env python3
"""Decompose train-step time into subgraph costs on the real chip.

Times, each as its own jitted program with a data-dependent host-readback
barrier (block_until_ready lies on tunneled platforms):
  - full train step (the BENCH_TRAIN number)
  - forward only (no grad)
  - encoder-only value_and_grad (the piece a fused backward kernel
    would accelerate)
  - LSA matching alone on loss-shaped costs
  - loss+grad WITHOUT matching (identity assignment) — isolates the
    matcher's in-graph cost

Usage: python tools/profile_train_step.py [--batch 16] [--points 2560]
       [--config configs/recommended.yaml] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(chain_fn, iters, warmup=3):
    """chain_fn(s, i) -> scalar jax array data-dependent on s.

    Chaining every dispatch on the previous scalar and reading back ONCE
    amortizes the tunnel round trip (~25 ms on axon), which otherwise
    floors every per-iteration measurement.
    """
    import jax.numpy as jnp

    def run(n):
        s = jnp.zeros((), jnp.float32)
        for i in range(n):
            s = chain_fn(s, i)
        return float(s)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--points", type=int, default=2560)
    p.add_argument("--config", default=None)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )

    honor_env_platform()
    enable_compile_cache()

    from wireframe_tpu.config import load_config
    from wireframe_tpu.models.wireframe import PointCloudToWireframe
    from wireframe_tpu.ops.lsa import solve_lsa_rows_batch
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    cfg = load_config(args.config, args.overrides)
    cfg.data.num_points = args.points
    cfg.train.device_augment = False
    cfg.__post_init__()

    from wireframe_tpu.utils.synth import make_random_batch

    b, n, d = args.batch, args.points, cfg.model.input_dim
    v = cfg.model.max_vertices
    r = np.random.default_rng(0)
    batch = {k: jnp.asarray(a) for k, a in make_random_batch(cfg, b).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), (1, 256, d))
    model = PointCloudToWireframe(cfg.model)

    results = {}

    # 1. full train step (state threads through; loss read once at end)
    step = jax.jit(make_train_step(cfg))

    def full_chain(s, i):
        nonlocal state
        state, m = step(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
        return s + m["total_loss"]

    results["full_step"] = timeit(full_chain, args.iters)

    # 2. forward only (input perturbed by s*0 forces the chain)
    fwd = jax.jit(lambda p, x, c: model.apply(
        {"params": p}, x, c, train=False))

    def fwd_chain(s, i):
        o = fwd(state.params, batch["point_clouds"] + s * 0.0,
                batch["vertex_counts"])
        return s + o["vertices"].sum() + o["edge_probs"].sum()

    results["forward_only"] = timeit(fwd_chain, args.iters)

    # 3. encoder-only value_and_grad (XLA path, what a fused VJP targets)
    from wireframe_tpu.models.encoder import PointNetEncoder

    enc = PointNetEncoder(
        input_dim=d, hidden_dims=tuple(cfg.model.encoder_hidden_dims),
        output_dim=cfg.model.encoder_output_dim,
        dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
        else jnp.float32,
        return_point_features=cfg.model.vertex_head == "query")
    enc_params = enc.init(jax.random.PRNGKey(0),
                          batch["point_clouds"][:1, :256])["params"]

    def enc_loss(params, x):
        g, pooled, feats = enc.apply({"params": params}, x)
        extra = feats.mean() if feats is not None else 0.0
        return (g.mean() + pooled["masked_max"].mean()
                + pooled["masked_mean"].mean() + extra)

    enc_vg = jax.jit(jax.value_and_grad(enc_loss))

    def enc_chain(s, i):
        val, grads = enc_vg(enc_params, batch["point_clouds"] + s * 0.0)
        return s + val

    results["encoder_fwd_bwd"] = timeit(enc_chain, args.iters)

    # 4. LSA matching alone on loss-shaped costs
    cost = jnp.asarray(r.random((b, v, v)).astype(np.float32))

    @jax.jit
    def match_only(c, cnt):
        sol = solve_lsa_rows_batch(jnp.swapaxes(c, 1, 2), cnt)
        return sol.sum().astype(jnp.float32)

    results["lsa_matching"] = timeit(
        lambda s, i: s + match_only(cost + s * 0.0,
                                    batch["vertex_counts"]),
        args.iters)

    print(f"config: vertex_head={cfg.model.vertex_head} "
          f"dtype={cfg.model.compute_dtype} B={b} N={n} V={v}")
    full = results["full_step"]
    for k, t in results.items():
        print(f"{k:>18}: {t * 1e3:8.2f} ms  ({t / full * 100:5.1f}% of step)")
    print(f"{'clouds/sec':>18}: {b / full:8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
