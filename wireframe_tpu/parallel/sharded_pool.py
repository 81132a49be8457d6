"""Explicit point-axis-sharded encoding via shard_map + ICI collectives.

This is the workload's honest "sequence parallelism" (SURVEY.md §5): the
per-point MLP is pointwise, so the points-per-cloud axis shards freely
across the mesh's `mp` axis; the four pooling reductions are associative,
so each shard reduces locally and combines over ICI with `psum` (sums,
counts) and `pmax` (maxes).  The default pjit path gets the same result
from GSPMD sharding propagation; this module is the explicit variant —
useful when you want guaranteed collective placement (one psum+pmax per
pooling, after the local reduction) instead of trusting the partitioner,
e.g. for the 10k-point configs where a bad GSPMD choice would
all-gather the (B, N, 512) features.

Each mp shard computes its slice of the point MLP with the SAME kernel
params (replicated), so this composes with the Pallas fused kernel: the
kernel runs per-shard on the local point slice.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wireframe_tpu.ops.pallas_encoder import point_encoder_reference

_NEG_INF = -jnp.inf


def sharded_point_pools(mesh: Mesh, x: jnp.ndarray, stage_params,
                        final_w, final_b,
                        compute_dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Compute the encoder's four pooled stats with the point axis sharded
    over the mesh's "mp" axis.

    x: (B, N, D) — N must divide by mesh.shape["mp"].
    Returns dict of (B, C) f32 pools: masked_mean, masked_max, mean, max.
    """
    n = x.shape[1]
    mp = mesh.shape["mp"]
    assert n % mp == 0, f"N={n} not divisible by mp={mp}"

    def local_fn(x_shard, *params_flat):
        # Rebuild the params pytree (closed-over trees with shard_map is
        # fine, but explicit args keep the replication spec visible).
        sp = [tuple(params_flat[4 * i: 4 * (i + 1)])
              for i in range(len(stage_params))]
        fw, fb = params_flat[-2], params_flat[-1]

        feats = point_encoder_reference(
            x_shard, sp, fw, fb, compute_dtype=compute_dtype)  # (B, n/mp, C)
        mask = jnp.abs(jnp.sum(x_shard, axis=-1)) > 1e-9
        mask_f = mask[..., None].astype(jnp.float32)

        local_masked_sum = jnp.sum(feats * mask_f, axis=1)
        local_masked_max = jnp.max(
            jnp.where(mask[..., None], feats, _NEG_INF), axis=1)
        local_sum = jnp.sum(feats, axis=1)
        local_max = jnp.max(feats, axis=1)
        local_count = jnp.sum(mask_f, axis=1)

        # Combine shards over ICI: one psum / pmax per reduction.
        masked_sum = jax.lax.psum(local_masked_sum, "mp")
        masked_max = jax.lax.pmax(local_masked_max, "mp")
        total_sum = jax.lax.psum(local_sum, "mp")
        total_max = jax.lax.pmax(local_max, "mp")
        count = jax.lax.psum(local_count, "mp")

        valid = jnp.maximum(count, 1.0)
        masked_max = jnp.where(jnp.isfinite(masked_max), masked_max, 0.0)
        return {
            "masked_mean": masked_sum / valid,
            "masked_max": masked_max,
            "mean": total_sum / n,
            "max": total_max,
        }

    params_flat = []
    for (w, b, g, be) in stage_params:
        params_flat += [w, b, g, be]
    params_flat += [final_w, final_b]

    in_specs = (P(None, "mp", None),) + (P(),) * len(params_flat)
    out_specs = {k: P() for k in ("masked_mean", "masked_max", "mean", "max")}

    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(x, *params_flat)
