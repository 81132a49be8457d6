"""Fused Pallas TPU kernel: per-point MLP stack + pooling reductions.

This is the FLOPs-dominant path of the whole model (SURVEY.md §3.3): a
5-stage shared MLP (input_dim -> 512 -> 1024 -> 2048 -> 1024 -> 512 with
LayerNorm+ReLU between stages) applied to every point, followed by four
pooling reductions over the point axis (masked mean/max for the encoder's
global feature, unmasked mean/max for the vertex head's fusion).

Why a kernel: under plain XLA every stage round-trips its (B*N, H)
activation through HBM — ~41 KB of traffic per point against ~10.5 MFLOP
of compute, putting the op near the bandwidth roofline.  Here the weights
(~11.5 MB bf16) stay resident in VMEM across the whole grid (constant
index maps), each point tile's activations never leave VMEM, and the
pooling accumulators live in the revisited output block — points are read
once, pools written once.  When point features aren't needed downstream
(the default: the vertex head consumes pooled stats), the (B, N, 512)
tensor is never materialized at all.

Training uses the plain-XLA twin `point_encoder_reference` (autodiff);
the kernel drives inference via ModelConfig.use_pallas_encoder.
Numerical equality is unit-tested in tests/test_pallas_encoder.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _ln(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
        eps: float = 1e-6) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def point_encoder_reference(x: jnp.ndarray,
                            stage_params: Sequence[Tuple],
                            final_w: jnp.ndarray, final_b: jnp.ndarray,
                            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Plain-JAX chain (the autodiff/training path and the test oracle).

    x: (..., D).  stage_params: [(w, b, ln_scale, ln_bias), ...].
    Returns point features (..., output_dim) in float32.
    """
    h = x.astype(compute_dtype)
    for w, b, g, be in stage_params:
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + b
        h = _ln(h, g, be)
        h = jnp.maximum(h, 0.0)
        h = h.astype(compute_dtype)
    out = jnp.dot(h, final_w.astype(compute_dtype),
                  preferred_element_type=jnp.float32) + final_b
    return out


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fused_point_encoder(x: jnp.ndarray,
                        stage_params: Sequence[Tuple],
                        final_w: jnp.ndarray, final_b: jnp.ndarray,
                        *, tile: int = 256,
                        return_point_features: bool = False,
                        interpret: bool = None,
                        compute_dtype=jnp.bfloat16,
                        kv_pool: int = 0):
    """Run the fused kernel.

    Args:
      x: (B, N, D) float32; all-zero rows are padding (excluded from the
        masked pools, INCLUDED in the unmasked pools — reference parity
        with PointNetEncoder.py:85-111 / VertexPredictor.py:86-87).
      stage_params: [(w (I,H), b (H,), ln_scale (H,), ln_bias (H,)), ...]
      final_w: (H, C); final_b: (C,).
      tile: points per grid step; N must be divisible by it.
      kv_pool: p > 1 additionally emits `kv_features` (B, N/p, C) — the
        masked window max-pool over p consecutive rows
        (ops.masked_pool.window_max_pool semantics) straight from VMEM,
        so a decoder consuming only pooled KV never needs the full
        (B, N, C) features written to HBM.
    Returns dict of pooled stats (each (B, C) f32): masked_mean,
      masked_max, mean, max; plus point_features (B, N, C) and/or
      kv_features if requested.
    """
    b, n, d = x.shape
    c = final_w.shape[-1]
    n_stages = len(stage_params)
    assert n % tile == 0, f"N={n} not divisible by tile={tile}"
    if kv_pool:
        assert tile % kv_pool == 0 and (
            (tile // kv_pool) % 8 == 0 or tile // kv_pool == n // kv_pool
        ), (tile, kv_pool)
    grid = (b, n // tile)
    if interpret is None:
        interpret = not _on_tpu()  # CPU tests run the interpreter

    def row2d(p):  # (H,) -> (1, H) for TPU-friendly >=2D VMEM layout
        return p.reshape(1, -1).astype(jnp.float32)

    flat_params: List[jnp.ndarray] = []
    in_specs = [
        pl.BlockSpec((1, tile, d), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    cdt = compute_dtype
    for (w, bb, g, be) in stage_params:
        for p in (w.astype(cdt), row2d(bb), row2d(g), row2d(be)):
            flat_params.append(p)
            in_specs.append(const_spec(p.shape))
    flat_params.append(final_w.astype(cdt))
    in_specs.append(const_spec(final_w.shape))
    flat_params.append(row2d(final_b))
    in_specs.append(const_spec(flat_params[-1].shape))

    # Pools layout (8 sublane rows, c lanes): 0=masked_sum, 1=masked_max,
    # 2=unmasked_sum, 3=unmasked_max, 4=valid count (broadcast), 5-7 pad.
    out_shape = [
        jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 8, c), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if return_point_features:
        out_shape.append(jax.ShapeDtypeStruct((b, n, c), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM))
    if kv_pool:
        out_shape.append(
            jax.ShapeDtypeStruct((b, n // kv_pool, c), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tile // kv_pool, c),
                         lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM))

    def kernel(*refs):
        x_ref = refs[0]
        stage_refs = [refs[1 + 4 * i: 1 + 4 * (i + 1)]
                      for i in range(n_stages)]
        fw_ref = refs[1 + 4 * n_stages]
        fb_ref = refs[2 + 4 * n_stages]
        pools_ref = refs[3 + 4 * n_stages]
        feats_ref = refs[4 + 4 * n_stages] if return_point_features else None
        kv_ref = refs[-1] if kv_pool else None

        t = pl.program_id(1)

        xt = x_ref[0]                                       # (T, D) f32
        mask = jnp.abs(jnp.sum(xt, axis=-1)) > 1e-9         # (T,)
        mask_f = mask.astype(jnp.float32)[:, None]

        h = xt.astype(cdt)
        for w_ref, b_ref, g_ref, be_ref in stage_refs:
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
            h = h + b_ref[0]
            h = _ln(h, g_ref[0], be_ref[0])
            h = jnp.maximum(h, 0.0).astype(cdt)
        feats = jnp.dot(h, fw_ref[:], preferred_element_type=jnp.float32)
        feats = feats + fb_ref[0]                           # (T, C) f32

        if feats_ref is not None:
            feats_ref[0] = feats

        if kv_ref is not None:
            fr = jnp.where(mask[:, None], feats, _NEG_INF).reshape(
                tile // kv_pool, kv_pool, feats.shape[-1])
            pm = jnp.max(fr, axis=1)
            # _NEG_INF is a finite sentinel: empty windows pool to 0 via
            # the same half-sentinel guard the global masked max uses.
            kv_ref[0] = jnp.where(pm > _NEG_INF / 2, pm, 0.0)

        cdim = feats.shape[-1]
        count_row = jnp.full((cdim,), jnp.sum(mask_f), jnp.float32)
        u_masked_sum = jnp.sum(feats * mask_f, axis=0)
        u_masked_max = jnp.max(
            jnp.where(mask[:, None], feats, _NEG_INF), axis=0)
        u_sum = jnp.sum(feats, axis=0)
        u_max = jnp.max(feats, axis=0)

        # No scatter in Mosaic: init/accumulate with whole-row static
        # indexed loads/stores.
        @pl.when(t == 0)
        def _():
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, cdim), 0)
            is_max_row = (row_ids == 1) | (row_ids == 3)
            pools_ref[0] = jnp.where(is_max_row, _NEG_INF, 0.0)

        pools_ref[0, 0] = pools_ref[0, 0] + u_masked_sum
        pools_ref[0, 1] = jnp.maximum(pools_ref[0, 1], u_masked_max)
        pools_ref[0, 2] = pools_ref[0, 2] + u_sum
        pools_ref[0, 3] = jnp.maximum(pools_ref[0, 3], u_max)
        pools_ref[0, 4] = pools_ref[0, 4] + count_row

    stage_flops = sum(2 * w.shape[0] * w.shape[1]
                      for (w, *_rest) in stage_params)
    stage_flops += 2 * final_w.shape[0] * final_w.shape[1]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * stage_flops,
            bytes_accessed=x.size * 4 + b * 8 * c * 4
            + sum(p.size * p.dtype.itemsize for p in flat_params),
            transcendentals=0,
        ),
    )(x, *flat_params)

    pools = outs[0]
    valid = jnp.maximum(pools[:, 4, 0], 1.0)[:, None]
    masked_max = pools[:, 1]
    masked_max = jnp.where(masked_max > _NEG_INF / 2, masked_max, 0.0)
    result = {
        "masked_mean": pools[:, 0] / valid,
        "masked_max": masked_max,
        "mean": pools[:, 2] / n,
        "max": pools[:, 3],
    }
    if return_point_features:
        result["point_features"] = outs[1]
    if kv_pool:
        result["kv_features"] = outs[-1]
    return result
