"""Differentiable fused Pallas point-MLP chain (forward + custom VJP).

Training companion to `ops.pallas_encoder.fused_point_encoder`
(VERDICT r1 #4 / ROADMAP #5): the inference kernel fuses the 5-stage
per-point MLP *and* the pooling reductions but has no autodiff rule, so
round-1 training fell back to the plain-XLA chain — the FLOPs-dominant
path (SURVEY.md §3.3, reference models/PointNetEncoder.py:90-94) ran
fused only at inference.

This module makes the chain itself (x -> per-point features) a
`jax.custom_vjp` op backed by two Pallas kernels:

- **forward**: per point-tile, run the whole Linear+LayerNorm+ReLU stack
  in VMEM (weights resident across the grid via constant index maps) and
  write only the final (B, N, C) features.  No intermediate activation
  ever touches HBM — under plain XLA every stage output (~20 KB/point
  f32) is both written out AND saved as an autodiff residual.
- **backward**: rematerialization.  The only residuals saved are the
  *inputs* (x and the parameters).  Per tile the kernel recomputes the
  stage activations (keeping the LayerNorm normalized values and rstd in
  VMEM), then backpropagates ReLU -> LayerNorm -> matmul per stage,
  accumulating all parameter gradients in f32 VMEM accumulator blocks
  that are revisited across the whole grid and written back once.

Pooling is deliberately NOT part of this op during training: the masked/
unmasked mean/max reductions stay in XLA (ops.masked_pool), so their
gradients — including max tie-splitting semantics — are bit-identical to
the plain-XLA training path the gradient-equality tests compare against.

VMEM budget per grid step at tile=512 (v5e has 128 MiB/core): bf16
weights ~11.5 MB + f32 gradient accumulators ~22 MB + f32 normalized
activations ~10.5 MB + transients — comfortably under budget; tile=256
halves the activation term if ever needed.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wireframe_tpu.ops.pallas_encoder import _ln, _on_tpu


def _row2d(p: jnp.ndarray) -> jnp.ndarray:
    """(H,) -> (1, H) f32 for TPU-friendly >=2D VMEM layout."""
    return p.reshape(1, -1).astype(jnp.float32)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda bi, ti, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _pack_params(stage_params, final_w, final_b, cdt):
    """Flatten params the way both kernels expect: per stage
    (w cdt, b row f32, ln_scale row f32, ln_bias row f32), then final_w
    cdt and final_b row f32.  Returns (flat_list, in_specs)."""
    flat: List[jnp.ndarray] = []
    specs = []
    for (w, b, g, be) in stage_params:
        for p in (w.astype(cdt), _row2d(b), _row2d(g), _row2d(be)):
            flat.append(p)
            specs.append(_const_spec(p.shape))
    flat.append(final_w.astype(cdt))
    specs.append(_const_spec(final_w.shape))
    flat.append(_row2d(final_b))
    specs.append(_const_spec(flat[-1].shape))
    return flat, specs


def _recompute_stages(x_tile, stage_refs, cdt, eps=1e-6):
    """Forward recompute for one tile, keeping what backward needs.

    Returns (hs, xhats, rstds): hs[k] is the cdt input to stage k's
    matmul (hs[-1] feeds the final projection), xhats[k]/rstds[k] are the
    LayerNorm normalized values / reciprocal stddevs (f32).
    """
    h = x_tile.astype(cdt)
    hs, xhats, rstds = [h], [], []
    for (w_ref, b_ref, g_ref, be_ref) in stage_refs:
        z = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        z = z + b_ref[0]
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (z - mu) * rstd
        ln = xhat * g_ref[0] + be_ref[0]
        h = jnp.maximum(ln, 0.0).astype(cdt)
        hs.append(h)
        xhats.append(xhat)
        rstds.append(rstd)
    return hs, xhats, rstds


def _kv_pool_tile_fwd(x_tile, out, p):
    """In-kernel masked window max/sum pools of one tile's features.

    x_tile: (T, D) raw input rows (for the validity mask), out: (T, C)
    f32 features.  Returns (pooled (T/p, C) f32, idx (T/p, C) i32,
    sums (T/p, C) f32): pooled/idx follow
    `ops.masked_pool.window_max_pool` semantics (invalid rows contribute
    -inf, fully-invalid windows pool to 0, ties to the lowest offset);
    sums are the masked window sums, whose total over windows is the
    global masked sum (→ masked_mean without another (B, N, C) pass).
    """
    t, c = out.shape
    valid = jnp.abs(jnp.sum(x_tile, axis=-1)) > 1e-9        # (T,)
    filled = jnp.where(valid[:, None], out, -jnp.inf)
    fr = filled.reshape(t // p, p, c)
    pm = jnp.max(fr, axis=1)
    idx = jnp.argmax(fr, axis=1).astype(jnp.int32)
    pooled = jnp.where(jnp.isfinite(pm), pm, 0.0)
    zr = jnp.where(valid[:, None], out, 0.0).reshape(t // p, p, c)
    sums = jnp.sum(zr, axis=1)
    return pooled, idx, sums


def _kv_pool_tile_bwd(x_tile, dpool, idx, dsums, p):
    """Scatter one tile's pooled-KV + window-sum cotangents onto rows.

    Inverse of `_kv_pool_tile_fwd`: rows of fully-invalid windows get 0
    from the max path (their pooled output was the constant 0),
    otherwise the window's max cotangent lands on its argmax row; the
    sum cotangent broadcasts to every VALID row of its window.  Returns
    (T, C) f32.
    """
    tp, c = dpool.shape
    valid = jnp.abs(jnp.sum(x_tile, axis=-1)) > 1e-9        # (T,)
    win_valid = jnp.any(valid.reshape(tp, p), axis=1)       # (T/p,)
    dp = jnp.where(win_valid[:, None], dpool, 0.0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (tp, p, c), 1)
    scat = jnp.where(k_iota == idx[:, None, :], dp[:, None, :], 0.0)
    scat = scat + jnp.where(valid.reshape(tp, p)[..., None],
                            dsums[:, None, :], 0.0)
    return scat.reshape(tp * p, c)


def _kv_out_extras(b, n, c, tile, kv_pool):
    """(out_shape, out_specs) for the pooled/idx/sums forward outputs."""
    np_ = n // kv_pool
    tp = tile // kv_pool
    assert tp % 8 == 0 or tp == np_, (
        f"pooled tile {tp} violates Mosaic's sublane rule "
        f"(tile={tile}, kv_pool={kv_pool})")
    shapes = [jax.ShapeDtypeStruct((b, np_, c), jnp.float32),
              jax.ShapeDtypeStruct((b, np_, c), jnp.int32),
              jax.ShapeDtypeStruct((b, np_, c), jnp.float32)]
    specs = [pl.BlockSpec((1, tp, c), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)] * 3
    return shapes, specs


def _chain_forward_pallas(x, stage_params, final_w, final_b,
                          *, tile, cdt, interpret, kv_pool=0,
                          emit_features=True):
    """Fused forward: (B, N, D) -> per-point features (B, N, C) f32.

    With kv_pool=p > 1 the kernel also emits the masked window max-pool
    of the features over groups of p consecutive rows — the decoder's KV
    tokens — plus the window argmax for the backward scatter and the
    masked window sums (whose per-cloud total is the global masked sum),
    straight from VMEM (the XLA formulations cost several (B, N, C) HBM
    relayout passes at the B=64 recipe).  Returns feats or
    (feats, pooled (B, N/p, C), idx (B, N/p, C) i32, sums (B, N/p, C)).

    emit_features=False (kv_pool only) drops the (B, N, C) feature
    output entirely — the features live only in VMEM long enough to be
    pooled.  At the B=64 recipe that (B, 2560, 512) f32 tensor is a
    335 MB HBM write the query-decoder path never reads (ROADMAP #27's
    trace oddity); returns (pooled, idx, sums).
    """
    b, n, d = x.shape
    c = final_w.shape[-1]
    n_stages = len(stage_params)
    assert n % tile == 0, f"N={n} not divisible by tile={tile}"
    if kv_pool:
        assert tile % kv_pool == 0, (tile, kv_pool)
    assert emit_features or kv_pool, "feature-less chain needs kv_pool"
    grid = (b, n // tile)

    flat_params, param_specs = _pack_params(stage_params, final_w,
                                            final_b, cdt)
    in_specs = [
        pl.BlockSpec((1, tile, d), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        *param_specs,
    ]
    n_out_feat = 1 if emit_features else 0

    def kernel(*refs):
        x_ref = refs[0]
        stage_refs = [refs[1 + 4 * i: 1 + 4 * (i + 1)]
                      for i in range(n_stages)]
        fw_ref = refs[1 + 4 * n_stages]
        fb_ref = refs[2 + 4 * n_stages]

        h = x_ref[0].astype(cdt)
        for (w_ref, b_ref, g_ref, be_ref) in stage_refs:
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
            h = _ln(h + b_ref[0], g_ref[0], be_ref[0])
            h = jnp.maximum(h, 0.0).astype(cdt)
        out = jnp.dot(h, fw_ref[:],
                      preferred_element_type=jnp.float32) + fb_ref[0]
        if emit_features:
            refs[3 + 4 * n_stages][0] = out
        if kv_pool:
            pool_ref, idx_ref, sum_ref = refs[3 + n_out_feat
                                              + 4 * n_stages:]
            pooled, idx, sums = _kv_pool_tile_fwd(x_ref[0], out, kv_pool)
            pool_ref[0] = pooled
            idx_ref[0] = idx
            sum_ref[0] = sums

    stage_flops = sum(2 * w.shape[0] * w.shape[1]
                      for (w, *_r) in stage_params)
    stage_flops += 2 * final_w.shape[0] * final_w.shape[1]

    out_shape = []
    out_specs = []
    if emit_features:
        out_shape.append(jax.ShapeDtypeStruct((b, n, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, tile, c),
                                      lambda bi, ti: (bi, ti, 0),
                                      memory_space=pltpu.VMEM))
    kv_bytes = 0
    if kv_pool:
        kv_shapes, kv_specs = _kv_out_extras(b, n, c, tile, kv_pool)
        out_shape += kv_shapes
        out_specs += kv_specs
        kv_bytes = sum(s.size * jnp.dtype(s.dtype).itemsize
                       for s in kv_shapes)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if kv_pool else out_specs[0],
        out_shape=out_shape if kv_pool else out_shape[0],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * stage_flops,
            bytes_accessed=x.size * 4 + b * n * c * 4 * n_out_feat
            + kv_bytes
            + sum(p.size * p.dtype.itemsize for p in flat_params),
            transcendentals=0,
        ),
    )(x, *flat_params)
    return outs


def _stage_widths(stage_params):
    return [w.shape[1] for (w, *_r) in stage_params]


def _chain_forward_stash_pallas(x, stage_params, final_w, final_b,
                                *, tile, cdt, interpret, kv_pool=0,
                                emit_features=True):
    """Fused forward that ALSO writes each stage's pre-LayerNorm
    activations z_k (in `cdt`) to HBM, so the stash backward can skip
    the recompute matmuls entirely (~1/3 of the remat backward's MXU
    work for ~2x the chain's HBM activation traffic — a win whenever
    the chain is compute-bound, which it is at the production widths).

    Returns (features (B, N, C) f32, tuple of z_k (B, N, H_k) cdt);
    with kv_pool > 1 also (pooled, idx, sums) — see
    `_chain_forward_pallas`.  emit_features=False (kv_pool only) drops
    the (B, N, C) feature output (the stash z_k are still written — the
    backward needs them) and returns (zs, pooled, idx, sums).
    """
    b, n, d = x.shape
    c = final_w.shape[-1]
    n_stages = len(stage_params)
    assert n % tile == 0, f"N={n} not divisible by tile={tile}"
    if kv_pool:
        assert tile % kv_pool == 0, (tile, kv_pool)
    assert emit_features or kv_pool, "feature-less chain needs kv_pool"
    grid = (b, n // tile)

    flat_params, param_specs = _pack_params(stage_params, final_w,
                                            final_b, cdt)
    in_specs = [
        pl.BlockSpec((1, tile, d), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        *param_specs,
    ]
    widths = _stage_widths(stage_params)
    n_out_feat = 1 if emit_features else 0
    out_shape = []
    out_specs = []
    if emit_features:
        out_shape.append(jax.ShapeDtypeStruct((b, n, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, tile, c),
                                      lambda bi, ti: (bi, ti, 0),
                                      memory_space=pltpu.VMEM))
    for h in widths:
        out_shape.append(jax.ShapeDtypeStruct((b, n, h), cdt))
        out_specs.append(pl.BlockSpec((1, tile, h),
                                      lambda bi, ti: (bi, ti, 0),
                                      memory_space=pltpu.VMEM))
    kv_bytes = 0
    if kv_pool:
        kv_shapes, kv_specs = _kv_out_extras(b, n, c, tile, kv_pool)
        out_shape += kv_shapes
        out_specs += kv_specs
        kv_bytes = sum(s.size * jnp.dtype(s.dtype).itemsize
                       for s in kv_shapes)

    def kernel(*refs):
        x_ref = refs[0]
        stage_refs = [refs[1 + 4 * i: 1 + 4 * (i + 1)]
                      for i in range(n_stages)]
        fw_ref = refs[1 + 4 * n_stages]
        fb_ref = refs[2 + 4 * n_stages]
        z0 = 3 + n_out_feat + 4 * n_stages
        z_refs = refs[z0: z0 + n_stages]

        h = x_ref[0].astype(cdt)
        for k, (w_ref, b_ref, g_ref, be_ref) in enumerate(stage_refs):
            z = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
            z = z + b_ref[0]
            z_refs[k][0] = z.astype(cdt)
            h = jnp.maximum(_ln(z, g_ref[0], be_ref[0]), 0.0).astype(cdt)
        out = jnp.dot(h, fw_ref[:],
                      preferred_element_type=jnp.float32) + fb_ref[0]
        if emit_features:
            refs[3 + 4 * n_stages][0] = out
        if kv_pool:
            pool_ref, idx_ref, sum_ref = refs[z0 + n_stages:]
            pooled, idx, sums = _kv_pool_tile_fwd(x_ref[0], out, kv_pool)
            pool_ref[0] = pooled
            idx_ref[0] = idx
            sum_ref[0] = sums

    stage_flops = sum(2 * w.shape[0] * w.shape[1]
                      for (w, *_r) in stage_params)
    stage_flops += 2 * final_w.shape[0] * final_w.shape[1]
    z_bytes = sum(b * n * h * jnp.dtype(cdt).itemsize for h in widths)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The stash outputs push scoped VMEM slightly past the 16 MB
            # default at B=128 (ROADMAP #20: over by 204 KB); the kernel
            # is legitimate at 32 MB (v5e VMEM is 128 MB/core).
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * stage_flops,
            bytes_accessed=x.size * 4 + b * n * c * 4 * n_out_feat
            + z_bytes + kv_bytes
            + sum(p.size * p.dtype.itemsize for p in flat_params),
            transcendentals=0,
        ),
    )(x, *flat_params)
    zs = tuple(outs[n_out_feat: n_out_feat + n_stages])
    if kv_pool and emit_features:
        return outs[0], zs, outs[-3], outs[-2], outs[-1]
    if kv_pool:
        return zs, outs[-3], outs[-2], outs[-1]
    return outs[0], zs


def _stages_from_z(x_tile, z_list, stage_refs, cdt, eps=1e-6):
    """Reconstruct what backward needs from STORED pre-LN activations:
    no matmuls, only LayerNorm statistics + ReLU (VPU work).

    Same return contract as `_recompute_stages`.  z was stored in `cdt`,
    so the reconstructed statistics differ from the forward's f32 ones
    at cdt precision — bounded by the gradient-equality tests.
    """
    hs, xhats, rstds = [x_tile.astype(cdt)], [], []
    for (z_ref_val, (w_ref, b_ref, g_ref, be_ref)) in zip(z_list, stage_refs):
        z = z_ref_val.astype(jnp.float32)
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (z - mu) * rstd
        ln = xhat * g_ref[0] + be_ref[0]
        hs.append(jnp.maximum(ln, 0.0).astype(cdt))
        xhats.append(xhat)
        rstds.append(rstd)
    return hs, xhats, rstds


def _chain_backward_pallas(x, stage_params, final_w, final_b, g,
                           *, tile, cdt, interpret, zs=None,
                           kv_pool=0, dpool=None, kv_idx=None,
                           dsums=None):
    """Backward pass: rematerializing by default, stash-driven with zs.

    Args: primals (x (B,N,D) f32, params), the cotangent g (B,N,C) f32
    of the forward's output features, and optionally `zs` — the tuple of
    stored pre-LN activations from `_chain_forward_stash_pallas`.  With
    zs the per-tile recompute needs NO matmuls (LN stats + ReLU only),
    cutting the kernel's MXU work from 3x to 2x the forward.
    With kv_pool > 1, `dpool` (B, N/p, C) is the pooled-KV cotangent,
    `kv_idx` the forward's saved argmax, and `dsums` the window-sum
    cotangent; the kernel scatters dpool onto its argmax rows and
    broadcasts dsums onto valid rows in VMEM, folding both into g before
    the stage backward (no HBM-side (B, N, C) scatter passes).
    g=None (kv_pool only — the emit_features=False chain) skips the
    (B, N, C) cotangent input entirely: the feature output doesn't
    exist, so the backward seeds purely from the kv scatter instead of
    reading a 335 MB materialized-zeros tensor from HBM.
    Returns (dx, dstage_params, dfinal_w, dfinal_b) — f32, matching the
    primal pytree structure.
    """
    b, n, d = x.shape
    c = final_w.shape[-1]
    n_stages = len(stage_params)
    assert g is not None or kv_pool, "g=None needs the kv_pool cotangents"
    grid = (b, n // tile)

    flat_params, param_specs = _pack_params(stage_params, final_w,
                                            final_b, cdt)
    z_specs = []
    z_inputs = ()
    if zs is not None:
        z_inputs = tuple(zs)
        for z in z_inputs:
            h = z.shape[-1]
            z_specs.append(pl.BlockSpec(
                (1, tile, h), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM))
    kv_inputs = ()
    kv_specs = []
    if kv_pool:
        tp = tile // kv_pool
        kv_inputs = (dpool, kv_idx, dsums)
        kv_specs = [pl.BlockSpec((1, tp, c), lambda bi, ti: (bi, ti, 0),
                                 memory_space=pltpu.VMEM)] * 3
    g_inputs = () if g is None else (g,)
    g_specs = [] if g is None else [
        pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM)]
    in_specs = [
        pl.BlockSpec((1, tile, d), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        *g_specs,
        *kv_specs,
        *z_specs,
        *param_specs,
    ]

    # Outputs: dx per tile + one f32 accumulator block per parameter,
    # revisited across the whole (sequential) grid, written back once.
    out_shape = [jax.ShapeDtypeStruct((b, n, d), jnp.float32)]
    out_specs = [pl.BlockSpec((1, tile, d), lambda bi, ti: (bi, ti, 0),
                              memory_space=pltpu.VMEM)]
    for (w, bb, gg, be) in stage_params:
        for shape in (w.shape, (1,) + bb.shape, (1,) + gg.shape,
                      (1,) + be.shape):
            out_shape.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            out_specs.append(_const_spec(shape))
    out_shape.append(jax.ShapeDtypeStruct(final_w.shape, jnp.float32))
    out_specs.append(_const_spec(final_w.shape))
    out_shape.append(jax.ShapeDtypeStruct((1,) + final_b.shape, jnp.float32))
    out_specs.append(_const_spec((1,) + final_b.shape))

    n_z = len(z_inputs)
    n_kv = len(kv_inputs)
    n_g = len(g_inputs)

    def kernel(*refs):
        x_ref = refs[0]
        g_ref = refs[1] if n_g else None
        kv_refs = refs[1 + n_g: 1 + n_g + n_kv]
        z_refs = refs[1 + n_g + n_kv: 1 + n_g + n_kv + n_z]
        p0 = 1 + n_g + n_kv + n_z
        stage_refs = [refs[p0 + 4 * i: p0 + 4 * (i + 1)]
                      for i in range(n_stages)]
        fw_ref = refs[p0 + 4 * n_stages]
        o = p0 + 2 + 4 * n_stages  # fb_ref at o-1 is unused in backward
        dx_ref = refs[o]
        dstage_refs = [refs[o + 1 + 4 * i: o + 1 + 4 * (i + 1)]
                       for i in range(n_stages)]
        dfw_ref = refs[o + 1 + 4 * n_stages]
        dfb_ref = refs[o + 2 + 4 * n_stages]

        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            for dref in (*sum(dstage_refs, ()), dfw_ref, dfb_ref):
                dref[...] = jnp.zeros(dref.shape, dref.dtype)

        if n_z:
            hs, xhats, rstds = _stages_from_z(
                x_ref[0], [zr[0] for zr in z_refs], stage_refs, cdt)
        else:
            hs, xhats, rstds = _recompute_stages(x_ref[0], stage_refs, cdt)

        if n_kv:
            dpool_ref, idx_ref, dsums_ref = kv_refs
            gout = _kv_pool_tile_bwd(
                x_ref[0], dpool_ref[0], idx_ref[0], dsums_ref[0],
                kv_pool)                                   # (T, C) f32
            if n_g:
                gout = gout + g_ref[0]
        else:
            gout = g_ref[0]                                # (T, C) f32
        dfb_ref[0] += jnp.sum(gout, axis=0)
        g_cdt = gout.astype(cdt)
        # dfw += h_last^T @ g;  dh = g @ fw^T
        dfw_ref[...] += jax.lax.dot_general(
            hs[-1], g_cdt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jax.lax.dot_general(
            g_cdt, fw_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (T, H_last)

        for k in reversed(range(n_stages)):
            w_ref, _b_ref, gm_ref, be_ref = stage_refs[k]
            dw_ref, db_ref, dg_ref, dbe_ref = dstage_refs[k]
            xhat, rstd = xhats[k], rstds[k]
            gamma = gm_ref[0]
            ln = xhat * gamma + be_ref[0]
            # ReLU backward with jnp.maximum's exact-tie rule (g/2 at 0).
            dln = jnp.where(ln > 0, dh, jnp.where(ln < 0, 0.0, 0.5 * dh))
            dg_ref[0] += jnp.sum(dln * xhat, axis=0)
            dbe_ref[0] += jnp.sum(dln, axis=0)
            dxhat = dln * gamma
            m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
            m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
            dz = (dxhat - m1 - xhat * m2) * rstd           # (T, H) f32
            db_ref[0] += jnp.sum(dz, axis=0)
            dz_cdt = dz.astype(cdt)
            dw_ref[...] += jax.lax.dot_general(
                hs[k], dz_cdt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh = jax.lax.dot_general(
                dz_cdt, w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (T, H_prev)

        dx_ref[0] = dh

    stage_flops = sum(2 * w.shape[0] * w.shape[1]
                      for (w, *_r) in stage_params)
    stage_flops += 2 * final_w.shape[0] * final_w.shape[1]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # Gradient accumulators are revisited across BOTH grid dims.
            dimension_semantics=("arbitrary", "arbitrary"),
            # Default scoped-VMEM limit is 16 MB; this kernel legitimately
            # holds ~22 MB of f32 grad accumulators + ~11.5 MB bf16
            # weights + the tile's rematerialized activations (v5e VMEM
            # is 128 MB/core).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # remat: recompute + dw + dx matmuls; stash: dw + dx only.
            flops=(2 if n_z else 3) * b * n * stage_flops,
            bytes_accessed=(x.size + x.size) * 4
            + sum(gi.size * 4 for gi in g_inputs)
            + sum(z.size * z.dtype.itemsize for z in z_inputs)
            + sum(k.size * k.dtype.itemsize for k in kv_inputs)
            + 2 * sum(p.size * p.dtype.itemsize for p in flat_params),
            transcendentals=0,
        ),
    )(x, *g_inputs, *kv_inputs, *z_inputs, *flat_params)

    dx = outs[0]
    dstages = []
    i = 1
    for _ in range(n_stages):
        dw, db, dg, dbe = outs[i:i + 4]
        dstages.append((dw, db[0], dg[0], dbe[0]))
        i += 4
    dfw = outs[i]
    dfb = outs[i + 1][0]
    return dx, tuple(dstages), dfw, dfb


@functools.lru_cache(maxsize=None)
def make_differentiable_chain(tile: int = 512,
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = None,
                              backward: str = "remat",
                              kv_pool: int = 0,
                              emit_features: bool = True):
    """Build the custom-VJP fused point chain for the given statics.

    Returned callable: chain(x, stage_params, final_w, final_b) ->
    point features (B, N, C) f32, differentiable w.r.t. every input.
    stage_params is a tuple of (w, b, ln_scale, ln_bias) tuples.

    backward:
      "remat" — save only the inputs; backward recomputes activations
        per tile (3x forward MXU work, minimal HBM).
      "stash" — forward also writes each stage's pre-LN activations in
        `compute_dtype`; backward reconstructs from them with LN stats +
        ReLU only (2x forward MXU work, ~2x chain HBM activation
        traffic).  Faster when compute-bound; gradients differ from
        remat at compute_dtype precision (z round-trips through cdt).

    kv_pool=p > 1 changes the signature to chain(...) ->
    (features, pooled_kv (B, N/p, C) f32, kv_sums (B, N/p, C) f32): the
    decoder's KV window max-pool (ops.masked_pool.window_max_pool
    semantics, validity mask recomputed from x in-kernel) and the masked
    window SUMS (sum over windows = the global masked sum, so
    masked_mean needs no (B, N, C) pass either) are emitted by the
    forward kernel and their cotangents scattered in the backward kernel
    — all in VMEM, so the pooling costs no extra (B, N, C) HBM passes.
    Tie rule is lowest-index (same as window_max_pool's custom VJP).

    emit_features=False (kv_pool only) changes the signature to
    chain(...) -> (pooled_kv, kv_sums): the (B, N, C) per-point features
    are never written to HBM at all — forward skips the output and
    backward seeds purely from the kv cotangent scatter, instead of
    JAX materializing a (B, N, C) ZEROS cotangent for an output nobody
    reads (at the B=64 recipe that dead tensor was a 0.5 ms 335 MB HBM
    broadcast + an equal read back in the kernel, ROADMAP #27).  This is
    the query-decoder training path, where the decoder consumes only the
    pooled KV tokens.
    """
    assert backward in ("remat", "stash"), backward
    assert emit_features or kv_pool > 1, \
        "emit_features=False requires kv_pool > 1"
    cdt = jnp.dtype(compute_dtype).type

    def _resolve_interpret():
        return (not _on_tpu()) if interpret is None else interpret

    if not kv_pool:
        @jax.custom_vjp
        def chain(x, stage_params, final_w, final_b):
            return _chain_forward_pallas(
                x, stage_params, final_w, final_b,
                tile=tile, cdt=cdt, interpret=_resolve_interpret())

        def chain_fwd(x, stage_params, final_w, final_b):
            if backward == "stash":
                out, zs = _chain_forward_stash_pallas(
                    x, stage_params, final_w, final_b,
                    tile=tile, cdt=cdt, interpret=_resolve_interpret())
                return out, (x, stage_params, final_w, final_b, zs)
            out = _chain_forward_pallas(
                x, stage_params, final_w, final_b,
                tile=tile, cdt=cdt, interpret=_resolve_interpret())
            return out, (x, stage_params, final_w, final_b, None)

        def chain_bwd(residuals, g):
            x, stage_params, final_w, final_b, zs = residuals
            return _chain_backward_pallas(
                x, stage_params, final_w, final_b, g,
                tile=tile, cdt=cdt, interpret=_resolve_interpret(), zs=zs)

        chain.defvjp(chain_fwd, chain_bwd)
        return chain

    if not emit_features:
        @jax.custom_vjp
        def chain_kv_slim(x, stage_params, final_w, final_b):
            pooled, _idx, sums = _chain_forward_pallas(
                x, stage_params, final_w, final_b,
                tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                kv_pool=kv_pool, emit_features=False)
            return pooled, sums

        def chain_kv_slim_fwd(x, stage_params, final_w, final_b):
            if backward == "stash":
                zs, pooled, idx, sums = _chain_forward_stash_pallas(
                    x, stage_params, final_w, final_b,
                    tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                    kv_pool=kv_pool, emit_features=False)
            else:
                pooled, idx, sums = _chain_forward_pallas(
                    x, stage_params, final_w, final_b,
                    tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                    kv_pool=kv_pool, emit_features=False)
                zs = None
            return ((pooled, sums),
                    (x, stage_params, final_w, final_b, zs, idx))

        def chain_kv_slim_bwd(residuals, gs):
            x, stage_params, final_w, final_b, zs, idx = residuals
            dpool, dsums = gs
            return _chain_backward_pallas(
                x, stage_params, final_w, final_b, None,
                tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                zs=zs, kv_pool=kv_pool, dpool=dpool, kv_idx=idx,
                dsums=dsums)

        chain_kv_slim.defvjp(chain_kv_slim_fwd, chain_kv_slim_bwd)
        return chain_kv_slim

    @jax.custom_vjp
    def chain_kv(x, stage_params, final_w, final_b):
        out, pooled, _idx, sums = _chain_forward_pallas(
            x, stage_params, final_w, final_b,
            tile=tile, cdt=cdt, interpret=_resolve_interpret(),
            kv_pool=kv_pool)
        return out, pooled, sums

    def chain_kv_fwd(x, stage_params, final_w, final_b):
        if backward == "stash":
            out, zs, pooled, idx, sums = _chain_forward_stash_pallas(
                x, stage_params, final_w, final_b,
                tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                kv_pool=kv_pool)
        else:
            out, pooled, idx, sums = _chain_forward_pallas(
                x, stage_params, final_w, final_b,
                tile=tile, cdt=cdt, interpret=_resolve_interpret(),
                kv_pool=kv_pool)
            zs = None
        return ((out, pooled, sums),
                (x, stage_params, final_w, final_b, zs, idx))

    def chain_kv_bwd(residuals, gs):
        x, stage_params, final_w, final_b, zs, idx = residuals
        g, dpool, dsums = gs
        return _chain_backward_pallas(
            x, stage_params, final_w, final_b, g,
            tile=tile, cdt=cdt, interpret=_resolve_interpret(), zs=zs,
            kv_pool=kv_pool, dpool=dpool, kv_idx=idx, dsums=dsums)

    chain_kv.defvjp(chain_kv_fwd, chain_kv_bwd)
    return chain_kv
