"""Custom-VJP fused point chain: forward + gradient equality vs XLA.

The differentiable Pallas chain (ops.pallas_chain_grad) must match the
plain-XLA training path (ops.pallas_encoder.point_encoder_reference)
both forward and backward.  On CPU the kernels run in interpreter mode,
which is semantics-identical to compiled Mosaic; compiled-TPU equality
is covered by tests/test_tpu_kernel.py behind the tpu marker.

float32 compute is compared tightly (same math, different accumulation
order); bfloat16 loosely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pallas_encoder import make_params
from wireframe_tpu.ops.pallas_chain_grad import make_differentiable_chain
from wireframe_tpu.ops.pallas_encoder import point_encoder_reference


def _grads(fn, x, sp, fw, fb):
    def loss(x, sp, fw, fb):
        feats = fn(x, sp, fw, fb)
        # Exercise every output element with non-uniform weights.
        w = jnp.arange(feats.size, dtype=jnp.float32).reshape(feats.shape)
        return jnp.sum(feats * jnp.sin(w * 0.01)) + jnp.sum(feats ** 2) * 0.1

    return jax.grad(loss, argnums=(0, 1, 2, 3))(x, sp, fw, fb)


def _assert_tree_close(a, b, rtol, atol):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for ga, gb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=rtol, atol=atol)


def test_forward_matches_reference_f32(rng):
    b, n, d, c = 2, 128, 8, 64
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    sp = tuple(sp)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 100:] = 0.0
    xj = jnp.asarray(x)

    chain = make_differentiable_chain(tile=64, compute_dtype=jnp.float32)
    out = chain(xj, sp, fw, fb)
    ref = point_encoder_reference(xj, sp, fw, fb,
                                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference_f32(rng):
    b, n, d, c = 2, 128, 8, 48
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    sp = tuple(sp)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[1, 64:] = 0.0  # padded rows flow through the chain like any row
    xj = jnp.asarray(x)

    chain = make_differentiable_chain(tile=32, compute_dtype=jnp.float32)
    ref = lambda x, sp, fw, fb: point_encoder_reference(  # noqa: E731
        x, sp, fw, fb, compute_dtype=jnp.float32)

    g_chain = _grads(chain, xj, sp, fw, fb)
    g_ref = _grads(ref, xj, sp, fw, fb)
    _assert_tree_close(g_chain, g_ref, rtol=5e-4, atol=5e-5)


def test_gradients_match_reference_bf16(rng):
    b, n, d, c = 2, 64, 8, 32
    sp, fw, fb = make_params(rng, d, [32], c)
    sp = tuple(sp)
    xj = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))

    chain = make_differentiable_chain(tile=32, compute_dtype=jnp.bfloat16)
    ref = lambda x, sp, fw, fb: point_encoder_reference(  # noqa: E731
        x, sp, fw, fb, compute_dtype=jnp.bfloat16)

    g_chain = _grads(chain, xj, sp, fw, fb)
    g_ref = _grads(ref, xj, sp, fw, fb)
    # bf16 matmul operand rounding differs between the two paths (the
    # kernel casts cotangents to bf16 for the MXU); compare loosely.
    _assert_tree_close(g_chain, g_ref, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_encoder_module_grads_pallas_vs_xla(rng):
    """Full PointNetEncoder: grads through pools + fusion MLP must match
    between the differentiable-Pallas path and the plain-XLA path."""
    from wireframe_tpu.models.encoder import PointNetEncoder

    x = np.asarray(rng.normal(size=(2, 64, 8)), np.float32)
    x[0, 48:] = 0.0
    xj = jnp.asarray(x)

    kwargs = dict(hidden_dims=(32, 64), output_dim=32, dtype=jnp.float32,
                  return_point_features=True)
    enc_ref = PointNetEncoder(use_pallas=False, **kwargs)
    params = enc_ref.init({"params": jax.random.PRNGKey(0)}, xj)["params"]
    enc_pls = PointNetEncoder(use_pallas=True, differentiable=True,
                              pallas_tile=32, **kwargs)

    def make_loss(enc):
        def loss(p):
            g, pooled, feats = enc.apply({"params": p}, xj)
            return (jnp.sum(g ** 2) + jnp.sum(feats ** 2) * 1e-3
                    + sum(jnp.sum(v) for v in pooled.values()))
        return loss

    out_ref = make_loss(enc_ref)(params)
    out_pls = make_loss(enc_pls)(params)
    np.testing.assert_allclose(float(out_ref), float(out_pls),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(make_loss(enc_ref))(params)
    g_pls = jax.grad(make_loss(enc_pls))(params)
    _assert_tree_close(g_pls, g_ref, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_train_step_pallas_matches_xla_trajectory(rng):
    """Jitted train steps with the fused differentiable encoder must
    track the plain-XLA path's loss trajectory from the same init (f32
    compute: the paths differ only in accumulation order)."""
    from wireframe_tpu.config import Config
    from wireframe_tpu.ops.pairs import num_pairs
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    def build(use_pallas):
        cfg = Config()
        cfg.data.num_points = 64
        cfg.data.max_vertices = 8
        cfg.model.use_pallas_encoder = use_pallas
        cfg.model.pallas_tile = 32
        cfg.train.device_augment = False
        cfg.__post_init__()
        return cfg

    cfg = build(True)
    b, n, d, v = 2, 64, cfg.model.input_dim, cfg.model.max_vertices
    e = num_pairs(v)
    counts = np.array([5, 7], np.int32)
    batch = {
        "point_clouds": jnp.asarray(
            rng.normal(size=(b, n, d)).astype(np.float32)),
        "target_vertices": jnp.asarray(
            (rng.normal(size=(b, v, 3))
             * (np.arange(v)[None, :, None] < counts[:, None, None]))
            .astype(np.float32)),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None, :] < counts[:, None]).astype(np.float32)),
        "vertex_counts": jnp.asarray(counts),
        "edge_labels": jnp.asarray(
            (rng.random((b, e)) < 0.2).astype(np.float32)),
    }

    def run(cfg, n_steps=4):
        state = create_train_state(cfg, jax.random.PRNGKey(0), (b, n, d))
        step = jax.jit(make_train_step(cfg))
        losses = []
        key = jax.random.PRNGKey(1)
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
            losses.append(float(m["total_loss"]))
        return losses

    # 3 steps: beyond that, optimization chaos on random data amplifies
    # last-ulp f32 accumulation-order differences to visible size
    # (observed: 1e-6 rel at step 3, 4e-3 by step 4 after a loss spike).
    losses_pallas = run(build(True), n_steps=3)
    losses_xla = run(build(False), n_steps=3)
    assert all(np.isfinite(losses_pallas))
    np.testing.assert_allclose(losses_pallas, losses_xla,
                               rtol=1e-4, atol=1e-5)


def test_stash_backward_matches_remat_f32(rng):
    """backward="stash" stores pre-LN activations instead of
    rematerializing; in f32 the stored z round-trips exactly, so the
    gradients must match the remat path to accumulation-order noise."""
    b, n, d, c = 2, 128, 8, 32
    sp, fw, fb = make_params(rng, d, [16, 32, 64], c)
    sp = tuple(sp)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))

    remat = make_differentiable_chain(tile=64, compute_dtype=jnp.float32,
                                      backward="remat")
    stash = make_differentiable_chain(tile=64, compute_dtype=jnp.float32,
                                      backward="stash")
    np.testing.assert_array_equal(np.asarray(remat(x, sp, fw, fb)),
                                  np.asarray(stash(x, sp, fw, fb)))
    _assert_tree_close(_grads(remat, x, sp, fw, fb),
                       _grads(stash, x, sp, fw, fb),
                       rtol=1e-4, atol=1e-4)


def test_stash_backward_bf16_gate_semantics(rng):
    """In bf16 the stash gradient is the EXACT gradient of the
    bf16-rounded forward: reconstructing ln from stored bf16 z can flip
    the ReLU gate on near-zero activations.  Contract: parameter
    gradients (averaged over the tile) stay close, and elementwise dx
    differs only on a small fraction of gate-flip positions."""
    b, n, d, c = 2, 128, 8, 32
    sp, fw, fb = make_params(rng, d, [16, 32, 64], c)
    sp = tuple(sp)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))

    remat = make_differentiable_chain(tile=64, compute_dtype=jnp.bfloat16,
                                      backward="remat")
    stash = make_differentiable_chain(tile=64, compute_dtype=jnp.bfloat16,
                                      backward="stash")
    # Identical forward (stash stores z but computes h from the same f32 z).
    np.testing.assert_array_equal(np.asarray(remat(x, sp, fw, fb)),
                                  np.asarray(stash(x, sp, fw, fb)))

    g1 = _grads(remat, x, sp, fw, fb)
    g2 = _grads(stash, x, sp, fw, fb)
    # A flipped gate zeroes/unzeroes one row's contribution, which can
    # move individual small entries arbitrarily far in relative terms —
    # the meaningful contract is that each gradient TENSOR is close in
    # norm (training-direction equivalence), with a bounded flip count.
    for ga, gb in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(ga, np.float64), np.asarray(gb, np.float64)
        denom = np.linalg.norm(a) + 1e-6
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.05, f"relative grad-norm error {rel:.3f}"
    dx1, dx2 = np.asarray(g1[0]), np.asarray(g2[0])
    rel = np.abs(dx1 - dx2) / (np.abs(dx1) + np.abs(dx2) + 1e-3)
    flips = rel > 0.05
    assert flips.mean() < 0.05, f"gate-flip fraction {flips.mean():.3f}"


def test_chain_tile_invariance_and_encoder_routing(rng):
    """The chain is pointwise over the point axis, so tile size changes
    results only through matmul reduction blocking (float-level noise,
    ~1e-6) — the basis for the split train/inference tile defaults
    (ModelConfig.pallas_chain_tile=256 vs pallas_tile=512) — and the
    encoder module's differentiable path must honor chain_tile when the
    point count only divides the chain tile."""
    b, n, d, c = 2, 128, 8, 64
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    sp = tuple(sp)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    xj = jnp.asarray(x)

    out32 = make_differentiable_chain(
        tile=32, compute_dtype=jnp.float32)(xj, sp, fw, fb)
    out128 = make_differentiable_chain(
        tile=128, compute_dtype=jnp.float32)(xj, sp, fw, fb)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out128),
                               rtol=1e-4, atol=1e-5)

    # n=128 divides chain_tile=64 but NOT pallas_tile=96: with the split
    # knob the differentiable path stays on the Pallas chain.
    from wireframe_tpu.models.encoder import PointNetEncoder

    enc = PointNetEncoder(input_dim=d, hidden_dims=(32, 64), output_dim=c,
                          use_pallas=True, differentiable=True,
                          pallas_tile=96, chain_tile=64)
    params = enc.init(jax.random.PRNGKey(0), xj)
    g, pooled, _ = enc.apply(params, xj)
    enc_ref = PointNetEncoder(input_dim=d, hidden_dims=(32, 64),
                              output_dim=c, use_pallas=False)
    g_ref, pooled_ref, _ = enc_ref.apply(params, xj)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backward", ["remat", "stash"])
def test_chain_kv_pool_matches_xla(rng, backward):
    """kv_pool>1 path: the kernel-emitted pooled KV and its VJP must
    match point_encoder_reference + ops.masked_pool.window_max_pool
    (both outputs cotangent-loaded at once)."""
    from wireframe_tpu.ops.masked_pool import (
        point_validity_mask,
        window_max_pool,
    )

    b, n, d, c, p = 2, 128, 8, 64, 4
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    sp = tuple(sp)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 96:] = 0.0       # padding tail
    x[1, 8:12] = 0.0      # a fully-invalid window mid-cloud
    xj = jnp.asarray(x)
    mask = point_validity_mask(xj)

    chain = make_differentiable_chain(tile=32, compute_dtype=jnp.float32,
                                      backward=backward, kv_pool=p)
    feats, pooled, sums = chain(xj, sp, fw, fb)
    ref_feats = point_encoder_reference(xj, sp, fw, fb,
                                        compute_dtype=jnp.float32)
    ref_pooled, ref_wm = window_max_pool(ref_feats, mask, p)
    ref_sums = jnp.sum(
        jnp.where(mask[..., None], ref_feats, 0.0).reshape(b, n // p, p, c),
        axis=2)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref_feats),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pooled),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                               rtol=1e-5, atol=1e-5)
    # fully-invalid window pooled to 0
    assert not np.asarray(ref_wm)[1, 2]
    assert np.abs(np.asarray(pooled)[1, 2]).max() == 0.0

    def loss_kv(x, sp, fw, fb):
        f, pl_, sm = chain(x, sp, fw, fb)
        return jnp.sum(f * 0.01) + jnp.sum(pl_ ** 2) + jnp.sum(sm * 0.3)

    def loss_ref(x, sp, fw, fb):
        f = point_encoder_reference(x, sp, fw, fb,
                                    compute_dtype=jnp.float32)
        pl_, _ = window_max_pool(f, mask, p)
        sm = jnp.sum(
            jnp.where(mask[..., None], f, 0.0).reshape(b, n // p, p, c),
            axis=2)
        return jnp.sum(f * 0.01) + jnp.sum(pl_ ** 2) + jnp.sum(sm * 0.3)

    g1 = jax.grad(loss_kv, argnums=(0, 1, 2, 3))(xj, sp, fw, fb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xj, sp, fw, fb)
    _assert_tree_close(g1, g2, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("backward", ["remat", "stash"])
def test_chain_kv_pool_slim_matches_xla(rng, backward):
    """emit_features=False: chain -> (pooled, sums) only.  The forward
    never writes the (B, N, C) features and the backward never reads a
    features cotangent — outputs and VJP must still match the XLA
    reference with the loss taken on pooled+sums alone."""
    from wireframe_tpu.ops.masked_pool import (
        point_validity_mask,
        window_max_pool,
    )

    b, n, d, c, p = 2, 128, 8, 64, 4
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    sp = tuple(sp)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 96:] = 0.0       # padding tail
    x[1, 8:12] = 0.0      # a fully-invalid window mid-cloud
    xj = jnp.asarray(x)
    mask = point_validity_mask(xj)

    slim = make_differentiable_chain(tile=32, compute_dtype=jnp.float32,
                                     backward=backward, kv_pool=p,
                                     emit_features=False)
    pooled, sums = slim(xj, sp, fw, fb)
    ref_feats = point_encoder_reference(xj, sp, fw, fb,
                                        compute_dtype=jnp.float32)
    ref_pooled, _ = window_max_pool(ref_feats, mask, p)
    ref_sums = jnp.sum(
        jnp.where(mask[..., None], ref_feats, 0.0).reshape(b, n // p, p, c),
        axis=2)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pooled),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums),
                               rtol=1e-5, atol=1e-5)

    def loss_slim(x, sp, fw, fb):
        pl_, sm = slim(x, sp, fw, fb)
        return jnp.sum(pl_ ** 2) + jnp.sum(sm * 0.3)

    def loss_ref(x, sp, fw, fb):
        f = point_encoder_reference(x, sp, fw, fb,
                                    compute_dtype=jnp.float32)
        pl_, _ = window_max_pool(f, mask, p)
        sm = jnp.sum(
            jnp.where(mask[..., None], f, 0.0).reshape(b, n // p, p, c),
            axis=2)
        return jnp.sum(pl_ ** 2) + jnp.sum(sm * 0.3)

    g1 = jax.grad(loss_slim, argnums=(0, 1, 2, 3))(xj, sp, fw, fb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xj, sp, fw, fb)
    _assert_tree_close(g1, g2, rtol=1e-3, atol=2e-4)


def test_encoder_kv_pool_drops_dead_feature_output(rng):
    """PointNetEncoder on the differentiable kv_pool path without
    return_point_features must route through the slim chain: identical
    masked pools / kv outputs and gradients to the feature-emitting
    variant, no 'mean'/'max' keys (their only producer is the dead
    feature tensor), and point_features=None."""
    from wireframe_tpu.models.encoder import PointNetEncoder

    b, n, d, c, p = 2, 64, 8, 32, 4
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 48:] = 0.0
    xj = jnp.asarray(x)

    enc = PointNetEncoder(input_dim=d, hidden_dims=(16, 32), output_dim=c,
                          dtype=jnp.float32, use_pallas=True,
                          differentiable=True, pallas_tile=32, kv_pool=p)
    params = enc.init(jax.random.PRNGKey(0), xj)
    g, pooled, pf = enc.apply(params, xj)
    assert pf is None
    assert "mean" not in pooled and "max" not in pooled
    enc_full = PointNetEncoder(input_dim=d, hidden_dims=(16, 32),
                               output_dim=c, dtype=jnp.float32,
                               use_pallas=True, differentiable=True,
                               pallas_tile=32, kv_pool=p,
                               return_point_features=True)
    g_full, pooled_full, pf_full = enc_full.apply(params, xj)
    assert pf_full is not None
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_full),
                               rtol=1e-6, atol=1e-6)
    for k in ("masked_max", "masked_mean", "kv", "kv_mask"):
        np.testing.assert_allclose(np.asarray(pooled[k]),
                                   np.asarray(pooled_full[k]),
                                   rtol=1e-6, atol=1e-6)

    def loss(fn):
        def f(params):
            g_, pooled_, _ = fn(params)
            return jnp.sum(g_ ** 2) + jnp.sum(pooled_["kv"] * 0.1)
        return f

    gr = jax.grad(loss(lambda prm: enc.apply(prm, xj)))(params)
    gr_full = jax.grad(loss(lambda prm: enc_full.apply(prm, xj)))(params)
    _assert_tree_close(gr, gr_full, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_step_kv_pool_pallas_matches_xla(rng):
    """Same trajectory check with the query decoder + decoder_kv_pool>1:
    the pallas path pools KV inside the chain kernel, the XLA path pools
    in the decoder — the two must track at f32."""
    from wireframe_tpu.config import Config
    from wireframe_tpu.ops.pairs import num_pairs
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    def build(use_pallas):
        cfg = Config()
        cfg.data.num_points = 64
        cfg.data.max_vertices = 8
        cfg.model.use_pallas_encoder = use_pallas
        cfg.model.pallas_tile = 32
        cfg.model.vertex_head = "query"
        cfg.model.decoder_kv_pool = 4
        cfg.model.decoder_dim = 64
        cfg.model.decoder_layers = 2
        cfg.model.decoder_ffn_dim = 128
        cfg.train.device_augment = False
        cfg.__post_init__()
        return cfg

    cfg = build(True)
    b, n, d, v = 2, 64, cfg.model.input_dim, cfg.model.max_vertices
    e = num_pairs(v)
    counts = np.array([5, 7], np.int32)
    batch = {
        "point_clouds": jnp.asarray(
            rng.normal(size=(b, n, d)).astype(np.float32)),
        "target_vertices": jnp.asarray(
            (rng.normal(size=(b, v, 3))
             * (np.arange(v)[None, :, None] < counts[:, None, None]))
            .astype(np.float32)),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None, :] < counts[:, None]).astype(np.float32)),
        "vertex_counts": jnp.asarray(counts),
        "edge_labels": jnp.asarray(
            (rng.random((b, e)) < 0.2).astype(np.float32)),
    }

    def run(cfg, n_steps=3):
        state = create_train_state(cfg, jax.random.PRNGKey(0), (b, n, d))
        step = jax.jit(make_train_step(cfg))
        losses = []
        key = jax.random.PRNGKey(1)
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
            losses.append(float(m["total_loss"]))
        return losses

    losses_pallas = run(build(True))
    losses_xla = run(build(False))
    assert all(np.isfinite(losses_pallas))
    np.testing.assert_allclose(losses_pallas, losses_xla,
                               rtol=1e-4, atol=1e-5)
