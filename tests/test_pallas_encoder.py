"""Fused Pallas encoder kernel vs the plain-XLA reference chain.

On CPU the kernel runs in interpreter mode — semantics-identical, so
this validates masking, pooling, and accumulation logic; compiled-TPU
equality is exercised by bench/verify runs on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wireframe_tpu.ops.masked_pool import (
    masked_max,
    masked_mean,
    point_validity_mask,
)
from wireframe_tpu.ops.pallas_encoder import (
    fused_point_encoder,
    point_encoder_reference,
)


def make_params(rng, d, dims, c):
    prev, sp = d, []
    for h in dims:
        sp.append((
            jnp.asarray((rng.normal(size=(prev, h)) * 0.1).astype(np.float32)),
            jnp.asarray((rng.normal(size=(h,)) * 0.1).astype(np.float32)),
            jnp.ones((h,), jnp.float32),
            jnp.zeros((h,), jnp.float32),
        ))
        prev = h
    fw = jnp.asarray((rng.normal(size=(prev, c)) * 0.1).astype(np.float32))
    fb = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    return sp, fw, fb


def test_fused_matches_reference_with_padding(rng):
    b, n, d, c = 2, 128, 8, 64
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 100:] = 0.0  # padded rows
    xj = jnp.asarray(x)

    out = fused_point_encoder(xj, sp, fw, fb, tile=64,
                              return_point_features=True)
    feats = point_encoder_reference(xj, sp, fw, fb)
    mask = point_validity_mask(xj)

    np.testing.assert_allclose(np.asarray(out["point_features"]),
                               np.asarray(feats), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["masked_mean"]),
                               np.asarray(masked_mean(feats, mask)),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["masked_max"]),
                               np.asarray(masked_max(feats, mask)),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["mean"]),
                               np.asarray(jnp.mean(feats, -2)),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["max"]),
                               np.asarray(jnp.max(feats, -2)),
                               rtol=2e-2, atol=2e-3)


def test_fused_all_padding_sample(rng):
    """A fully padded sample must give zero masked pools (finite guard)."""
    b, n, d, c = 2, 64, 8, 32
    sp, fw, fb = make_params(rng, d, [32], c)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[1] = 0.0
    out = fused_point_encoder(jnp.asarray(x), sp, fw, fb, tile=32)
    np.testing.assert_array_equal(np.asarray(out["masked_max"][1]),
                                  np.zeros(c))
    np.testing.assert_array_equal(np.asarray(out["masked_mean"][1]),
                                  np.zeros(c))
    assert np.isfinite(np.asarray(out["max"])).all()


def test_encoder_module_pallas_flag_same_params(rng):
    """PointNetEncoder with use_pallas on/off must produce the same
    outputs from the same params."""
    from wireframe_tpu.models.encoder import PointNetEncoder

    x = jnp.asarray(rng.normal(size=(2, 64, 8)).astype(np.float32))
    # Both paths in bf16 compute (the kernel's internal dtype), so the
    # only difference left is accumulation order.
    enc_ref = PointNetEncoder(hidden_dims=(32, 64), output_dim=32,
                              dtype=jnp.bfloat16, use_pallas=False)
    params = enc_ref.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    g_ref, pooled_ref, _ = enc_ref.apply({"params": params}, x)

    enc_pls = PointNetEncoder(hidden_dims=(32, 64), output_dim=32,
                              dtype=jnp.bfloat16, use_pallas=True,
                              pallas_tile=32)
    g_pls, pooled_pls, _ = enc_pls.apply({"params": params}, x)

    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_pls),
                               rtol=2e-2, atol=2e-3)
    for k in pooled_ref:
        np.testing.assert_allclose(np.asarray(pooled_ref[k]),
                                   np.asarray(pooled_pls[k]),
                                   rtol=2e-2, atol=2e-3)


def test_fused_kv_pool_output(rng):
    """kv_pool>1: the kernel-emitted pooled KV must equal
    window_max_pool over the reference features (incl. a fully-invalid
    window pooling to 0), without the full point-features output."""
    from wireframe_tpu.ops.masked_pool import window_max_pool

    b, n, d, c, p = 2, 128, 8, 64, 4
    sp, fw, fb = make_params(rng, d, [32, 64], c)
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 96:] = 0.0       # padding tail
    x[1, 8:12] = 0.0      # fully-invalid window mid-cloud
    xj = jnp.asarray(x)

    out = fused_point_encoder(xj, sp, fw, fb, tile=32, kv_pool=p)
    assert "point_features" not in out
    feats = point_encoder_reference(xj, sp, fw, fb)
    ref_kv, ref_wm = window_max_pool(feats, point_validity_mask(xj), p)
    np.testing.assert_allclose(np.asarray(out["kv_features"]),
                               np.asarray(ref_kv), rtol=2e-2, atol=2e-3)
    assert not np.asarray(ref_wm)[1, 2]
    assert np.abs(np.asarray(out["kv_features"])[1, 2]).max() == 0.0


def test_encoder_module_inference_kv_matches_xla(rng):
    """PointNetEncoder with kv_pool + point_features_for_kv: the fused
    inference path must produce the same pooled KV / mask the XLA path's
    consumer would compute, and skip materializing point features."""
    import jax

    from wireframe_tpu.models.encoder import PointNetEncoder
    from wireframe_tpu.ops.masked_pool import window_max_pool

    b, n, d, p = 2, 128, 8, 4
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 96:] = 0.0
    xj = jnp.asarray(x)

    def build(use_pallas):
        return PointNetEncoder(
            input_dim=d, hidden_dims=(32, 64), output_dim=64,
            dtype=jnp.float32, use_pallas=use_pallas, pallas_tile=32,
            kv_pool=p, point_features_for_kv=True)

    enc = build(True)
    params = enc.init(jax.random.PRNGKey(0), xj)
    g_p, pooled_p, pf_p = enc.apply(params, xj)
    g_x, pooled_x, pf_x = build(False).apply(params, xj)

    assert pf_p is None          # fused path skipped the HBM write
    assert pf_x is not None      # XLA path must hand features to the pool
    ref_kv, ref_wm = window_max_pool(
        jnp.asarray(pf_x), jnp.abs(jnp.sum(xj, -1)) > 1e-9, p)
    np.testing.assert_allclose(np.asarray(pooled_p["kv"]),
                               np.asarray(ref_kv), rtol=2e-2, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(pooled_p["kv_mask"]),
                                  np.asarray(ref_wm))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=2e-2, atol=2e-3)
