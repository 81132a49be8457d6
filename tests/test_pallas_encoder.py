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
