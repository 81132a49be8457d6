"""Masked pooling vs numpy oracle — the subtle encoder semantics
(PointNetEncoder.py:85-111) the whole parity story depends on."""

import numpy as np
import jax.numpy as jnp

from wireframe_tpu.ops.masked_pool import (
    masked_max,
    masked_mean,
    point_validity_mask,
    window_max_pool,
)


def test_validity_mask_zero_rows(rng):
    x = rng.normal(size=(2, 10, 8)).astype(np.float32)
    x[0, 3] = 0.0          # padding row -> invalid
    x[1, 7] = 0.0
    mask = np.asarray(point_validity_mask(jnp.asarray(x)))
    assert not mask[0, 3] and not mask[1, 7]
    assert mask.sum() == 18


def test_masked_mean_max_oracle(rng):
    b, n, c = 3, 32, 16
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = rng.random((b, n)) > 0.3
    mask[0] = True  # one fully valid sample
    got_mean = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    got_max = np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask)))
    for i in range(b):
        rows = x[i][mask[i]]
        np.testing.assert_allclose(got_mean[i], rows.mean(0), rtol=1e-5)
        np.testing.assert_allclose(got_max[i], rows.max(0), rtol=1e-5)


def test_masked_max_all_invalid_returns_zero():
    x = jnp.ones((1, 4, 8))
    mask = jnp.zeros((1, 4), bool)
    out = np.asarray(masked_max(x, mask))
    np.testing.assert_array_equal(out, np.zeros((1, 8)))
    mean = np.asarray(masked_mean(x, mask))
    np.testing.assert_array_equal(mean, np.zeros((1, 8)))


def test_window_max_pool_oracle(rng):
    b, n, c, w = 2, 24, 5, 4
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = rng.random((b, n)) > 0.4
    mask[0, 0:4] = False  # one fully-invalid window
    pooled, wmask = window_max_pool(jnp.asarray(x), jnp.asarray(mask), w)
    assert pooled.shape == (b, n // w, c) and wmask.shape == (b, n // w)
    for i in range(b):
        for j in range(n // w):
            rows = x[i, j * w:(j + 1) * w][mask[i, j * w:(j + 1) * w]]
            if len(rows):
                assert wmask[i, j]
                np.testing.assert_allclose(np.asarray(pooled[i, j]),
                                           rows.max(0), rtol=1e-6)
            else:
                assert not wmask[i, j]
                np.testing.assert_array_equal(np.asarray(pooled[i, j]), 0.0)


def test_window_max_pool_ragged_and_identity(rng):
    x = rng.normal(size=(1, 10, 3)).astype(np.float32)
    mask = np.ones((1, 10), bool)
    # N=10 not divisible by 4: padded windows must be masked out.
    pooled, wmask = window_max_pool(jnp.asarray(x), jnp.asarray(mask), 4)
    assert pooled.shape == (1, 3, 3)
    np.testing.assert_allclose(np.asarray(pooled[0, 2]),
                               x[0, 8:10].max(0), rtol=1e-6)
    assert np.asarray(wmask).all()  # every window holds >=1 valid point
    # window=1 is the identity.
    same, smask = window_max_pool(jnp.asarray(x), jnp.asarray(mask), 1)
    np.testing.assert_array_equal(np.asarray(same), x)
    np.testing.assert_array_equal(np.asarray(smask), mask)


def test_pooling_padding_invariance(rng):
    # Appending zero (invalid) rows must not change masked pools — the
    # property that lets us pad point clouds to buckets.
    x = rng.normal(size=(1, 16, 8)).astype(np.float32)
    mask = np.ones((1, 16), bool)
    xp = np.concatenate([x, np.zeros((1, 8, 8), np.float32)], axis=1)
    maskp = np.concatenate([mask, np.zeros((1, 8), bool)], axis=1)
    np.testing.assert_allclose(
        np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask))),
        np.asarray(masked_mean(jnp.asarray(xp), jnp.asarray(maskp))),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask))),
        np.asarray(masked_max(jnp.asarray(xp), jnp.asarray(maskp))),
        rtol=1e-6)


def test_window_max_pool_custom_vjp_matches_xla(rng):
    """The argmax-scatter VJP must match jnp.max's tie-splitting VJP
    everywhere except exact ties, and per-window cotangent SUMS must
    match even on ties (so parameter gradients through duplicated
    points are unchanged — see window_max_pool's docstring)."""
    import jax

    b, n, c, w = 3, 32, 7, 4
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = rng.random((b, n)) > 0.2
    mask[0, 8:12] = False          # fully-invalid window
    x[1, 4] = x[1, 5] = x[1, 6]    # duplicated points -> real ties
    xt, mt = jnp.asarray(x), jnp.asarray(mask)
    wvec = jnp.arange(c, dtype=jnp.float32) + 1.0

    def ref_pool(f):
        fr = f.reshape(b, n // w, w, c)
        mr = mt.reshape(b, n // w, w)
        filled = jnp.where(mr[..., None], fr, -jnp.inf)
        pooled = jnp.max(filled, axis=2)
        wm = jnp.any(mr, axis=2)
        return jnp.where(wm[..., None], pooled, jnp.zeros_like(pooled))

    def loss(pool_fn, f):
        p = pool_fn(f)
        return jnp.sum(p * p * wvec)

    g_new = jax.jit(jax.grad(
        lambda f: loss(lambda a: window_max_pool(a, mt, w)[0], f)))(xt)
    g_old = jax.jit(jax.grad(lambda f: loss(ref_pool, f)))(xt)
    gn, go = np.asarray(g_new), np.asarray(g_old)
    # per-window sums always equal
    np.testing.assert_allclose(
        gn.reshape(b, n // w, w, c).sum(2),
        go.reshape(b, n // w, w, c).sum(2), atol=1e-5)
    # element-wise equal off the tied rows
    tied = np.zeros((b, n), bool)
    tied[1, 4:8] = True
    np.testing.assert_allclose(gn[~tied], go[~tied], atol=1e-6)
    # no gradient leaks into invalid windows' rows
    assert np.abs(gn[0, 8:12]).max() == 0.0
