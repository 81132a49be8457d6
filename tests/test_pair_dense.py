"""PairDense (distributive layer-1 edge Dense) vs explicit concat+Dense.

The decomposition W @ [f_i ‖ f_j ‖ x_i ‖ x_j ‖ d] = (fW1+xW3)[i] +
(fW2+xW4)[j] + d w5 + b must reproduce nn.Dense over the materialized
concatenation exactly (modulo float reassociation) for the SAME kernel
params — this is what keeps reference-checkpoint transplantation valid.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wireframe_tpu.models.edge_head import EdgePredictor, PairDense
from wireframe_tpu.ops.pairs import triu_pairs


def test_pair_dense_matches_concat_dense(rng):
    b, v, h, feat = 2, 16, 32, 24
    f = jnp.asarray(rng.normal(size=(b, v, h)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, v, 3)).astype(np.float32))
    pairs = triu_pairs(v)
    i_idx, j_idx = pairs[:, 0], pairs[:, 1]
    c1, c2 = x[:, i_idx], x[:, j_idx]
    dist = jnp.sqrt(jnp.sum(jnp.square(c1 - c2), -1, keepdims=True) + 1e-12)

    mod = PairDense(feat, dtype=jnp.float32)
    params = mod.init({"params": jax.random.PRNGKey(0)},
                      f, x, dist, i_idx, j_idx)["params"]
    got = mod.apply({"params": params}, f, x, dist, i_idx, j_idx)

    concat = jnp.concatenate(
        [f[:, i_idx], f[:, j_idx], c1, c2, dist], axis=-1)  # (B, E, 2h+7)
    want = jnp.dot(concat, params["kernel"]) + params["bias"]

    assert params["kernel"].shape == (2 * h + 7, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_edge_predictor_param_tree_unchanged(rng):
    """The PairDense refactor must keep the exact param tree the torch
    transplant targets: Dense_2..Dense_5 + LayerNorm_2, LayerNorm_3."""
    v = 8
    mod = EdgePredictor(max_vertices=v, hidden_dim=32, num_heads=4)
    verts = jnp.asarray(rng.normal(size=(2, v, 3)).astype(np.float32))
    mask = jnp.ones((2, v), bool)
    params = mod.init({"params": jax.random.PRNGKey(0)}, verts, mask)["params"]
    for name in ("Dense_0", "Dense_1", "Dense_2", "Dense_3", "Dense_4",
                 "Dense_5", "LayerNorm_0", "LayerNorm_1", "LayerNorm_2",
                 "LayerNorm_3", "attention"):
        assert name in params, sorted(params)
    assert params["Dense_2"]["kernel"].shape == (2 * 32 + 7, 32)
