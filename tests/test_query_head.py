"""Query-based vertex decoder, existence slot-mask mode, matched
existence labels, and the LR schedule (the round-2 anti-collapse stack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wireframe_tpu.config import Config
from wireframe_tpu.losses.wireframe_loss import (
    WireframeLossConfig,
    wireframe_loss,
)
from wireframe_tpu.models.wireframe import PointCloudToWireframe
from wireframe_tpu.ops.pairs import (
    num_pairs,
    pairs_from_slot_mask,
    triu_pairs_np,
)


def small_query_cfg(v=8, n=64):
    cfg = Config()
    cfg.data.num_points = n
    cfg.data.max_vertices = v
    cfg.model.encoder_hidden_dims = (32,)
    cfg.model.encoder_output_dim = 32
    cfg.model.edge_hidden_dim = 32
    cfg.model.edge_num_heads = 2
    cfg.model.vertex_head = "query"
    cfg.model.decoder_dim = 32
    cfg.model.decoder_layers = 2
    cfg.model.decoder_heads = 2
    cfg.model.decoder_ffn_dim = 64
    cfg.model.edge_use_slot_features = True
    cfg.model.slot_mask_mode = "existence"
    cfg.__post_init__()
    return cfg


def init_model(cfg, b=2):
    model = PointCloudToWireframe(cfg.model)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, cfg.data.num_points, cfg.model.input_dim)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, None,
                        train=False)["params"]
    return model, params, x


def test_query_head_forward_shapes_and_masks():
    cfg = small_query_cfg()
    v, e = cfg.model.max_vertices, num_pairs(cfg.model.max_vertices)
    model, params, x = init_model(cfg)
    out = model.apply({"params": params}, x, None, train=False)
    b = x.shape[0]
    assert out["vertices"].shape == (b, v, 3)
    assert out["existence_probabilities"].shape == (b, v)
    assert out["edge_probs"].shape == (b, e)
    assert out["slot_mask"].shape == (b, v)
    for k in ("vertices", "existence_probabilities", "edge_probs"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # Existence mode: slot mask IS the thresholded existence, pair mask
    # requires both endpoints live, probs zeroed outside it.
    live = np.asarray(out["existence_probabilities"]) > 0.5
    np.testing.assert_array_equal(np.asarray(out["slot_mask"]), live)
    pairs = triu_pairs_np(v)
    want_pair = live[:, pairs[:, 0]] & live[:, pairs[:, 1]]
    np.testing.assert_array_equal(np.asarray(out["pair_mask"]), want_pair)
    probs = np.asarray(out["edge_probs"])
    assert (probs[~want_pair] == 0).all()


def test_query_head_is_input_sensitive():
    """The collapse probe: different clouds MUST map to different vertex
    sets through the cross-attention path (QUALITY.md §3)."""
    cfg = small_query_cfg()
    model, params, x = init_model(cfg, b=2)
    out = model.apply({"params": params}, x, None, train=False)
    va, vb = np.asarray(out["vertices"][0]), np.asarray(out["vertices"][1])
    assert not np.allclose(va, vb, atol=1e-4)


@pytest.mark.slow
def test_query_head_padding_invariance():
    """Zero-padding points must not change predictions (cross-attention
    key mask correctness)."""
    cfg = small_query_cfg(n=64)
    model, params, _ = init_model(cfg)
    rng = np.random.default_rng(3)
    real = rng.normal(size=(1, 48, cfg.model.input_dim)).astype(np.float32)
    short = np.concatenate(
        [real, np.zeros((1, 16, cfg.model.input_dim), np.float32)], axis=1)
    long_pad = np.concatenate(
        [real, np.zeros((1, 80, cfg.model.input_dim), np.float32)], axis=1)
    out_a = model.apply({"params": params}, jnp.asarray(short), None,
                        train=False)
    out_b = model.apply({"params": params}, jnp.asarray(long_pad), None,
                        train=False)
    np.testing.assert_allclose(np.asarray(out_a["vertices"]),
                               np.asarray(out_b["vertices"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_a["existence_probabilities"]),
        np.asarray(out_b["existence_probabilities"]),
        rtol=2e-4, atol=2e-5)


def test_matched_existence_labels_follow_the_matching():
    """Perfect predictions under a non-identity slot permutation: matched
    existence labels give ~zero loss where positional labels penalize."""
    b, v = 1, 6
    count = 3
    rng = np.random.default_rng(0)
    tgt = np.zeros((b, v, 3), np.float32)
    tgt[0, :count] = rng.normal(size=(count, 3))
    # Predictions occupy slots 2,4,5 (scattered), matching targets 0,1,2.
    slot_of_target = [2, 4, 5]
    pred_v = np.zeros((b, v, 3), np.float32)
    exist_logits = np.full((b, v), -10.0, np.float32)
    for t, s in enumerate(slot_of_target):
        pred_v[0, s] = tgt[0, t]
        exist_logits[0, s] = 10.0
    preds = {
        "vertices": jnp.asarray(pred_v),
        "existence_logits": jnp.asarray(exist_logits),
        "existence_probabilities": jax.nn.sigmoid(jnp.asarray(exist_logits)),
        "edge_logits": jnp.full((b, num_pairs(v)), -10.0, jnp.float32),
        "pair_mask": jnp.ones((b, num_pairs(v)), bool),
    }
    targets = {
        "vertices": jnp.asarray(tgt),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None] < count).astype(np.float32)),
        "edge_labels": jnp.zeros((b, num_pairs(v)), jnp.float32),
        "vertex_counts": jnp.asarray([count], jnp.int32),
    }
    matched = wireframe_loss(
        preds, targets,
        WireframeLossConfig(matched_existence_labels=True))
    positional = wireframe_loss(
        preds, targets,
        WireframeLossConfig(matched_existence_labels=False))
    assert float(matched["existence_loss"]) < 1e-3
    assert float(positional["existence_loss"]) > 1.0
    assert float(matched["vertex_loss"]) < 1e-6


@pytest.mark.slow
def test_train_step_query_head_grads_flow():
    cfg = small_query_cfg()
    cfg.train.matched_edge_labels = True
    cfg.train.matched_existence_labels = True
    cfg.train.batch_size = 2
    cfg.train.device_augment = False
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               (2, cfg.data.num_points, 8))
    assert "vertex_decoder" in state.params  # query head selected
    v, e = cfg.model.max_vertices, num_pairs(cfg.model.max_vertices)
    r = np.random.default_rng(0)
    counts = np.array([3, 5], np.int32)
    batch = {
        "point_clouds": jnp.asarray(
            r.normal(size=(2, cfg.data.num_points, 8)), jnp.float32),
        "target_vertices": jnp.asarray(
            r.normal(size=(2, v, 3))
            * (np.arange(v)[None, :, None] < counts[:, None, None]),
            jnp.float32),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None] < counts[:, None]).astype(np.float32)),
        "vertex_counts": jnp.asarray(counts),
        "edge_labels": jnp.asarray(
            (r.random((2, e)) < 0.2).astype(np.float32)),
    }
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # Slot queries must receive gradient (params changed).
    before = np.asarray(state.params["vertex_decoder"]["slot_queries"])
    after = np.asarray(new_state.params["vertex_decoder"]["slot_queries"])
    assert not np.allclose(before, after)


@pytest.mark.slow
def test_decoder_remat_gradients_identical():
    """model.decoder_remat=True recomputes each decoder block in the
    backward instead of stashing activations; gradients must be
    numerically identical to the non-remat path."""
    cfg = small_query_cfg()
    model, params, x = init_model(cfg)
    cfg_r = small_query_cfg()
    cfg_r.model.decoder_remat = True
    model_r = PointCloudToWireframe(cfg_r.model)

    def scalar(m, p):
        out = m.apply({"params": p}, x, None, train=False)
        return (jnp.sum(out["vertices"] ** 2)
                + jnp.sum(out["existence_probabilities"])
                + jnp.sum(out["edge_probs"]))

    base, g_base = jax.value_and_grad(
        lambda p: scalar(model, p))(params)
    rem, g_rem = jax.value_and_grad(
        lambda p: scalar(model_r, p))(params)
    np.testing.assert_allclose(float(base), float(rem), rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves(g_base)
    flat_b = jax.tree_util.tree_leaves(g_rem)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_decoder_kv_pool_forward_and_grads():
    """model.decoder_kv_pool=w pools the decoder KV axis w-fold; the
    model must stay finite, input-sensitive, and padding-invariant, and
    gradients must reach the slot queries through the pooled path."""
    cfg = small_query_cfg(n=64)
    cfg.model.decoder_kv_pool = 4
    model, params, x = init_model(cfg)
    out = model.apply({"params": params}, x, None, train=False)
    for k in ("vertices", "existence_probabilities", "edge_probs"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    va, vb = np.asarray(out["vertices"][0]), np.asarray(out["vertices"][1])
    assert not np.allclose(va, vb, atol=1e-4)

    # Padding invariance: extra zero points only add invalid windows.
    rng = np.random.default_rng(5)
    real = rng.normal(size=(1, 48, cfg.model.input_dim)).astype(np.float32)
    short = np.concatenate(
        [real, np.zeros((1, 16, cfg.model.input_dim), np.float32)], axis=1)
    long_pad = np.concatenate(
        [real, np.zeros((1, 80, cfg.model.input_dim), np.float32)], axis=1)
    out_a = model.apply({"params": params}, jnp.asarray(short), None,
                        train=False)
    out_b = model.apply({"params": params}, jnp.asarray(long_pad), None,
                        train=False)
    np.testing.assert_allclose(np.asarray(out_a["vertices"]),
                               np.asarray(out_b["vertices"]),
                               rtol=2e-4, atol=2e-5)

    def scalar(p):
        o = model.apply({"params": p}, x, None, train=False)
        return jnp.sum(o["vertices"] ** 2) + jnp.sum(o["edge_probs"])

    g = jax.grad(scalar)(params)
    gq = np.asarray(g["vertex_decoder"]["slot_queries"])
    assert np.isfinite(gq).all() and np.abs(gq).max() > 0


def test_lr_schedule_warmup_cosine():
    from wireframe_tpu.train.state import make_lr_schedule

    cfg = Config()
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.learning_rate = 1e-3
    cfg.train.warmup_steps = 10
    cfg.train.num_epochs = 100
    cfg.train.lr_min_ratio = 0.01
    sched = make_lr_schedule(cfg, steps_per_epoch=2)  # total 200 steps
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(100)) < 1e-3
    np.testing.assert_allclose(float(sched(200)), 1e-5, rtol=1e-2)
    # Constant mode stays a plain float (reference parity).
    cfg.train.lr_schedule = "constant"
    assert make_lr_schedule(cfg) == 1e-3


def test_pairs_from_slot_mask_decode():
    v = 5
    live = np.array([True, False, True, True, False])
    probs = np.zeros(num_pairs(v), np.float32)
    pairs = triu_pairs_np(v)
    # High prob on (0,2) [both live], (0,1) [1 dead], (2,3) [both live].
    for a, b in [(0, 2), (0, 1), (2, 3)]:
        probs[np.nonzero((pairs[:, 0] == a) & (pairs[:, 1] == b))[0]] = 0.9
    got = pairs_from_slot_mask(probs, live, v, 0.5)
    np.testing.assert_array_equal(got, [[0, 2], [2, 3]])


@pytest.mark.slow
def test_edge_dist_gradient_finite_on_coincident_vertices():
    """Two identical predicted vertices: the pair-distance gradient must
    stay finite (bare jnp.linalg.norm gives NaN at 0, which poisoned
    whole-model grads under bfloat16 rounding)."""
    from wireframe_tpu.models.edge_head import EdgePredictor

    v = 6
    head = EdgePredictor(hidden_dim=32, num_heads=2, max_vertices=v)
    verts = np.zeros((1, v, 3), np.float32)
    verts[0, :, 0] = [0.0, 0.0, 1.0, 2.0, 3.0, 4.0]  # slots 0,1 coincide
    mask = jnp.ones((1, v), bool)
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(verts), mask)

    def loss(vv):
        probs, logits, _ = head.apply(params, vv, mask)
        return jnp.sum(logits)

    g = jax.grad(loss)(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()


def test_host_z_sort_matches_device_sort(rng):
    """DataConfig.z_sort_points: feeding host-z-sorted points with
    model.points_z_sorted=True must equal the in-graph sort path on the
    same unsorted cloud (the model is permutation-invariant everywhere
    except the KV windows, which see identical rows either way)."""
    import jax

    from wireframe_tpu.config import Config

    def build(points_z_sorted):
        cfg = Config()
        cfg.data.num_points = 64
        cfg.data.max_vertices = 8
        cfg.model.vertex_head = "query"
        cfg.model.decoder_kv_pool = 4
        cfg.model.decoder_dim = 64
        cfg.model.decoder_layers = 2
        cfg.model.decoder_ffn_dim = 128
        cfg.model.use_pallas_encoder = False
        cfg.__post_init__()
        cfg.model.points_z_sorted = points_z_sorted
        return PointCloudToWireframe(cfg.model), cfg

    b, n, d = 2, 64, 8
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    x[0, 56:] = 0.0  # padding rows must stay last under both sorts
    x_sorted = x.copy()
    for i in range(b):
        zkey = np.where(np.abs(x[i].sum(-1)) > 1e-9, x[i][:, 2], np.inf)
        x_sorted[i] = x[i][np.argsort(zkey, kind="stable")]

    model_dev, _ = build(False)
    params = model_dev.init({"params": jax.random.PRNGKey(0)},
                            jnp.asarray(x), None, train=False)["params"]
    out_dev = model_dev.apply({"params": params}, jnp.asarray(x), None,
                              train=False)
    model_host, _ = build(True)
    out_host = model_host.apply({"params": params}, jnp.asarray(x_sorted),
                                None, train=False)

    np.testing.assert_allclose(np.asarray(out_dev["vertices"]),
                               np.asarray(out_host["vertices"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dev["edge_probs"]),
                               np.asarray(out_host["edge_probs"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_cross_kv_matches_per_layer_layout():
    """model.decoder_fused_cross_kv batches all layers' cross K/V into
    one matmul pair.  Same function class: transplanting the per-layer
    kernels into the fused layout must reproduce the forward outputs
    (f32, so the softmax dtype is identical too)."""
    import copy

    cfg = small_query_cfg()
    model, params, x = init_model(cfg)
    base = model.apply({"params": params}, x, None, train=False)

    fcfg = copy.deepcopy(cfg)
    fcfg.model.decoder_fused_cross_kv = True
    fmodel = PointCloudToWireframe(fcfg.model)
    fparams = fmodel.init({"params": jax.random.PRNGKey(1)}, x, None,
                          train=False)["params"]

    # Transplant: per-layer cross_attn {query,key,value,out} -> fused
    # layout {cross_q, cross_k_all, cross_v_all, cross_out}.
    fparams = jax.tree_util.tree_map(lambda a: a, fparams)  # mutable copy
    dec_b = params["vertex_decoder"]
    dec_f = fparams["vertex_decoder"]
    L = cfg.model.decoder_layers
    k_kernel = np.stack([np.asarray(
        dec_b[f"block{i}"]["cross_attn"]["key"]["kernel"])
        for i in range(L)], axis=1)            # (D, L, H, hd)
    v_kernel = np.stack([np.asarray(
        dec_b[f"block{i}"]["cross_attn"]["value"]["kernel"])
        for i in range(L)], axis=1)
    k_bias = np.stack([np.asarray(
        dec_b[f"block{i}"]["cross_attn"]["key"]["bias"])
        for i in range(L)])                    # (L, H, hd)
    v_bias = np.stack([np.asarray(
        dec_b[f"block{i}"]["cross_attn"]["value"]["bias"])
        for i in range(L)])
    dec_f["cross_k_all"] = {"kernel": jnp.asarray(k_kernel),
                            "bias": jnp.asarray(k_bias)}
    dec_f["cross_v_all"] = {"kernel": jnp.asarray(v_kernel),
                            "bias": jnp.asarray(v_bias)}
    for i in range(L):
        src = dec_b[f"block{i}"]
        dst = dec_f[f"block{i}"]
        dst["cross_q"] = src["cross_attn"]["query"]
        dst["cross_out"] = src["cross_attn"]["out"]
        for shared in ("self_attn", "ln_self", "ln_cross", "ln_ffn",
                       "ffn_in", "ffn_out"):
            dst[shared] = src[shared]
    for shared in ("point_proj", "point_ln", "slot_queries", "global_proj",
                   "out_ln", "coord_head", "exist_head"):
        if shared in dec_b:
            dec_f[shared] = dec_b[shared]
    for top in params:
        if top != "vertex_decoder":
            fparams[top] = params[top]

    fused = fmodel.apply({"params": fparams}, x, None, train=False)
    for key in ("vertices", "existence_probabilities", "edge_probs"):
        np.testing.assert_allclose(np.asarray(fused[key]),
                                   np.asarray(base[key]),
                                   rtol=2e-5, atol=2e-5)


def test_fused_cross_kv_applies_attention_dropout():
    """The fused cross-attention branch must keep the flax path's
    attention-weight dropout (the fused layout is a perf lever, not a
    silent regularization change).  Captured intermediates of the named
    cross_drop module prove weights are actually dropped in train mode
    and untouched in eval."""
    cfg = small_query_cfg()
    cfg.model.decoder_fused_cross_kv = True
    cfg.model.decoder_dropout = 0.5
    model, params, x = init_model(cfg)

    is_cross_drop = lambda mdl, _name: mdl.name == "cross_drop"
    _, state = model.apply({"params": params}, x, None, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           capture_intermediates=is_cross_drop)
    vals = [np.asarray(v) for v in
            jax.tree_util.tree_leaves(state["intermediates"])]
    assert len(vals) == cfg.model.decoder_layers
    # Rate-0.5 dropout zeroes ~half the attention weights (softmax
    # weights are almost surely nonzero before the mask).
    frac_zero = np.mean([np.mean(v == 0.0) for v in vals])
    assert 0.3 < frac_zero < 0.7, frac_zero
    # Eval mode: the weights pass through untouched (rows still sum to 1).
    _, state = model.apply({"params": params}, x, None, train=False,
                           capture_intermediates=is_cross_drop)
    for v in jax.tree_util.tree_leaves(state["intermediates"]):
        np.testing.assert_allclose(np.asarray(v).sum(-1), 1.0, rtol=1e-3)


def test_decoder_scan_matches_unrolled_layout():
    """model.decoder_scan rolls the layer stack into one nn.scan'ed
    block with stacked (L, ...) params.  Same per-layer math:
    transplanting the unrolled blocks (stacked on axis 0) into the scan
    layout must reproduce the forward outputs exactly (f32)."""
    import copy

    cfg = small_query_cfg()
    model, params, x = init_model(cfg)
    base = model.apply({"params": params}, x, None, train=False)

    scfg = copy.deepcopy(cfg)
    scfg.model.decoder_scan = True
    smodel = PointCloudToWireframe(scfg.model)
    sparams = smodel.init({"params": jax.random.PRNGKey(1)}, x, None,
                          train=False)["params"]

    dec_b = params["vertex_decoder"]
    dec_s = sparams["vertex_decoder"]
    L = cfg.model.decoder_layers
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *[dec_b[f"block{i}"] for i in range(L)])
    # Scan layout sanity: every leaf gained a leading layer axis.
    ref_shapes = jax.tree_util.tree_map(jnp.shape, dec_s["blocks"]["block"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, stacked)
    assert ref_shapes == got_shapes
    dec_s["blocks"] = {"block": stacked}
    for shared in dec_b:
        if not shared.startswith("block"):
            dec_s[shared] = dec_b[shared]
    for top in params:
        if top != "vertex_decoder":
            sparams[top] = params[top]

    out = smodel.apply({"params": sparams}, x, None, train=False)
    for key in ("vertices", "existence_probabilities", "edge_probs"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(base[key]),
                                   rtol=2e-5, atol=2e-5)


def test_decoder_scan_train_step_grads_flow():
    """The scanned decoder trains: one jitted step produces finite loss
    and updates the stacked block params (and composes with
    decoder_remat)."""
    cfg = small_query_cfg()
    cfg.model.decoder_scan = True
    cfg.model.decoder_remat = True
    cfg.train.batch_size = 2
    cfg.train.device_augment = False
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               (2, cfg.data.num_points, 8))
    blocks = state.params["vertex_decoder"]["blocks"]["block"]
    L = cfg.model.decoder_layers
    assert all(a.shape[0] == L for a in jax.tree_util.tree_leaves(blocks))
    v, e = cfg.model.max_vertices, num_pairs(cfg.model.max_vertices)
    r = np.random.default_rng(0)
    counts = np.array([3, 5], np.int32)
    batch = {
        "point_clouds": jnp.asarray(
            r.normal(size=(2, cfg.data.num_points, 8)), jnp.float32),
        "target_vertices": jnp.asarray(
            r.normal(size=(2, v, 3))
            * (np.arange(v)[None, :, None] < counts[:, None, None]),
            jnp.float32),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None] < counts[:, None]).astype(np.float32)),
        "vertex_counts": jnp.asarray(counts),
        "edge_labels": jnp.asarray(
            (r.random((2, e)) < 0.2).astype(np.float32)),
    }
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    before = jax.tree_util.tree_leaves(blocks)
    after = jax.tree_util.tree_leaves(
        new_state.params["vertex_decoder"]["blocks"]["block"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a))
               for b, a in zip(before, after))
