"""End-to-end integration on synthetic data: overfit convergence,
checkpoint round-trip, loader->step wiring.  Uses a small model so the
whole file runs in well under a minute on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wireframe_tpu.config import Config
from wireframe_tpu.data.building3d import Building3DDataset, collate_fixed
from wireframe_tpu.data.loader import BatchLoader
from wireframe_tpu.io.obj import save_wireframe
from wireframe_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from wireframe_tpu.train.state import create_train_state
from wireframe_tpu.train.step import make_forward_fn, make_train_step

from conftest import make_synthetic_sample


def small_cfg():
    cfg = Config()
    cfg.data.num_points = 128
    cfg.data.max_vertices = 12
    cfg.model.encoder_hidden_dims = (64, 128)
    cfg.model.encoder_output_dim = 64
    cfg.model.edge_hidden_dim = 64
    cfg.model.edge_num_heads = 4
    cfg.train.device_augment = False
    cfg.__post_init__()
    return cfg


@pytest.fixture
def corpus(tmp_path, rng):
    root = tmp_path / "data"
    for split, n in (("train", 4), ("test", 2)):
        (root / split / "xyz").mkdir(parents=True)
        (root / split / "wireframe").mkdir(parents=True)
        for i in range(n):
            pc, verts, edges = make_synthetic_sample(
                rng, n_points=200, n_verts=6)
            np.savetxt(str(root / split / "xyz" / f"{i}.xyz"), pc)
            save_wireframe(verts, edges,
                           str(root / split / "wireframe" / f"{i}.obj"))
    return str(root)


@pytest.mark.slow
def test_logged_lr_tracks_schedule(corpus):
    """The metric log's learning_rate must follow the live warmup_cosine
    schedule, not the config constant (the reference logs the optimizer's
    actual param-group LR, train.py:176)."""
    from wireframe_tpu.train.loop import train_model
    from wireframe_tpu.train.state import make_lr_schedule

    cfg = small_cfg()
    cfg.data.root_dir = corpus
    cfg.data.augment = False
    cfg.train.overfit_one_batch = True
    cfg.train.num_epochs = 4
    cfg.train.log_every = 1
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.warmup_steps = 2

    class Capture:
        rows = []

        def log(self, metrics):
            self.rows.append(dict(metrics))

    writer = Capture()
    train_model(cfg, BatchLoader(ds := Building3DDataset(cfg.data, "train"),
                                 2, cfg.model.max_vertices, seed=0,
                                 augment_on_host=False, prefetch=0),
                metric_writer=writer)
    logged = [r["learning_rate"] for r in writer.rows]
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    expect = [float(sched(s)) for s in range(4)]
    np.testing.assert_allclose(logged, expect, rtol=1e-6)
    assert len(set(logged)) > 1  # warmup then decay: must not be constant


def test_overfit_loss_decreases(corpus):
    cfg = small_cfg()
    cfg.data.root_dir = corpus
    cfg.data.augment = False
    ds = Building3DDataset(cfg.data, "train")
    loader = BatchLoader(ds, 2, cfg.model.max_vertices, seed=0,
                         augment_on_host=False, prefetch=0)
    batch = next(iter(loader))
    db = {k: jnp.asarray(batch[k]) for k in (
        "point_clouds", "target_vertices", "vertex_existence",
        "vertex_counts", "edge_labels")}

    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               db["point_clouds"].shape)
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, m = step(state, db, k)
        losses.append(float(m["total_loss"]))
    # Overfit on a fixed batch must cut the loss at least in half.
    assert min(losses[-10:]) < 0.5 * losses[0], losses[::10]
    assert np.isfinite(losses).all()


def test_checkpoint_round_trip(tmp_path, corpus):
    cfg = small_cfg()
    cfg.data.root_dir = corpus
    state = create_train_state(cfg, jax.random.PRNGKey(0), (1, 128, 8))
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, 7, state.params, state.opt_state, cfg)
    payload, meta = load_checkpoint(ckdir)
    assert meta["step"] == 7
    assert meta["max_vertices"] == cfg.model.max_vertices
    # params identical
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(payload["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored params produce identical forward outputs
    fwd = make_forward_fn(cfg, train=False)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 128, 8)).astype(np.float32))
    out_a = fwd(state.params, x, None)
    out_b = fwd(payload["params"], x, None)
    np.testing.assert_allclose(np.asarray(out_a["vertices"]),
                               np.asarray(out_b["vertices"]), rtol=1e-6)


@pytest.mark.slow
def test_ema_params_track_weights(rng):
    """train.ema_decay maintains an exponential moving average of the
    params inside the jitted step (variance lever, r2 VERDICT weak #1)."""
    from wireframe_tpu.utils.synth import make_random_batch

    cfg = small_cfg()
    cfg.data.num_points = 64
    cfg.data.max_vertices = 8
    cfg.train.ema_decay = 0.9
    cfg.__post_init__()
    b, n, d = 2, 64, 8
    batch = {k: jnp.asarray(a) for k, a in
             make_random_batch(cfg, b, seed=7, edge_density=0.2).items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), (b, n, d))
    assert state.ema_params is not None
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    step = jax.jit(make_train_step(cfg))
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    want = jax.tree_util.tree_map(lambda a, c: 0.9 * a + 0.1 * c,
                                  p0, s1.params)
    for a, c in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(s1.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-7)
    # decay 0 (default) keeps the state EMA-free
    cfg2 = small_cfg()
    assert create_train_state(
        cfg2, jax.random.PRNGKey(0), (1, 128, 8)).ema_params is None


@pytest.mark.slow
def test_full_epoch_loop_runs(corpus):
    """Non-overfit mode: iterate real shuffled epochs through the loader.

    Also exercises parallel.dp=-1 auto-resolution against the LOADER's
    batch size (2): the mesh resolves to dp=2 on the 8 virtual devices
    and the loop shards every batch (the r3 bug was resolving against
    cfg.train.batch_size=3 instead)."""
    from wireframe_tpu.train.loop import train_model

    cfg = small_cfg()
    cfg.data.root_dir = corpus
    cfg.data.augment = True
    cfg.train.overfit_one_batch = False
    cfg.train.device_augment = True
    cfg.train.num_epochs = 2
    cfg.train.log_every = 1
    ds = Building3DDataset(cfg.data, "train")
    loader = BatchLoader(ds, 2, cfg.model.max_vertices, seed=0,
                         augment_on_host=False)
    state = train_model(cfg, loader)
    assert int(state.step) == 4  # 2 epochs x 2 batches


@pytest.mark.slow
def test_flatten_optimizer_same_trajectory(rng):
    """train.flatten_optimizer runs the optimizer on one concatenated
    vector — updates must match the per-leaf chain to fp tolerance."""
    import jax

    from wireframe_tpu.config import Config
    from wireframe_tpu.ops.pairs import num_pairs
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    def build(flatten):
        cfg = Config()
        cfg.data.num_points = 64
        cfg.data.max_vertices = 8
        cfg.model.use_pallas_encoder = False
        cfg.train.device_augment = False
        cfg.train.flatten_optimizer = flatten
        cfg.__post_init__()
        return cfg

    cfg = build(False)
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
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
            losses.append(float(m["total_loss"]))
        return losses

    np.testing.assert_allclose(run(build(False)), run(build(True)),
                               rtol=1e-5, atol=1e-6)
