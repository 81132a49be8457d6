"""Checkpoint / deterministic-resume behavior of the training loop."""

import numpy as np
import jax
import pytest

from wireframe_tpu.config import Config
from wireframe_tpu.data.building3d import Building3DDataset
from wireframe_tpu.data.loader import BatchLoader
from wireframe_tpu.io.obj import save_wireframe
from wireframe_tpu.train.checkpoint import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
    warm_start_params,
)
from wireframe_tpu.train.loop import train_model
from wireframe_tpu.train.state import create_train_state

from conftest import make_synthetic_sample


@pytest.fixture
def corpus(tmp_path, rng):
    root = tmp_path / "data"
    (root / "train" / "xyz").mkdir(parents=True)
    (root / "train" / "wireframe").mkdir(parents=True)
    for i in range(4):
        pc, verts, edges = make_synthetic_sample(rng, n_points=150, n_verts=5)
        np.savetxt(str(root / "train" / "xyz" / f"{i}.xyz"), pc)
        save_wireframe(verts, edges,
                       str(root / "train" / "wireframe" / f"{i}.obj"))
    return str(root)


def small_cfg(corpus, ckdir):
    cfg = Config()
    cfg.data.root_dir = corpus
    cfg.data.num_points = 128
    cfg.data.max_vertices = 10
    cfg.data.augment = False
    cfg.model.encoder_hidden_dims = (32,)
    cfg.model.encoder_output_dim = 32
    cfg.model.edge_hidden_dim = 32
    cfg.model.edge_num_heads = 2
    cfg.train.device_augment = False
    # Single-device: resume determinism is what's under test here (the
    # auto-mesh path has its own coverage in test_sharding.py).
    cfg.parallel.dp = 1
    cfg.train.num_epochs = 6
    cfg.train.log_every = 2
    cfg.train.checkpoint_every = 3
    cfg.train.checkpoint_dir = ckdir
    # Full-corpus mode: 4 samples / batch 2 -> 2 optimizer steps per
    # epoch, so epoch and step units DIFFER — the regime where resume
    # must read meta['epoch'], not meta['step'] (ADVICE r1, main.py:116).
    cfg.train.overfit_one_batch = False
    cfg.__post_init__()
    return cfg


@pytest.mark.slow
def test_periodic_checkpoint_and_resume(tmp_path, corpus):
    """One training run covers both: the mid-run checkpoint is written,
    and a second run restored from it continues (single compile budget
    shared across the two assertions)."""
    ckdir = str(tmp_path / "ck")
    cfg = small_cfg(corpus, ckdir)
    ds = Building3DDataset(cfg.data, "train")
    loader = BatchLoader(ds, 2, cfg.model.max_vertices, seed=0,
                         augment_on_host=False, prefetch=0)
    state = train_model(cfg, loader)
    # checkpoint_every=3 with 6 epochs -> one mid-run checkpoint after
    # epoch 3, i.e. optimizer step 6 (2 batches/epoch).  Directory names
    # use the optimizer step (monotonic across mid-run + final saves);
    # the completed-epoch count rides in metadata.
    assert latest_step(ckdir) == 6
    assert int(state.step) == 12  # 6 epochs x 2 batches

    template = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed),
                                  (2, 128, 8))
    # The template restores optax NamedTuple structure (orbax would
    # otherwise return plain dicts that Adam can't consume).
    payload, meta = load_checkpoint(
        ckdir, 6, template={"params": template.params,
                            "opt_state": template.opt_state})
    assert meta["step"] == 6 and meta["epoch"] == 3
    # main.py's resume rule: completed epochs from meta['epoch'].
    start_epoch = int(meta.get("epoch", meta.get("step", 0)))
    assert start_epoch == 3
    resumed = template.replace(params=payload["params"],
                               opt_state=payload["opt_state"])
    # Continue from epoch 3 for the remaining 3 epochs.
    final = train_model(cfg, loader, state=resumed, start_epoch=start_epoch)
    # Both runs completed 6 total epochs of updates; parameters stay
    # finite and the resumed state is not the initial one.
    a = jax.tree_util.tree_leaves(final.params)
    b = jax.tree_util.tree_leaves(template.params)
    assert any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
    for x in a:
        assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_warm_start_params(tmp_path, corpus):
    """TrainConfig.init_from semantics: params come from the checkpoint,
    optimizer state and step stay fresh, EMA re-seeds from the loaded
    weights, and an architecture mismatch raises instead of corrupting."""
    ckdir = str(tmp_path / "pre_ck")
    cfg = small_cfg(corpus, ckdir)
    cfg.train.ema_decay = 0.999
    cfg.__post_init__()
    template = create_train_state(cfg, jax.random.PRNGKey(0), (2, 128, 8))
    # Fake a "pretrained" checkpoint: perturbed copies of the init.
    pre_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 0.25, template.params)
    save_checkpoint(ckdir, 7, pre_params, template.opt_state, cfg)

    fresh = create_train_state(cfg, jax.random.PRNGKey(1), (2, 128, 8))
    warmed = warm_start_params(fresh, ckdir)
    got = jax.tree_util.tree_leaves(warmed.params)
    want = jax.tree_util.tree_leaves(pre_params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))
    assert int(warmed.step) == 0                      # fresh step counter
    # Fresh optimizer state (Adam moments all zero).
    for leaf in jax.tree_util.tree_leaves(warmed.opt_state):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and arr.ndim > 0:
            assert np.all(arr == 0)
    # EMA re-seeded from the warm-start weights.
    for g, w in zip(jax.tree_util.tree_leaves(warmed.ema_params), want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))

    # Architecture mismatch fails loudly.
    cfg2 = small_cfg(corpus, ckdir)
    cfg2.model.encoder_hidden_dims = (48,)
    cfg2.__post_init__()
    other = create_train_state(cfg2, jax.random.PRNGKey(0), (2, 128, 8))
    with pytest.raises(Exception):
        warm_start_params(other, ckdir)
