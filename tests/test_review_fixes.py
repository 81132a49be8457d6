"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wireframe_tpu.config import load_config
from wireframe_tpu.data.loader import BatchLoader


class _BoomDataset:
    """Dataset whose Nth sample raises (corrupt-file stand-in)."""

    def __init__(self, n, boom_at):
        self.n, self.boom_at = n, boom_at

    def __len__(self):
        return self.n

    def get_sample(self, i, rng=None, augment_on_host=None):
        if i == self.boom_at:
            raise OSError(f"corrupt file at index {i}")
        return {
            "point_clouds": np.zeros((16, 8), np.float32),
            "wf_vertices": np.zeros((3, 3), np.float32),
            "wf_edges": np.zeros((1, 2), np.int64),
            "wf_edges_vertices": np.zeros((1, 6), np.float32),
            "centroid": np.zeros(3),
            "max_distance": 1.0,
            "scan_idx": i,
        }


def test_loader_propagates_worker_exception():
    ds = _BoomDataset(6, boom_at=3)
    loader = BatchLoader(ds, 2, max_vertices=4, shuffle=False, prefetch=2)
    with pytest.raises(OSError, match="corrupt file"):
        list(loader)


def test_loader_epoch_determinism_and_resume():
    """Same epoch index -> same batches; fast-forwarding `epoch` replays
    the uninterrupted run's order."""
    ds = _BoomDataset(8, boom_at=-1)
    a = BatchLoader(ds, 2, max_vertices=4, shuffle=True, seed=7, prefetch=0)
    orders = []
    for _ in range(3):  # epochs 0, 1, 2
        orders.append([b["scan_idx"].tolist() for b in a])
    # epochs differ from each other
    assert orders[0] != orders[1] or orders[1] != orders[2]

    b = BatchLoader(ds, 2, max_vertices=4, shuffle=True, seed=7, prefetch=0)
    b.epoch = 2  # resume at epoch 2
    replay = [bt["scan_idx"].tolist() for bt in b]
    assert replay == orders[2]


def test_scipy_matcher_grad_does_not_crash(rng):
    """value_and_grad through the scipy-callback matcher (needs the
    stop_gradient the reference's .detach() provides)."""
    from wireframe_tpu.losses.wireframe_loss import (
        WireframeLossConfig,
        wireframe_loss,
    )
    from wireframe_tpu.ops.pairs import num_pairs, pair_validity_mask

    b, v = 2, 6
    e = num_pairs(v)
    counts = np.array([4, 5], np.int32)
    pmask = np.asarray(pair_validity_mask(counts, v))
    tgt = {
        "vertices": jnp.asarray(rng.normal(size=(b, v, 3)).astype(np.float32)),
        "vertex_existence": jnp.asarray(
            (np.arange(v)[None] < counts[:, None]).astype(np.float32)),
        "edge_labels": jnp.asarray((rng.random((b, e)) < .3).astype(np.float32)),
        "vertex_counts": jnp.asarray(counts),
    }

    def loss_fn(x):
        preds = {
            "vertices": x,
            "existence_logits": jnp.zeros((b, v)),
            "existence_probabilities": jnp.full((b, v), 0.5),
            "edge_logits": jnp.zeros((b, e)),
            "pair_mask": jnp.asarray(pmask),
        }
        return wireframe_loss(preds, tgt,
                              WireframeLossConfig(matcher="scipy"))["total_loss"]

    x0 = jnp.asarray(rng.normal(size=(b, v, 3)).astype(np.float32))
    val, grad = jax.value_and_grad(loss_fn)(x0)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_model_max_vertices_override_forwards():
    cfg = load_config(None, ["model.max_vertices=32"])
    assert cfg.model.max_vertices == 32
    assert cfg.data.max_vertices == 32


def test_model_input_dim_override_rejected():
    with pytest.raises(KeyError):
        load_config(None, ["model.input_dim=5"])


def test_string_tuple_override():
    cfg = load_config(None, ["parallel.mesh_axis_names=a,b"])
    assert cfg.parallel.mesh_axis_names == ("a", "b")


def test_empty_loader_raises_clearly(tmp_path):
    from wireframe_tpu.config import Config
    from wireframe_tpu.train.loop import train_model

    ds = _BoomDataset(2, boom_at=-1)  # 2 samples, bs=3, drop_last
    loader = BatchLoader(ds, 3, max_vertices=4, prefetch=0)
    cfg = Config()
    with pytest.raises(ValueError, match="no batches"):
        train_model(cfg, loader)
