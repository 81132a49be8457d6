"""Serving path: warm fixed-shape bucketed prediction (wireframe_tpu.serve).

Checks the WireframePredictor contract end-to-end on CPU with a freshly
initialized checkpoint: raw variable-size clouds in (arrays and .xyz
files), world-coordinate wireframes out, batch padding not leaking into
real outputs, and bucket routing bounded by the configured buckets.
"""

import os

import numpy as np
import pytest

from wireframe_tpu.config import Config
from wireframe_tpu.serve import WireframePredictor
from wireframe_tpu.train.checkpoint import save_checkpoint
from wireframe_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    import jax

    cfg = Config()
    cfg.data.num_points = 64
    cfg.data.max_vertices = 8
    cfg.data.point_buckets = (64, 128)
    cfg.eval.batch_size = 2
    cfg.__post_init__()
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               (1, 64, cfg.model.input_dim))
    d = tmp_path_factory.mktemp("serve_ckpt")
    save_checkpoint(str(d), 1, state.params, cfg=cfg)
    return str(d), cfg


def _raw_cloud(rng, n, offset=(0.0, 0.0, 0.0), scale=1.0):
    pc = np.zeros((n, 8))
    pc[:, :3] = rng.normal(size=(n, 3)) * scale + np.asarray(offset)
    pc[:, 3:7] = rng.uniform(0, 255, size=(n, 4))
    pc[:, 7] = rng.uniform(0, 50000, size=n)
    return pc


def test_predict_world_coordinates_and_shapes(ckpt_dir, rng):
    ckpt, cfg = ckpt_dir
    pred = WireframePredictor(
        ckpt, overrides=["data.point_buckets=64,128",
                         "eval.batch_size=2"],
        cache_dir="")
    pred.warmup()

    offset = (534000.0, 6588000.0, 45.0)
    clouds = [_raw_cloud(rng, n, offset=offset) for n in (40, 64, 100, 128)]
    results = pred.predict(clouds)

    assert len(results) == len(clouds)
    for r in results:
        assert r["vertices"].shape == (r["num_vertices"], 3)
        assert r["edges"].shape == (r["num_edges"], 2)
        if r["num_edges"]:
            assert r["edges"].max() < r["num_vertices"]
        if r["num_vertices"]:
            # De-normalized back to the input UTM-like frame.
            assert np.linalg.norm(
                r["vertices"].mean(axis=0) - np.asarray(offset)) < 100.0


def test_batch_padding_does_not_change_outputs(ckpt_dir, rng):
    """A cloud served alone must produce the same wireframe as the same
    cloud served alongside others (fixed-batch padding isolation)."""
    ckpt, _ = ckpt_dir
    pred = WireframePredictor(
        ckpt, overrides=["data.point_buckets=64,128",
                         "eval.batch_size=2"],
        cache_dir="")
    cloud = _raw_cloud(rng, 64)
    alone = pred.predict([cloud])[0]
    together = pred.predict([cloud, _raw_cloud(rng, 64),
                             _raw_cloud(rng, 100)])[0]
    np.testing.assert_allclose(alone["vertices"], together["vertices"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(alone["edges"], together["edges"])


def test_predict_files_writes_obj(ckpt_dir, rng, tmp_path):
    ckpt, _ = ckpt_dir
    from wireframe_tpu.io.obj import load_wireframe

    xyz_path = tmp_path / "42.xyz"
    np.savetxt(xyz_path, _raw_cloud(rng, 80), fmt="%.4f")
    pred = WireframePredictor(
        ckpt, overrides=["data.point_buckets=64,128",
                         "eval.batch_size=2"],
        cache_dir="")
    out = pred.predict_files([str(xyz_path)], out_dir=str(tmp_path / "obj"))
    assert os.path.exists(out[0]["obj_path"])
    verts, edges = load_wireframe(out[0]["obj_path"])
    assert verts.shape == (out[0]["num_vertices"], 3)
    assert len(edges) == out[0]["num_edges"]


def test_geometry_only_input(ckpt_dir, rng):
    """(N, 3) clouds are accepted: non-XYZ channels zero-filled."""
    ckpt, _ = ckpt_dir
    pred = WireframePredictor(
        ckpt, overrides=["data.point_buckets=64,128",
                         "eval.batch_size=2"],
        cache_dir="")
    r = pred.predict([rng.normal(size=(50, 3))])[0]
    assert r["vertices"].shape[1] == 3
