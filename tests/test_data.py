"""Data pipeline: normalization, sampling, augmentation, fixed collation.

Uses a synthetic corpus written to tmp_path in the reference's on-disk
layout (train/{xyz,wireframe}) — no dependence on the real dataset.
"""

import numpy as np
import pytest

from wireframe_tpu.config import DataConfig
from wireframe_tpu.data.building3d import (
    Building3DDataset,
    collate_fixed,
    edge_endpoint_array,
)
from wireframe_tpu.data.loader import BatchLoader
from wireframe_tpu.io.obj import save_wireframe
from wireframe_tpu.ops.pairs import num_pairs

from conftest import make_synthetic_sample


@pytest.fixture
def corpus(tmp_path, rng):
    root = tmp_path / "data"
    for split, n in (("train", 6), ("test", 3)):
        (root / split / "xyz").mkdir(parents=True)
        (root / split / "wireframe").mkdir(parents=True)
        for i in range(n):
            pc, verts, edges = make_synthetic_sample(
                rng, n_points=300 + 17 * i, n_verts=5 + i)
            np.savetxt(str(root / split / "xyz" / f"{1000 + i}.xyz"), pc)
            save_wireframe(verts, edges,
                           str(root / split / "wireframe" / f"{1000 + i}.obj"))
    return str(root)


def make_cfg(corpus, **kw):
    cfg = DataConfig(root_dir=corpus, num_points=256, max_vertices=16,
                     augment=False, **kw)
    return cfg


def test_dataset_listing(corpus):
    ds = Building3DDataset(make_cfg(corpus), "train")
    assert len(ds) == 6
    ds_test = Building3DDataset(make_cfg(corpus), "test")
    assert len(ds_test) == 3


def test_normalization(corpus):
    ds = Building3DDataset(make_cfg(corpus), "train")
    raw = ds.load_raw(0)
    pc = raw["point_cloud"]
    # normalized: centroid ~0, max radius ~1
    np.testing.assert_allclose(pc[:, :3].mean(0), 0, atol=1e-9)
    np.testing.assert_allclose(
        np.max(np.linalg.norm(pc[:, :3], axis=1)), 1.0, rtol=1e-9)
    # GT vertices share the same frame transform
    assert np.abs(raw["wf_vertices"]).max() < 10


def test_sample_fixed_point_count(corpus, rng):
    ds = Building3DDataset(make_cfg(corpus), "train")
    s = ds.get_sample(0, rng=rng)
    assert s["point_clouds"].shape == (256, 8)
    assert s["point_clouds"].dtype == np.float32


def test_augment_consistency(corpus):
    """Cloud and GT vertices must receive the same flip/rotation."""
    cfg = make_cfg(corpus)
    cfg.augment = True
    ds = Building3DDataset(cfg, "train")
    base = ds.load_raw(0)
    rng = np.random.default_rng(7)
    s = ds.get_sample(0, rng=rng, augment_on_host=True)
    # distances between GT vertices are rotation/flip invariant
    d_base = np.linalg.norm(
        base["wf_vertices"][:, None] - base["wf_vertices"][None], axis=-1)
    d_aug = np.linalg.norm(
        s["wf_vertices"][:, None].astype(np.float64)
        - s["wf_vertices"][None].astype(np.float64), axis=-1)
    np.testing.assert_allclose(d_aug, d_base, rtol=1e-4, atol=1e-5)
    # z coordinates unchanged by z-rotation + xy flips
    np.testing.assert_allclose(np.sort(s["wf_vertices"][:, 2]),
                               np.sort(base["wf_vertices"][:, 2]), rtol=1e-5)


def test_edge_endpoint_z_ordering(rng):
    verts = rng.normal(size=(6, 3))
    edges = np.array([[0, 1], [2, 5]])
    ev = edge_endpoint_array(verts, edges)
    assert ev.shape == (2, 2, 3)
    assert (ev[:, 0, 2] >= ev[:, 1, 2]).all()  # z descending per edge


def test_collate_shapes(corpus, rng):
    ds = Building3DDataset(make_cfg(corpus), "train")
    samples = [ds.get_sample(i, rng=rng) for i in range(3)]
    batch = collate_fixed(samples, 16)
    assert batch["point_clouds"].shape == (3, 256, 8)
    assert batch["target_vertices"].shape == (3, 16, 3)
    assert batch["vertex_existence"].shape == (3, 16)
    assert batch["edge_labels"].shape == (3, num_pairs(16))
    for i in range(3):
        c = batch["vertex_counts"][i]
        assert batch["vertex_existence"][i, :c].all()
        assert not batch["vertex_existence"][i, c:].any()
        # every GT edge is a label=1 slot
        assert batch["edge_labels"][i].sum() == len(batch["wf_edges"][i])


def test_loader_epochs(corpus):
    ds = Building3DDataset(make_cfg(corpus), "train")
    loader = BatchLoader(ds, batch_size=4, max_vertices=16, shuffle=True,
                         drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 1  # 6 samples, bs=4, drop_last
    assert batches[0]["point_clouds"].shape[0] == 4
    # second epoch reshuffles but yields the same structure
    batches2 = list(loader)
    assert len(batches2) == 1


def test_augment_extended_levers(rng):
    """aug_jitter_std noises only VALID point rows (targets and padding
    untouched); aug_scale_range applies one linear map to cloud AND
    vertices; rot_degrees=0 leaves coordinates magnitude-preserved
    (flips only)."""
    import jax

    from wireframe_tpu.data.augment import augment_batch

    b, n, v, d = 3, 32, 5, 8
    pc = rng.normal(size=(b, n, d)).astype(np.float32)
    pc[:, 28:] = 0.0  # padded point rows
    tv = rng.normal(size=(b, v, 3)).astype(np.float32)
    tv[:, 4:] = 0.0   # padded vertex rows
    key = jax.random.PRNGKey(0)

    # Jitter: padding rows stay exactly zero; targets unchanged relative
    # to the no-jitter run with the same key; valid XYZ rows move.
    pc_j, tv_j = augment_batch(key, pc, tv, rot_degrees=0.0,
                               jitter_std=0.01)
    pc_0, tv_0 = augment_batch(key, pc, tv, rot_degrees=0.0)
    np.testing.assert_array_equal(np.asarray(pc_j)[:, 28:], 0.0)
    np.testing.assert_array_equal(np.asarray(tv_j), np.asarray(tv_0))
    assert np.abs(np.asarray(pc_j)[:, :28, :3]
                  - np.asarray(pc_0)[:, :28, :3]).max() > 0
    # rot_degrees=0: flips only — coordinate magnitudes preserved.
    np.testing.assert_allclose(np.abs(np.asarray(pc_0)[..., :3]),
                               np.abs(pc[..., :3]), rtol=1e-6)

    # Scale: cloud and vertices transform by the SAME per-sample linear
    # map (recover it from the points, apply to the vertices).
    pc_s, tv_s = augment_batch(key, pc, tv, scale_range=0.3)
    for i in range(b):
        m, *_ = np.linalg.lstsq(pc[i, :28, :3],
                                np.asarray(pc_s)[i, :28, :3], rcond=None)
        np.testing.assert_allclose(tv[i] @ m, np.asarray(tv_s)[i],
                                   rtol=1e-4, atol=1e-5)
    # Non-degenerate scaling actually happened for at least one sample.
    norms = (np.linalg.norm(np.asarray(pc_s)[..., :3], axis=-1).sum(1)
             / np.linalg.norm(pc[..., :3], axis=-1).sum(1))
    assert np.abs(norms - 1.0).max() > 1e-3


def test_mixed_loader_cotrain(corpus, tmp_path, rng):
    """MixedBatchLoader (train.cotrain_*): every batch = primary samples
    plus aux_per_batch i.i.d. draws from the auxiliary corpus; epochs
    span the primary corpus; deterministic per (seed, epoch)."""
    from wireframe_tpu.data.loader import MixedBatchLoader

    # Auxiliary corpus with a provenance marker: constant intensity
    # column (stable under sampling/sorting), so the aux rows of each
    # collated batch are identifiable.
    aux_root = tmp_path / "aux"
    (aux_root / "train" / "xyz").mkdir(parents=True)
    (aux_root / "train" / "wireframe").mkdir(parents=True)
    for i in range(3):
        pc, verts, edges = make_synthetic_sample(rng, n_points=280,
                                                 n_verts=6)
        pc[:, 7] = 12345.0
        np.savetxt(str(aux_root / "train" / "xyz" / f"{i}.xyz"), pc)
        save_wireframe(verts, edges,
                       str(aux_root / "train" / "wireframe" / f"{i}.obj"))

    primary = Building3DDataset(make_cfg(corpus), "train")
    aux = Building3DDataset(make_cfg(str(aux_root)), "train")

    def build():
        return MixedBatchLoader(primary, aux, 1, 3, 16, shuffle=True,
                                drop_last=True, seed=5,
                                augment_on_host=True)

    ml = build()
    assert len(ml) == 3  # 6 primary // (3 - 1) per batch
    batches = list(ml)
    assert len(batches) == 3
    marker = 12345.0 / 65536.0  # scale_intensity divides by 2^16
    for b in batches:
        assert b["point_clouds"].shape == (3, 256, 8)
        # Last slot is the aux draw; first two are primary.
        np.testing.assert_allclose(b["point_clouds"][2, :, 7], marker,
                                   rtol=1e-6)
        assert not np.allclose(b["point_clouds"][0, :, 7], marker)
        assert not np.allclose(b["point_clouds"][1, :, 7], marker)

    # Determinism: a fresh loader with the same seed replays exactly.
    for x, y in zip(batches, build()):
        np.testing.assert_array_equal(x["point_clouds"],
                                      y["point_clouds"])
        np.testing.assert_array_equal(x["edge_labels"], y["edge_labels"])

    # Validation errors.
    with pytest.raises(ValueError):
        MixedBatchLoader(primary, aux, 3, 3, 16)
    with pytest.raises(ValueError):
        MixedBatchLoader(primary, aux, 0, 3, 16)
