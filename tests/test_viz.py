"""Viz library smoke tests: every plot function renders and saves."""

import os

import numpy as np

from wireframe_tpu.viz import (
    plot_edge_probabilities,
    plot_point_cloud,
    plot_prediction_comparison,
    plot_training_loss,
    plot_wireframe,
)


def test_all_plots_render(tmp_path, rng):
    pc = rng.normal(size=(500, 8))
    verts = rng.normal(size=(6, 3))
    edges = np.array([[0, 1], [1, 2], [3, 4]])

    p1 = str(tmp_path / "pc.png")
    plot_point_cloud(pc, save_path=p1)
    p2 = str(tmp_path / "wf.png")
    plot_wireframe(verts, edges, save_path=p2)
    p3 = str(tmp_path / "cmp.png")
    plot_prediction_comparison(
        pc, verts, edges, verts + 0.1, edges,
        metrics={"corners_f1": 0.5, "edges_f1": 0.25,
                 "average_corner_offset": 0.1},
        save_path=p3)
    p4 = str(tmp_path / "loss.png")
    plot_training_loss(
        [{"epoch": i, "total_loss": 1.0 / (i + 1), "vertex_loss": 0.5,
          "existence_loss": 0.2, "edge_loss": 0.1} for i in range(5)],
        save_path=p4)
    p5 = str(tmp_path / "probs.png")
    plot_edge_probabilities(rng.random(100), save_path=p5)

    for p in (p1, p2, p3, p4, p5):
        assert os.path.getsize(p) > 1000  # non-trivial PNG


def test_empty_edges_ok(tmp_path, rng):
    verts = rng.normal(size=(4, 3))
    plot_wireframe(verts, np.empty((0, 2), np.int64),
                   save_path=str(tmp_path / "e.png"))


def test_demo_data_generator(tmp_path):
    """tools/gen_demo_data produces a loadable Building3D-format corpus."""
    import subprocess
    import sys

    out = str(tmp_path / "corpus")
    r = subprocess.run(
        [sys.executable, "tools/gen_demo_data.py", "--out", out,
         "--train", "2", "--test", "1"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    from wireframe_tpu.config import DataConfig
    from wireframe_tpu.data import Building3DDataset

    ds = Building3DDataset(DataConfig(root_dir=out, num_points=256), "train")
    assert len(ds) == 2
    raw = ds.load_raw(0)
    assert raw["point_cloud"].shape[1] == 8
    assert 4 <= len(raw["wf_vertices"]) <= 40
    assert len(raw["wf_edges"]) >= 4
    assert raw["wf_edges"].max() < len(raw["wf_vertices"])


def test_demo_data_generator_diversity():
    """The generator spans multiple building families / vertex counts
    (needed for the synthetic-pretrain corpus to transfer, QUALITY.md
    round-4 study) and stays within the recipe's max_vertices=40."""
    import numpy as np

    from tools.gen_demo_data import make_building

    rng = np.random.default_rng(3)
    vcounts = set()
    for _ in range(40):
        cloud, verts, edges = make_building(rng)
        assert 4 <= len(verts) <= 40
        assert edges.max() < len(verts)
        assert cloud.shape[1] == 8
        # UTM-magnitude frame like the real corpus.
        assert 5.3e5 < cloud[:, 0].mean() < 5.4e5
        vcounts.add(len(verts))
    assert len(vcounts) >= 4, vcounts
