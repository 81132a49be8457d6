"""IO round-trip and parser tests (.obj wireframes, .xyz clouds)."""

import numpy as np

from wireframe_tpu.io.obj import load_wireframe, save_wireframe
from wireframe_tpu.io.xyz import read_xyz, select_features


def test_obj_round_trip(tmp_path, rng):
    verts = rng.normal(size=(7, 3))
    edges = np.array([[0, 1], [1, 2], [2, 3], [0, 6]], dtype=np.int64)
    path = str(tmp_path / "wf.obj")
    save_wireframe(verts, edges, path)
    v2, e2 = load_wireframe(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-12)
    np.testing.assert_array_equal(e2, edges)


def test_obj_edge_dedup_and_sorting(tmp_path):
    # 1-based input, reversed + duplicate edges must collapse to sorted
    # 0-based unique rows (reference load_wireframe semantics).
    path = str(tmp_path / "wf.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("l 2 1\nl 1 2\nl 3 1\n")
    verts, edges = load_wireframe(path)
    assert verts.shape == (3, 3)
    assert sorted(map(tuple, edges.tolist())) == [(0, 1), (0, 2)]


def test_xyz_parser_matches_loadtxt(tmp_path, rng):
    data = rng.normal(size=(50, 8)) * 1000
    path = str(tmp_path / "pc.xyz")
    np.savetxt(path, data)
    got = read_xyz(path)
    ref = np.loadtxt(path, ndmin=2)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_select_features_all_channels(rng):
    pc = rng.uniform(0, 255, size=(10, 8))
    # strict reference parity mode: intensity unscaled (quirk 3)
    out = select_features(pc, use_color=True, use_intensity=True,
                          scale_intensity=False)
    assert out.shape == (10, 8)
    np.testing.assert_allclose(out[:, :3], pc[:, :3])
    np.testing.assert_allclose(out[:, 3:7], pc[:, 3:7] / 256.0)
    np.testing.assert_allclose(out[:, 7], pc[:, 7])
    # framework default: 16-bit scaling
    out2 = select_features(pc, use_color=True, use_intensity=True,
                           scale_intensity=True)
    np.testing.assert_allclose(out2[:, 7], pc[:, 7] / 65536.0)


def test_select_features_intensity_only(rng):
    # Reference crashes on this branch (building3d.py:108); we fixed it.
    pc = rng.uniform(0, 255, size=(10, 8))
    out = select_features(pc, use_color=False, use_intensity=True)
    assert out.shape == (10, 4)
    np.testing.assert_allclose(out[:, 3], pc[:, 7])
