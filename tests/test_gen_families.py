"""Structural invariants for the synthetic roof families.

Guards the generator properties the synthetic-pretrain corpus depends
on (QUALITY.md round-4 study; tools/gen_demo_data.py):

- every family emits a CONNECTED wireframe with valid, duplicate-free
  edges and no orphan vertices — the connected-topology motif is the
  whole point of the tee-gable/M-roof families;
- the tee-gable junction vertex lies exactly on the main north roof
  plane (the valley edges meet the surface, not mid-air);
- the M-roof end-wall fan does not invert: the wall triangles tile the
  M profile polygon exactly, with no wedge above the valley (the
  regression fixed in commit 8b6b738 — inverted fan triangles sampled
  cloud points in the sky over the valley on every M-roof block).

Pure numpy — no JAX, no device.
"""
import numpy as np
import pytest

from tools.corpus_stats import _n_components as _components
from tools.gen_demo_data import (_FAMILIES, _roof_m, _roof_poly,
                                 _roof_tee_gable, _sample_faces,
                                 _triangulate, make_building)


@pytest.mark.parametrize("fam", _FAMILIES + (_roof_poly,),
                         ids=lambda f: f.__name__)
def test_family_wireframe_invariants(fam):
    rng = np.random.default_rng(7)
    for _ in range(5):
        verts, edges, tris = fam(rng, rng.uniform(6, 18), rng.uniform(6, 18))
        edges = np.asarray(edges)
        tris = np.asarray(tris)
        v = len(verts)
        assert np.isfinite(verts).all()
        # Valid, self-loop-free, duplicate-free edges.
        assert edges.min() >= 0 and edges.max() < v
        assert (edges[:, 0] != edges[:, 1]).all()
        canon = {tuple(sorted(e)) for e in edges.tolist()}
        assert len(canon) == len(edges)
        # No orphan vertices, single connected component.
        assert set(np.unique(edges)) == set(range(v))
        assert _components(v, edges) == 1
        # Sampling surfaces reference valid vertices and are non-degenerate.
        assert tris.min() >= 0 and tris.max() < v
        corners = verts[tris]
        areas = 0.5 * np.linalg.norm(
            np.cross(corners[:, 1] - corners[:, 0],
                     corners[:, 2] - corners[:, 0]), axis=-1)
        assert (areas > 1e-6).all()


def test_tee_gable_junction_on_main_plane():
    rng = np.random.default_rng(11)
    for _ in range(20):
        w, d = rng.uniform(6, 18), rng.uniform(6, 18)
        verts, edges, _ = _roof_tee_gable(rng, w, d)
        h = verts[0, 2]                      # eave height
        hr = verts[4, 2]                     # main ridge height
        jx, jy, jz = verts[11]               # junction vertex
        # North plane: z falls linearly from hr at y=d/2 to h at y=d.
        plane_z = hr - (jy - d / 2) * 2 * (hr - h) / d
        assert jz == pytest.approx(plane_z, abs=1e-9)
        assert d / 2 < jy < d                # strictly inside the plane
        # Both valley edges terminate at the junction.
        canon = {tuple(sorted(e)) for e in np.asarray(edges).tolist()}
        assert (6, 11) in canon and (7, 11) in canon


def _shoelace(poly_xz):
    x, z = poly_xz[:, 0], poly_xz[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def test_m_roof_end_walls_tile_profile_exactly():
    """Regression for 8b6b738: an end-wall fan from an eave corner
    inverts at the reflex valley vertex and covers a sky wedge; a
    correct fan's summed triangle area equals the profile polygon's."""
    rng = np.random.default_rng(13)
    for _ in range(20):
        w, d = rng.uniform(6, 18), rng.uniform(6, 18)
        verts, _, tris = _roof_m(rng, w, d)
        for y_val, wall in ((0.0, {0, 1, 4, 6, 8}), (d, {2, 3, 5, 7, 9})):
            wall_tris = [t for t in tris if set(t) <= wall]
            assert len(wall_tris) == 3
            # Profile polygon eave->rafter->valley->rafter->eave in x-z.
            ids = [0, 4, 8, 6, 1] if y_val == 0.0 else [3, 5, 9, 7, 2]
            poly = verts[ids][:, [0, 2]]
            tri_area = sum(_shoelace(verts[list(t)][:, [0, 2]])
                           for t in wall_tris)
            assert tri_area == pytest.approx(_shoelace(poly), rel=1e-9)
            # And sampled wall points never rise above the valley height
            # between the two ridges (the sky-wedge symptom).
            pts = _sample_faces(rng, verts, wall_tris, 500)
            hv = verts[8, 2]
            x1, x2 = verts[4, 0], verts[6, 0]
            between = (pts[:, 0] > x1 + 1e-6) & (pts[:, 0] < x2 - 1e-6)
            # Max allowed z between the ridges: the two inner rafter
            # lines peak at the ridges and meet the valley at hv.
            assert (pts[between, 2] <=
                    np.maximum(hv, np.interp(pts[between, 0],
                                             [x1, verts[8, 0], x2],
                                             [verts[4, 2], hv,
                                              verts[6, 2]])) + 1e-9).all()


def test_poly_roof_is_pure_outline_loop():
    """The polygonal family exists to supply the real corpus's dominant
    motif: every vertex degree 2, E/V exactly 1, one planar surface."""
    rng = np.random.default_rng(19)
    for _ in range(30):
        verts, edges, tris = _roof_poly(rng, rng.uniform(6, 18),
                                        rng.uniform(6, 18))
        edges = np.asarray(edges)
        deg = np.zeros(len(verts), int)
        np.add.at(deg, edges[:, 0], 1)
        np.add.at(deg, edges[:, 1], 1)
        assert (deg == 2).all()
        assert len(edges) == len(verts)
        # All vertices coplanar (one roof plane).
        a = verts[1] - verts[0]
        b = verts[2] - verts[0]
        n = np.cross(a, b)
        n /= np.linalg.norm(n)
        assert np.abs((verts - verts[0]) @ n).max() < 1e-8
        # Triangulation tiles the footprint polygon exactly.
        poly = verts[:, :2]
        tri_area = sum(_shoelace(poly[list(t)]) for t in tris)
        assert tri_area == pytest.approx(_shoelace(poly), rel=1e-9)


def test_triangulate_nonconvex_exact_cover():
    """Ear clipping tiles a reflex rectilinear polygon exactly (a
    corner fan would invert on these — the M-roof failure mode)."""
    u_shape = np.array([(0, 0), (10, 0), (10, 8), (7, 8), (7, 3),
                        (3, 3), (3, 8), (0, 8)], float)
    for poly in (u_shape, u_shape[::-1]):   # both orientations
        tris = _triangulate(poly)
        assert len(tris) == len(poly) - 2
        total = sum(_shoelace(poly[list(t)]) for t in tris)
        assert total == pytest.approx(_shoelace(poly), rel=1e-12)
        assert all(_shoelace(poly[list(t)]) > 1e-9 for t in tris)


def test_real_mix_matches_corpus_topology_profile():
    """make_building(mix='real') approximates the measured real-corpus
    profile (tools/corpus_stats.py): deg-2 dominant, E/V near 1.15,
    multi-component compounds, within the 38-vertex budget."""
    rng = np.random.default_rng(23)
    degs, comps, vcounts, ev = [], [], [], []
    for _ in range(150):
        cloud, verts, edges = make_building(rng, mix="real")
        v = len(verts)
        assert 4 <= v <= 38
        # The 38-vertex budget break must not thin the cloud: the drawn
        # point total (>=2000) splits over KEPT blocks, so even
        # truncated compounds keep a dense cloud.
        assert len(cloud) >= 1900
        vcounts.append(v)
        ev.append(len(edges) / v)
        d = np.zeros(v, int)
        np.add.at(d, edges[:, 0], 1)
        np.add.at(d, edges[:, 1], 1)
        degs.extend(d.tolist())
        comps.append(_components(v, edges))
    degs = np.asarray(degs)
    assert 0.55 <= (degs == 2).mean() <= 0.85   # real: 0.70
    assert 1.05 <= np.mean(ev) <= 1.30          # real: 1.15
    assert 1.7 <= np.mean(comps) <= 2.7         # real: 2.28
    assert 10 <= np.median(vcounts) <= 24       # real: 18


def test_make_building_rejects_unknown_mix():
    with pytest.raises(ValueError, match="unknown mix"):
        make_building(np.random.default_rng(0), mix="Real")


def test_make_building_compound_invariants():
    rng = np.random.default_rng(17)
    for _ in range(25):
        cloud, verts, edges = make_building(rng, mix="uniform")
        v = len(verts)
        assert 4 <= v <= 36                  # 3 blocks x 12 max
        assert np.isfinite(cloud).all() and np.isfinite(verts).all()
        assert edges.min() >= 0 and edges.max() < v
        canon = {tuple(sorted(e)) for e in edges.tolist()}
        assert len(canon) == len(edges)      # block offsetting kept edges unique
        assert set(np.unique(edges)) == set(range(v))  # no orphans
        assert cloud.shape[1] == 8
        assert (cloud[:, 3:7] >= 0).all() and (cloud[:, 3:7] <= 255).all()
        assert (cloud[:, 7] >= 46000).all() and (cloud[:, 7] <= 48000).all()


def test_corpus_stats_on_generated_corpus(tmp_path):
    """tools/corpus_stats.py measures a generated corpus end-to-end."""
    from tools.corpus_stats import corpus_stats
    from tools.gen_demo_data import main as gen_main

    out = str(tmp_path / "c")
    assert gen_main(["--out", out, "--train", "4", "--test", "0",
                     "--seed", "5"]) == 0
    s = corpus_stats(out, "train")
    assert s["n_buildings"] == 4
    assert 4 <= s["v_p50"] <= 38
    assert s["edges_per_vertex"] > 0.9
    assert abs(sum(s["deg_pct"].values()) - 100.0) < 1e-6
    assert s["components_mean"] >= 1.0
