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

from tools.gen_demo_data import (_FAMILIES, _roof_m, _roof_tee_gable,
                                 _sample_faces, make_building)


def _components(n_verts, edges):
    parent = list(range(n_verts))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    return len({find(v) for v in range(n_verts)})


@pytest.mark.parametrize("fam", _FAMILIES, ids=lambda f: f.__name__)
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
            ids = [i for i in (0, 4, 8, 6, 1)] if y_val == 0.0 \
                else [i for i in (3, 5, 9, 7, 2)]
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


def test_make_building_compound_invariants():
    rng = np.random.default_rng(17)
    for _ in range(25):
        cloud, verts, edges = make_building(rng)
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
