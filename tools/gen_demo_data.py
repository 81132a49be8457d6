#!/usr/bin/env python3
"""Generate a synthetic Building3D-format corpus.

The reference bundles 43 train / 8 test real LiDAR roofs; those data
files belong to the Building3D benchmark distribution and are not copied
here.  This tool synthesizes structurally similar samples in the exact
on-disk layout (`<root>/{train,test}/{xyz,wireframe}`), so every CLI and
test can run without the real corpus — and so a large pretraining corpus
can be produced on demand (QUALITY.md round-4 synthetic-pretrain study).

Building families (per block): flat, shed, gable, hip, pyramid roofs on
rectangular footprints; a building is 1-3 adjacent blocks with random
sizes/heights plus a random whole-building z-rotation, giving 4-18
wireframe vertices per building (the real Tallinn corpus spans 4-38).
Clouds get planar roof/gable-end surface points with Gaussian sensor
noise, UTM-magnitude coordinates, RGBA in [0,255] and raw ~46-48k
intensity — matching the measured statistics of the real corpus
(reference datasets/, SURVEY.md §2 corpus row).

Usage:
  python tools/gen_demo_data.py --out datasets --train 12 --test 4
  python tools/gen_demo_data.py --out /tmp/syn5k --train 5000 --test 100
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wireframe_tpu.io.obj import save_wireframe  # noqa: E402


def _rect(w, d, h):
    """Footprint corners at height h, counter-clockwise."""
    return np.array([[0, 0, h], [w, 0, h], [w, d, h], [0, d, h]], float)


def _roof_flat(rng, w, d):
    h = rng.uniform(3, 9)
    verts = _rect(w, d, h)
    edges = [[0, 1], [1, 2], [2, 3], [3, 0]]
    tris = [[0, 1, 2], [0, 2, 3]]
    return verts, edges, tris


def _roof_shed(rng, w, d):
    h = rng.uniform(3, 8)
    h2 = h + rng.uniform(1, 3)
    verts = _rect(w, d, h)
    verts[2, 2] = h2
    verts[3, 2] = h2
    edges = [[0, 1], [1, 2], [2, 3], [3, 0]]
    tris = [[0, 1, 2], [0, 2, 3]]
    return verts, edges, tris


def _roof_gable(rng, w, d):
    h = rng.uniform(3, 8)
    ridge_h = h + rng.uniform(1, 4)
    verts = np.vstack([
        _rect(w, d, h),
        [[w / 2, 0, ridge_h], [w / 2, d, ridge_h]],     # ridge along y
    ])
    edges = [[0, 1], [1, 2], [2, 3], [3, 0],            # eave loop
             [0, 4], [1, 4], [2, 5], [3, 5],            # rafters
             [4, 5]]                                    # ridge
    tris = [[0, 1, 4], [1, 4, 5], [1, 2, 5],            # roof planes +
            [2, 3, 5], [3, 5, 4], [3, 0, 4]]            # gable-end walls
    return verts, edges, tris


def _roof_hip(rng, w, d):
    h = rng.uniform(3, 8)
    ridge_h = h + rng.uniform(1, 4)
    inset = rng.uniform(0.2, 0.4) * min(w, d)
    verts = np.vstack([
        _rect(w, d, h),
        [[w / 2, inset, ridge_h], [w / 2, d - inset, ridge_h]],
    ])
    edges = [[0, 1], [1, 2], [2, 3], [3, 0],
             [0, 4], [1, 4], [2, 5], [3, 5],
             [4, 5]]
    tris = [[0, 1, 4],                                  # front hip face
            [2, 3, 5],                                  # back hip face
            [1, 2, 5], [1, 5, 4],                       # right plane
            [3, 0, 4], [3, 4, 5]]                       # left plane
    return verts, edges, tris


def _roof_pyramid(rng, w, d):
    h = rng.uniform(3, 8)
    apex_h = h + rng.uniform(1.5, 5)
    verts = np.vstack([_rect(w, d, h), [[w / 2, d / 2, apex_h]]])
    edges = [[0, 1], [1, 2], [2, 3], [3, 0],
             [0, 4], [1, 4], [2, 4], [3, 4]]
    tris = [[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]]
    return verts, edges, tris


_FAMILIES = (_roof_flat, _roof_shed, _roof_gable, _roof_hip, _roof_pyramid)


def _sample_faces(rng, verts, tris, n_pts):
    """Uniform points on the union of triangles, ~area-proportional."""
    corners = verts[np.asarray(tris)]                   # (T, 3, 3)
    areas = 0.5 * np.linalg.norm(
        np.cross(corners[:, 1] - corners[:, 0],
                 corners[:, 2] - corners[:, 0]), axis=-1)
    weights = areas / max(areas.sum(), 1e-9)
    counts = rng.multinomial(n_pts, weights)
    pts = []
    for (a, b, c), k in zip(corners, counts):
        if k == 0:
            continue
        u = rng.random((k, 1))
        v = rng.random((k, 1))
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u)
        v = np.where(flip, 1 - v, v)
        pts.append(a + u * (b - a) + v * (c - a))
    return np.vstack(pts)


def make_building(rng: np.random.Generator):
    """1-3 adjacent roof blocks -> (cloud (N,8), verts (V,3), edges (E,2))."""
    n_blocks = rng.choice([1, 2, 3], p=[0.45, 0.4, 0.15])
    all_verts, all_edges, all_pts = [], [], []
    n_pts_total = int(rng.integers(2000, 6000))
    cursor_x = 0.0
    for bi in range(n_blocks):
        w, d = rng.uniform(6, 18), rng.uniform(6, 18)
        fam = _FAMILIES[rng.integers(len(_FAMILIES))]
        verts, edges, tris = fam(rng, w, d)
        # Adjacent placement along +x, with a random y offset so
        # footprints form L/T-ish compounds instead of a strip.
        offs = np.array([cursor_x, rng.uniform(-0.3, 0.3) * d if bi else 0.0,
                         0.0])
        verts = verts + offs
        base = sum(len(v) for v in all_verts)
        all_verts.append(verts)
        all_edges.append(np.asarray(edges) + base)
        all_pts.append(_sample_faces(rng, verts, tris,
                                     max(n_pts_total // n_blocks, 200)))
        cursor_x += w
    verts = np.vstack(all_verts)
    edges = np.vstack(all_edges)
    pc = np.vstack(all_pts)
    pc += rng.normal(scale=rng.uniform(0.03, 0.08), size=pc.shape)

    # Random whole-building orientation (the real corpus has arbitrary
    # street-grid headings; training augment only covers ±5°).
    theta = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    pc = pc @ rot.T
    verts = verts @ rot.T

    # Place in a UTM-like frame (Tallinn-ish magnitudes, like the corpus).
    offset = np.array([534000.0, 6588000.0, 0.0]) + rng.uniform(0, 900, 3)
    pc += offset
    verts = verts + offset

    # 8 feature channels: XYZ, RGBA in [0,255], raw intensity ~46-48k.
    n = len(pc)
    rgba = rng.uniform(0, 255, (n, 4))
    intensity = rng.uniform(46000, 48000, (n, 1))
    cloud = np.hstack([pc, rgba, intensity])
    return cloud, verts, edges


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="datasets")
    p.add_argument("--train", type=int, default=12)
    p.add_argument("--test", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    scan = 10000
    for split, count in (("train", args.train), ("test", args.test)):
        xyz_dir = os.path.join(args.out, split, "xyz")
        wf_dir = os.path.join(args.out, split, "wireframe")
        os.makedirs(xyz_dir, exist_ok=True)
        os.makedirs(wf_dir, exist_ok=True)
        for _ in range(count):
            scan += 1
            cloud, verts, edges = make_building(rng)
            np.savetxt(os.path.join(xyz_dir, f"{scan}.xyz"), cloud,
                       fmt="%.6f")
            save_wireframe(verts, edges,
                           os.path.join(wf_dir, f"{scan}.obj"))
    print(f"✓ synthetic corpus: {args.train} train / {args.test} test "
          f"under {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
