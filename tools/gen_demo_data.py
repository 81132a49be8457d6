#!/usr/bin/env python3
"""Generate a synthetic Building3D-format demo corpus.

The reference bundles 43 train / 8 test real LiDAR roofs; those data
files belong to the Building3D benchmark distribution and are not copied
here.  This tool synthesizes structurally similar samples — prism/gable
"buildings" with planar roof faces, UTM-magnitude coordinates, RGBA and
raw intensity channels — in the exact on-disk layout
(`<root>/{train,test}/{xyz,wireframe}`), so every CLI and test can run
without the real corpus.

Usage: python tools/gen_demo_data.py --out datasets --train 12 --test 4
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wireframe_tpu.io.obj import save_wireframe  # noqa: E402


def make_building(rng: np.random.Generator):
    """A gabled box: 8 base corners + ridge, with noisy surface points."""
    w, d, h = rng.uniform(6, 20), rng.uniform(6, 20), rng.uniform(3, 8)
    ridge_h = h + rng.uniform(1, 4)
    base = np.array([
        [0, 0, h], [w, 0, h], [w, d, h], [0, d, h],       # eaves
    ])
    ridge = np.array([[w / 2, 0, ridge_h], [w / 2, d, ridge_h]])
    verts = np.vstack([base, ridge])
    edges = np.array([
        [0, 1], [1, 2], [2, 3], [3, 0],       # eave loop
        [0, 4], [1, 4], [2, 5], [3, 5],       # rafters
        [4, 5],                               # ridge
    ])

    # Sample points on the two roof planes + noise.
    n_pts = rng.integers(1500, 6000)
    pts = []
    for tri in ([0, 1, 4], [1, 4, 5], [1, 2, 5],
                [2, 3, 5], [3, 5, 4], [3, 0, 4]):
        a, b, c = verts[list(tri)]
        k = n_pts // 6
        u = rng.random((k, 1)); v = rng.random((k, 1))
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u); v = np.where(flip, 1 - v, v)
        pts.append(a + u * (b - a) + v * (c - a))
    pc = np.vstack(pts)
    pc += rng.normal(scale=0.05, size=pc.shape)

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
