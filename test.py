#!/usr/bin/env python3
"""Inference entry point — the `test.py` the reference README promises
(README.md:126-129) but does not ship.

Runs the trained model over a split (or explicit .xyz files), writes the
predicted wireframes as Wavefront `.obj` files (de-normalized back to
world coordinates), and prints per-sample vertex/edge counts.

Usage:
  python test.py [--checkpoint-dir checkpoints] [--data-root PATH]
                 [--split test] [--out-dir predictions]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--split", default="test", choices=("train", "test"))
    p.add_argument("--out-dir", default="predictions")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE")
    return p.parse_args(argv)


def main(argv=None):
    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from main import resolve_data_root
    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset, collate_fixed
    from wireframe_tpu.eval import decode_predictions
    from wireframe_tpu.io import save_wireframe
    from wireframe_tpu.train.checkpoint import load_checkpoint
    from wireframe_tpu.train.step import make_forward_fn

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = resolve_data_root(args.data_root)

    from wireframe_tpu.train.checkpoint import apply_checkpoint_model_config

    payload, meta = load_checkpoint(args.checkpoint_dir, args.step)
    apply_checkpoint_model_config(cfg, meta)

    dataset = Building3DDataset(cfg.data, args.split)
    forward = jax.jit(make_forward_fn(cfg, train=False))
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(cfg.data.seed)
    v = cfg.model.max_vertices
    bs = cfg.eval.batch_size

    for k in range(0, len(dataset), bs):
        idxs = list(range(k, min(k + bs, len(dataset))))
        samples = [dataset.get_sample(i, rng=rng, augment_on_host=False)
                   for i in idxs]
        batch = collate_fixed(samples, v)
        preds = forward(payload["params"], jnp.asarray(batch["point_clouds"]), None)
        verts = np.asarray(preds["vertices"])
        probs = np.asarray(preds["edge_probs"])
        counts = np.asarray(preds["actual_vertex_counts"])
        existence = np.asarray(preds["existence_probabilities"])

        for j, i in enumerate(idxs):
            if cfg.model.slot_mask_mode == "existence":
                # Live slots are scattered: emit them compacted, with
                # edges re-indexed into the compacted vertex list.
                live = existence[j] > cfg.eval.vertex_existence_thresh
                dec = decode_predictions(
                    verts[j], probs[j], int(counts[j]), v,
                    cfg.eval.edge_confidence_thresh, live_mask=live)
                live_idx = np.nonzero(live)[0]
                remap = -np.ones(v, dtype=np.int64)
                remap[live_idx] = np.arange(len(live_idx))
                out_verts = dec["vertices"][live_idx]
                edges = remap[dec["edges"]]  # endpoints live by decode
                c = len(live_idx)
            else:
                dec = decode_predictions(
                    verts[j], probs[j], int(counts[j]), v,
                    cfg.eval.edge_confidence_thresh)
                c = int(counts[j])
                out_verts = dec["vertices"][:c]
                # Keep only edges among emitted vertices (indices < c).
                edges = dec["edges"][(dec["edges"] < c).all(axis=1)]
            # De-normalize back to the original UTM frame.
            out_verts = (out_verts * batch["max_distance"][j]
                         + batch["centroid"][j])
            name = f"{batch['scan_idx'][j]}.obj"
            save_wireframe(out_verts, edges, os.path.join(args.out_dir, name))
            print(f"{name}: {c} vertices, {len(edges)} edges")

    print(f"✓ wireframes written to {args.out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
