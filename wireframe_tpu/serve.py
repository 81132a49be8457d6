"""Production serving path for the wireframe predictor (ROADMAP #11).

The reference has no serving story at all — its inference is a
per-sample Python loop inside evaluate.py.  This module packages the
bucketed raw-cloud predictor behind a warm, fixed-shape serving API:

- **One program per point bucket.**  Raw clouds (1.3k-14k+ points) are
  padded to the smallest configured bucket (padding rows are invalid
  under the encoder mask), and every request batch is padded to a fixed
  `serve_batch_size`, so the set of compiled programs is exactly
  len(point_buckets) — no shape-driven recompiles in steady state.
- **Warm pool.**  `warmup()` runs one dummy batch through every bucket
  program up front; combined with JAX's persistent compilation cache
  (enabled here via `jax_compilation_cache_dir`), a restarted server
  re-warms from disk instead of recompiling.
- **World-coordinate outputs.**  Each cloud is normalized exactly like
  the training pipeline (centroid + max-radius, reference
  datasets/building3d.py:119-126) and predictions are de-normalized back
  to the input frame before they are returned / written as `.obj`.

Usage:
    predictor = WireframePredictor("checkpoints")
    predictor.warmup()
    results = predictor.predict([cloud1, cloud2])     # raw (N, 8) arrays
    results = predictor.predict_files(["a.xyz"])      # or .xyz paths
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class WireframePredictor:
    """Warm, fixed-shape point-cloud -> wireframe inference service."""

    def __init__(self, checkpoint_dir: str,
                 config: Optional[str] = None,
                 overrides: Sequence[str] = (),
                 step: Optional[int] = None,
                 serve_batch_size: Optional[int] = None,
                 cache_dir: Optional[str] = None):
        """
        Args:
          checkpoint_dir: trained checkpoint (arch read from metadata).
          config / overrides: optional yaml + `--set`-style overrides.
          step: checkpoint step (default: latest).
          serve_batch_size: fixed batch every bucket program is compiled
            for (default cfg.eval.batch_size).  Requests are chunked and
            padded to it.
          cache_dir: persistent XLA compile cache directory (default:
            the user-scoped `utils.platform.default_cache_dir()`;
            set "" to disable).
        """
        import jax

        from wireframe_tpu.config import load_config
        from wireframe_tpu.train.checkpoint import (
            apply_checkpoint_model_config,
            load_checkpoint,
        )
        from wireframe_tpu.train.step import make_forward_fn

        from wireframe_tpu.utils.platform import enable_compile_cache

        enable_compile_cache(cache_dir)

        cfg = load_config(config, list(overrides))
        payload, meta = load_checkpoint(checkpoint_dir, step)
        apply_checkpoint_model_config(cfg, meta)
        self.cfg = cfg
        self.params = payload["params"]
        self.batch_size = int(serve_batch_size or cfg.eval.batch_size)
        self.buckets = tuple(sorted(cfg.data.point_buckets))
        self._forward = jax.jit(make_forward_fn(cfg, train=False))

    # ------------------------------------------------------------------
    # Input preparation
    # ------------------------------------------------------------------

    def _preprocess(self, raw: np.ndarray) -> dict:
        """Channel-select + normalize one raw cloud; keep the transform."""
        from wireframe_tpu.io.xyz import select_features

        cfg = self.cfg.data
        raw = np.asarray(raw, np.float64)
        if raw.ndim != 2 or raw.shape[1] < 3:
            raise ValueError(f"cloud must be (N, >=3), got {raw.shape}")
        if raw.shape[1] >= 8:
            pc = select_features(raw, cfg.use_color, cfg.use_intensity,
                                 scale_intensity=cfg.scale_intensity)
        else:
            # Geometry-only input: zero-fill the non-XYZ feature channels.
            pc = np.zeros((raw.shape[0], self.cfg.model.input_dim),
                          np.float64)
            pc[:, :3] = raw[:, :3]
        centroid = np.zeros(3)
        max_distance = 1.0
        if cfg.normalize:
            centroid = np.mean(pc[:, 0:3], axis=0)
            pc = pc.copy()
            pc[:, 0:3] -= centroid
            max_distance = float(np.max(np.linalg.norm(pc[:, 0:3], axis=1)))
            max_distance = max(max_distance, 1e-12)
            pc[:, 0:3] /= max_distance
        return {"pc": pc.astype(np.float32), "centroid": centroid,
                "max_distance": max_distance}

    # ------------------------------------------------------------------
    # Warm pool
    # ------------------------------------------------------------------

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile (or load from the persistent cache) every bucket
        program at the serving batch size."""
        import jax.numpy as jnp

        d = self.cfg.model.input_dim
        for bucket in (buckets or self.buckets):
            dummy = np.zeros((self.batch_size, bucket, d), np.float32)
            dummy[:, 0, 0] = 1.0  # one valid point keeps pools non-degenerate
            out = self._forward(self.params, jnp.asarray(dummy), None)
            float(np.asarray(out["vertices"]).sum())  # force completion

    # ------------------------------------------------------------------
    # Prediction
    # ------------------------------------------------------------------

    def predict(self, clouds: Sequence[np.ndarray]) -> List[Dict]:
        """Raw clouds -> wireframes in the input coordinate frame.

        Returns per-cloud dicts: vertices (C, 3) float64 world coords,
        edges (E, 2) int64 into vertices, edge_probs of the kept edges,
        num_vertices, num_edges.
        """
        import jax.numpy as jnp

        from wireframe_tpu.data.bucketing import choose_bucket, pad_or_sample
        from wireframe_tpu.eval.evaluator import decode_predictions

        cfg = self.cfg
        v = cfg.model.max_vertices
        prep = [self._preprocess(c) for c in clouds]

        # Group by bucket, then chunk each group to the fixed batch size.
        by_bucket: Dict[int, List[int]] = {}
        for i, p in enumerate(prep):
            by_bucket.setdefault(
                choose_bucket(p["pc"].shape[0], self.buckets), []).append(i)

        results: List[Optional[Dict]] = [None] * len(prep)
        d = cfg.model.input_dim
        for bucket, idxs in sorted(by_bucket.items()):
            for k in range(0, len(idxs), self.batch_size):
                chunk = idxs[k:k + self.batch_size]
                x = np.zeros((self.batch_size, bucket, d), np.float32)
                for j, i in enumerate(chunk):
                    # Fresh content-keyed RNG per cloud (ADVICE r2): a
                    # shared mutating RNG made identical requests return
                    # different downsamples (and raced across threads).
                    x[j] = pad_or_sample(prep[i]["pc"], bucket,
                                         self._cloud_rng(prep[i]["pc"]))
                    if cfg.data.z_sort_points:
                        from wireframe_tpu.data.bucketing import (
                            z_sort_rows,
                        )

                        x[j] = z_sort_rows(x[j])
                preds = self._forward(self.params, jnp.asarray(x), None)
                verts = np.asarray(preds["vertices"])
                probs = np.asarray(preds["edge_probs"])
                counts = np.asarray(preds["actual_vertex_counts"])
                exist = np.asarray(preds["existence_probabilities"])
                for j, i in enumerate(chunk):
                    results[i] = self._decode_one(
                        verts[j], probs[j], int(counts[j]), exist[j],
                        prep[i], v, decode_predictions)
        return results  # type: ignore[return-value]

    def _cloud_rng(self, pc: np.ndarray) -> np.random.Generator:
        """Deterministic per-request RNG keyed off the cloud's content, so
        serving is reproducible (same cloud -> same downsample -> same
        wireframe) and thread-safe (no shared mutable state)."""
        import zlib

        digest = zlib.crc32(np.ascontiguousarray(pc, np.float32).tobytes())
        return np.random.default_rng(
            np.random.SeedSequence([self.cfg.data.seed, digest]))

    def _decode_one(self, verts, probs, count, existence, prep, v,
                    decode_predictions) -> Dict:
        cfg = self.cfg
        if cfg.model.slot_mask_mode == "existence":
            live = existence > cfg.eval.vertex_existence_thresh
            dec = decode_predictions(verts, probs, count, v,
                                     cfg.eval.edge_confidence_thresh,
                                     live_mask=live)
            live_idx = np.nonzero(live)[0]
            remap = -np.ones(v, dtype=np.int64)
            remap[live_idx] = np.arange(len(live_idx))
            out_verts = dec["vertices"][live_idx]
            edges = remap[dec["edges"]]
        else:
            dec = decode_predictions(verts, probs, count, v,
                                     cfg.eval.edge_confidence_thresh)
            out_verts = dec["vertices"][:count]
            edges = dec["edges"][(dec["edges"] < count).all(axis=1)] \
                if len(dec["edges"]) else dec["edges"]
        out_verts = (np.asarray(out_verts, np.float64)
                     * prep["max_distance"] + prep["centroid"])
        return {
            "vertices": out_verts,
            "edges": np.asarray(edges, np.int64).reshape(-1, 2),
            "num_vertices": int(len(out_verts)),
            "num_edges": int(len(edges)),
        }

    def predict_files(self, paths: Sequence[str],
                      out_dir: Optional[str] = None) -> List[Dict]:
        """Predict from `.xyz` files; optionally write `.obj` outputs."""
        from wireframe_tpu.io import save_wireframe
        from wireframe_tpu.io.xyz import read_xyz

        results = self.predict([read_xyz(p) for p in paths])
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            for p, r in zip(paths, results):
                name = os.path.splitext(os.path.basename(p))[0] + ".obj"
                save_wireframe(r["vertices"], r["edges"],
                               os.path.join(out_dir, name))
                r["obj_path"] = os.path.join(out_dir, name)
        return results
