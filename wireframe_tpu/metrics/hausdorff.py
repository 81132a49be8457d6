"""Segment-to-segment Hausdorff distance (sampled).

Semantics of eval/ap_calculator.py:8-36: each 3D segment is discretized
into `sample_points` equally spaced points (endpoints included); the
distance between two segments is the symmetric Hausdorff distance between
their point sets; returns the full N x M matrix.

Two implementations with identical outputs:
- numpy (host eval path, mirrors the reference numerically),
- jax (jit/vmap-able, static shapes — used by the on-device eval pipeline
  and the benchmark; O(N*M*S^2) contractions map well onto the VPU/MXU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sample_segments_np(lines: np.ndarray, s: int) -> np.ndarray:
    # lines: (K, 2, 3) -> (K, S, 3)
    w = np.linspace(0.0, 1.0, s).reshape(1, s, 1)
    a = lines[:, 0, :][:, None, :]
    b = lines[:, 1, :][:, None, :]
    return a + w * (b - a)


def hausdorff_distance_line(p_line: np.ndarray, t_line: np.ndarray,
                            sample_points: int = 20) -> np.ndarray:
    """(N,2,3) x (M,2,3) -> (N,M) symmetric Hausdorff matrix (numpy)."""
    p_line = np.asarray(p_line, dtype=np.float64)
    t_line = np.asarray(t_line, dtype=np.float64)
    n, m = p_line.shape[0], t_line.shape[0]
    if n == 0:
        return np.array([])
    ps = _sample_segments_np(p_line, sample_points)  # (N, S, 3)
    ts = _sample_segments_np(t_line, sample_points)  # (M, S, 3)
    # (N, M, S, S) pairwise point distances
    diff = ps[:, None, :, None, :] - ts[None, :, None, :, :]
    d = np.sqrt(np.sum(diff * diff, axis=-1))
    h_pt = d.min(axis=3).max(axis=2)  # sup_p inf_t
    h_tp = d.min(axis=2).max(axis=2)  # sup_t inf_p
    return np.maximum(h_pt, h_tp)


def hausdorff_distance_line_jax(p_line: jnp.ndarray, t_line: jnp.ndarray,
                                sample_points: int = 20) -> jnp.ndarray:
    """JAX twin of hausdorff_distance_line; static shapes, jittable."""
    w = jnp.linspace(0.0, 1.0, sample_points)[None, :, None]
    ps = p_line[:, 0, None, :] + w * (p_line[:, 1, None, :] - p_line[:, 0, None, :])
    ts = t_line[:, 0, None, :] + w * (t_line[:, 1, None, :] - t_line[:, 0, None, :])
    diff = ps[:, None, :, None, :] - ts[None, :, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    h_pt = d.min(axis=3).max(axis=2)
    h_tp = d.min(axis=2).max(axis=2)
    return jnp.maximum(h_pt, h_tp)
