"""Shared synthetic train-batch builder.

One definition of the fixed-shape batch contract (the dict
`make_train_step` consumes, see `parallel/mesh.py:batch_sharding` for
the layout) for every tool, test, and the driver's multichip dryrun —
previously copy-pasted in five places, where a contract change (e.g. a
new batch key) had to be replicated by hand.

Returns HOST numpy arrays; callers device_put/shard as appropriate.
"""

from __future__ import annotations

import numpy as np

from wireframe_tpu.ops.pairs import num_pairs


def make_random_batch(cfg, batch_size: int, *, num_points: int = None,
                      seed: int = 0, edge_density: float = 0.1) -> dict:
    """Random counts-masked batch matching `cfg`'s model/data shapes.

    Vertex slots at index >= vertex_counts[i] are zeroed, mirroring the
    collate path's padding (`data/building3d.py:collate_fixed`).
    """
    n = cfg.data.num_points if num_points is None else num_points
    d, v = cfg.model.input_dim, cfg.model.max_vertices
    e = num_pairs(v)
    r = np.random.default_rng(seed)
    counts = r.integers(4, v + 1, size=batch_size).astype(np.int32)
    slot_live = np.arange(v)[None, :] < counts[:, None]
    return {
        "point_clouds": r.normal(
            size=(batch_size, n, d)).astype(np.float32),
        "target_vertices": (
            r.normal(size=(batch_size, v, 3))
            * slot_live[:, :, None]).astype(np.float32),
        "vertex_existence": slot_live.astype(np.float32),
        "vertex_counts": counts,
        "edge_labels": (
            r.random((batch_size, e)) < edge_density).astype(np.float32),
    }
