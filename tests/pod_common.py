"""Shared fixture builder for the multi-process pod test.

Imported both by the pytest process (single-process 8-device reference)
and by the spawned jax.distributed children, so the config and the
global batch are bit-identical everywhere.
"""

import numpy as np

from wireframe_tpu.config import Config
from wireframe_tpu.ops.pairs import num_pairs


def build_cfg_and_batch(b: int = 8, n: int = 128, max_vertices: int = 16):
    cfg = Config()
    cfg.data.num_points = n
    cfg.data.max_vertices = max_vertices
    cfg.train.device_augment = False
    cfg.train.matcher = "device"
    # Tiny model: the pod test exercises the CROSS-PROCESS machinery
    # (assembly, replication, GSPMD collectives, counter merge), not the
    # architecture — full dims push the per-child compile+run past the
    # subprocess timeout (measured ~7 min/child at default dims).
    cfg.model.encoder_hidden_dims = (64, 128, 256, 128)
    cfg.model.encoder_output_dim = 64
    cfg.model.edge_hidden_dim = 64
    cfg.model.edge_num_heads = 4
    cfg.__post_init__()

    d, v = cfg.model.input_dim, cfg.model.max_vertices
    e = num_pairs(v)
    r = np.random.default_rng(0)
    counts = r.integers(4, v + 1, size=b).astype(np.int32)
    batch = {
        "point_clouds": r.normal(size=(b, n, d)).astype(np.float32),
        "target_vertices": (
            r.normal(size=(b, v, 3))
            * (np.arange(v)[None, :, None] < counts[:, None, None])
        ).astype(np.float32),
        "vertex_existence": (
            np.arange(v)[None, :] < counts[:, None]).astype(np.float32),
        "vertex_counts": counts,
        "edge_labels": (r.random((b, e)) < 0.1).astype(np.float32),
    }
    return cfg, batch
