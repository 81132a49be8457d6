"""Device mesh + sharding layout.

The reference has no distributed code at all (SURVEY.md §2: single
cuda-or-cpu device, train.py:21).  This module is the additive TPU
scaling path, built the JAX way: declare a `Mesh` and `NamedSharding`s
for the data, and let GSPMD partition the jitted train step and insert
the ICI collectives (all-reduce for the gradient sum over `dp`,
psum/pmax for the point-axis pooling reductions over `mp`).  Framework
code never calls a collectives API for the data path.

Axes:
  dp — data parallel: batch dimension of every tensor.
  mp — point parallel: the points-per-cloud axis of `point_clouds`
       (the per-point MLP is pointwise; masked mean/max pooling are
       associative reductions, so GSPMD reduces them over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, mp) mesh.  dp=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} exceeds {n} devices"
    grid = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> dict:
    """NamedShardings for a fixed-shape train batch: batch axis over dp,
    point axis over mp."""
    return {
        "point_clouds": NamedSharding(mesh, P("dp", "mp", None)),
        "target_vertices": NamedSharding(mesh, P("dp", None, None)),
        "vertex_existence": NamedSharding(mesh, P("dp", None)),
        "vertex_counts": NamedSharding(mesh, P("dp")),
        "edge_labels": NamedSharding(mesh, P("dp", None)),
    }


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put the batch with its shardings (keys not in the layout are
    replicated)."""
    layout = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        s = layout.get(k, NamedSharding(mesh, P()))
        out[k] = jax.device_put(v, s)
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
