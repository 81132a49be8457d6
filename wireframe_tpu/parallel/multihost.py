"""Multi-host (pod-scale) data loading helpers.

On a multi-host TPU pod each process sees only its local devices; the
global batch is assembled from per-host shards
(`jax.make_array_from_process_local_data`).  The reference has no
distributed anything; this module provides the host-side sharding math
and the assembly step for pod-scale training/eval (SURVEY.md §7 step 7).

Single-host behavior is the identity, so the same code path runs
everywhere (and is what the unit tests exercise; true multi-process runs
need `jax.distributed.initialize` at program start).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_shard_indices(num_items: int, process_index: int = None,
                       process_count: int = None) -> List[int]:
    """Deterministic round-robin split of dataset indices across hosts.

    Round-robin (not contiguous blocks) keeps per-host sample counts
    balanced to within one for any corpus ordering.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, num_items, pc))


def host_batch_slice(global_batch: int, process_index: int = None,
                     process_count: int = None) -> int:
    """Per-host batch size for an evenly divisible global batch."""
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (
        f"global batch {global_batch} not divisible by {pc} hosts")
    return global_batch // pc


def replicate_across_hosts(mesh: Mesh, tree):
    """Fully replicate a pytree over a (possibly multi-process) mesh.

    Every process must hold IDENTICAL values (e.g. params initialized
    from the same PRNGKey) — each contributes its full copy as the
    process-local data of a replicated global array.  Single-host this
    is equivalent to `parallel.mesh.replicate`.
    """
    s = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def assemble_global_batch(mesh: Mesh, local_batch: dict,
                          batch_axis: str = "dp") -> dict:
    """Build global device arrays from per-host local batches.

    Each host contributes its local shard of the batch axis; point_clouds
    additionally shard their point axis over "mp" per
    `parallel.mesh.batch_sharding`.

    Every key must be in the batch-sharding layout (ADVICE r2): a key
    outside it would be placed with a replicated P() spec built from
    process-LOCAL data — if hosts ever passed different values, each
    host's devices would silently hold different data under a sharding
    that claims replication.  Use `replicate_across_hosts` explicitly for
    values that are verified identical on every host.
    """
    from wireframe_tpu.parallel.mesh import batch_sharding

    layout = batch_sharding(mesh)
    extra = sorted(set(local_batch) - set(layout))
    if extra:
        raise ValueError(
            f"assemble_global_batch: keys {extra} are not in the batch "
            "sharding layout; replicate host-identical values via "
            "replicate_across_hosts instead")
    return {
        k: jax.make_array_from_process_local_data(layout[k], np.asarray(v))
        for k, v in local_batch.items()
    }
