"""Multi-host helpers: sharding math + single-host assembly identity."""

import numpy as np

from wireframe_tpu.parallel.mesh import make_mesh
from wireframe_tpu.parallel.multihost import (
    assemble_global_batch,
    host_batch_slice,
    host_shard_indices,
)


def test_host_shard_indices_partition():
    n, hosts = 43, 4
    all_idx = []
    for p in range(hosts):
        part = host_shard_indices(n, p, hosts)
        all_idx += part
        assert len(part) in (n // hosts, n // hosts + 1)
    assert sorted(all_idx) == list(range(n))


def test_host_batch_slice():
    assert host_batch_slice(64, 0, 8) == 8
    import pytest
    with pytest.raises(AssertionError):
        host_batch_slice(10, 0, 4)


def test_assemble_single_host_identity(rng):
    mesh = make_mesh(dp=4, mp=2)
    batch = {
        "point_clouds": rng.normal(size=(8, 64, 8)).astype(np.float32),
        "vertex_counts": np.arange(8, dtype=np.int32),
    }
    out = assemble_global_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["point_clouds"]),
                                  batch["point_clouds"])
    np.testing.assert_array_equal(np.asarray(out["vertex_counts"]),
                                  batch["vertex_counts"])
