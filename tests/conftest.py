"""Test config: run everything on CPU with 8 virtual devices.

This is the standard way to exercise pjit/shard_map sharding logic without
a TPU pod (SURVEY.md §4): XLA's host platform is forced to expose 8
devices, so `jax.sharding.Mesh` tests see a real multi-device topology.
Must run before jax initializes, hence the env mutation at import time.
"""

import os

# Force CPU even when the image points JAX at a TPU (a sitecustomize
# registers the 'axon' plugin and sets jax_platforms itself, so the env
# var alone is not enough): the tunnel platform lacks host callbacks
# (pure_callback) and compiles slowly; unit tests must be deterministic
# and hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual-CPU mesh, got " + str(jax.devices()))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_synthetic_sample(rng, n_points=256, n_verts=8, n_extra_edges=4,
                          input_dim=8):
    """A random 'building': vertices on a unit sphere-ish cloud, a cycle of
    edges plus a few chords.  Returns (point_cloud, vertices, edges)."""
    verts = rng.normal(size=(n_verts, 3)) * 0.5
    # points scattered near edges to be vaguely structured
    pc = np.zeros((n_points, input_dim))
    pc[:, :3] = rng.normal(size=(n_points, 3)) * 0.6
    if input_dim > 3:
        pc[:, 3:7] = rng.uniform(0, 255, size=(n_points, 4))
    if input_dim == 8:
        pc[:, 7] = rng.uniform(0, 50000, size=n_points)
    edges = [(i, (i + 1) % n_verts) for i in range(n_verts)]
    while len(edges) < n_verts + n_extra_edges:
        a, b = rng.integers(0, n_verts, 2)
        if a != b and (min(a, b), max(a, b)) not in [
                (min(x), max(x)) for x in edges]:
            edges.append((int(a), int(b)))
    edges = np.array([(min(a, b), max(a, b)) for a, b in edges], dtype=np.int64)
    return pc, verts, edges


@pytest.fixture
def synthetic_sample(rng):
    return make_synthetic_sample(rng)
