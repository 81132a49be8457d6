"""TRUE multi-process pod test (ROADMAP #8).

Round 1 verified the multihost helpers only under process_count=1.  Here
two real OS processes, each exposing 4 virtual CPU devices, form an
8-device jax.distributed cluster and run the REAL pod code paths:

- `assemble_global_batch`: per-host local batch shards -> one global
  (dp, mp)-sharded batch;
- `replicate_across_hosts`: identical per-host params/opt_state -> fully
  replicated global arrays;
- the full jitted train step over the dp=4 x mp=2 mesh (GSPMD inserts
  the cross-process collectives);
- `eval.distributed.gather_merge`: cross-process APCalculator counter
  merge via process_allgather.

The loss from the 2-process run must match a single-process 8-device run
of the same global batch (this test process already has 8 virtual CPU
devices from conftest), and the merged counters must equal the exact
host-side sum.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import json, os, sys
sys.path.insert(0, os.environ["_POD_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["_POD_COORD"],
    num_processes=2,
    process_id=int(os.environ["_POD_PID"]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_devices()
assert jax.device_count() == 8, jax.devices()

import numpy as np
from tests.pod_common import build_cfg_and_batch
from wireframe_tpu.eval.distributed import (
    calculator_from_vector,
    counters_vector,
    gather_merge,
)
from wireframe_tpu.parallel.mesh import make_mesh
from wireframe_tpu.parallel.multihost import (
    assemble_global_batch,
    host_batch_slice,
    replicate_across_hosts,
)
from wireframe_tpu.train.state import create_train_state
from wireframe_tpu.train.step import make_train_step

pid = jax.process_index()
cfg, global_batch = build_cfg_and_batch()
b = global_batch["point_clouds"].shape[0]
per_host = host_batch_slice(b)
lo = pid * per_host
local_batch = {k: v[lo:lo + per_host] for k, v in global_batch.items()}

mesh = make_mesh(dp=4, mp=2)
state = create_train_state(cfg, jax.random.PRNGKey(0),
                           global_batch["point_clouds"].shape)
with mesh:
    state = state.replace(
        params=replicate_across_hosts(mesh, state.params),
        opt_state=replicate_across_hosts(mesh, state.opt_state))
    batch = assemble_global_batch(mesh, local_batch)
    step = jax.jit(make_train_step(cfg))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(np.asarray(metrics["total_loss"]))

# Cross-process counter merge: per-process distinct synthetic counters.
ap = calculator_from_vector(
    np.arange(9, dtype=np.float64) * (pid + 1), distance_thresh=1.0)
merged = gather_merge(ap)

print("POD_RESULT " + json.dumps({
    "pid": pid,
    "loss": loss,
    "merged": counters_vector(merged).tolist(),
}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_pod_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["_POD_REPO"] = repo
        env["_POD_COORD"] = coord
        env["_POD_PID"] = str(pid)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"pod child failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("POD_RESULT "):
                r = json.loads(line[len("POD_RESULT "):])
                results[r["pid"]] = r
    assert sorted(results) == [0, 1]

    # Single-process reference on this test process's own 8 CPU devices.
    import jax

    from tests.pod_common import build_cfg_and_batch
    from wireframe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    cfg, global_batch = build_cfg_and_batch()
    mesh = make_mesh(dp=4, mp=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               global_batch["point_clouds"].shape)
    with mesh:
        state = state.replace(params=replicate(mesh, state.params),
                              opt_state=replicate(mesh, state.opt_state))
        batch = shard_batch(mesh, global_batch)
        _, metrics = jax.jit(make_train_step(cfg))(
            state, batch, jax.random.PRNGKey(1))
        want_loss = float(np.asarray(metrics["total_loss"]))

    for pid in (0, 1):
        np.testing.assert_allclose(results[pid]["loss"], want_loss,
                                   rtol=1e-4, atol=1e-6)

    # Exact counter merge: sum of both processes' synthetic vectors.
    want = np.arange(9, dtype=np.float64) * 1 + np.arange(9) * 2.0
    for pid in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(results[pid]["merged"]), want)
