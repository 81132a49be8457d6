"""Optimized-HLO collective-size audit for mesh-sharded programs.

A GSPMD regression that only bites at production shapes — the accidental
(B, N, 512) activation all-gather `parallel/sharded_pool.py` warns
about — is invisible to toy-shape mesh tests.  This module compiles the
full train step ABSTRACTLY (ShapeDtypeStructs carry the shardings, so no
full-size arrays are materialized) and scans the optimized HLO for data
collectives above a byte budget.  Shared by
`tests/test_sharding.py::test_full_recipe_shape_mesh_compile` and the
driver's `__graft_entry__.dryrun_multichip` second tier (r4 VERDICT #5:
the recorded multichip evidence should itself rule out the oversized-
collective regression, not delegate to a slow test the driver never
runs).
"""

from __future__ import annotations

import re

_HLO_SHAPE = re.compile(
    r"\b(f32|bf16|f16|s32|u32|s64|u64|s8|u8|pred)\[([\d,]*)\]")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1}

DEFAULT_OPS = ("all-gather", "all-to-all", "collective-permute")


def collective_sizes(hlo_text: str, ops=DEFAULT_OPS):
    """[(op, dtype[shape], bytes)] for every collective in optimized HLO.

    Scans the result shape of each matching instruction line; `psum`-
    style all-reduces are excluded by default because gradient reductions
    legitimately span the whole parameter tree.
    """
    out = []
    for line in hlo_text.splitlines():
        for op in ops:
            if f" {op}(" not in line and f" {op}-start(" not in line:
                continue
            m = _HLO_SHAPE.search(line)
            if not m:
                continue
            dt, dims = m.group(1), m.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            out.append((op, f"{dt}[{dims}]", n * _DTYPE_BYTES[dt]))
    return out


def recipe_mesh_config(dp: int = 4, mp: int = 2):
    """`configs/recommended.yaml` at full production shapes (B=64,
    N=2560, V=40, decoder_dim=256, kv_pool=4) over a (dp, mp) mesh.

    use_pallas_encoder stays off: Pallas is shard-LOCAL compute with no
    sharding semantics, and it does not lower on the CPU backend; the
    XLA encoder path sees identical GSPMD partitioning.
    """
    from wireframe_tpu.config import Config

    cfg = Config()
    cfg.data.num_points = 2560
    cfg.data.max_vertices = 40
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.vertex_head = "query"
    cfg.model.decoder_dim = 256
    cfg.model.decoder_layers = 4
    cfg.model.decoder_heads = 8
    cfg.model.decoder_ffn_dim = 1024
    cfg.model.decoder_kv_pool = 4
    cfg.model.slot_mask_mode = "existence"
    cfg.model.edge_use_slot_features = True
    cfg.train.matched_edge_labels = True
    cfg.train.matched_existence_labels = True
    cfg.train.ema_decay = 0.999
    cfg.train.lr_schedule = "warmup_cosine"
    cfg.train.matcher = "device"
    cfg.train.batch_size = 64
    cfg.parallel.dp = dp
    cfg.parallel.mp = mp
    cfg.__post_init__()
    return cfg


def audit_train_step_collectives(cfg, mesh, max_bytes=48 * 2**20):
    """Abstractly lower + compile the full train step for `cfg` over
    `mesh`, and return the collective-size list from the optimized HLO.

    Raises AssertionError when any data collective (all-gather /
    all-to-all / collective-permute result) exceeds `max_bytes`.  The
    regression under guard: a (64, 2560, 512) activation gather is
    168 MB in bf16 / 336 MB in f32; legitimate data collectives at the
    recipe shapes are the point_clouds resharding (~5 MB) and small
    reductions — 48 MB of headroom.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wireframe_tpu.parallel.mesh import batch_sharding
    from wireframe_tpu.train.state import create_train_state
    from wireframe_tpu.train.step import make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               (1, cfg.data.num_points,
                                cfg.model.input_dim), steps_per_epoch=5)
    repl = NamedSharding(mesh, P())
    state_abs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype,
                                       sharding=repl), state)
    layout = batch_sharding(mesh)
    b = cfg.train.batch_size
    n, d = cfg.data.num_points, cfg.model.input_dim
    v = cfg.data.max_vertices
    e = v * (v - 1) // 2
    batch_shapes = {
        "point_clouds": ((b, n, d), np.float32),
        "target_vertices": ((b, v, 3), np.float32),
        "vertex_existence": ((b, v), np.float32),
        "vertex_counts": ((b,), np.int32),
        "edge_labels": ((b, e), np.float32),
    }
    batch_abs = {
        k: jax.ShapeDtypeStruct(s, dt, sharding=layout[k])
        for k, (s, dt) in batch_shapes.items()
    }
    rng_abs = jax.ShapeDtypeStruct((2,), np.uint32, sharding=repl)

    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    compiled = step.lower(state_abs, batch_abs, rng_abs).compile()
    sizes = collective_sizes(compiled.as_text())
    offenders = [s for s in sizes if s[2] > max_bytes]
    assert not offenders, (
        "oversized data collectives in the full-shape mesh program "
        f"(accidental activation gather?): {offenders}")
    return sizes
