"""Checkpoint / resume via orbax.

The reference saves only a final `state_dict` (main.py:53) and recovers
`max_vertices` by sniffing a weight shape at load time (evaluate.py:49-52,
quirk 10).  Here checkpoints carry params + optimizer state + step +
explicit metadata (max_vertices, input_dim, config json), support periodic
mid-run saves and deterministic resume, and a converter can import the
reference's PyTorch `.pth` layout for side-by-side parity testing.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from wireframe_tpu.config import Config, config_to_dict


def save_checkpoint(directory: str, step: int, params: Any,
                    opt_state: Any = None,
                    cfg: Optional[Config] = None,
                    epoch: Optional[int] = None) -> str:
    """Write checkpoint `directory/step_<N>`; returns the path.

    `step` is always the OPTIMIZER step (monotonic across mid-run and
    final saves, so `latest_step` ordering is correct); `epoch` is the
    completed-epoch count, stamped separately in metadata because the two
    units differ whenever an epoch has more than one batch — resume must
    use `meta["epoch"]`, never `step` (ADVICE r1, main.py:116).
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {"step": int(step)}
    if epoch is not None:
        meta["epoch"] = int(epoch)
    if cfg is not None:
        meta["config"] = config_to_dict(cfg)
        meta["max_vertices"] = cfg.model.max_vertices
        meta["input_dim"] = cfg.model.input_dim
    with open(os.path.join(directory, f"step_{step}.meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".meta.json"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: Optional[int] = None,
                    template: Any = None) -> Tuple[dict, dict]:
    """Returns (payload, metadata).

    Pass `template` (a like-shaped pytree, e.g. {"params": ...,
    "opt_state": ...}) to restore exact pytree structure — REQUIRED when
    restoring `opt_state`, because without it orbax returns plain dicts
    where optax expects its NamedTuple states."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if template is not None:
        payload = ocp.StandardCheckpointer().restore(path, template)
    else:
        # Device-agnostic restore: a checkpoint written on TPU must load
        # on CPU (and vice versa).  The default restore pins the arrays
        # to the SAVED device sharding; force plain numpy instead.
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", meta)
        restore_args = jax.tree_util.tree_map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        payload = ckptr.restore(path, restore_args=restore_args)
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def apply_checkpoint_model_config(cfg: Config, meta: dict) -> Config:
    """Overwrite cfg's MODEL architecture fields from checkpoint metadata.

    Single source of truth for the architecture at load time (the
    reference instead sniffs `max_vertices` from a weight shape,
    evaluate.py:49-52 — quirk 10).  Data/eval knobs stay CLI-controlled.
    """
    saved = meta.get("config", {}).get("model")
    if saved:
        for key, value in saved.items():
            if hasattr(cfg.model, key):
                current = getattr(cfg.model, key)
                setattr(cfg.model, key,
                        tuple(value) if isinstance(current, tuple) else value)
        cfg.data.max_vertices = cfg.model.max_vertices
    elif meta.get("max_vertices"):
        cfg.data.max_vertices = int(meta["max_vertices"])
        cfg.model.max_vertices = cfg.data.max_vertices
    # Input-feature semantics must match training exactly or the restored
    # weights see a different input distribution.
    saved_data = meta.get("config", {}).get("data", {})
    for key in ("use_color", "use_intensity", "scale_intensity",
                "normalize"):
        if key in saved_data:
            setattr(cfg.data, key, saved_data[key])
    cfg.__post_init__()
    return cfg


# ---------------------------------------------------------------------------
# PyTorch `.pth` import (parity testing only; torch is CPU-only here).
# ---------------------------------------------------------------------------

_TORCH_TO_FLAX_NOTES = """
Mapping reference state_dict -> flax params (transposed Dense kernels):
  encoder.mlp.{0,4,8,12}.*        -> encoder/point_mlp/dense_*  (+ LayerNorm 1,5,9,13)
  encoder.mlp.16.*                -> encoder/point_mlp/proj
  encoder.feature_fusion.{0,3,6}  -> encoder/fusion Dense_{0,1,2} (+ LN 1,4)
  vertex_predictor.vertex_mlp{1..4}.0 -> vertex_predictor/mlp{1..4}/Dense_0
  vertex_predictor.final_layer    -> vertex_predictor/final_layer
  vertex_predictor.residual_proj{1,2} -> same names
  vertex_predictor.point_pool_proj    -> same name (lazily created there)
  edge_predictor.*                -> edge head (attention layouts differ:
                                     torch packs QKV; flax splits per-head)
"""


def import_torch_state_dict(pth_path: str):
    """Load the reference's `.pth` and return (state_dict_numpy, max_vertices).

    Full weight transplantation is intentionally out of scope (the
    architectures are functionally equivalent but not weight-layout
    identical, e.g. packed-QKV attention); this importer exists so parity
    tooling can read reference checkpoints' shapes/metadata.
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    out = {k: np.asarray(v) for k, v in sd.items()}
    final = out.get("vertex_predictor.final_layer.weight")
    max_vertices = final.shape[0] // 4 if final is not None else None
    return out, max_vertices
