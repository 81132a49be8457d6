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


def warm_start_params(state: Any, directory: str) -> Any:
    """Load the latest checkpoint's params into `state`, keeping the
    fresh optimizer state and step counter (TrainConfig.init_from — the
    synthetic-pretrain → real-finetune path, unlike `--resume` which
    restores the optimizer too).  The checkpoint's param tree must match
    the state's exactly (architecture mismatch raises)."""
    payload, _ = load_checkpoint(directory)
    params = jax.tree_util.tree_map(jax.numpy.asarray, payload["params"])

    # Structure AND shape check: mismatched architectures fail loudly
    # here instead of at the first apply.
    def _check(a, b):
        if a.shape != b.shape:
            raise ValueError(
                f"init_from checkpoint param shape {b.shape} does not "
                f"match the configured architecture's {a.shape}")

    jax.tree_util.tree_map(_check, state.params, params)
    state = state.replace(params=params)
    if state.ema_params is not None:
        # Re-seed the EMA trajectory from the warm-start weights.
        state = state.replace(ema_params=jax.tree_util.tree_map(
            jax.numpy.array, params))
    return state


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
        # Keys added to ModelConfig AFTER this checkpoint was written
        # restore with today's default, which may differ from the
        # behavior the weights were trained under — make that loud
        # instead of silent (ROADMAP #13).
        stale = sorted(k for k in vars(cfg.model) if k not in saved)
        if stale:
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint metadata predates model config key(s) %s; "
                "restoring with current defaults — verify they match the "
                "training-time behavior", ", ".join(stale))
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

def import_torch_state_dict(pth_path: str):
    """Load the reference's `.pth` as (state_dict_numpy, max_vertices)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    out = {k: np.asarray(v) for k, v in sd.items()}
    final = out.get("vertex_predictor.final_layer.weight")
    max_vertices = final.shape[0] // 4 if final is not None else None
    return out, max_vertices


def torch_to_flax_params(sd: dict, num_heads: int = 8) -> dict:
    """Full weight transplantation: reference PyTorch state_dict -> flax
    params for the reference-parity model (model.vertex_head="mlp").

    Layout rules (every torch Linear weight is (out, in); flax Dense
    kernels are (in, out), hence the transposes):
      encoder.mlp.{4i}/{4i+1}      -> encoder/stage{i}_* (Linear + LN)
      encoder.mlp.16               -> encoder/proj_*
      encoder.feature_fusion.{0,3,6}/{1,4} -> encoder/fusion Dense_{0,1,2}
                                              + LayerNorm_{0,1}
      vertex_predictor.vertex_mlp{k}.{0,1} -> vertex_predictor/mlp{k}
      final_layer / residual_proj{1,2} / point_pool_proj -> same names
        (point_pool_proj exists in the state_dict only if a forward ran
        before torch.save — the reference creates it lazily,
        VertexPredictor.py:94-97)
      edge_predictor.vertex_proj.{0,3}/{1,4} -> edge Dense_{0,1} + LN_{0,1}
      edge_predictor.attention     -> packed in_proj_weight (3H, H) split
        into flax query/key/value kernels (H, heads, head_dim) per
        models/EdgePredictor.py:41-46; out_proj -> out kernel
        (heads, head_dim, H)
      edge_predictor.edge_mlp.{0,4,8,10}/{1,5} -> edge Dense_{2..5}
        + LayerNorm_{2,3}
      edge_predictor.spatial_proj  -> dead in the reference (never called,
        quirk 9) — skipped.
    """
    def t(key):  # torch Linear weight -> flax kernel
        return np.asarray(sd[key]).T.copy()

    def v(key):
        return np.asarray(sd[key]).copy()

    def dense(prefix):
        return {"kernel": t(prefix + ".weight"), "bias": v(prefix + ".bias")}

    def ln(prefix):
        return {"scale": v(prefix + ".weight"), "bias": v(prefix + ".bias")}

    encoder = {}
    n_stages = 0
    while f"encoder.mlp.{4 * n_stages}.weight" in sd and (
            f"encoder.mlp.{4 * n_stages + 1}.weight" in sd):
        i = n_stages
        encoder[f"stage{i}_w"] = t(f"encoder.mlp.{4 * i}.weight")
        encoder[f"stage{i}_b"] = v(f"encoder.mlp.{4 * i}.bias")
        encoder[f"stage{i}_ln_scale"] = v(f"encoder.mlp.{4 * i + 1}.weight")
        encoder[f"stage{i}_ln_bias"] = v(f"encoder.mlp.{4 * i + 1}.bias")
        n_stages += 1
    encoder["proj_w"] = t(f"encoder.mlp.{4 * n_stages}.weight")
    encoder["proj_b"] = v(f"encoder.mlp.{4 * n_stages}.bias")
    encoder["fusion"] = {
        "Dense_0": dense("encoder.feature_fusion.0"),
        "LayerNorm_0": ln("encoder.feature_fusion.1"),
        "Dense_1": dense("encoder.feature_fusion.3"),
        "LayerNorm_1": ln("encoder.feature_fusion.4"),
        "Dense_2": dense("encoder.feature_fusion.6"),
    }

    vertex = {
        "final_layer": dense("vertex_predictor.final_layer"),
        "residual_proj1": dense("vertex_predictor.residual_proj1"),
        "residual_proj2": dense("vertex_predictor.residual_proj2"),
    }
    for k in (1, 2, 3, 4):
        vertex[f"mlp{k}"] = {
            "Dense_0": dense(f"vertex_predictor.vertex_mlp{k}.0"),
            "LayerNorm_0": ln(f"vertex_predictor.vertex_mlp{k}.1"),
        }
    if "vertex_predictor.point_pool_proj.weight" in sd:
        vertex["point_pool_proj"] = dense("vertex_predictor.point_pool_proj")
    else:
        raise KeyError(
            "state_dict lacks vertex_predictor.point_pool_proj — the "
            "reference creates it lazily on the first forward; run one "
            "forward before torch.save, or load with strict=False "
            "semantics by injecting a fresh flax init for this layer")

    in_w = np.asarray(sd["edge_predictor.attention.in_proj_weight"])
    in_b = np.asarray(sd["edge_predictor.attention.in_proj_bias"])
    h = in_w.shape[1]
    head_dim = h // num_heads

    def qkv(part):
        w = in_w[part * h:(part + 1) * h]   # (H_out, H_in) torch layout
        b = in_b[part * h:(part + 1) * h]
        return {"kernel": w.T.reshape(h, num_heads, head_dim).copy(),
                "bias": b.reshape(num_heads, head_dim).copy()}

    out_w = np.asarray(sd["edge_predictor.attention.out_proj.weight"])
    attention = {
        "query": qkv(0),
        "key": qkv(1),
        "value": qkv(2),
        "out": {
            "kernel": out_w.T.reshape(num_heads, head_dim, h).copy(),
            "bias": v("edge_predictor.attention.out_proj.bias"),
        },
    }

    edge = {
        "Dense_0": dense("edge_predictor.vertex_proj.0"),
        "LayerNorm_0": ln("edge_predictor.vertex_proj.1"),
        "Dense_1": dense("edge_predictor.vertex_proj.3"),
        "LayerNorm_1": ln("edge_predictor.vertex_proj.4"),
        "attention": attention,
        "Dense_2": dense("edge_predictor.edge_mlp.0"),
        "LayerNorm_2": ln("edge_predictor.edge_mlp.1"),
        "Dense_3": dense("edge_predictor.edge_mlp.4"),
        "LayerNorm_3": ln("edge_predictor.edge_mlp.5"),
        "Dense_4": dense("edge_predictor.edge_mlp.8"),
        "Dense_5": dense("edge_predictor.edge_mlp.10"),
    }

    return {"encoder": encoder, "vertex_predictor": vertex,
            "edge_predictor": edge}


def load_torch_checkpoint_as_params(pth_path: str, num_heads: int = 8):
    """One-call import: reference `.pth` -> (flax params, max_vertices)."""
    sd, max_vertices = import_torch_state_dict(pth_path)
    return torch_to_flax_params(sd, num_heads=num_heads), max_vertices
