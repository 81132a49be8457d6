"""Jitted train / eval steps.

ONE compiled program per step: (optional) batched device augmentation ->
forward -> Hungarian-matched loss (assignment solved on device) ->
grads -> clip -> Adam.  Nothing syncs to the host inside the loop —
the reference's per-step GPU->CPU scipy round trip
(losses/WireframeLoss.py:235-236) and per-sample `.item()` slicing
(PointCloudToWireframe.py:81,90) have no equivalent here.

Also computes the reference's monitoring metric in-graph: index-aligned
vertex RMSE of sample 0's GT-count prefix (train.py:148-151), plus a
batched Hungarian RMSE (the metric models/utils.py:38-55 defines but
never calls — quirk 5, we log both).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wireframe_tpu.config import Config
from wireframe_tpu.data.augment import augment_batch
from wireframe_tpu.losses.wireframe_loss import WireframeLossConfig, wireframe_loss
from wireframe_tpu.train.state import TrainState


def _monitor_metrics(pred_vertices, batch, matched_cols) -> Dict[str, jnp.ndarray]:
    tgt = batch["target_vertices"]
    counts = batch["vertex_counts"].astype(jnp.int32)
    v = tgt.shape[1]
    slot = jnp.arange(v, dtype=jnp.int32)

    # Index-aligned RMSE over sample 0's prefix (reference monitor).
    m0 = (slot < counts[0]).astype(jnp.float32)[:, None]
    diff0 = (pred_vertices[0] - tgt[0]) * m0
    n0 = jnp.maximum(jnp.sum(m0) * 3.0, 1.0)
    rmse0 = jnp.sqrt(jnp.sum(diff0 * diff0) / n0)

    # Hungarian RMSE over the whole batch using the loss's matching.
    matched = matched_cols < counts[:, None]
    tgt_m = jnp.take_along_axis(
        tgt, jnp.where(matched, matched_cols, 0)[..., None].astype(jnp.int32),
        axis=1)
    d = (pred_vertices - tgt_m) * matched[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(matched.astype(jnp.float32)) * 3.0, 1.0)
    h_rmse = jnp.sqrt(jnp.sum(d * d) / n)
    return {"vertex_rmse": rmse0, "hungarian_rmse": h_rmse}


def _edge_prf(edge_probs, losses, thresh: float = 0.5):
    """In-graph train-batch edge precision/recall/F1 at `thresh`, against
    the labels the edge BCE actually used (matched labels when
    train.matched_edge_labels; a live-pair observability metric the
    reference never logs)."""
    labels = losses["edge_labels_eff"]
    mask = losses["pair_mask_eff"]
    pred_pos = (edge_probs > thresh).astype(jnp.float32) * mask
    pos = labels * mask
    tp = jnp.sum(pred_pos * pos)
    p = tp / jnp.maximum(jnp.sum(pred_pos), 1.0)
    r = tp / jnp.maximum(jnp.sum(pos), 1.0)
    f1 = 2.0 * p * r / jnp.maximum(p + r, 1e-9)
    return {"train_edge_precision": p, "train_edge_recall": r,
            "train_edge_f1": f1}


def make_train_step(cfg: Config) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    loss_cfg = WireframeLossConfig(
        vertex_weight=cfg.train.vertex_weight,
        edge_weight=cfg.train.edge_weight,
        existence_weight=cfg.train.existence_weight,
        matcher=cfg.train.matcher,
        matched_edge_labels=cfg.train.matched_edge_labels,
        matched_existence_labels=cfg.train.matched_existence_labels,
    )
    do_augment = cfg.train.device_augment and cfg.data.augment
    ema_decay = cfg.train.ema_decay

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng_aug, rng_drop = jax.random.split(rng)
        point_clouds = batch["point_clouds"]
        target_vertices = batch["target_vertices"]
        if do_augment:
            point_clouds, target_vertices = augment_batch(
                rng_aug, point_clouds, target_vertices,
                rot_degrees=cfg.train.aug_rot_degrees,
                jitter_std=cfg.train.aug_jitter_std,
                scale_range=cfg.train.aug_scale_range)
        work_batch = dict(batch,
                          point_clouds=point_clouds,
                          target_vertices=target_vertices)

        def loss_fn(params):
            preds = state.apply_fn(
                {"params": params},
                work_batch["point_clouds"],
                work_batch["vertex_counts"],
                train=True,
                rngs={"dropout": rng_drop},
            )
            targets = {
                "vertices": work_batch["target_vertices"],
                "vertex_existence": work_batch["vertex_existence"],
                "edge_labels": work_batch["edge_labels"],
                "vertex_counts": work_batch["vertex_counts"],
            }
            losses = wireframe_loss(preds, targets, loss_cfg)
            return losses["total_loss"], (losses, preds)

        (total, (losses, preds)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        if ema_decay > 0:
            new_state = new_state.replace(ema_params=jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, new_state.params))

        metrics = {
            "total_loss": total,
            "vertex_loss": losses["vertex_loss"],
            "existence_loss": losses["existence_loss"],
            "edge_loss": losses["edge_loss"],
            "grad_norm": optax_global_norm(grads),
        }
        metrics.update(_monitor_metrics(
            preds["vertices"], work_batch, losses["matched_cols"]))
        metrics.update(_edge_prf(preds["edge_probs"], losses))
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_forward_fn(cfg: Config, train: bool = False) -> Callable:
    """Jittable inference forward: (params, point_clouds, counts?) -> preds."""
    from wireframe_tpu.models.wireframe import PointCloudToWireframe

    model = PointCloudToWireframe(cfg.model)

    def forward(params, point_clouds,
                target_vertex_counts: Optional[jnp.ndarray] = None):
        return model.apply({"params": params}, point_clouds,
                           target_vertex_counts, train=train)

    return forward
