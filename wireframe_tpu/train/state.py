"""Train state: params + optimizer, matching the reference regime.

Optimizer parity with train.py:96 + train.py:141: global-norm gradient
clipping at 1.0, then torch-style Adam — lr 1e-3, betas (0.9, 0.999),
eps 1e-8, and *coupled* L2 weight decay 1e-6 (torch.optim.Adam adds
wd * param to the gradient BEFORE the Adam moments, which is
`optax.add_decayed_weights` before `scale_by_adam` — NOT AdamW).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wireframe_tpu.config import Config
from wireframe_tpu.models.wireframe import PointCloudToWireframe


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)
    # EMA of params (None when train.ema_decay == 0); updated in the
    # jitted train step, saved as a separate `/ema` checkpoint.
    ema_params: Any = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_lr_schedule(cfg: Config, steps_per_epoch: int = 1):
    """Scalar LR schedule per cfg.train.lr_schedule.

    "constant" reproduces the reference (Adam lr=1e-3 forever,
    train.py:96); "warmup_cosine" warms up linearly for `warmup_steps`
    optimizer steps then cosine-decays to learning_rate * lr_min_ratio
    at num_epochs * steps_per_epoch steps.
    """
    t = cfg.train
    if t.lr_schedule == "constant":
        return t.learning_rate
    if t.lr_schedule == "warmup_cosine":
        total = max(t.num_epochs * max(steps_per_epoch, 1), t.warmup_steps + 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=t.learning_rate,
            warmup_steps=t.warmup_steps,
            decay_steps=total,
            end_value=t.learning_rate * t.lr_min_ratio,
        )
    raise ValueError(f"Unknown lr_schedule: {t.lr_schedule!r}")


def make_optimizer(cfg: Config,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    t = cfg.train
    lr = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.add_decayed_weights(t.weight_decay),
        optax.scale_by_adam(b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps),
        optax.scale_by_learning_rate(lr),
    )
    if t.flatten_optimizer:
        tx = optax.flatten(tx)
    return tx


def create_train_state(cfg: Config, rng: jax.Array,
                       sample_batch_shape=None,
                       steps_per_epoch: int = 1) -> TrainState:
    """Initialize model params + optimizer.

    sample_batch_shape: optional (B, N, D); defaults from config.
    steps_per_epoch sizes the cosine decay horizon (ignored for the
    constant schedule); pass len(loader) for full-corpus training.
    """
    model = PointCloudToWireframe(cfg.model)
    if sample_batch_shape is None:
        sample_batch_shape = (1, cfg.data.num_points, cfg.model.input_dim)
    tx = make_optimizer(cfg, steps_per_epoch)

    # One jitted program for model + optimizer + EMA init.  Eager init
    # dispatches thousands of tiny ops; on a tunneled TPU each pays the
    # ~25 ms host round trip, making init the DOMINANT cold-start cost
    # (measured 205-214 s, tools/compile_report.py — warm compile cache
    # included, since eager ops never hit it).  As one program it
    # compiles in seconds, lands in the persistent cache, and reruns in
    # well under a second.  The EMA starts as an explicit jnp.copy:
    # copy_p is never elided, so the ema buffers are distinct from the
    # params buffers — the train step donates the whole state, and
    # donating one buffer through two pytree slots is a TPU runtime
    # error (verified on-chip).
    want_ema = cfg.train.ema_decay > 0

    def _init(rng, x, counts):
        params = model.init({"params": rng}, x, counts,
                            train=False)["params"]
        ema = (jax.tree_util.tree_map(jnp.copy, params)
               if want_ema else None)
        return params, tx.init(params), ema

    dummy = jnp.zeros(sample_batch_shape, jnp.float32)
    dummy_counts = jnp.full((sample_batch_shape[0],), 4, jnp.int32)
    params, opt_state, ema_params = jax.jit(_init)(rng, dummy, dummy_counts)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        tx=tx,
        apply_fn=model.apply,
        ema_params=ema_params,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
