#!/usr/bin/env python3
"""Training entry point (reference: main.py).

Default behavior reproduces the reference regime: batch_size=3, 1000
epochs overfitting the first shuffled batch, Adam 1e-3, loss weights
3.0/1.0/1.5 — then saves a checkpoint.  `--set train.overfit_one_batch=false`
turns on the full-corpus epoch loop.

Usage:
  python main.py [--config cfg.yaml] [--data-root PATH] [--set key=val ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

logging.basicConfig(level=logging.INFO)
# orbax/absl INFO floods the console during checkpoint saves.
logging.getLogger("absl").setLevel(logging.WARNING)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="yaml config path")
    p.add_argument("--data-root", default=None,
                   help="Building3D corpus root (train/ + test/ subdirs)")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY=VALUE", help="config override, repeatable")
    p.add_argument("--wandb", action="store_true",
                   help="log to wandb when available")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in "
                        "--checkpoint-dir")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax debug_nans (fail fast on NaN)")
    return p.parse_args(argv)


def resolve_data_root(cli_root, allow_generate=True):
    """Locate (or synthesize) a Building3D corpus.

    Order: explicit --data-root > ./datasets > auto-generated synthetic
    demo corpus in ./datasets (tools/gen_demo_data.py).  The repo is
    self-contained: no path outside the tree is ever consulted — point
    --data-root at a real Building3D corpus for benchmark-comparable
    numbers.
    """
    if cli_root:
        if not os.path.isdir(os.path.join(cli_root, "train", "xyz")):
            raise SystemExit(
                f"--data-root {cli_root!r} has no train/xyz/ directory "
                "(expected Building3D layout: <root>/{train,test}/"
                "{xyz,wireframe})")
        return cli_root
    if os.path.isdir(os.path.join("./datasets", "train", "xyz")):
        return "./datasets"
    if not allow_generate:
        raise SystemExit("No Building3D corpus found; pass --data-root")
    print("No corpus at ./datasets — generating a synthetic demo corpus "
          "(tools/gen_demo_data.py). Pass --data-root for real data.")
    from tools.gen_demo_data import main as gen_main

    gen_main(["--out", "datasets"])
    return "./datasets"


def main(argv=None):
    from wireframe_tpu.utils.platform import (
        enable_compile_cache,
        honor_env_platform,
    )
    honor_env_platform()
    enable_compile_cache()
    args = parse_args(argv)

    from wireframe_tpu.config import load_config
    from wireframe_tpu.data import Building3DDataset, BatchLoader
    from wireframe_tpu.train import train_model
    from wireframe_tpu.train.checkpoint import save_checkpoint
    from wireframe_tpu.train.metrics_logging import MetricWriter, maybe_wandb

    cfg = load_config(args.config, args.overrides)
    cfg.data.root_dir = resolve_data_root(args.data_root)
    cfg.train.checkpoint_dir = args.checkpoint_dir

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    train_ds = Building3DDataset(cfg.data, "train")
    print(f"Training samples: {len(train_ds)}")

    if cfg.train.cotrain_root:
        import dataclasses

        from wireframe_tpu.data import MixedBatchLoader

        aux_ds = Building3DDataset(
            dataclasses.replace(cfg.data, root_dir=cfg.train.cotrain_root),
            "train")
        print(f"Co-training: {cfg.train.cotrain_count}/"
              f"{cfg.train.batch_size} samples per batch from "
              f"{len(aux_ds)} auxiliary samples at {cfg.train.cotrain_root}")
        loader = MixedBatchLoader(
            train_ds, aux_ds, cfg.train.cotrain_count,
            cfg.train.batch_size, cfg.model.max_vertices,
            shuffle=True, drop_last=True, seed=cfg.train.seed,
            augment_on_host=not cfg.train.device_augment)
    else:
        loader = BatchLoader(
            train_ds, cfg.train.batch_size, cfg.model.max_vertices,
            shuffle=True, drop_last=True, seed=cfg.train.seed,
            augment_on_host=not cfg.train.device_augment)

    run = maybe_wandb(config={
        "learning_rate": cfg.train.learning_rate,
        "architecture": "PointCloudToWireframe",
        "dataset": "Building3D",
        "epochs": cfg.train.num_epochs,
    }) if args.wandb else None
    writer = MetricWriter(jsonl_path=os.path.join(
        args.checkpoint_dir, "train_metrics.jsonl"), wandb_run=run)

    state = None
    start_epoch = 0
    if args.resume:
        from wireframe_tpu.train.checkpoint import (
            latest_step,
            load_checkpoint,
        )
        from wireframe_tpu.train.state import create_train_state

        if latest_step(args.checkpoint_dir) is not None:
            import jax

            template_state = create_train_state(
                cfg, jax.random.PRNGKey(cfg.train.seed),
                (cfg.train.batch_size, cfg.data.num_points,
                 cfg.model.input_dim),
                steps_per_epoch=(1 if cfg.train.overfit_one_batch
                                 else len(loader)))
            payload, meta = load_checkpoint(
                args.checkpoint_dir,
                template={"params": template_state.params,
                          "opt_state": template_state.opt_state})
            state = template_state.replace(
                step=jax.numpy.asarray(meta.get("step", 0)),
                params=payload["params"],
                opt_state=payload["opt_state"])
            if state.ema_params is not None:
                # Re-seed the EMA from the restored weights (the EMA
                # trajectory itself is not checkpointed).
                state = state.replace(ema_params=jax.tree_util.tree_map(
                    jax.numpy.array, payload["params"]))
            # 'epoch' (completed epochs) is the resume point; 'step' is
            # the optimizer step and differs whenever an epoch has more
            # than one batch.  Old checkpoints without 'epoch' fall back
            # to 'step' (correct for the overfit-one-batch regime they
            # were written under).
            start_epoch = int(meta.get("epoch", meta.get("step", 0)))
            print(f"Resuming from epoch {start_epoch} "
                  f"(optimizer step {int(meta.get('step', 0))})")

    if state is None and cfg.train.init_from:
        # Warm-start from a pretrained checkpoint: params only — fresh
        # optimizer state, LR schedule, and epoch counter (use --resume
        # to continue an interrupted run instead).
        import jax

        from wireframe_tpu.train.checkpoint import warm_start_params
        from wireframe_tpu.train.state import create_train_state

        state = create_train_state(
            cfg, jax.random.PRNGKey(cfg.train.seed),
            (cfg.train.batch_size, cfg.data.num_points,
             cfg.model.input_dim),
            steps_per_epoch=(1 if cfg.train.overfit_one_batch
                             else len(loader)))
        state = warm_start_params(state, cfg.train.init_from)
        print(f"Initialized params from {cfg.train.init_from}")

    state = train_model(cfg, loader, metric_writer=writer, state=state,
                        start_epoch=start_epoch)

    if start_epoch >= cfg.train.num_epochs:
        # `--resume` on an already-finished run: zero epochs executed, so
        # there is nothing new to save.  Writing here would REPLACE the
        # real EMA checkpoint with a copy of the final params (the EMA
        # trajectory is re-seeded from them on resume, not checkpointed)
        # — silently changing later `evaluate.py --checkpoint-dir ck/ema`
        # results.
        print(f"✓ training already complete at epoch {start_epoch}; "
              f"checkpoints left untouched")
        writer.close()
        return 0

    path = save_checkpoint(args.checkpoint_dir, int(state.step),
                           state.params, state.opt_state, cfg,
                           epoch=max(start_epoch, cfg.train.num_epochs))
    print(f"✓ checkpoint saved: {path}")
    if state.ema_params is not None:
        # EMA weights as a drop-in checkpoint: `evaluate.py
        # --checkpoint-dir <dir>/ema` consumes it unchanged.
        ema_path = save_checkpoint(
            os.path.join(args.checkpoint_dir, "ema"), int(state.step),
            state.ema_params, None, cfg,
            epoch=max(start_epoch, cfg.train.num_epochs))
        print(f"✓ EMA checkpoint saved: {ema_path}")
    if run is not None:
        # Cross-script linkage the reference maintains (main.py:57-61).
        with open("wandb_run_id.txt", "w") as f:
            f.write(run.id)
        print(f"✓ W&B run ID saved: {run.id}")
    writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
