"""Thin metric-writer abstraction (stdout / jsonl / optional wandb).

The reference logs inline to Python logging + wandb with hard-coded metric
names (train.py:161-186); this keeps those names but decouples the sink.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class MetricWriter:
    """Fan-out writer: always buffers, optionally jsonl file and wandb."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 wandb_run=None):
        self.history = []
        self.jsonl_path = jsonl_path
        self.wandb_run = wandb_run
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)

    def log(self, metrics: Dict[str, float]) -> None:
        self.history.append(dict(metrics))
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(metrics) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(metrics)

    def close(self) -> None:
        if self.wandb_run is not None:
            self.wandb_run.finish()


def maybe_wandb(project: str = "Wireframe3D",
                config: Optional[dict] = None):
    """wandb.init if wandb is importable and WANDB_MODE != 'disabled'."""
    if os.environ.get("WANDB_MODE", "") == "disabled":
        return None
    try:
        import wandb
        return wandb.init(project=project, config=config or {})
    except Exception as e:  # offline images have no wandb / no network
        logger.info("wandb unavailable (%s); logging locally only", e)
        return None
