"""Metrics logging: local JSONL always; wandb when available and enabled
(reference: train.py:47-54, model.py:541-543 — wandb is a hard dependency
there; here it is an optional sink)."""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, output_dir: str, project: str = "sam_road_tpu",
                 config=None, use_wandb: bool = False, disabled: bool = False):
        self.disabled = disabled
        self.path = os.path.join(output_dir, "metrics.jsonl")
        os.makedirs(output_dir, exist_ok=True)
        self._wandb = None
        if use_wandb and not disabled:
            try:
                import wandb

                wandb.init(project=project,
                           config=dict(config) if config else None)
                self._wandb = wandb
            except ImportError:
                print("wandb not available; logging to JSONL only")

    def log(self, metrics: dict, step: int | None = None):
        if self.disabled:
            return
        record = {"ts": time.time(), **metrics}
        if step is not None:
            record["step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, key: str, paths, step: int | None = None):
        """Record image artifacts: paths in the JSONL always, wandb.Image
        when wandb is active (reference: model.py:571-581 val tables)."""
        if self.disabled:
            return
        self.log({key: list(paths)}, step=step)
        if self._wandb is not None:
            self._wandb.log(
                {key: [self._wandb.Image(p) for p in paths]}, step=step
            )

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
