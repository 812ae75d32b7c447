"""Training harness: optimizer groups, jitted train/eval steps, checkpoints."""

from sam_road_tpu.training.harness import (
    TrainState,
    build_optimizer,
    make_train_step,
    make_eval_step,
    Trainer,
)

__all__ = [
    "TrainState",
    "build_optimizer",
    "make_train_step",
    "make_eval_step",
    "Trainer",
]
