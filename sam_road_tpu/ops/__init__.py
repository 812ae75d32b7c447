"""Device-side ops: point sampling, losses, eval metrics, fused kernels."""

from sam_road_tpu.ops.sampling import bilinear_sample_points
from sam_road_tpu.ops.losses import (
    bce_with_logits,
    sigmoid_focal_loss,
    masked_topo_loss,
)

__all__ = [
    "bilinear_sample_points",
    "bce_with_logits",
    "sigmoid_focal_loss",
    "masked_topo_loss",
]
