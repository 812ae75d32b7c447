"""Training losses (reference: model.py:349-354, 511-544).

All losses compute in float32 regardless of activation dtype; bf16 loss
accumulation loses too many mantissa bits at these batch sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, reduction: str = "mean"):
    """Numerically-stable binary cross entropy on logits
    (torch BCEWithLogitsLoss semantics)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x, 0) - x*z + log(1 + exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def sigmoid_focal_loss(
    logits, targets, alpha: float = 0.25, gamma: float = 2.0, reduction: str = "mean"
):
    """torchvision.ops.sigmoid_focal_loss semantics (reference: model.py:351)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def masked_topo_loss(topo_logits, connected, valid):
    """Masked BCE over topology pairs normalized by the valid count
    (reference: model.py:522-538).

    Args:
      topo_logits: [B, S, P, 1] edge logits.
      connected: [B, S, P] bool ground truth.
      valid: [B, S, P] bool mask (padding pairs are invalid).
    """
    gt = connected.astype(jnp.float32)[..., None]
    mask = valid.astype(jnp.float32)[..., None]
    loss = bce_with_logits(topo_logits, gt, reduction="none")
    loss = loss * mask
    return loss.sum() / jnp.maximum(mask.sum(), 1.0)
