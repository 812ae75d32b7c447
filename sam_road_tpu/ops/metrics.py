"""On-device evaluation metrics (reference: model.py:356-363, torchmetrics).

IoU / F1 run as streaming count accumulators; the PR curve is a 4096-bin
score histogram per class (the reference's fp16 scores quantize its
torchmetrics curve to the same 2^-12 grid — observed thresholds like
0.499267578125 = 2045/4096 in config/toponet_vitb_512_cityscale.yaml:29-34),
so best-F1 threshold search reproduces the reference's calibration output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PR_BINS = 4096


def binary_iou_counts(scores, targets, threshold: float = 0.5, weights=None):
    """Returns (intersection, union) for streaming Jaccard at `threshold`.

    `weights` (optional, broadcastable to scores) down-weights entries —
    used by validation to exclude padding samples from ragged final batches
    so each eval patch is counted exactly once."""
    pred = scores >= threshold
    tgt = targets >= 0.5
    inter = jnp.logical_and(pred, tgt).astype(jnp.float32)
    union = jnp.logical_or(pred, tgt).astype(jnp.float32)
    if weights is not None:
        inter = inter * weights
        union = union * weights
    return jnp.sum(inter), jnp.sum(union)


def binary_f1_counts(scores, targets, threshold: float = 0.5, ignore_index: int = -1,
                     weights=None):
    """Returns (tp, fp, fn) ignoring entries where target == ignore_index."""
    keep = targets != ignore_index
    pred = jnp.logical_and(scores >= threshold, keep)
    tgt = jnp.logical_and(targets == 1, keep)
    tp = jnp.logical_and(pred, tgt).astype(jnp.float32)
    fp = jnp.logical_and(pred, ~tgt).astype(jnp.float32)
    fn = jnp.logical_and(~pred, tgt).astype(jnp.float32)
    if weights is not None:
        tp, fp, fn = tp * weights, fp * weights, fn * weights
    return jnp.sum(tp), jnp.sum(fp), jnp.sum(fn)


def pr_histogram(scores, targets, ignore_index: int = -1, weights=None):
    """Score histograms for positives/negatives -> (pos_hist, neg_hist),
    each [PR_BINS]."""
    keep = targets != ignore_index
    bins = jnp.clip((scores * PR_BINS).astype(jnp.int32), 0, PR_BINS - 1)
    pos = jnp.where(jnp.logical_and(keep, targets == 1), 1.0, 0.0)
    neg = jnp.where(jnp.logical_and(keep, targets != 1), 1.0, 0.0)
    if weights is not None:
        pos = pos * weights
        neg = neg * weights
    pos_hist = jnp.zeros((PR_BINS,), jnp.float32).at[bins.reshape(-1)].add(pos.reshape(-1))
    neg_hist = jnp.zeros((PR_BINS,), jnp.float32).at[bins.reshape(-1)].add(neg.reshape(-1))
    return pos_hist, neg_hist


def pr_curve_from_histograms(pos_hist, neg_hist):
    """(precision, recall, thresholds) with thresholds k/PR_BINS; prediction
    counts positive when score >= threshold (torchmetrics semantics)."""
    pos_hist = np.asarray(pos_hist, np.float64)
    neg_hist = np.asarray(neg_hist, np.float64)
    # TP(k) = positives with bin >= k; FP(k) = negatives with bin >= k
    tp = np.cumsum(pos_hist[::-1])[::-1]
    fp = np.cumsum(neg_hist[::-1])[::-1]
    total_pos = pos_hist.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 1.0)
        recall = tp / max(total_pos, 1.0)
    thresholds = np.arange(PR_BINS) / PR_BINS
    return precision, recall, thresholds


def find_best_threshold(pos_hist, neg_hist):
    """Best-F1 threshold search (reference: model.py:619-634)."""
    precision, recall, thresholds = pr_curve_from_histograms(pos_hist, neg_hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        f1 = np.where(
            precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0
        )
    k = int(np.nanargmax(f1))
    return {
        "threshold": float(thresholds[k]),
        "precision": float(precision[k]),
        "recall": float(recall[k]),
        "f1": float(f1[k]),
    }
