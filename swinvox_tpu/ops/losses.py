"""Losses and voxel metrics (float32, fully vectorized).

Replicates the reference's training objective and eval metrics:
  * BCE-with-logits, mean over all voxels (reference core/train.py:165,249-255)
  * per-sample IoU over binarization thresholds with the union==0 edge case
    (reference core/test.py:141-153)
  * F-score from tp/fp/fn with eps=1e-8 (reference core/test.py:156-164)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean binary cross-entropy from logits, computed in float32."""
    return jnp.mean(bce_with_logits_per_sample(logits, labels))


def bce_with_logits_per_sample(
    logits: jax.Array, labels: jax.Array
) -> jax.Array:
    """Per-sample mean BCE: [B, ...] -> [B] (float32)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # max(x,0) - x*z + log(1+exp(-|x|)) — the numerically stable form
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)


def voxel_iou(
    volume_prob: jax.Array,
    ground_truth: jax.Array,
    thresholds: Sequence[float] = (0.2, 0.3, 0.4, 0.5),
) -> jax.Array:
    """Per-sample IoU at each threshold.

    volume_prob: [B, D, H, W] probabilities; ground_truth: [B, D, H, W] {0,1}.
    Returns [B, len(thresholds)].  union==0 -> IoU 1.0 if intersection==0
    (reference core/test.py:150-153).
    """
    probs = volume_prob.astype(jnp.float32)[:, None]  # [B, 1, D, H, W]
    th = jnp.asarray(thresholds, jnp.float32)[None, :, None, None, None]
    pred = (probs >= th).astype(jnp.float32)  # [B, T, D, H, W]
    gt = ground_truth.astype(jnp.float32)[:, None]
    intersection = jnp.sum(pred * gt, axis=(2, 3, 4))
    union = jnp.sum(jnp.clip(pred + gt, 0.0, 1.0), axis=(2, 3, 4))
    iou = jnp.where(union > 0, intersection / jnp.maximum(union, 1.0), 1.0)
    return iou


def voxel_fscore(
    volume_prob: jax.Array,
    ground_truth: jax.Array,
    thresholds: Sequence[float] = (0.2, 0.3, 0.4, 0.5),
    eps: float = 1e-8,
) -> jax.Array:
    """Per-sample F1 at each threshold: [B, len(thresholds)]."""
    probs = volume_prob.astype(jnp.float32)[:, None]
    th = jnp.asarray(thresholds, jnp.float32)[None, :, None, None, None]
    pred = (probs >= th).astype(jnp.float32)
    gt = ground_truth.astype(jnp.float32)[:, None]
    tp = jnp.sum(pred * gt, axis=(2, 3, 4))
    fp = jnp.sum(pred * (1.0 - gt), axis=(2, 3, 4))
    fn = jnp.sum((1.0 - pred) * gt, axis=(2, 3, 4))
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    return 2.0 * precision * recall / (precision + recall + eps)
