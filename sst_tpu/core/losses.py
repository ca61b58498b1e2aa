"""Loss functions (JAX), numerically matching mmdet's implementations used by
the reference (FocalLoss mmdet3d/models/losses/focal_loss.py; L1/SmoothL1/CE
from mmdet). All losses take explicit element weights and an avg_factor —
the reference's reduction convention — and are mask/padding friendly."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def sigmoid_focal_loss(
    logits,
    targets,
    weight=None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor=1.0,
):
    """mmdet sigmoid focal loss. targets: int class ids in [0, C] where C
    (== logits.shape[-1]) means background; or one-hot float of shape logits."""
    c = logits.shape[-1]
    if targets.dtype in (jnp.int32, jnp.int64):
        onehot = jax.nn.one_hot(targets, c, dtype=logits.dtype)
    else:
        onehot = targets
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, onehot)
    pt = p * onehot + (1 - p) * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * (1 - pt) ** gamma
    loss = (ce * focal_weight).sum(-1)
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=1.0):
    loss = jnp.abs(pred - target).sum(-1)
    return _reduce(loss, weight, avg_factor)


def smooth_l1_loss(pred, target, weight=None, beta: float = 1.0, avg_factor=1.0):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta).sum(-1)
    return _reduce(loss, weight, avg_factor)


def cross_entropy_loss(logits, targets, weight=None, avg_factor=1.0):
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(targets, 0)
    )
    return _reduce(loss, weight, avg_factor)


def binary_cross_entropy_loss(logits, targets, weight=None, avg_factor=1.0):
    loss = optax.sigmoid_binary_cross_entropy(logits, targets)
    if loss.ndim > 1:
        loss = loss.sum(-1)
    return _reduce(loss, weight, avg_factor)
