"""Primitive-type losses and the type-mIoU train metric.

Reference: src/segment_loss.py:134-155 (evaluate_miou), :204-226
(primitive_loss NLL + LabelSmoothingLoss on log-probs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def primitive_nll(type_log_prob: jax.Array, target: jax.Array) -> jax.Array:
    """NLL over log-probs. type_log_prob: (B, N, C); target: (B, N)."""
    nll = -jnp.take_along_axis(
        type_log_prob, target[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def label_smoothing_nll(type_log_prob: jax.Array, target: jax.Array,
                        smoothing: float = 0.025) -> jax.Array:
    """conf * NLL + smoothing * (-mean logprob)
    (reference: src/segment_loss.py:209-226)."""
    nll = -jnp.take_along_axis(
        type_log_prob, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    smooth = -jnp.mean(type_log_prob, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def evaluate_type_miou(gt_labels: jax.Array, pred_log_prob: jax.Array) -> jax.Array:
    """Per-class IoU of argmax types, averaged over classes then shapes
    (reference: src/segment_loss.py:134-155).

    gt_labels: (B, N) int; pred_log_prob: (B, N, C)."""
    C = pred_log_prob.shape[-1]
    pred = jnp.argmax(pred_log_prob, axis=-1)                     # (B, N)
    cls = jnp.arange(C, dtype=pred.dtype)
    gt_m = gt_labels[:, :, None] == cls[None, None, :]            # (B, N, C)
    pr_m = pred[:, :, None] == cls[None, None, :]
    eps = jnp.finfo(jnp.float32).eps
    inter = jnp.sum(gt_m & pr_m, axis=1).astype(jnp.float32) + eps
    union = jnp.sum(gt_m | pr_m, axis=1).astype(jnp.float32) + eps
    return jnp.mean(jnp.mean(inter / union, axis=-1))
