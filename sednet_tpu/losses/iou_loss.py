"""Differentiable soft-IoU losses with Hungarian reordering + edge/boundary
consistency.

Rebuild of reference src/my_iou_loss.py:
  * miou_loss: soft IoU between per-class scores and one-hot targets, with
    optional matched-channel gather and gt-channel mask (:8-46);
  * miou_loss_weighted: per-shape weighting by instance counts (:49-96);
  * reorder_pred_idx: Hungarian assignment of GT segment ids onto predicted
    channels from argmax-overlap IoU (:147-188) — vectorized (the reference
    double-loops segments in Python);
  * miou_loss_edge: IoU consistency between the predicted edge class and the
    instance-boundary points implied by the predicted instances' 1-NN
    disagreement (:227-244) — the CUDA ThreeNN becomes ops.pointnet2.three_nn.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sednet_tpu.metrics.segmentation import hungarian_match
from sednet_tpu.ops.pointnet2 import three_nn


def miou_loss(inputs: jax.Array, target_one_hot: jax.Array,
              matching_indices: jax.Array | None = None,
              gt_mask: jax.Array | None = None):
    """inputs: (B, C, N) scores; target_one_hot: (B, C, N); optional
    matching_indices (B, C, N) gathers input channels into target order;
    gt_mask (B, C) restricts the average to present GT channels.
    Returns 1 - mean soft IoU (reference: my_iou_loss.py:13-46)."""
    b, c, _ = inputs.shape
    if matching_indices is not None:
        inputs = jnp.take_along_axis(inputs, matching_indices, axis=1)
    inter = (inputs * target_one_hot).reshape(b, c, -1).sum(2)
    union = (inputs + target_one_hot - inputs * target_one_hot
             ).reshape(b, c, -1).sum(2)
    iou = inter / jnp.where(union == 0, 1.0, union)
    if gt_mask is None:
        return 1.0 - iou.mean()
    masked = jnp.where(gt_mask, iou, 0.0).sum(-1)
    denom = jnp.maximum(gt_mask.sum(), 1)
    return 1.0 - masked.sum() / denom


def miou_loss_weighted(inputs, target_one_hot, matching_indices=None,
                       gt_mask=None, abs_w: bool = False):
    """Per-shape weights from instance counts (reference: my_iou_loss.py:49-96)."""
    b, c, _ = inputs.shape
    if matching_indices is not None:
        inputs = jnp.take_along_axis(inputs, matching_indices, axis=1)
    inter = (inputs * target_one_hot).reshape(b, c, -1).sum(2)
    union = (inputs + target_one_hot - inputs * target_one_hot
             ).reshape(b, c, -1).sum(2)
    iou = inter / jnp.where(union == 0, 1.0, union)
    present = target_one_hot.sum(-1) > 0                     # (B, C)
    if gt_mask is not None:
        present = present & gt_mask
        iou = jnp.where(gt_mask, iou, 0.0)
    counts = present.sum(-1).astype(jnp.float32)             # (B,)
    if abs_w:
        w = (counts / 8.0) ** 1.3
        w = w / jnp.clip(w.sum(), min=1e-8)
    else:
        w = counts / jnp.clip(counts.sum(), min=1e-8)
    w = jax.lax.stop_gradient(w)
    return 1.0 - (iou.mean(-1) * w).sum()


def reorder_pred_idx(inputs: np.ndarray, target: np.ndarray):
    """Hungarian alignment of GT segment ids to predicted channels.

    inputs: (B, C, N) scores; target: (B, N) GT segment ids.
    Returns (matching_indices (B, N, C) for jnp.take_along_axis on axis 1
    after transpose, target_inst_num (B,))
    (reference: my_iou_loss.py:147-188, vectorized)."""
    inputs_idx = np.argmax(inputs, axis=1)                   # (B, N)
    b, c, n = inputs.shape
    target_inst_num = target.max(-1) + 1
    matching = np.zeros((b, n, c), np.int64)
    for i in range(b):
        # -1 noise points belong to NO GT segment (the reference builds
        # each one-hot from target == j for j >= 0, my_iou_loss.py:158-166)
        # — clipping them into segment 0 would skew its IoU row
        t = target[i]
        gt_oh = np.zeros((n, c), np.float64)
        valid = t >= 0
        gt_oh[valid, np.clip(t[valid], 0, c - 1)] = 1.0
        pr_oh = np.eye(c, dtype=np.float64)[inputs_idx[i]]
        inter = gt_oh.T @ pr_oh                              # (C, C)
        union = gt_oh.sum(0)[:, None] + pr_oh.sum(0)[None, :] - inter
        mat = np.where(union > 0, inter / np.where(union == 0, 1, union), 0.0)
        k = int(target_inst_num[i])
        _, col = hungarian_match(-mat[:k, :])
        matching[i, :, :k] = col
    return matching, target_inst_num


def miou_loss_edge(points: jax.Array, inst_scores: jax.Array,
                   edge_logits: jax.Array) -> jax.Array:
    """IoU between predicted edge points and predicted instance boundaries
    (1-NN instance disagreement) (reference: my_iou_loss.py:227-244).

    points: (B, N, 3); inst_scores: (B, C, N); edge_logits: (B, N, 2)."""
    inst_pred = inst_scores.argmax(1)                        # (B, N)
    _, nn_idx = three_nn(points, points)                     # (B, N, 3)
    nearest = nn_idx[..., 1]
    nn_inst = jnp.take_along_axis(inst_pred, nearest, axis=-1)
    inst_edge = (nn_inst != inst_pred).astype(jnp.float32)
    edge_pred = (edge_logits.argmax(-1) == 1).astype(jnp.float32)
    inter = (inst_edge * edge_pred).sum(-1)
    union = inst_edge.sum(-1) + edge_pred.sum(-1) - inter + 1e-7
    return 1.0 - (inter / union).mean()
