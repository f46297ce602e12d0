"""Residual evaluation harness: clustering -> matching -> fitting -> residuals.

Rebuild of the reference's Evaluation (Fitting_patches_and_edges/
residual_utils.py:49-331) and eval metrics (src/eval_utils.py:103-175):

  * match: Hungarian assignment on the relaxed-IoU cost between predicted
    clusters and GT segments (src/fitting_utils.py:362-376);
  * weights_normalize: mean-shift-kernel membership -> probabilities
    (src/fitting_utils.py:306-325);
  * residual train mode: fit on GT-matched segments with soft weights;
  * residual eval mode: fit on predicted segments (majority predicted type),
    hard one-hot weights, residuals vs the matched GT points (sqrt=True);
  * separate_losses: spline-vs-geometric split with the >1 -> 0.1 degenerate
    clamp (src/eval_utils.py:130-175);
  * p_coverage: SPFN coverage@0.01 (src/eval_utils.py:103-127).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from sednet_tpu.cluster import guard_mean_shift
from sednet_tpu.fit.driver import FittingModule, fit_one_shape
from sednet_tpu.fit.residuals import (distance_from_cone,
                                      distance_from_cylinder,
                                      distance_from_plane,
                                      distance_from_sphere, residual_loss,
                                      residual_loss_batched)
from sednet_tpu.metrics import hungarian_match, relaxed_iou_fast, to_one_hot
from sednet_tpu.ops.chamfer import nn_distance
from sednet_tpu.ops.guard import guard_exp

EPS = 1e-8


def match(target: np.ndarray, pred_labels: np.ndarray):
    """Hungarian match on relaxed IoU (reference: src/fitting_utils.py:362-376).
    Returns (rows, cols, unique_target, unique_pred)."""
    cost = 1.0 - np.asarray(relaxed_iou_fast(
        jnp.asarray(to_one_hot(pred_labels)[None]),
        jnp.asarray(to_one_hot(target)[None])))[0]
    rids, cids = hungarian_match(cost)
    return rids, cids, np.unique(target), np.unique(pred_labels)


def weights_normalize(weights: jax.Array, bw: float) -> jax.Array:
    """Mean-shift-kernel membership -> probabilities
    (reference: src/fitting_utils.py:306-325). weights: (K, N)."""
    prob = guard_exp(weights / (bw * bw) / 2.0)
    prob = prob / jnp.sum(prob, 0, keepdims=True)
    if weights.shape[0] == 1:
        return prob
    prob = prob - jnp.min(prob, 1, keepdims=True)
    return prob / (jnp.max(prob, 1, keepdims=True) + EPS)


def separate_losses(distance: Dict, gt_points: Dict, lamb: float = 1.0):
    """Spline-vs-geometric residual split (reference: src/eval_utils.py:130-175).
    Returns [mean loss, geometric mean or None, spline mean or None]."""
    losses, geom, spline = [], [], []
    for k in sorted(gt_points.keys()):
        if gt_points[k] is None or k not in distance:
            continue
        if gt_points[k].shape[0] < 100:
            continue
        name, d = distance[k]
        d = float(d)
        if d > 1:  # degenerate (reference: eval_utils.py:149-152)
            d = 0.1
        if name in ("closed-spline", "open-spline"):
            spline.append(d)
            losses.append(d * lamb)
        else:
            geom.append(d)
            losses.append(d)
    total = float(np.mean(losses)) if losses else 0.0
    return [total,
            float(np.mean(geom)) if geom else None,
            float(np.mean(spline)) if spline else None]


def p_coverage(points: np.ndarray, parameters: Dict, threshold: float = 0.01):
    """SPFN coverage: per-point min distance to any fitted primitive
    (reference: src/eval_utils.py:103-127). Returns (mean_dist, coverage)."""
    pts = jnp.asarray(points, jnp.float32)
    dists = []
    for k, v in parameters.items():
        if v is None:
            continue
        name = v[0]
        kw = dict(weights=None, sqrt=True, reduce=False)
        if name == "plane":
            dists.append(distance_from_plane(pts, v[1], v[2], **kw))
        elif name == "sphere":
            dists.append(distance_from_sphere(pts, v[1], v[2], **kw))
        elif name == "cylinder":
            dists.append(distance_from_cylinder(pts, v[1], v[2], v[3], **kw))
        elif name == "cone":
            dists.append(distance_from_cone(pts, v[1], v[2], v[3], **kw))
        else:  # spline: one-sided NN distance to the sampled surface
            d1, _, _, _ = nn_distance(pts[None], jnp.asarray(v[1])[None])
            dists.append(jnp.sqrt(jnp.clip(d1[0], min=1e-12)))
    if not dists:
        return float("nan"), 0.0
    reduce_distance = jnp.min(jnp.stack(dists, 0), 0)
    cover = float(jnp.mean((reduce_distance < threshold).astype(jnp.float32)))
    return float(jnp.mean(reduce_distance)), cover


class Evaluation:
    """End-to-end residual evaluation (reference: residual_utils.py:49-152)."""

    def __init__(self, fitter: FittingModule | None = None):
        self.fitter = fitter or FittingModule()

    def cluster(self, embedding: jax.Array, key, quantile=0.015,
                iterations=50):
        emb = embedding / jnp.clip(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), min=1e-12)
        res = guard_mean_shift(key, emb,
                               num_samples=min(10000, emb.shape[0]),
                               quantile=quantile, iterations=iterations,
                               max_clusters=49, retry_factor=1.2)
        return res, emb

    def residual_eval_mode(self, points, normals, labels, cluster_ids,
                           pred_primitives, *, if_optimize=False, lamb=1.0):
        """Fit predicted segments (majority predicted type), residuals vs
        matched GT points (reference: residual_utils.py:210-331)."""
        rows, cols, _, unique_pred = match(labels, cluster_ids)
        col_of = dict(zip(rows, cols))
        segments, gt_points = [], {}
        for index, i in enumerate(np.sort(unique_pred)):
            c = col_of.get(i)
            if c is None:
                continue
            gt_i = labels == c
            pred_i = cluster_ids == i
            if gt_i.sum() == 0 or pred_i.sum() == 0:
                continue
            vals, counts = np.unique(pred_primitives[pred_i],
                                     return_counts=True)
            seg_type = int(vals[np.argmax(counts)])
            segments.append({
                "id": int(i), "label": seg_type,
                "points": points[pred_i], "normals": normals[pred_i],
                "weights": np.ones(int(pred_i.sum()), np.float32),
            })
            gt_points[int(i)] = np.asarray(points[gt_i], np.float32)
        parameters, _ = fit_one_shape(segments, self.fitter, eval_mode=True,
                                      if_optimize=if_optimize)
        distance = residual_loss_batched(gt_points, parameters, sqrt=True)
        loss = separate_losses(distance, gt_points, lamb=lamb)
        return loss, parameters, distance

    def residual_eval_batch(self, items, *, if_optimize=False, lamb=1.0):
        """residual_eval_mode over MANY shapes with shared device calls.

        items: list of dicts with keys points, normals, labels, cluster_ids,
        pred_primitives (each per-shape, like residual_eval_mode's args).
        One batched relaxed-IoU call matches every shape, then all shapes'
        segments ride the SAME packed fit + residual calls — the
        through-the-relay transfer count is per batch, not per shape.
        Returns a list of (loss, parameters, distance) tuples."""
        if not items:
            return []
        pred_oh = np.stack([to_one_hot(np.asarray(it["cluster_ids"]))
                            for it in items])
        gt_oh = np.stack([to_one_hot(np.asarray(it["labels"]))
                          for it in items])
        costs = 1.0 - np.asarray(relaxed_iou_fast(jnp.asarray(pred_oh),
                                                  jnp.asarray(gt_oh)))
        segments, gt_points = [], {}
        for si, it in enumerate(items):
            labels = np.asarray(it["labels"])
            cluster_ids = np.asarray(it["cluster_ids"])
            pred_primitives = np.asarray(it["pred_primitives"])
            points = np.asarray(it["points"], np.float32)
            normals = np.asarray(it["normals"], np.float32)
            rows, cols = hungarian_match(costs[si])
            col_of = dict(zip(rows, cols))
            for i in np.sort(np.unique(cluster_ids)):
                c = col_of.get(i)
                if c is None:
                    continue
                gt_i = labels == c
                pred_i = cluster_ids == i
                if gt_i.sum() == 0 or pred_i.sum() == 0:
                    continue
                vals, counts = np.unique(pred_primitives[pred_i],
                                         return_counts=True)
                segments.append({
                    "id": (si, int(i)),
                    "label": int(vals[np.argmax(counts)]),
                    "points": points[pred_i], "normals": normals[pred_i],
                    "weights": np.ones(int(pred_i.sum()), np.float32),
                })
                gt_points[(si, int(i))] = points[gt_i]
        parameters, _ = fit_one_shape(segments, self.fitter, eval_mode=True,
                                      if_optimize=if_optimize)
        distance = residual_loss_batched(gt_points, parameters, sqrt=True)
        out = []
        for si in range(len(items)):
            gp = {k[1]: v for k, v in gt_points.items() if k[0] == si}
            par = {k[1]: v for k, v in parameters.items() if k[0] == si}
            dist = {k[1]: v for k, v in distance.items() if k[0] == si}
            out.append((separate_losses(dist, gp, lamb=lamb), par, dist))
        return out

    def residual_train_mode(self, points, normals, labels, cluster_ids,
                            primitives, weights, bw, *, lamb=1.0):
        """Fit GT-matched segments with soft mean-shift weights
        (reference: residual_utils.py:154-209). weights: (K, N) center-point
        similarities."""
        rows, cols, _, unique_pred = match(labels, cluster_ids)
        # rows are predicted-cluster ids, cols their matched GT segment ids;
        # index by id through the dict (rows is NOT guaranteed to be arange,
        # so cols[i] would mis-pair whenever the assignment permutes rows)
        col_of = dict(zip(rows, cols))
        w = weights_normalize(weights, float(bw)).T  # (N, K)
        segments, gt_points = [], {}
        for index, i in enumerate(np.sort(unique_pred)):
            c = col_of.get(i)
            gt_i = labels == c if c is not None else None
            if gt_i is None or gt_i.sum() == 0 or (cluster_ids == i).sum() == 0:
                continue
            vals, counts = np.unique(primitives[gt_i], return_counts=True)
            seg_type = int(vals[np.argmax(counts)])
            # training subsamples every other point (primitive_forward.py:946-951)
            sub = np.arange(0, points.shape[0], 2)
            segments.append({
                "id": int(i), "label": seg_type,
                "points": points[sub], "normals": normals[sub],
                "weights": np.asarray(w[sub, i]),
            })
            gt_points[int(i)] = np.asarray(points[gt_i], np.float32)
        parameters, _ = fit_one_shape(segments, self.fitter, eval_mode=False)
        distance = residual_loss_batched(gt_points, parameters)
        loss = separate_losses(distance, gt_points, lamb=lamb)
        return loss, parameters, distance
