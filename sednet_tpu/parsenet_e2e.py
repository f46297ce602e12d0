"""End-to-end ParseNet training: embedding + type + differentiable fitting
residual loss.

Rebuild of reference Fitting_patches_and_edges/splinenet/train_parsenet_e2e.py
(468 LoC) + PrimitivesEmbeddingDGCNGne2e + Evaluation.fitting_loss
(residual_utils.py:86-209). The reference computed the fitting loss inside
the model's forward to appease DataParallel; here the step is split at the
natural device/host cut:

  A (device): forward + differentiable mean-shift (quantile 0.125, 5 iters —
     residual_utils.py:94-95) -> cluster ids;
  B (host):   Hungarian match clusters to GT segments, majority GT type per
     matched cluster -> fixed-shape (K, N) masks + (K,) types;
  C (device, grad): embedding -> shifted centers -> mean-shift-kernel
     membership weights (weights_normalize) -> vmapped weighted fits of all
     K segments -> closed-form residuals against matched GT masks, with the
     degenerate >1 -> 0.1 clamp (eval_utils.py:149-152). Gradients flow
     through the fits and the kernel weights into the backbone, exactly the
     e2e path of the reference. Spline segments are excluded from the
     residual (the reference freezes SplineNet decoders and caps spline
     count; here they contribute no residual gradient).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from sednet_tpu.cluster.mean_shift import (compute_bandwidth,
                                           mean_shift_iterate, nms)
from sednet_tpu.fit.evaluation import match, weights_normalize
from sednet_tpu.fit.primitives import fit_cone, fit_cylinder, fit_plane, fit_sphere
from sednet_tpu.fit.residuals import (distance_from_cone,
                                      distance_from_cylinder,
                                      distance_from_plane,
                                      distance_from_sphere)

MAX_SEGS = 50
# fitting-type codes for the switch
F_NONE, F_PLANE, F_SPHERE, F_CYLINDER, F_CONE = 0, 1, 2, 3, 4
_TYPE_TO_F = {1: F_PLANE, 5: F_SPHERE, 4: F_CYLINDER, 3: F_CONE}


@functools.partial(jax.jit, static_argnames=("num_samples", "iterations"))
def cluster_for_matching(key, embedding, *, num_samples=10000,
                         quantile=0.125, iterations=5):
    """Phase A: cluster a single shape's embedding; returns
    (cluster_ids (N,), center_mask (N,), bandwidth)."""
    emb = embedding / jnp.clip(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), min=1e-12)
    bw = jnp.clip(compute_bandwidth(key, emb,
                                    min(num_samples, emb.shape[0]),
                                    jnp.float32(quantile)), min=0.003)
    shifted = mean_shift_iterate(emb, bw, iterations)
    labels, center_mask, _ = nms(lax.stop_gradient(shifted),
                                 lax.stop_gradient(emb), bw)
    return labels, center_mask, bw


def build_match_arrays(cluster_ids: np.ndarray, center_mask: np.ndarray,
                       gt_labels: np.ndarray, gt_types: np.ndarray):
    """Phase B (host): per-cluster matched GT masks + fit-type codes.

    Returns (center_rows (K,), seg_fit_type (K,), gt_mask (K, N), pred_mask
    (K, N)) with K = MAX_SEGS."""
    n = cluster_ids.shape[0]
    rows, cols, _, unique_pred = match(gt_labels, cluster_ids)
    col_of = dict(zip(rows.tolist(), cols.tolist()))
    center_rows = np.zeros(MAX_SEGS, np.int32)
    nz = np.nonzero(center_mask)[0]
    center_rows[: min(len(nz), MAX_SEGS)] = nz[:MAX_SEGS]
    seg_type = np.zeros(MAX_SEGS, np.int32)
    gt_mask = np.zeros((MAX_SEGS, n), np.float32)
    pred_mask = np.zeros((MAX_SEGS, n), np.float32)
    for i in np.unique(cluster_ids):
        if i >= MAX_SEGS:
            continue
        c = col_of.get(int(i))
        if c is None:
            continue
        g = gt_labels == c
        p = cluster_ids == i
        if g.sum() < 100 or p.sum() < 20:
            continue
        vals, counts = np.unique(gt_types[g], return_counts=True)
        t = int(vals[np.argmax(counts)])
        seg_type[i] = _TYPE_TO_F.get(t, F_NONE)
        gt_mask[i] = g
        pred_mask[i] = p
    return center_rows, seg_type, gt_mask, pred_mask


def _segment_residual(points, normals, w, gt_w, fit_code):
    """Residual of one segment: fit with weights w, evaluate (squared,
    weighted-mean) distance on the GT-mask points. Branch via lax.switch."""

    def none_fn():
        return jnp.float32(0.0)

    def plane_fn():
        a, d = fit_plane(points, w)
        return distance_from_plane(points, a, d, weights=gt_w)

    def sphere_fn():
        c, r = fit_sphere(points, w)
        return distance_from_sphere(points, c, r, weights=gt_w)

    def cyl_fn():
        a, c, r = fit_cylinder(points, normals, w)
        return distance_from_cylinder(points, a, c, r, weights=gt_w)

    def cone_fn():
        apex, a, theta = fit_cone(points, normals, w)
        return distance_from_cone(points, apex, a, theta, weights=gt_w)

    d = lax.switch(fit_code, [none_fn, plane_fn, sphere_fn, cyl_fn, cone_fn])
    # degenerate clamp (reference: eval_utils.py:149-152)
    return jnp.where(d > 1.0, 0.1, d)


@jax.jit
def e2e_fitting_loss(embedding, points, normals, center_rows, seg_type,
                     gt_mask, bandwidth):
    """Phase C: differentiable residual loss for one shape.

    embedding: (N, E); points/normals: (N, 3); center_rows/seg_type: (K,);
    gt_mask: (K, N)."""
    emb = embedding / jnp.clip(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), min=1e-12)
    centers = emb[center_rows]                        # (K, E) differentiable
    sims = centers @ emb.T                            # (K, N)
    w = weights_normalize(sims, bandwidth)            # (K, N) probabilities

    def per_segment(wk, gtk, code):
        return _segment_residual(points, normals, wk + 1e-8, gtk, code)

    res = jax.vmap(per_segment)(w, gt_mask, seg_type)  # (K,)
    valid = (seg_type > 0).astype(jnp.float32)
    return jnp.sum(res * valid) / jnp.clip(valid.sum(), min=1.0)


class E2EState(NamedTuple):
    params: dict
    opt_state: object
    step: jax.Array


def make_e2e_train_step(model, optimizer, cfg, fitting_weight: float = 1.0):
    """Combined step: triplet embedding + smoothed type CE + residual loss.
    The caller supplies the phase-B arrays per batch item."""
    from sednet_tpu.losses import TripletConfig, label_smoothing_nll, triplet_loss
    from sednet_tpu.train import model_input, remap_train_types

    # honor the config's triplet knobs like train.make_train_step does
    tri_cfg = TripletConfig(max_segments=MAX_SEGS,
                            margin=cfg.triplet_margin)

    @jax.jit
    def step(state: E2EState, batch, match_arrays, bandwidths, key):
        def loss_fn(params):
            out = model.apply({"params": params},
                              model_input(batch, cfg.normals))
            prim = remap_train_types(batch["prim"])
            emb_loss = triplet_loss(key, out.embedding, batch["labels"],
                                    tri_cfg)
            p_loss = label_smoothing_nll(out.type_log_prob, prim, cfg.smooth)

            center_rows, seg_type, gt_mask = match_arrays
            fit_loss = jnp.mean(jax.vmap(e2e_fitting_loss)(
                out.embedding, batch["points"], batch["normals"],
                center_rows, seg_type, gt_mask, bandwidths))
            total = emb_loss + p_loss + fitting_weight * fit_loss
            return total, {"loss": total, "emb": emb_loss, "type": p_loss,
                           "fit": fit_loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return E2EState(params, opt_state, state.step + 1), metrics

    return step


def e2e_train_batch(model, state, batch, cfg, step_fn, key):
    """One full A->B->C iteration over a host batch dict."""
    from sednet_tpu.train import model_input

    out = model.apply({"params": state.params},
                      model_input(batch, cfg.normals))
    b = batch["points"].shape[0]
    rows, types, masks, bws = [], [], [], []
    for i in range(b):
        cid, cmask, bw = cluster_for_matching(
            jax.random.fold_in(key, i), out.embedding[i],
            num_samples=min(10000, batch["points"].shape[1]))
        cr, st, gm, _ = build_match_arrays(
            np.asarray(cid), np.asarray(cmask),
            np.asarray(batch["labels"][i]), np.asarray(batch["prim"][i]))
        rows.append(cr)
        types.append(st)
        masks.append(gm)
        bws.append(float(bw))
    match_arrays = (jnp.asarray(np.stack(rows)), jnp.asarray(np.stack(types)),
                    jnp.asarray(np.stack(masks)))
    return step_fn(state, batch, match_arrays,
                   jnp.asarray(np.asarray(bws, np.float32)), key)
