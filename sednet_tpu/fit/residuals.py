"""Closed-form point-to-primitive distances + the residual dispatch.

Rebuild of reference src/primitives.py:47-206 (ComputePrimitiveDistance /
ResidualLoss). All distances are squared unless sqrt=True, reduced by
(optionally weighted) mean — weighted reduction is the TPU addition that lets
one vmapped call evaluate all padded segments at once.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sednet_tpu.ops.chamfer import chamfer_distance, nn_distance
from sednet_tpu.ops.guard import guard_sqrt


def _reduce(distance, weights, sqrt, reduce):
    if sqrt:
        distance = guard_sqrt(distance)
    if not reduce:
        return distance
    if weights is None:
        return jnp.mean(distance)
    return jnp.sum(distance * weights) / jnp.clip(jnp.sum(weights), min=1e-8)


def distance_from_plane(points, normal, d, *, weights=None, sqrt=False,
                        reduce=True):
    """(n.x - d)^2 (reference: src/primitives.py:89-111)."""
    distance = (points @ normal.reshape(3) - d) ** 2
    return _reduce(distance, weights, sqrt, reduce)


def distance_from_sphere(points, center, radius, *, weights=None, sqrt=False,
                         reduce=True):
    """(||x - c|| - r)^2 (reference: src/primitives.py:113-127)."""
    distance = (jnp.linalg.norm(points - center.reshape(1, 3), axis=1)
                - radius) ** 2
    return _reduce(distance, weights, sqrt, reduce)


def distance_from_cylinder(points, axis, center, radius, *, weights=None,
                           sqrt=False, reduce=True):
    """(sqrt(||v||^2 - (v.a)^2) - r)^2 (reference: src/primitives.py:129-161)."""
    a = axis.reshape(3)
    v = points - center.reshape(1, 3)
    prj = (v @ a) ** 2
    lat = jnp.clip(jnp.sum(v * v, 1) - prj, min=1e-5)
    distance = (jnp.sqrt(lat) - radius) ** 2
    return _reduce(distance, weights, sqrt, reduce)


def distance_from_cone(points, apex, axis, theta, *, weights=None, sqrt=False,
                       reduce=True):
    """(||v|| sin(min(|alpha - theta|, pi/2)))^2
    (reference: src/primitives.py:166-195)."""
    a = axis.reshape(3)
    v = points - apex.reshape(1, 3) + 1e-8
    mod_v = jnp.linalg.norm(v, axis=1)
    alpha = jnp.arccos(jnp.clip((v @ a) / (mod_v + 1e-7), -0.999, 0.999))
    dist_angle = jnp.clip(jnp.abs(alpha - theta), max=3.142 / 2.0)
    distance = (mod_v * jnp.sin(dist_angle)) ** 2
    return _reduce(distance, weights, sqrt, reduce)


def distance_from_torus(points, axis, center, major_radius, minor_radius, *,
                        weights=None, sqrt=False, reduce=True):
    """Reference: src/primitives.py:58-87."""
    a = axis.reshape(3)
    a = a / jnp.linalg.norm(a)
    v = points - center.reshape(1, 3)
    z = v @ a
    x = guard_sqrt(jnp.sum(v * v, 1) - z ** 2)
    right = (guard_sqrt((x - major_radius) ** 2 + z ** 2) - minor_radius) ** 2
    left = (guard_sqrt((x + major_radius) ** 2 + z ** 2) - minor_radius) ** 2
    distance = jnp.minimum(right, left)
    return _reduce(distance, weights, sqrt, reduce)


def distance_from_bspline(points, surface_points, *, sqrt=False, reduce=True):
    """Chamfer proxy (reference: src/primitives.py:197-206)."""
    del reduce
    return chamfer_distance(surface_points[None], points[None], sqrt=sqrt)


def residual_loss(points_per_segment: Dict, parameters: Dict, sqrt=False):
    """Dispatch table keyed by primitive name
    (reference: src/primitives.py:36-44). parameters[k] = ("plane", n, d) etc;
    returns {k: [name, distance]}."""
    routines: Dict[str, Callable] = {
        "plane": lambda pts, p: distance_from_plane(pts, *p, sqrt=sqrt),
        "sphere": lambda pts, p: distance_from_sphere(pts, *p, sqrt=sqrt),
        "cylinder": lambda pts, p: distance_from_cylinder(pts, *p, sqrt=sqrt),
        "cone": lambda pts, p: distance_from_cone(pts, *p, sqrt=sqrt),
        "torus": lambda pts, p: distance_from_torus(pts, *p, sqrt=sqrt),
        "open-spline": lambda pts, p: distance_from_bspline(pts, p[0], sqrt=sqrt),
        "closed-spline": lambda pts, p: distance_from_bspline(pts, p[0], sqrt=sqrt),
    }
    out = {}
    for k, v in parameters.items():
        if v is None:  # degenerate small segment (reference: primitives.py:39-41)
            continue
        out[k] = [v[0], routines[v[0]](points_per_segment[k], v[1:])]
    return out


# ---------------------------------------------------------------------------
# Batched padded residual evaluation.
#
# residual_loss dispatches one jitted distance per segment with the segment's
# own point count — on a fresh shape every new (type, size) pair recompiles
# (measured ~5 s of XLA compiles per shape) and even warm it costs one
# device dispatch per segment. The padded path packs all geometric segments
# of a shape into one (S, P) masked batch (bucketed sizes, so at most a
# handful of compilations ever) and all same-grid splines into one masked
# chamfer call. Same math, same return contract as residual_loss.
# ---------------------------------------------------------------------------

GEOM_TYPE_IDS = {"plane": 0, "sphere": 1, "cylinder": 2, "cone": 3,
                 "torus": 4}


def _bucket(n: int, lo: int = 128) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pack_geom_params(v) -> np.ndarray:
    """(name, *params) -> flat (8,) float32 slot layout:
    plane [n(3), d] / sphere [c(3), r] / cylinder [a(3), c(3), r] /
    cone [apex(3), axis(3), theta] / torus [axis(3), center(3), R, r]."""
    name = v[0]
    flat = np.zeros(8, np.float32)
    parts = [np.asarray(p, np.float32).reshape(-1) for p in v[1:]]
    cat = np.concatenate(parts)
    flat[: cat.shape[0]] = cat
    assert cat.shape[0] <= 8, name
    return flat


@functools.partial(jax.jit, static_argnames=("sqrt",))
def _geom_residuals_padded(points, mask, type_ids, params, sqrt=False):
    """points (S,P,3), mask (S,P), type_ids (S,) int32 in GEOM_TYPE_IDS
    values, params (S,8) -> (S,) masked-mean residuals. Per-branch math is
    kept identical to the scalar distance_from_* functions above
    (reference: src/primitives.py:58-195)."""

    def per_seg(pts, m, t, pp):
        d_pl = (pts @ pp[:3] - pp[3]) ** 2
        d_sp = (jnp.linalg.norm(pts - pp[:3][None], axis=1) - pp[3]) ** 2
        v = pts - pp[3:6][None]
        lat = jnp.clip(jnp.sum(v * v, 1) - (v @ pp[:3]) ** 2, min=1e-5)
        d_cy = (jnp.sqrt(lat) - pp[6]) ** 2
        vv = pts - pp[:3][None] + 1e-8
        mod_v = jnp.linalg.norm(vv, axis=1)
        alpha = jnp.arccos(
            jnp.clip((vv @ pp[3:6]) / (mod_v + 1e-7), -0.999, 0.999))
        dang = jnp.clip(jnp.abs(alpha - pp[6]), max=3.142 / 2.0)
        d_co = (mod_v * jnp.sin(dang)) ** 2
        ax = pp[:3] / jnp.linalg.norm(pp[:3])
        z = v @ ax
        x = guard_sqrt(jnp.sum(v * v, 1) - z ** 2)
        d_to = jnp.minimum(
            (guard_sqrt((x - pp[6]) ** 2 + z ** 2) - pp[7]) ** 2,
            (guard_sqrt((x + pp[6]) ** 2 + z ** 2) - pp[7]) ** 2)
        d = jnp.stack([d_pl, d_sp, d_cy, d_co, d_to], 0)[t]
        if sqrt:
            d = guard_sqrt(d)
        return jnp.sum(d * m) / jnp.clip(jnp.sum(m), min=1e-8)

    return jax.vmap(per_seg)(points, mask, type_ids, params)


@functools.partial(jax.jit, static_argnames=("sqrt",))
def _spline_residuals_padded(gt, mask, surf, sqrt=False):
    """Masked batched symmetric chamfer: gt (S,P,3) padded with far-away
    sentinels where mask==0, surf (S,G,3) fixed spline surface grids ->
    (S,). Matches chamfer_distance's 0.5*(mean+mean) convention."""
    far = gt + (1.0 - mask[..., None]) * 1e6  # pads never win an argmin
    d1, d2, _, _ = nn_distance(surf, far)     # d1 (S,G), d2 (S,P)
    if sqrt:
        d1 = jnp.sqrt(jnp.clip(d1, min=1e-12))
        d2 = jnp.sqrt(jnp.clip(d2, min=1e-12))
    m1 = jnp.mean(d1, axis=1)
    m2 = jnp.sum(d2 * mask, axis=1) / jnp.clip(jnp.sum(mask, axis=1),
                                               min=1e-8)
    return 0.5 * (m1 + m2)


def residual_loss_batched(points_per_segment: Dict, parameters: Dict,
                          sqrt=False) -> Dict:
    """Drop-in for residual_loss with batched padded device calls.

    Geometric segments: one call on (S_pad, P_pad) with power-of-two
    buckets. Splines: one masked chamfer per surface-grid size. Returns
    {k: [name, scalar residual]} like residual_loss."""
    geom, spline = [], {}
    for k, v in parameters.items():
        if v is None:
            continue
        pts = np.asarray(points_per_segment[k], np.float32)
        if v[0] in GEOM_TYPE_IDS:
            geom.append((k, v[0], pts, pack_geom_params(v)))
        else:
            surf = np.asarray(v[1], np.float32)
            spline.setdefault(surf.shape[0], []).append((k, v[0], pts, surf))
    out = {}
    if geom:
        p_pad = _bucket(max(g[2].shape[0] for g in geom))
        s_pad = _bucket(len(geom), lo=8)
        pts = np.zeros((s_pad, p_pad, 3), np.float32)
        msk = np.zeros((s_pad, p_pad), np.float32)
        tid = np.zeros(s_pad, np.int32)
        par = np.zeros((s_pad, 8), np.float32)
        par[:, :3] = 1.0  # benign params for pad rows (unit axis, no NaNs)
        for i, (k, name, p, pp) in enumerate(geom):
            pts[i, : p.shape[0]] = p
            msk[i, : p.shape[0]] = 1.0
            tid[i] = GEOM_TYPE_IDS[name]
            par[i] = pp
        res = np.asarray(_geom_residuals_padded(
            jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(tid),
            jnp.asarray(par), sqrt=sqrt))
        for i, (k, name, _, _) in enumerate(geom):
            out[k] = [name, res[i]]
    for g, items in spline.items():
        p_pad = _bucket(max(it[2].shape[0] for it in items))
        s_pad = _bucket(len(items), lo=4)
        pts = np.zeros((s_pad, p_pad, 3), np.float32)
        msk = np.zeros((s_pad, p_pad), np.float32)
        srf = np.zeros((s_pad, g, 3), np.float32)
        for i, (k, name, p, sf) in enumerate(items):
            pts[i, : p.shape[0]] = p
            msk[i, : p.shape[0]] = 1.0
            srf[i] = sf
        res = np.asarray(_spline_residuals_padded(
            jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(srf), sqrt=sqrt))
        for i, (k, name, _, _) in enumerate(items):
            out[k] = [name, res[i]]
    return out
