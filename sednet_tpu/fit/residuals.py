"""Closed-form point-to-primitive distances + the residual dispatch.

Rebuild of reference src/primitives.py:47-206 (ComputePrimitiveDistance /
ResidualLoss). All distances are squared unless sqrt=True, reduced by
(optionally weighted) mean — weighted reduction is the TPU addition that lets
one vmapped call evaluate all padded segments at once.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from sednet_tpu.ops.chamfer import chamfer_distance
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
