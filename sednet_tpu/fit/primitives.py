"""Differentiable weighted least-squares primitive fits.

TPU-native rebuild of the reference's Fit.fit_{plane,sphere,cylinder,cone}_torch
(reference: src/primitive_forward.py:712-847). All fits take full-shape point
arrays with per-point weights, so per-segment fitting is a *mask*, not a
dynamic slice — one vmap over (segments x shapes) fits every segment of every
shape in a single compiled program (the reference loops segments in Python,
fit_one_shape_torch, primitive_forward.py:929-1051).

Deviations by design:
  * the reference's LeastSquares.lstsq picks QR vs ridge by condition number
    at runtime (src/fitting_utils.py:32-85); we always solve the ridge normal
    equations (same lambda) — branch-free and jit-stable;
  * jnp.linalg.svd provides the differentiable SVD (the reference's CustomSVD
    K-matrix guard, src/fitting_utils.py:385-455, exists for torch's unstable
    equal-singular-value gradients; JAX applies an equivalent regularization
    internally via the standard svd JVP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sednet_tpu.ops.guard import guard_sqrt

EPS = 1e-8


def ridge_lstsq(a: jax.Array, y: jax.Array, lamb: float = 0.01) -> jax.Array:
    """Solve min ||Ax - y||^2 + lamb ||x||^2 (reference ridge branch:
    src/fitting_utils.py:63-82)."""
    ata = a.T @ a + lamb * jnp.eye(a.shape[1], dtype=a.dtype)
    return jnp.linalg.solve(ata, a.T @ y)


def _smallest_right_singular(m: jax.Array) -> jax.Array:
    """Right singular vector for the smallest singular value of m (N,3)."""
    _, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return vt[-1]


def fit_plane(points: jax.Array, weights: jax.Array):
    """Weighted plane fit (reference: src/primitive_forward.py:712-733).

    points: (N, 3); weights: (N,). Returns (normal (3,), d scalar) with the
    plane {x : n.x = d}."""
    w = weights[:, None]
    wsum = jnp.sum(w) + EPS
    centroid = jnp.sum(w * points, 0) / wsum
    a = _smallest_right_singular(w * (points - centroid))
    d = jnp.sum(w * (points @ a)[:, None]) / wsum
    return a, d


def fit_sphere(points: jax.Array, weights: jax.Array):
    """Weighted sphere fit via linear least squares on the center
    (reference: src/primitive_forward.py:750-773).

    Returns (center (3,), radius)."""
    w = weights[:, None]
    wsum = jnp.sum(w) + EPS
    a = 2.0 * (-points + jnp.sum(points * w, 0) / wsum)
    dot = w * jnp.sum(points * points, 1, keepdims=True)
    y = dot - jnp.sum(dot) / wsum
    center = -ridge_lstsq(w * a, w * y, 0.01)[:, 0]
    r2 = jnp.sum(weights * jnp.sum((points - center) ** 2, 1)) / wsum
    radius = guard_sqrt(jnp.clip(r2, min=1e-3))
    return center, radius


def fit_cylinder(points: jax.Array, normals: jax.Array, weights: jax.Array):
    """Axis from the normals' null space; radius/center by projecting onto
    the orthogonal plane and circle-fitting via the sphere LS
    (reference: src/primitive_forward.py:788-810).

    Returns (axis (3,), center (3,), radius)."""
    w = weights[:, None]
    a = _smallest_right_singular(w * normals)
    a = a / (jnp.linalg.norm(a) + EPS)
    prj = points - (points @ a)[:, None] * a[None, :]
    center, radius = fit_sphere(prj, weights)
    return a, center, radius


def fit_cone(points: jax.Array, normals: jax.Array, weights: jax.Array):
    """Apex from n.x = n.p LS; axis = plane fit of normals (flipped to point
    inside); theta = weighted mean angle
    (reference: src/primitive_forward.py:812-847).

    Returns (apex (3,), axis (3,), theta)."""
    w = weights[:, None]
    a_mat = w * normals
    y = w * jnp.sum(normals * points, 1, keepdims=True)
    apex = ridge_lstsq(a_mat, y, 1e-3)[:, 0]

    axis, _ = fit_plane(normals, weights)
    axis = jnp.where(jnp.sum(normals @ axis) > 0, -axis, axis)

    diff = points - apex[None, :]
    diff = diff / jnp.clip(jnp.linalg.norm(diff, axis=1, keepdims=True),
                           min=1e-12)
    cos = jnp.clip(jnp.abs(diff @ axis), max=0.999)
    theta = jnp.sum(weights * jnp.arccos(cos)) / (jnp.sum(weights) + EPS)
    theta = jnp.clip(theta, 1e-3, 3.142 / 2 - 1e-3)
    return apex, axis, theta


@jax.jit
def fit_all_types_batched(points: jax.Array, normals: jax.Array,
                          weights: jax.Array):
    """All four geometric fits for a padded batch of segments in ONE
    compiled call — the masked/vmapped fit path the reference's per-segment
    Python loop becomes (reference: src/primitive_forward.py:929-1051).

    points/normals: (S, P, 3), weights: (S, P) with ZERO weight (and zero
    points/normals) on padding rows — every fit touches points only through
    weight-multiplied terms, so padding leaves results identical to the
    unpadded fit. Returns a dict of per-type stacked parameters; the caller
    selects the entry matching each segment's type.
    """

    def one(p, n, w):
        pn, pd = fit_plane(p, w)
        sc, sr = fit_sphere(p, w)
        ca, cc, cr = fit_cylinder(p, n, w)
        ka, kx, kt = fit_cone(p, n, w)
        return {"plane": (pn, pd), "sphere": (sc, sr),
                "cylinder": (ca, cc, cr), "cone": (ka, kx, kt)}

    return jax.vmap(one)(points, normals, weights)


@jax.jit
def fit_all_types_packed(points: jax.Array, normals: jax.Array,
                         weights: jax.Array) -> jax.Array:
    """fit_all_types_batched with the results packed into ONE (S, 22)
    array — a single device->host transfer fetches every fit of the shape
    (the per-array fetch was ~30 ms/array through the axon relay).
    Layout: plane n[0:3] d[3] | sphere c[4:7] r[7] | cylinder a[8:11]
    c[11:14] r[14] | cone apex[15:18] axis[18:21] theta[21]."""
    out = fit_all_types_batched(points, normals, weights)
    pn, pd = out["plane"]
    sc, sr = out["sphere"]
    ca, cc, cr = out["cylinder"]
    ka, kx, kt = out["cone"]
    return jnp.concatenate([
        pn, pd[:, None], sc, sr[:, None], ca, cc, cr[:, None],
        ka, kx, kt[:, None]], axis=1)


def unpack_fit_params(row: "np.ndarray", name: str):
    """Host-side unpack of one fit_all_types_packed row into the
    parameter-list tail for `name` (same contract as fit_all_types_batched
    entries)."""
    if name == "plane":
        return [row[0:3], row[3]]
    if name == "sphere":
        return [row[4:7], row[7]]
    if name == "cylinder":
        return [row[8:11], row[11:14], row[14]]
    if name == "cone":
        return [row[15:18], row[18:21], row[21]]
    raise KeyError(name)


@functools.lru_cache(maxsize=None)
def _fit_bucket(p: int) -> int:
    """Pad segment point counts to a few fixed buckets so the batched fit
    compiles once per bucket instead of once per segment size."""
    for b in (512, 2048, 10240):
        if p <= b:
            return b
    return ((p + 4095) // 4096) * 4096
