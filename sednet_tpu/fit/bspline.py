"""B-spline basis math, control-grid surface sampling, standardization,
and the Kronecker least-squares control-point fit.

Rebuild of the reference's spline stack:
  * uniform_knot_bspline / basis_function_one (NURBS Book Alg 2.4)
    (reference: src/loss.py:190-297, src/approximation.py);
  * sample_points_from_control_points_ (reference:
    src/fitting_utils.py:609-622) — the per-batch per-channel Python loops
    become one einsum;
  * standardize_points (weighted mean / PCA rotation / extent scale,
    reference: src/fitting_utils.py:493-553) as a fixed-shape masked
    program (the boolean indexing becomes masks + lax.cond);
  * fit_bezier_surface_fit_kronecker (reference: src/approximation.py) —
    LS control points via the (Nu (x) Nv) design matrix.

Basis matrices are numpy (host precompute, jit constants).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

EPS = 1e-8


def basis_function_one(degree: int, knots, span: int, u: float) -> float:
    """Cox-de Boor single basis value (NURBS Book Alg 2.4;
    reference: src/loss.py:242-297)."""
    if ((span == 0 and u == knots[0]) or
            (span == len(knots) - degree - 2 and u == knots[-1])):
        return 1.0
    if u < knots[span] or u >= knots[span + degree + 1]:
        return 0.0
    n = [0.0] * (degree + span + 1)
    for j in range(degree + 1):
        if knots[span + j] <= u < knots[span + j + 1]:
            n[j] = 1.0
    for k in range(1, degree + 1):
        saved = 0.0
        if n[0] != 0.0:
            saved = ((u - knots[span]) * n[0]) / (knots[span + k] - knots[span])
        for j in range(degree - k + 1):
            u_left = knots[span + j + 1]
            u_right = knots[span + j + k + 1]
            if n[j + 1] == 0.0:
                n[j] = saved
                saved = 0.0
            else:
                temp = n[j + 1] / (u_right - u_left)
                n[j] = saved + (u_right - u) * temp
                saved = (u - u_left) * temp
    return n[0]


def uniform_knot_bspline(cu: int, cv: int, du: int, dv: int,
                         grid_size: int = 30):
    """Uniform-knot basis matrices (nu (grid, cu), nv (grid, cv))
    (reference: src/loss.py:190-211)."""
    u = np.arange(0.0, 1.0, 1.0 / grid_size)
    knots_u = ([0.0] * du
               + np.arange(0, 1.01, 1.0 / (cu - du)).tolist() + [1.0] * du)
    knots_v = ([0.0] * dv
               + np.arange(0, 1.01, 1.0 / (cv - dv)).tolist() + [1.0] * dv)
    nu = np.zeros((u.shape[0], cu))
    nv = np.zeros((u.shape[0], cv))
    for i, ui in enumerate(u):
        for j in range(cu):
            nu[i, j] = basis_function_one(du, knots_u, j, ui)
        for j in range(cv):
            nv[i, j] = basis_function_one(dv, knots_v, j, ui)
    return nu.astype(np.float32), nv.astype(np.float32)


def sample_from_control_grid(nu: jax.Array, nv: jax.Array,
                             control: jax.Array, cu: int, cv: int) -> jax.Array:
    """(B, cu*cv, 3) control grid -> (B, grid^2, 3) surface samples
    (reference: src/fitting_utils.py:609-622)."""
    b = control.shape[0]
    grid = control.reshape(b, cu, cv, 3)
    pts = jnp.einsum("gu,buvc,hv->bghc", nu, grid, nv)
    return pts.reshape(b, nu.shape[0] * nv.shape[0], 3)


def _rotation_a_to_b_jax(a: jax.Array, b: jax.Array) -> jax.Array:
    """jit-safe rotation R with b = R @ a
    (reference: src/fitting_utils.py:560-598 numpy twin)."""
    cos = jnp.dot(a, b)
    sin = jnp.linalg.norm(jnp.cross(b, a))
    u = a
    v = b - jnp.dot(a, b) * a
    v = v / (jnp.linalg.norm(v) + EPS)
    w = jnp.cross(b, a)
    w = w / (jnp.linalg.norm(w) + EPS)
    f = jnp.stack([u, v, w], 1)
    g = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    g = g.at[0, 0].set(cos).at[0, 1].set(-sin).at[1, 0].set(sin).at[1, 1].set(cos)
    # fall back to identity for degenerate f
    det = jnp.linalg.det(f)
    r = f @ g @ jnp.linalg.inv(f + EPS * jnp.eye(3))
    return jnp.where(jnp.abs(det) < 1e-10, jnp.eye(3), r)


@functools.partial(jax.jit, static_argnames=())
def standardize_points(points: jax.Array, weights: jax.Array):
    """Weighted center -> PCA-align smallest axis to +x -> per-axis extent
    scale (reference: src/fitting_utils.py:512-553).

    points: (N, 3); weights: (N,). Returns (std_points (N,3), std (3,),
    mean (3,), R (3,3))."""
    n = points.shape[0]
    conf = weights > 0.8
    k = n // 4 if n >= 7500 else n // 2
    thresh = jnp.sort(weights)[n - k]
    topk_mask = weights >= thresh
    mask = jnp.where(conf.sum() < 400, topk_mask, conf)  # (N,)
    mf = mask.astype(points.dtype)[:, None]

    wp = points * weights[:, None] * mf
    mean = jnp.sum(wp, 0) / (jnp.sum(weights * mask) + EPS)
    centered = points - mean

    cov = (centered * mf).T @ (centered * mf)
    s, u = jnp.linalg.eigh(cov)
    smallest = u[:, 0]  # eigh sorts ascending
    r = lax.stop_gradient(_rotation_a_to_b_jax(smallest,
                                               jnp.array([1.0, 0.0, 0.0])))
    rotated = centered @ r.T
    wr = rotated * weights[:, None]
    big = jnp.where(mf > 0, wr, -jnp.inf)
    small = jnp.where(mf > 0, wr, jnp.inf)
    std = lax.stop_gradient(jnp.abs(big.max(0) - small.min(0)))
    return rotated / (std + EPS), std, mean, r


def reverse_transformation(points, mean, std, r):
    """Undo standardize_points (reference: src/fitting_utils.py:600-606)."""
    scaled = points * std.reshape(1, 3)
    return scaled @ r + mean  # (R^-1 @ p^T)^T == p @ R for rotations


def fit_control_points_kronecker(surface_points: jax.Array, nu: jax.Array,
                                 nv: jax.Array, lamb: float = 1e-6):
    """LS control grid C minimizing ||(Nu (x) Nv) vec(C) - vec(P)||
    (reference: src/approximation.py fit_bezier_surface_fit_kronecker).

    surface_points: (gu*gv, 3) gridded samples; returns (cu*cv, 3)."""
    a = jnp.kron(nu, nv)  # (gu*gv, cu*cv)
    ata = a.T @ a + lamb * jnp.eye(a.shape[1])
    return jnp.linalg.solve(ata, a.T @ surface_points)
