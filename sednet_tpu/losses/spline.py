"""SplineNet losses: permutation-invariant control-grid regression,
chamfer reconstruction, laplacian smoothing.

Rebuild of reference src/loss.py:12-239. The open-spline loss checks all 8
grid symmetries (4 flips x transpose, :21-38); the closed-spline loss also
rolls along the closed (u) direction, x4 half-permutations (:41-57,100-124);
both pick the minimum-cost alignment per shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sednet_tpu.fit.bspline import sample_from_control_grid
from sednet_tpu.ops.chamfer import chamfer_distance, nn_distance


def _all_permutations(grid: jax.Array) -> jax.Array:
    """(B, g, g, 3) -> (B, 8, g, g, 3) open-spline symmetries
    (reference: src/loss.py:21-38)."""
    p = [grid,
         jnp.flip(grid, 1),
         jnp.flip(grid, 2),
         jnp.flip(grid, (1, 2))]
    p = p + [jnp.swapaxes(q, 1, 2) for q in p]
    return jnp.stack(p, 1)


def _all_permutations_half(grid: jax.Array) -> jax.Array:
    """(B, g, g, 3) -> (B, 4, g, g, 3) closed-spline symmetries
    (reference: src/loss.py:41-57)."""
    return jnp.stack([grid, jnp.flip(grid, 1), jnp.flip(grid, 2),
                      jnp.flip(grid, (1, 2))], 1)


def control_points_permute_loss(output: jax.Array, control_points: jax.Array,
                                grid_size: int):
    """Min over the 8 open-spline symmetries
    (reference: src/loss.py:76-97). output: (B, g*g, 3);
    control_points: (B, g, g, 3). Returns (loss, best-aligned gt)."""
    b = output.shape[0]
    out = output.reshape(b, grid_size, grid_size, 3)[:, None]
    perms = _all_permutations(control_points)        # (B, 8, g, g, 3)
    diff = jnp.sum((out - perms) ** 2, (2, 3, 4))    # (B, 8)
    idx = jnp.argmin(diff, 1)
    loss = jnp.mean(jnp.min(diff, 1)) / (grid_size * grid_size * 3)
    best = jnp.take_along_axis(perms, idx[:, None, None, None, None],
                               axis=1)[:, 0]
    return loss, best


def control_points_permute_closed_loss(output: jax.Array,
                                       control_points: jax.Array,
                                       grid_u: int, grid_v: int):
    """Min over rolls x 4 symmetries for closed splines
    (reference: src/loss.py:100-124)."""
    b = output.shape[0]
    out = output.reshape(b, grid_u, grid_v, 3)[:, None]
    rolls = [jnp.roll(control_points, i, axis=1) for i in range(grid_v)]
    perms = jnp.concatenate([_all_permutations_half(r) for r in rolls], 1)
    diff = jnp.sum((out - perms) ** 2, (2, 3, 4))
    idx = jnp.argmin(diff, 1)
    loss = jnp.mean(jnp.min(diff, 1)) / (grid_u * grid_v * 3)
    best = jnp.take_along_axis(perms, idx[:, None, None, None, None],
                               axis=1)[:, 0]
    return loss, best


def spline_reconstruction_loss(nu, nv, control: jax.Array, points: jax.Array,
                               *, sqrt=False):
    """Chamfer between the sampled predicted surface and the gt points
    (reference: src/loss.py:167-187). control: (B, cu*cv, 3);
    points: (B, N, 3)."""
    cu, cv = nu.shape[1], nv.shape[1]
    reconst = sample_from_control_grid(jnp.asarray(nu), jnp.asarray(nv),
                                       control, cu, cv)
    return chamfer_distance(reconst, points, sqrt=sqrt), reconst


def spline_reconstruction_loss_one_sided(nu, nv, control, points, *, side=1):
    """One-sided chamfer (reference: src/loss.py:142-165 +
    src/utils.py:299-323). side=1 -> for every GT point, the nearest
    RECONST point ("the prediction must cover the gt patch"): the
    reference's diff is (B, M_gt, N_pred) and side==1 mins over the pred
    axis. side=0 is the reverse (every reconst point near some gt)."""
    cu, cv = nu.shape[1], nv.shape[1]
    reconst = sample_from_control_grid(jnp.asarray(nu), jnp.asarray(nv),
                                       control, cu, cv)
    d1, d2, _, _ = nn_distance(reconst, points)
    # d1: per-reconst min over gt (side 0); d2: per-gt min over reconst
    dist = jnp.mean(d2) if side == 1 else jnp.mean(d1)
    return dist, reconst


def laplacian_loss(output: jax.Array, gt: jax.Array, dist_type: str = "l2"):
    """Laplacian (4-neighbour) smoothing regression on control grids
    (reference: src/loss.py:213-239). output/gt: (B, g, g, 3)."""
    k = jnp.asarray([[0.0, 0.25, 0.0], [0.25, -1.0, 0.25], [0.0, 0.25, 0.0]],
                    jnp.float32)

    def lap_depthwise(x):
        xc = jnp.moveaxis(x, -1, 1).reshape(-1, 1, x.shape[1], x.shape[2])
        out = jax.lax.conv_general_dilated(
            xc, k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return out.reshape(x.shape[0], 3, x.shape[1], x.shape[2])

    lo = lap_depthwise(output)
    lg = lap_depthwise(gt)
    if dist_type == "l2":
        d = (lo - lg) ** 2
    else:
        d = jnp.abs(lo - lg)
    return jnp.mean(jnp.sum(d, 1))
