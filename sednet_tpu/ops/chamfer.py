"""Chamfer distance: blocked nearest-neighbour with a custom VJP.

TPU-native replacement for the reference's CUDA extension
(reference: src/chamfer_distance/{chamfer_distance.cu,chamfer_distance.py}),
which tiles point sets through shared memory and scatters gradients through
the argmin pairs. Here the forward is a row-block streaming min/argmin —
one MXU matmul per (R x N) tile, never materializing the full distance
matrix — and the backward gathers through the saved argmin indices
(the same gradient the CUDA kernel computes, without atomics: the scatter
into y becomes a segment-sum).

Also matches the reference's pure-torch chamfer used for metrics
(reference: src/utils.py:273-358).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sednet_tpu.ops.knn import pairwise_sqdist


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_one_direction(x, y, row_block):
    """For each row of x (N,D): min_j ||x_i - y_j||^2 and its argmin.

    Returns (dist (N,), idx (N,) int32)."""
    n = x.shape[0]
    rb = min(row_block, _round_up(n, 8))
    n_pad = _round_up(n, rb)
    x_q = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    def block(start):
        q = lax.dynamic_slice_in_dim(x_q, start, rb)
        d = pairwise_sqdist(q, y)  # (rb, M)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    starts = jnp.arange(n_pad // rb, dtype=jnp.int32) * rb
    dist, idx = lax.map(block, starts)
    return dist.reshape(n_pad)[:n], idx.reshape(n_pad)[:n]


@functools.partial(jax.jit, static_argnames=("row_block",))
def nn_distance(x: jax.Array, y: jax.Array, *, row_block: int = 1024):
    """Batched two-sided nearest neighbour.

    x: (B, N, D), y: (B, M, D).
    Returns (d1 (B,N), d2 (B,M), i1 (B,N), i2 (B,M)) — squared distances and
    argmin indices in both directions (the CUDA extension's interface,
    reference: src/chamfer_distance/chamfer_distance.py:54-121).
    """
    f = functools.partial(_nn_one_direction, row_block=row_block)
    d1, i1 = jax.vmap(f)(x, y)
    d2, i2 = jax.vmap(lambda a, b: f(b, a))(x, y)
    return d1, d2, i1, i2


@jax.custom_vjp
def _chamfer_dists(x, y):
    d1, d2, _, _ = nn_distance(x, y)
    return d1, d2


def _chamfer_fwd(x, y):
    d1, d2, i1, i2 = nn_distance(x, y)
    return (d1, d2), (x, y, i1, i2)


def _chamfer_bwd(res, g):
    x, y, i1, i2 = res
    g1, g2 = g  # (B, N), (B, M)
    y_near = jax.vmap(lambda yb, ib: yb[ib])(y, i1)  # (B, N, D)
    x_near = jax.vmap(lambda xb, ib: xb[ib])(x, i2)  # (B, M, D)
    # d1_i = ||x_i - y_{i1_i}||^2: dx from the x->y direction
    dx = 2.0 * g1[..., None] * (x - y_near)
    dy = 2.0 * g2[..., None] * (y - x_near)
    # scatter the cross terms (segment-sum instead of CUDA atomics)
    m = y.shape[1]
    n = x.shape[1]
    dy_scatter = jax.vmap(
        lambda gb, ib, diff: jax.ops.segment_sum(
            -2.0 * gb[:, None] * diff, ib, num_segments=m
        )
    )(g1, i1, x - y_near)
    dx_scatter = jax.vmap(
        lambda gb, ib, diff: jax.ops.segment_sum(
            -2.0 * gb[:, None] * diff, ib, num_segments=n
        )
    )(g2, i2, y - x_near)
    return dx + dx_scatter, dy + dy_scatter


_chamfer_dists.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_index(x: jax.Array, y: jax.Array):
    """Differentiable per-point squared NN distances both ways.

    Equivalent of the reference's ChamferIndex autograd Function
    (reference: src/chamfer_distance/chamfer_distance.py:88-121).
    """
    return _chamfer_dists(x, y)


def chamfer_distance(x: jax.Array, y: jax.Array, *, sqrt: bool = False) -> jax.Array:
    """Symmetric chamfer distance, mean over points then over batch.

    Matches ChamferDistance (reference: src/chamfer_distance/chamfer_distance.py:54-85)
    with the torch-metric convention of src/utils.py:273-358 when sqrt=True.
    """
    d1, d2 = _chamfer_dists(x, y)
    if sqrt:
        d1 = jnp.sqrt(jnp.clip(d1, min=1e-12))
        d2 = jnp.sqrt(jnp.clip(d2, min=1e-12))
    return jnp.mean(jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)) * 0.5
