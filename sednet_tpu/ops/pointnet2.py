"""pointnet2 op family, TPU-native.

Rebuild of the reference's vendored CUDA extension
(Fitting_patches_and_edges/pointnet2/_ext_src/src/bindings.cpp:11-24):
furthest_point_sampling, gather, three_nn, three_interpolate, ball_query,
group_points. Only three_nn is on the reference's live path
(proj_2_edge_utils.py:48); the rest exist for API completeness
(pointnet2_modules.py SA/FP layers).

Design: fixed shapes throughout — FPS is a `lax.fori_loop` max-of-min
update; ball_query returns a fixed (n_sample) slot list padded with the
first hit (the CUDA kernel's convention); everything vmaps over batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sednet_tpu.ops.knn import pairwise_sqdist
from sednet_tpu.ops.dispatch import target_backend


@functools.partial(jax.jit, static_argnames=("n_samples",))
def furthest_point_sampling(points: jax.Array, n_samples: int) -> jax.Array:
    """(B, N, 3) -> (B, n_samples) int32 indices; greedy max-of-min-distance
    (reference: pointnet2/_ext_src/src/sampling_gpu.cu)."""

    def one(pts):
        n = pts.shape[0]

        def body(i, state):
            idx, min_d = state
            last = pts[idx[i - 1]]
            d = jnp.sum((pts - last) ** 2, -1)
            min_d = jnp.minimum(min_d, d)
            idx = idx.at[i].set(jnp.argmax(min_d).astype(jnp.int32))
            return idx, min_d

        idx0 = jnp.zeros(n_samples, jnp.int32)
        min_d0 = jnp.full((n,), jnp.inf, jnp.float32)
        idx, _ = lax.fori_loop(1, n_samples, body, (idx0, min_d0))
        return idx

    return jax.vmap(one)(points)


def gather_operation(features: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C), (B, M) -> (B, M, C)."""
    return jax.vmap(lambda f, i: f[i])(features, idx)


@functools.partial(jax.jit, static_argnames=())
def three_nn(unknown: jax.Array, known: jax.Array):
    """3 nearest neighbours of each unknown point among known points.

    (B, N, 3), (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3)); euclidean
    distances like the CUDA kernel (interpolate_gpu.cu). On TPU this rides
    the fused Pallas top-k (no N x M matrix in HBM)."""
    from sednet_tpu.ops.flash_topk import pallas_topk_supported, topk_pallas

    if (target_backend() == "tpu"
            and pallas_topk_supported(known.shape[1], known.shape[2], 3)):
        idx, d = topk_pallas(unknown, known, 3, return_distances=True)
        return jnp.sqrt(jnp.clip(d, min=0.0)), idx

    def one(u, k):
        d = pairwise_sqdist(u, k)
        neg, idx = lax.top_k(-d, 3)
        return jnp.sqrt(jnp.clip(-neg, min=0.0)), idx.astype(jnp.int32)

    return jax.vmap(one)(unknown, known)


def three_interpolate(features: jax.Array, idx: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted interpolation from 3 neighbours.

    features (B, M, C), idx (B, N, 3), weight (B, N, 3) -> (B, N, C).
    Differentiable via plain autodiff (the CUDA ext hand-writes the grad)."""

    def one(f, i, w):
        return jnp.einsum("nkc,nk->nc", f[i], w)

    return jax.vmap(one)(features, idx, weight)


def interpolation_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance weights used with three_interpolate
    (reference: pointnet2_modules.py FP module)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, -1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("radius", "n_sample"))
def ball_query(centers: jax.Array, points: jax.Array, *, radius: float,
               n_sample: int):
    """Indices of up to n_sample points within radius of each center; empty
    slots repeat the first hit (CUDA convention, ball_query_gpu.cu).

    centers (B, M, 3), points (B, N, 3) -> (idx (B, M, n_sample) int32,
    count (B, M) int32)."""

    def one(c, p):
        d = pairwise_sqdist(c, p)                          # (M, N)
        inside = d <= radius * radius
        # rank points by (outside, index): first n_sample inside, in index
        # order, mirror the CUDA scan order
        n = p.shape[0]
        order_key = jnp.where(inside,
                              jnp.arange(n, dtype=jnp.int32)[None, :],
                              n + jnp.arange(n, dtype=jnp.int32)[None, :])
        _, sel = lax.top_k(-order_key.astype(jnp.float32), n_sample)
        sel = sel.astype(jnp.int32)
        count = jnp.minimum(inside.sum(-1), n_sample).astype(jnp.int32)
        slot = jnp.arange(n_sample, dtype=jnp.int32)[None, :]
        first = sel[:, :1]
        sel = jnp.where(slot < jnp.maximum(count[:, None], 1), sel, first)
        return sel, count

    return jax.vmap(one)(centers, points)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C), (B, M, K) -> (B, M, K, C)
    (reference: group_points_gpu.cu; grads via autodiff)."""
    return jax.vmap(lambda f, i: f[i])(features, idx)
