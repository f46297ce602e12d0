"""Edge-feature construction for DGCNN edge convolutions.

TPU-native equivalent of the reference's get_graph_feature family
(reference: src/PointNet.py:140-245), which flattens (B,N) and gathers with
global indices. Here we keep channels-last (B, N, C) layout — the channel
axis maps onto the 128-lane dimension — and gather per batch item with a
vmapped take, which XLA lowers to an efficient dynamic-gather.

Edge feature for point i and neighbour j: [x_j - x_i, x_i]  -> 2C channels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour features.

    x: (B, N, C), idx: (B, N, K) int32 -> (B, N, K, C).

    Implemented as ONE flat gather from a (B*N, C) table with
    batch-offset indices rather than a vmapped per-shape gather: XLA
    lowers the batched gather ~2.6x slower on TPU (measured 33.4 vs
    12.8 ms for (8, 10k, 64, 64) f32 on a v5e, scripts/sweep_gather.py —
    the batch dimension defeats its gather coalescing; index order and
    locality made no difference). Same values, same scatter-add VJP.
    """
    b, n, _ = x.shape
    if b == 1:
        return x[0][idx[0]][None]
    # clamp BEFORE adding the batch offset: the flat table would otherwise
    # turn an out-of-range index into a silent read from another shape's
    # rows instead of JAX's usual within-shape clamp (ADVICE r3). The clip
    # fuses into the index computation — free relative to the gather.
    idx = jnp.clip(idx, 0, n - 1)
    off = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    flat = x.reshape(b * n, x.shape[-1])[(idx + off).reshape(-1)]
    return flat.reshape(*idx.shape, x.shape[-1])


def edge_features(x: jax.Array, idx: jax.Array) -> jax.Array:
    """[x_j - x_i, x_i] edge features (reference: src/PointNet.py:170).

    x: (B, N, C), idx: (B, N, K) -> (B, N, K, 2C).
    """
    nbr = gather_neighbors(x, idx)                       # (B, N, K, C)
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)  # (B, N, K, C)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def edge_conv_features(x: jax.Array, idx: jax.Array, dense) -> jax.Array:
    """dense([x_j - x_i, x_i]) with the matmul factored THROUGH the gather.

    For a bias-free Dense with kernel W = [W_top; W_bot] over the 2C edge
    feature, dense([x_j - x_i, x_i]) = x_j @ W_top + x_i @ (W_bot - W_top).
    Computing a = x @ W_top and b = x @ (W_bot - W_top) first (two (N, 2C)
    Dense calls with zero/negated halves, so the parameter tree is
    unchanged) and gathering `a` cuts the matmul FLOPs by the neighbour
    count K (64x at the default k) versus applying dense to the gathered
    (B, N, K, 2C) tensor — at conv3 (256->128, N=10k, B=8) that is
    ~33 TFLOP -> ~10 GFLOP — and halves the gathered channel width.

    x: (B, N, C), idx: (B, N, K), dense: bias-free flax Dense (2C -> C').
    Returns (B, N, K, C'), identical (up to float reassociation) to
    dense(edge_features(x, idx)).
    """
    zeros = jnp.zeros_like(x)
    a = dense(jnp.concatenate([x, zeros], axis=-1))   # x @ W_top
    b = dense(jnp.concatenate([-x, x], axis=-1))      # x @ (W_bot - W_top)
    return gather_neighbors(a, idx) + b[:, :, None, :]


def edge_features_cross(
    pos: jax.Array, feat: jax.Array, idx: jax.Array, use_pos: bool = False
) -> jax.Array:
    """Gather `feat` neighbours using an index built on `pos` (xyz kNN).

    Reference: my_get_graph_feature (src/PointNet.py:213-245).
    pos: (B, N, 3), feat: (B, N, C), idx: (B, N, K)
    -> (B, N, K, C) or with use_pos (B, N, K, C+3) (center xyz prepended).
    """
    nbr = gather_neighbors(feat, idx)
    if use_pos:
        ctr = jnp.broadcast_to(pos[:, :, None, :], nbr.shape[:-1] + (3,))
        return jnp.concatenate([ctr, nbr], axis=-1)
    return nbr
