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


def edge_conv_factored(x: jax.Array, idx: jax.Array, dense,
                       scale: jax.Array, bias: jax.Array, *, groups: int,
                       negative_slope: float = 0.2,
                       eps: float = 1e-6) -> jax.Array:
    """Full edge-conv layer output WITHOUT materializing (B, N, K, C).

    Equals leaky_relu(GroupNorm(dense(edge_features)), slope).max(K) — the
    body of models.backbone.EdgeConv — up to float reassociation, but the
    gathered tensor (164 MB/shape at the reference's N=10k, k=64, C=64;
    reference hot loop src/PointNet.py:140-171) is never written to HBM:

      * the matmul is factored through the gather as in edge_conv_features:
        f[b,i,k,c] = a[b, idx[b,i,k], c] + bb[b,i,c] with a = x @ W_top,
        bb = x @ (W_bot - W_top);
      * ONE gather pass reduces over K into three (B, N, C) tensors —
        s = sum_k f-part, sq = sum_k (f-part)^2, and the per-channel
        signed extremum ext (max where the GN scale is >= 0, min where it
        is negative);
      * GroupNorm statistics are linear/quadratic in f, so they are
        recovered exactly from (s, sq, bb): per (batch, group)
          S1 = sum_{i,c in g} (s + K*bb),
          S2 = sum_{i,c in g} (sq + 2*bb*s + K*bb^2),
        with a FIXED item count N*K*gsz (no neighbour-count bookkeeping —
        unlike the threshold-based fused_edgeconv kernel, the indexed
        neighbour set always has exactly K members). Crucially
        sum_i s[b,i,c] already equals sum_p count[p] * a[b,p,c], so no
        scatter/bincount is needed anywhere;
      * GN-affine + LeakyReLU is monotone per channel with direction
        sign(scale), so max_k leaky(GN(f)) = leaky(GN(ext + bb)).

    Statistics match flax.linen.GroupNorm's use_fast_variance=True
    default (mean of squares minus squared mean, eps inside rsqrt).
    Gradients are exact too: stats gradients flow through s/sq (the same
    totals the direct path differentiates) and the extremum picks the
    same argmax element the direct path's max does.

    x: (B, N, C_in); idx: (B, N, K); dense: bias-free flax Dense
    (2*C_in -> C); scale/bias: (C,) GroupNorm affine. Returns (B, N, C).
    """
    zeros = jnp.zeros_like(x)
    a = dense(jnp.concatenate([x, zeros], axis=-1))   # x @ W_top
    bb = dense(jnp.concatenate([-x, x], axis=-1))     # x @ (W_bot - W_top)
    sign = jnp.where(scale >= 0, 1.0, -1.0)           # (C,)

    g = gather_neighbors(a * sign[None, None, :], idx)  # (B, N, K, C)
    s = jnp.sum(g, axis=2) * sign                     # sum_k a[idx]
    sq = jnp.sum(g * g, axis=2)                       # sign^2 == 1
    ext = jnp.max(g, axis=2) * sign                   # signed extremum of a

    b, n, c = a.shape
    k = idx.shape[2]
    gsz = c // groups

    def grp(v):                                       # (B,N,C)->(B,N,G,gsz)
        return v.reshape(b, n, groups, gsz)

    tot = jnp.float32(n * k * gsz)
    s1 = jnp.sum(grp(s + k * bb), axis=(1, 3))                    # (B, G)
    s2 = jnp.sum(grp(sq + 2.0 * bb * s + k * bb * bb), axis=(1, 3))
    mean = s1 / tot
    var = jnp.maximum(s2 / tot - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps)                                # (B, G)

    mean_c = jnp.repeat(mean, gsz, axis=1)[:, None, :]            # (B,1,C)
    mul_c = jnp.repeat(mul, gsz, axis=1)[:, None, :]
    y = (ext + bb - mean_c) * mul_c * scale[None, None, :] \
        + bias[None, None, :]
    return jax.nn.leaky_relu(y, negative_slope=negative_slope)


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
