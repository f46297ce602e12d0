"""Index-free fused DGCNN edge convolution (inference path).

The reference edge conv (reference: src/PointNet.py:140-171 +
src/SEDNet.py:78-94) is kNN -> gather (B, N, K, C) -> 1x1 conv -> GroupNorm
-> LeakyReLU -> max over K. On TPU the gather is the bottleneck: XLA lowers
the 640k-row gather at ~2.5% of HBM speed (~33 ms per batch-8 layer on a
v5e), and the GroupNorm re-reads the 164 MB gathered tensor.

This module removes the gather and the (B, N, K, C) tensor entirely. The
neighbour SET of point i is exactly { j : d(i, j) <= T_i } where T_i is the
k-th smallest distance (ties join the set — measure-zero on real clouds,
see Exactness below). One Pallas kernel makes two passes over the streamed
column tiles, everything resident in VMEM:

  phase 1 (value-only flash top-k): per-row ascending best-128 DISTANCE
    list via the bitonic network of ops.flash_topk, but without the index
    payload (half the permute traffic); yields T_i, and records which tiles
    ever contained a candidate (tiles skipped under a looser running
    threshold provably contain no final neighbour).
  phase 2: re-streams only the recorded tiles, recomputes the distance tile
    with bit-identical arithmetic, masks d <= T, and reduces the VMEM-
    resident pre-gather features a = x @ W_top over the mask:
      sum, sum-of-squares and count ride the MXU (mask @ a_tile);
      the per-channel max rides a static lane loop on the VPU.

An XLA epilogue then reconstructs the layer output EXACTLY:
  f[i,k,c] = a[j_ik, c] + b[i, c]   (b = x @ (W_bot - W_top), the factored
                                     form of ops.graph.edge_conv_features)
  GroupNorm stats are linear/quadratic in f -> recovered from sum/sumsq/
  count; and because GN + LeakyReLU is monotone in f per channel (direction
  = sign of the GN scale), max_k leaky(GN(f)) = leaky(GN(max-or-min_k f)).
  The kernel is fed sign(scale) * a so a single running max yields
  whichever extremum the channel needs.

Exactness: identical neighbour sets to the index-based path except when
several points tie EXACTLY (in f32) with the k-th distance — then all ties
participate (the gather path picks an arbitrary k-subset) and the count
output keeps the statistics consistent. The train path keeps the standard
differentiable gather implementation; this module is inference-only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sednet_tpu.ops.flash_topk import (W, _INF, _dist_tile, _lane_iota,
                                       _locality_order, _partner, _round_up)


def _compare_exchange_v(v, d, keep_min):
    """Value-only bitonic stage (no index payload — see
    flash_topk._compare_exchange for the masking scheme)."""
    pv = _partner(v, d)
    take = jnp.logical_or(jnp.logical_and(keep_min, pv < v),
                          jnp.logical_and(jnp.logical_not(keep_min), pv > v))
    return jnp.where(take, pv, v)


def _fold_tile_v(best_v, tile_v):
    """Value-only fold of a (RB, W) candidate tile into the ascending best
    list (see flash_topk._fold_tile)."""
    lane = _lane_iota()
    s, size = 1, 2
    while size <= W:
        d = size // 2
        while d >= 1:
            asc = (((lane >> s) & 1) == 0) == ((lane & d) == 0)
            tile_v = _compare_exchange_v(tile_v, d, jnp.logical_not(asc))
            d //= 2
        s += 1
        size *= 2
    m_v = jnp.minimum(tile_v, best_v)
    d = W // 2
    while d >= 1:
        m_v = _compare_exchange_v(m_v, d, (lane & d) == 0)
        d //= 2
    return m_v


def _make_fused_kernel(n_valid: int, n_tiles: int, metric: str, w: float,
                       k_lane: int):
    """Two-phase kernel: value top-k threshold, then masked reductions.

    Refs: q (D, RB) query block, p (D, NC) full geometry, a (NC, CP)
    sign-flipped pre-gather features; outputs mx/sm/sq (RB, CP), cnt
    (RB, 128). Tiles stream diagonal-first in both phases (see
    flash_topk._make_kernel); phase 2 only revisits tiles phase 1 actually
    folded (a tile skipped under a looser running threshold cannot contain
    a final neighbour)."""
    track_tiles = n_tiles <= W

    def kernel(q_ref, p_ref, a_ref, mx_ref, sm_ref, sq_ref, cnt_ref):
        q_blk = q_ref[:]                                  # (RB, D) natural
        if metric == "sqdist":
            qq = jnp.sum(q_blk * q_blk, axis=1, keepdims=True)  # (RB, 1)
        else:
            ch = lax.broadcasted_iota(jnp.int32, (1, q_blk.shape[1]), 1)
            q3 = jnp.where(ch < 3, q_blk, 0.0)
            qq = jnp.sum(q3 * q3, axis=1, keepdims=True)
        rb = q_blk.shape[0]
        cp = a_ref.shape[1]
        lane = _lane_iota()
        diag = jnp.minimum(pl.program_id(0) * (rb // W), n_tiles - 1)

        def tile_dist(j):
            j_eff = lax.rem(diag + j, n_tiles)
            col0 = pl.multiple_of(j_eff * W, W)
            p_tile = p_ref[:, pl.ds(col0, W)]
            d = _dist_tile(q_blk, p_tile, qq, metric, w)
            col = lane + col0                              # (1, W)
            d = jnp.where(col < n_valid, d, _INF)
            return d, j_eff, col0, col

        # ---- phase 1: value-only top-k + processed-tile mask
        # (proc rides as float32 0/1 — boolean vectors in a fori_loop carry
        # fail Mosaic legalization of the lowered scf.for)
        def body1(j, carry):
            best_v, proc = carry
            d, j_eff, _, _ = tile_dist(j)
            thresh = best_v[:, k_lane:k_lane + 1]
            # <= (not <): a tile whose only candidates TIE the running
            # k-th distance must still be marked for phase 2, or ties
            # would join the neighbour set only when their tile streamed
            # early — the documented all-ties contract would then depend
            # on the Morton order
            any_hit = jnp.any(jnp.min(d, axis=1, keepdims=True) <= thresh)
            best_v = lax.cond(any_hit,
                              lambda bv: _fold_tile_v(bv, d),
                              lambda bv: bv, best_v)
            if track_tiles:
                proc = jnp.maximum(
                    proc,
                    jnp.where(jnp.logical_and(lane == j_eff, any_hit),
                              1.0, 0.0))
            return best_v, proc

        init1 = (jnp.full((rb, W), _INF, jnp.float32),
                 jnp.zeros((1, W), jnp.float32))
        best_v, proc_f = lax.fori_loop(0, n_tiles, body1, init1)
        t_row = best_v[:, k_lane:k_lane + 1]               # (RB, 1)

        # ---- phase 2: masked reductions over the exact neighbour sets
        def body2(j, carry):
            mx, sm, sq, cnt = carry
            j_eff = lax.rem(diag + j, n_tiles)
            if track_tiles:
                bit = jnp.sum(jnp.where(lane == j_eff, proc_f, 0.0))
            else:
                bit = jnp.float32(1.0)

            def do(c):
                mx, sm, sq, cnt = c
                d, _, col0, col = tile_dist(j)
                hit = jnp.logical_and(d <= t_row, col < n_valid)
                m = hit.astype(jnp.float32)                 # (RB, W)
                a_t = a_ref[pl.ds(col0, W), :]              # (W, CP)
                sm = sm + lax.dot_general(
                    m, a_t, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                sq = sq + lax.dot_general(
                    m, a_t * a_t, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                cnt = cnt + jnp.sum(m, axis=1, keepdims=True)
                # per-channel masked max: static lane loop (the (r, j, c)
                # product is irreducible for an exact masked extremum)
                for wi in range(W):
                    sel = jnp.where(hit[:, wi:wi + 1],
                                    a_t[wi:wi + 1, :], -_INF)
                    mx = jnp.maximum(mx, sel)
                return mx, sm, sq, cnt

            def anyhit_then_do(c):
                d, _, _, col = tile_dist(j)
                any_hit = jnp.any(
                    jnp.min(d, axis=1, keepdims=True) <= t_row)
                return lax.cond(any_hit, do, lambda cc: cc, c)

            return lax.cond(bit > 0, anyhit_then_do, lambda c: c, carry)

        init2 = (jnp.full((rb, cp), -_INF, jnp.float32),
                 jnp.zeros((rb, cp), jnp.float32),
                 jnp.zeros((rb, cp), jnp.float32),
                 jnp.zeros((rb, W), jnp.float32))
        mx, sm, sq, cnt = lax.fori_loop(0, n_tiles, body2, init2)
        mx_ref[:] = mx
        sm_ref[:] = sm
        sq_ref[:] = sq
        cnt_ref[:] = cnt

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "normal_metric_w", "row_block",
                     "interpret", "spatial_sort"))
def fused_edge_reductions(geom: jax.Array, a: jax.Array, k: int, *,
                          metric: str = "sqdist",
                          normal_metric_w: float = 1.0,
                          row_block: int = 256, interpret: bool = False,
                          spatial_sort: bool = True):
    """Neighbour-set reductions of `a` under self-kNN of `geom`.

    geom: (N, D) rows defining the distance metric (self-kNN, k nearest
    including self); a: (N, C) values to reduce. Returns (mx, sm, sq, cnt):
    per-row max / sum / sum-of-squares of a over the neighbour set and the
    neighbour count (ties with the k-th distance included). Batched inputs
    (B, N, ...) unroll per shape like flash_topk.topk_pallas.
    """
    if geom.ndim == 3:
        outs = [fused_edge_reductions(
            geom[b], a[b], k, metric=metric,
            normal_metric_w=normal_metric_w, row_block=row_block,
            interpret=interpret, spatial_sort=spatial_sort)
            for b in range(geom.shape[0])]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))
    if not 1 <= k <= W:
        raise ValueError(f"k={k} outside [1, {W}]")
    geom = lax.stop_gradient(geom)
    a = lax.stop_gradient(a)

    if spatial_sort:
        key_dims = slice(0, 3) if metric == "points_normals" else slice(None)
        perm = _locality_order(geom[:, key_dims])
        mx, sm, sq, cnt = fused_edge_reductions(
            geom[perm], a[perm], k, metric=metric,
            normal_metric_w=normal_metric_w, row_block=row_block,
            interpret=interpret, spatial_sort=False)
        inv = jnp.argsort(perm)
        return mx[inv], sm[inv], sq[inv], cnt[inv]

    n, dim = geom.shape
    c = a.shape[1]
    d_pad = _round_up(dim, 8)
    c_pad = _round_up(c, 128)
    n_cols = _round_up(n, W)
    rb = max(_round_up(min(row_block, n), 128), 256)
    n_rows = _round_up(n, rb)
    # queries natural (N, D) — no relayout (see flash_topk.topk_pallas);
    # only the resident point set is transposed once
    g_pad = jnp.pad(geom.astype(jnp.float32),
                    ((0, n_rows - n), (0, d_pad - dim)))
    p_t = jnp.pad(geom.astype(jnp.float32).T,
                  ((0, d_pad - dim), (0, n_cols - n)))
    a_p = jnp.pad(a.astype(jnp.float32), ((0, n_cols - n), (0, c_pad - c)))

    kernel = _make_fused_kernel(n, n_cols // W, metric, normal_metric_w,
                                k_lane=k - 1)
    mx, sm, sq, cnt = pl.pallas_call(
        kernel,
        grid=(n_rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, n_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_cols, c_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((rb, w_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for w_ in (c_pad, c_pad, c_pad, W)),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, W), jnp.float32),
        ),
        interpret=interpret,
    )(g_pad, p_t, a_p)
    return mx[:n, :c], sm[:n, :c], sq[:n, :c], cnt[:n, 0]


def fused_edge_conv(x: jax.Array, geom: jax.Array, kernel_w: jax.Array,
                    gn_scale: jax.Array, gn_bias: jax.Array, k: int, *,
                    groups: int, metric: str = "sqdist",
                    normal_metric_w: float = 1.0, eps: float = 1e-6,
                    negative_slope: float = 0.2,
                    interpret: bool = False) -> jax.Array:
    """One full edge conv layer, index-free (inference only).

    x: (N, C_in) layer input features; geom: (N, D) kNN metric rows (equal
    to x for feature-space layers, xyz++normals for layer 1); kernel_w:
    (2*C_in, C_out) the flax Dense kernel over [x_j - x_i, x_i]; gn_scale /
    gn_bias: (C_out,) GroupNorm params. Returns (N, C_out) — max over the
    k neighbours of LeakyReLU(GroupNorm(dense(edge features))), matching
    models.backbone.EdgeConv up to reduction order.
    """
    c_in = x.shape[1]
    w_top = kernel_w[:c_in]
    w_bot = kernel_w[c_in:]
    a = x @ w_top                                   # (N, C_out)
    b = x @ (w_bot - w_top)                         # (N, C_out)
    sign = jnp.where(gn_scale >= 0, 1.0, -1.0)      # (C_out,)

    mxs, sms, sq, cnt = fused_edge_reductions(
        geom, a * sign[None, :], k, metric=metric,
        normal_metric_w=normal_metric_w, interpret=interpret)
    gext = sign[None, :] * mxs   # max a where scale>=0 else min a
    gsum = sign[None, :] * sms
    cnt = cnt[:, None]                              # (N, 1)

    c_out = a.shape[1]
    gsz = c_out // groups

    def grp(v):                                      # (N, C) -> (N, G, gsz)
        return v.reshape(v.shape[0], groups, gsz)

    # GroupNorm stats of f[i,k,c] = a[j_ik,c] + b[i,c] from the reductions;
    # fast-variance formula (mean of squares minus squared mean) matches
    # flax.linen.GroupNorm(use_fast_variance=True), its default.
    tot = jnp.sum(cnt) * gsz                         # scalar: items per group
    sum_g = jnp.sum(grp(gsum + cnt * b), axis=(0, 2))          # (G,)
    sumsq_g = jnp.sum(grp(sq + 2.0 * b * gsum + cnt * b * b), axis=(0, 2))
    mean_g = sum_g / tot
    var_g = jnp.maximum(sumsq_g / tot - mean_g * mean_g, 0.0)
    mul_g = lax.rsqrt(var_g + eps)                   # (G,)

    f_ext = gext + b                                 # (N, C) pre-GN extremum
    mean_c = jnp.repeat(mean_g, gsz)
    mul_c = jnp.repeat(mul_g, gsz)
    y = (f_ext - mean_c[None, :]) * mul_c[None, :] * gn_scale[None, :] \
        + gn_bias[None, :]
    return jax.nn.leaky_relu(y, negative_slope=negative_slope)


def encoder_apply_fused(enc_params, x: jax.Array, *, mode: int = 5,
                        k: int = 64, normal_metric_w: float = 1.0,
                        interpret: bool = False):
    """Index-free DGCNN encoder forward (inference).

    enc_params: variables["params"]["encoder"] of models.backbone
    .DGCNNEncoder — the fused path reads the SAME parameter tree the
    standard flax path trains. x: (B, N, 3|6). Returns (global (B, 1024),
    per-point feats (B, N, 256)) like DGCNNEncoder.__call__.
    """
    def one(xb):
        metric1 = "points_normals" if mode == 5 else "sqdist"
        p = enc_params

        def layer(name, feats, geom, metric):
            return fused_edge_conv(
                feats, geom, p[name]["conv"]["kernel"],
                p[name]["gn"]["scale"], p[name]["gn"]["bias"], k,
                groups=2, metric=metric, normal_metric_w=normal_metric_w,
                interpret=interpret)

        x1 = layer("conv1", xb, xb, metric1)
        x2 = layer("conv2", x1, x1, "sqdist")
        x3 = layer("conv3", x2, x2, "sqdist")
        feats = jnp.concatenate([x1, x2, x3], axis=-1)   # (N, 256)
        h = feats @ p["mlp1"]["kernel"] + p["mlp1"]["bias"]
        # GroupNorm(8) over (N, 1024) — flax reduces every non-batch axis
        hg = h.reshape(h.shape[0], 8, 128)
        mean = jnp.mean(hg, axis=(0, 2))
        var = jnp.maximum(jnp.mean(hg * hg, axis=(0, 2)) - mean * mean, 0.0)
        mul = lax.rsqrt(var + 1e-6) * 1.0
        hn = (hg - mean[None, :, None]) * mul[None, :, None]
        hn = hn.reshape(h.shape) * p["gn_mlp1"]["scale"][None, :] \
            + p["gn_mlp1"]["bias"][None, :]
        gf = jnp.max(jax.nn.relu(hn), axis=0)            # (1024,)
        return gf, feats

    outs = [one(x[i]) for i in range(x.shape[0])]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))
