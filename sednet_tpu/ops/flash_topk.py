"""Fused pairwise-distance + exact top-k Pallas kernel (flash-topk).

The backbone's hot loop is "k nearest of 10k points for every point"
(reference: src/PointNet.py:62-137 builds the full NxN matrix per batch item
and calls torch.topk). XLA's TopK at N=10k lowers through sort passes that
round-trip the (N, N) distances to HBM; measured on a v5e this costs ~200 ms
per shape per kNN build. This kernel never leaves VMEM: each query row-block
streams 128-wide column tiles of the point set, computes the distance tile on
the MXU, sorts the 128 candidates with a bitonic network on the VPU lanes
(Pallas has no sort/top_k lowering, so the compare-exchange stages are
hand-rolled with pltpu.roll), and folds them into a running ascending
best-128 list with a one-stage bitonic min-merge. Exact — every true
k-nearest element is kept because the merge keeps the 128 smallest of
(best-128 u tile-128) at every step.

Supports both reference metrics:
  * plain squared euclidean (src/PointNet.py:76-78),
  * d_p * (1 + W * d_n) position-normal product (src/PointNet.py:106-128).

Ties are broken by network position, not by lowest-index like torch.topk;
callers that need deterministic tie order must not rely on it (the reference
pipeline never does — ties only arise for duplicated points).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128  # lane width = candidate-list length; k <= W supported
_INF = float("inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_iota():
    return lax.broadcasted_iota(jnp.int32, (1, W), 1)


def _partner(v, d):
    """Value at lane (l ^ d) for every lane l (two circular shifts + select).

    pltpu.roll(x, s, axis): out[l] = in[(l - s) % W], so roll by W - d aligns
    lane l+d onto l and roll by +d aligns lane l-d onto l (shifts must be
    non-negative)."""
    lo = (_lane_iota() & d) == 0
    return jnp.where(lo, pltpu.roll(v, W - d, 1), pltpu.roll(v, d, 1))


def _compare_exchange(v, i, d, keep_min):
    """One bitonic stage: lanes exchange with partner l^d; a lane keeps the
    min of the pair where keep_min else the max. keep_min is a static (1, W)
    bool mask (trace-time constant)."""
    pv = _partner(v, d)
    pi = _partner(i, d)
    # take-partner = keep_min ? pv < v : pv > v, written with and/or since
    # Mosaic cannot select between boolean operands. Strict comparisons make
    # both lanes of a tied pair keep their own entry — an == / XOR variant
    # would move the same entry to both lanes, duplicating one index and
    # dropping the other (caught by the duplicated-points test).
    take = jnp.logical_or(jnp.logical_and(keep_min, pv < v),
                          jnp.logical_and(jnp.logical_not(keep_min), pv > v))
    return jnp.where(take, pv, v), jnp.where(take, pi, i)


def _fold_tile(best_v, best_i, tile_v, tile_i):
    """Fold a fresh (RB, W) candidate tile into the ascending best list.

    Sort the tile descending, pair lane-for-lane with the ascending best
    list (their concatenation is bitonic, so the elementwise min holds
    exactly the W smallest of the union), then re-sort the bitonic result
    ascending. The keep-min masks are built from iota at trace time inside
    the kernel (Pallas kernels cannot capture array constants)."""
    lane = _lane_iota()
    # full descending bitonic sort of the tile
    s, size = 1, 2
    while size <= W:
        d = size // 2
        while d >= 1:
            asc = (((lane >> s) & 1) == 0) == ((lane & d) == 0)
            tile_v, tile_i = _compare_exchange(tile_v, tile_i, d,
                                               jnp.logical_not(asc))
            d //= 2
        s += 1
        size *= 2
    # asc best ++ desc tile is bitonic: the lane-wise min is the W smallest
    take = tile_v < best_v
    m_v = jnp.where(take, tile_v, best_v)
    m_i = jnp.where(take, tile_i, best_i)
    # ascending bitonic merge of the W-length bitonic sequence
    d = W // 2
    while d >= 1:
        m_v, m_i = _compare_exchange(m_v, m_i, d, (lane & d) == 0)
        d //= 2
    return m_v, m_i


def _dist_tile(q_blk, p_tile, qq, metric: str, w: float):
    """(RB, W) distance tile. q_blk (RB, D) NATURAL layout (no host
    transpose of the queries; the matmul is the MXU-native
    (RB, D) @ (D, W) form), p_tile (D, W) transposed-resident.

    For the points_normals metric the position/normal channel splits are
    LANE slices of q_blk; Mosaic dislikes unaligned lane slices, so the
    split rides as elementwise masks into full-D matmuls instead (the
    masked lanes contribute exact zeros; D is <= 8 padded so the matmul
    cost is unchanged)."""
    if metric == "sqdist":
        s = lax.dot_general(q_blk, p_tile, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        pp = jnp.sum(p_tile * p_tile, axis=0, keepdims=True)  # (1, W)
        return qq + pp - 2.0 * s
    # points+normals product metric (reference: src/PointNet.py:106-128)
    d = q_blk.shape[1]
    ch = lax.broadcasted_iota(jnp.int32, (1, d), 1)
    q3 = jnp.where(ch < 3, q_blk, 0.0)
    qn = jnp.where((ch >= 3) & (ch < 6), q_blk, 0.0)
    s3 = lax.dot_general(q3, p_tile, (((1,), (0,)), ((), ())),
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    sn = lax.dot_general(qn, p_tile, (((1,), (0,)), ((), ())),
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    pp = jnp.sum(p_tile[:3] * p_tile[:3], axis=0, keepdims=True)
    dp = qq + pp - 2.0 * s3
    dn = 2.0 - 2.0 * sn
    return dp * (1.0 + w * dn)


def _make_kernel(n_valid: int, n_tiles: int, metric: str, w: float,
                 largest: bool = False, k_lane: int = W - 1,
                 halves: int = 1):
    """k_lane = k - 1: a tile whose every distance is >= every row's current
    (k_lane+1)-th best provably contains no top-k element, so its whole
    sort+merge (the dominant VPU work) is skipped with a lax.cond. Tiles
    stream DIAGONAL-FIRST (starting at the query block's own position along
    the locality curve, wrapping around) so the threshold tightens on the
    first few tiles — ~68% of tiles skip on spatially sorted CAD clouds vs
    ~50% with in-order streaming. Correctness never depends on the ordering
    (lanes past k_lane may go stale, so callers must not read them —
    topk_pallas slices [:k]).

    halves > 1 streams SUPER-tiles of halves*W columns: ONE bigger
    distance matmul per loop iteration (fewer loop/issue stalls, better
    MXU shape), then gates the fold PER 128-lane half — fold work stays
    identical, loop overhead divides by `halves`.

    (Round-3 attempt, reverted: feeding the locality permutation in as a
    resident per-column id vector — so the kernel emits ORIGINAL ids and
    the host-side perm[idx] remap gather disappears — fails Mosaic
    legalization: a dynamic (1, W) lane-slice of the (1, N) id vector
    carries a vpad "{*,128}" layout that neither broadcast_in_dim nor an
    implicit binary-op broadcast can expand to (RB, W) ("Invalid input
    layout"). See ROADMAP round-3 kNN notes for the full call-level cost
    decomposition this was meant to attack.)"""

    def kernel(q_ref, p_ref, iv_ref, ii_ref):
        q_blk = q_ref[:]                                  # (RB, D) natural
        if metric == "sqdist":
            qq = jnp.sum(q_blk * q_blk, axis=1, keepdims=True)  # (RB, 1)
        else:
            ch = lax.broadcasted_iota(jnp.int32, (1, q_blk.shape[1]), 1)
            q3 = jnp.where(ch < 3, q_blk, 0.0)
            qq = jnp.sum(q3 * q3, axis=1, keepdims=True)
        rb = q_blk.shape[0]
        lane = _lane_iota()
        cw = W * halves                                    # super-tile cols
        n_super = n_tiles // halves
        # first tile = the block's own region on the locality curve (the
        # row-block grid axis is axis 0 as authored; vmap's batching rule
        # renumbers program_id when it prepends the batch axis)
        diag = jnp.minimum(pl.program_id(0) * (rb // W) // halves,
                           n_super - 1)
        if largest:
            # farthest mode on a Morton-sorted cloud: curve position t's
            # spatial antipode sits near position n-1-t (complementing the
            # coordinates complements the interleaved bits), so the
            # farthest candidates live in the MIRRORED tile — stream from
            # there and the threshold tightens immediately, re-enabling
            # the skip that diagonal-first gives nearest mode
            diag = n_super - 1 - diag

        def body(j, carry):
            j_eff = lax.rem(diag + j, n_super)
            col0 = pl.multiple_of(j_eff * cw, cw)
            p_tile = p_ref[:, pl.ds(col0, cw)]
            d_all = _dist_tile(q_blk, p_tile, qq, metric, w)  # (RB, cw)
            if largest:
                d_all = -d_all  # select the k FARTHEST (spectral quirk)
            for h in range(halves):
                best_v, best_i = carry
                d = d_all[:, h * W:(h + 1) * W]
                col = lane + col0 + h * W                   # (1, W)
                d = jnp.where(col < n_valid, d, _INF)
                tile_i = jnp.broadcast_to(col, (rb, W))
                thresh = best_v[:, k_lane:k_lane + 1]       # (RB, 1)
                any_hit = jnp.any(
                    jnp.min(d, axis=1, keepdims=True) < thresh)
                carry = lax.cond(
                    any_hit,
                    lambda c, dd=d, ti=tile_i: _fold_tile(c[0], c[1], dd, ti),
                    lambda c: c,
                    carry)
            return carry

        init = (jnp.full((rb, W), _INF, jnp.float32),
                jnp.zeros((rb, W), jnp.int32))
        best_v, best_i = lax.fori_loop(0, n_super, body, init)
        iv_ref[:] = best_v
        ii_ref[:] = best_i

    return kernel


def _spread_bits(v: jax.Array) -> jax.Array:
    """Insert two zero bits between the low 10 bits (Morton spreading)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _locality_order(x: jax.Array) -> jax.Array:
    """Permutation sorting rows along a Morton curve of their top-3
    principal projections — queries near each other in space land in the
    same row block, so the kernel's threshold skip prunes far column tiles.
    Any ordering is CORRECT (the skip test is exact); this one makes it
    effective. For D > 3 (feature-space kNN) PCA supplies the locality
    axes."""
    c = x - jnp.mean(x, axis=0, keepdims=True)
    if x.shape[1] > 3:
        cov = (c.T @ c).astype(jnp.float32)
        _, vecs = jnp.linalg.eigh(cov)        # ascending eigenvalues
        c = c @ vecs[:, -3:]
    elif x.shape[1] < 3:
        c = jnp.pad(c, ((0, 0), (0, 3 - x.shape[1])))
    lo = jnp.min(c, axis=0, keepdims=True)
    hi = jnp.max(c, axis=0, keepdims=True)
    qv = jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0,
                  0.0, 1023.0).astype(jnp.uint32)
    key = (_spread_bits(qv[:, 0]) | (_spread_bits(qv[:, 1]) << 1)
           | (_spread_bits(qv[:, 2]) << 2))
    return jnp.argsort(key)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "normal_metric_w", "row_block",
                     "interpret", "return_distances", "largest",
                     "spatial_sort", "col_halves"))
def topk_pallas(q: jax.Array, p: jax.Array, k: int, *,
                metric: str = "sqdist", normal_metric_w: float = 1.0,
                row_block: int = 256, interpret: bool = False,
                return_distances: bool = False, largest: bool = False,
                spatial_sort: bool | None = None,
                col_halves: int = 4):
    """Exact k-nearest rows of p for every row of q, nearest first
    (largest=True selects the k FARTHEST instead — the spectral
    enrichment's reference quirk, smooth_normal_matrix.py:33-39).

    q: (M, D) or (B, M, D); p: (N, D) or (B, N, D) float32. Returns int32
    indices (..., M, k) (and the distances when return_distances). k <= 128.
    The transposed point set (D x N, f32) must fit VMEM alongside the row
    block: D <= ~256 at N = 10k. spatial_sort Morton-orders rows/columns so
    the kernel's exact threshold test can skip tiles' sorting work (~50%
    skipped on CAD clouds, ~10-15% end-to-end — the branch serializes the
    tile loop). Default None = auto: on for geometric inputs (D <= 8) where
    locality is real, off for feature-space kNN and largest= mode.
    """
    if q.ndim == 3:
        # unrolled per-shape dispatch instead of vmap: vmap prepends a grid
        # axis WITHOUT renumbering program_id, which would turn the
        # diagonal-first tile order into the batch index (correct but slow);
        # the unrolled calls share one compiled kernel and pipeline fully
        # (measured 122 ms vs 214 ms vmapped for 8 x 10k on a v5e).
        f = functools.partial(
            topk_pallas, k=k, metric=metric,
            normal_metric_w=normal_metric_w, row_block=row_block,
            interpret=interpret, return_distances=return_distances,
            largest=largest, spatial_sort=spatial_sort,
            col_halves=col_halves)
        # p may be a single shared point set for batched queries
        pb = (lambda b: p) if p.ndim == 2 else (lambda b: p[b])
        outs = [f(q[b], pb(b)) for b in range(q.shape[0])]
        if return_distances:
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]))
        return jnp.stack(outs)
    if not 1 <= k <= W:
        raise ValueError(f"k={k} outside [1, {W}]")
    # top-k indices are discrete — no gradient flows through them in the XLA
    # path either, and the bitonic network's pltpu.roll has no JVP rule, so
    # cut autodiff at the kernel boundary explicitly.
    q = lax.stop_gradient(q)
    p = lax.stop_gradient(p)

    if spatial_sort is None:
        # on for every query: geometric inputs have true locality, DGCNN
        # feature maps inherit it from their spatial receptive fields
        # (measured 160 -> 121 ms per batch-8 10k-point layer-2 kNN even
        # with untrained weights), and largest mode streams antipode-first
        # where the sorted curve makes the far region just as predictable
        # (spectral farthest-50 on a 10k xyz cloud: 26.3 -> 9.7 ms; on
        # cluster-structured emb128 26.9 -> 12.3; the one measured loss
        # is structureless random emb128, 26.8 -> 30.8 — no real input
        # looks like that)
        spatial_sort = True
    if spatial_sort:
        key_dims = slice(0, 3) if metric == "points_normals" else slice(None)
        perm_q = _locality_order(q[:, key_dims])
        # self-kNN (p is q) recomputes the identical permutation; cross-set
        # queries get their own column order
        perm_p = _locality_order(p[:, key_dims])
        idx_s = topk_pallas(q[perm_q], p[perm_p], k, metric=metric,
                            normal_metric_w=normal_metric_w,
                            row_block=row_block, interpret=interpret,
                            return_distances=return_distances,
                            largest=largest, spatial_sort=False,
                            col_halves=col_halves)
        inv_q = jnp.argsort(perm_q)
        if return_distances:
            idx_s, dist_s = idx_s
            return perm_p[idx_s][inv_q], dist_s[inv_q]
        return perm_p[idx_s][inv_q]

    m, dim = q.shape
    n = p.shape[0]
    d_pad = _round_up(dim, 8)
    n_cols = _round_up(n, W * col_halves)
    # queries stay in NATURAL (N, D) layout — no host-side relayout; the
    # distance matmul is then the MXU-native (RB, D) @ (D, W) form. Only
    # the resident point set is transposed once. (Round-3 measurement:
    # the q transpose + relayout was ~17% of the end-to-end call.)
    rb = max(_round_up(min(row_block, m), 128), 256)
    n_rows = _round_up(m, rb)
    q_pad = jnp.pad(q.astype(jnp.float32),
                    ((0, n_rows - m), (0, d_pad - dim)))
    p_t = jnp.pad(p.astype(jnp.float32).T,
                  ((0, d_pad - dim), (0, n_cols - n)))

    kernel = _make_kernel(n, n_cols // W, metric, normal_metric_w, largest,
                          k_lane=k - 1, halves=col_halves)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(n_rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, n_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, W), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, W), jnp.int32),
        ),
        interpret=interpret,
    )(q_pad, p_t)
    if return_distances:
        d = dist[:m, :k]
        return idx[:m, :k], (-d if largest else d)
    return idx[:m, :k]


def topk_neighbors_pallas(x: jax.Array, k: int, **kw):
    """Self-kNN convenience wrapper: every row of x against all rows of x."""
    return topk_pallas(x, x, k, **kw)


def pallas_topk_supported(n: int, dim: int, k: int,
                          col_halves: int = 4) -> bool:
    """Whether the fused kernel handles this problem (VMEM budget for the
    resident (D, N) point set + k within the 128-lane candidate list).

    col_halves must match topk_pallas's super-tile width: the kernel pads
    the resident set to a multiple of W*col_halves columns, so the VMEM
    estimate has to round the same way (ADVICE r3)."""
    d_pad = _round_up(dim, 8)
    n_cols = _round_up(n, W * col_halves)
    return k <= W and d_pad * n_cols * 4 <= 8 * 1024 * 1024
