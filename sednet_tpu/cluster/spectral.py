"""HPNet-style spectral enrichment of the instance embedding (test-time).

TPU-native rebuild of reference src/smooth_normal_matrix.py:
  * normal-affinity graph over a k-neighbourhood with gaussian angle weights
    (:42-92) — built with one scatter-add instead of torch gather chains;
  * top-12 eigenvectors via LOBPCG (:198) — jax.experimental.sparse.linalg;
  * per-source entropy weights (1.7 - E(feat), w - E(eigvecs),
    0.25 - E(type||edge)) where E is a pairwise-distance entropy (:95-154) —
    the CHUNK Python loops become a blocked lax.map streaming reduction;
  * weighted concatenation (:224-232).

Reference quirk preserved: knn_idx (:31-39) calls topk on *positive* squared
distances with torch's default largest=True, so the "neighbourhood" is the
k FARTHEST points. We reproduce that by default (`nearest=False`) since the
reference's published behavior depends on it; pass nearest=True for the
intended semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sednet_tpu.ops.knn import pairwise_sqdist
from sednet_tpu.ops.dispatch import target_backend


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "nearest"))
def _neighbor_idx(xyz: jax.Array, k: int, nearest: bool) -> jax.Array:
    """(N, 3) -> (N, k) neighbour indices (farthest by default — see module
    docstring). Uses the fused Pallas top-k on TPU; elsewhere a row-blocked
    streaming top-k — neither path materializes N x N in HBM (the dense
    matrix is 400 MB at the reference's N=10k).

    Tie order at EQUAL distances (coincident points) is backend-dependent
    here, as it is in the reference (torch.topk makes no tie guarantee
    either) — the affinity an exact tie flips is the same weight value,
    so only exact-duplicate bookkeeping can differ, never the math."""
    from sednet_tpu.ops.flash_topk import pallas_topk_supported, topk_pallas
    from sednet_tpu.ops.knn import _blocked_topk_neighbors

    n = xyz.shape[0]
    if (target_backend() == "tpu"
            and pallas_topk_supported(n, xyz.shape[1], k)):
        return topk_pallas(xyz, xyz, k, largest=not nearest)
    sign = 1.0 if nearest else -1.0
    return _blocked_topk_neighbors(
        xyz, lambda q, p: sign * pairwise_sqdist(q, p), k, 512)


@functools.partial(jax.jit, static_argnames=("k", "sigma", "nearest"))
def normal_affinity_topk(xyz: jax.Array, normals: jax.Array, *, sigma: float = 0.1,
                         k: int = 50, nearest: bool = False) -> jax.Array:
    """Symmetric normalized normal-angle affinity matrix (N, N)
    (reference: src/smooth_normal_matrix.py:42-92)."""
    n = xyz.shape[0]
    idx = _neighbor_idx(xyz, k, nearest)                          # (N, k)
    n_sub = normals[idx]                                          # (N, k, 3)
    cos = jnp.clip(jnp.einsum("nc,nkc->nk", normals, n_sub), -0.99, 0.99)
    w = jnp.exp(-jnp.arccos(cos) ** 2 / (2.0 * sigma * sigma))    # (N, k)
    # Reference math (smooth_normal_matrix.py:84-92): scatter -> fill zeros
    # with 1e-12 -> D^-1/2 A D^-1/2 -> symmetrize (a+aT)/2; its mask is
    # taken AFTER the background fill, so the clip(mask+maskT,1,2) divisor
    # is identically 2 — a quirk we keep. Rewritten in ONE double-sided
    # scatter instead of transpose+mask+clip passes over the N x N matrix
    # (each full pass is 800 MB of HBM traffic at N=10k; measured 40 ->
    # 21 ms per shape on v5e, loop-amortized). Exactness bookkeeping
    # (pinned to the scatter construction by the cluster test suite):
    #   * weights that underflow to exactly 0 in f32 (near-antipodal
    #     normals are common in the farthest-neighbour quirk mode) are
    #     indistinguishable from background after the reference's fill —
    #     pre-fill them to 1e-12 so both the degree and the entries agree;
    #   * d_i = FILLED asymmetric rowsum = w-rowsum + 1e-12 (n - k)
    #     (idx rows are distinct, so collisions never land inside a row);
    #   * (a+aT)/2 over the filled matrix = 1e-12 background + per-hit
    #     contributions of (w - 1e-12)/2: zero hits -> 1e-12, one hit ->
    #     (w + 1e-12)/2, two hits -> (w_ij + w_ji)/2, all exactly the
    #     reference values — so the fill costs NO extra per-element work
    #     (the background rides the accumulator init).
    w = jnp.where(w == 0.0, 1e-12, w)
    d = jax.lax.rsqrt(w.sum(-1) + 1e-12 * (n - k))
    a = _dense_sym_from_topk(idx, (w - 1e-12) * 0.5, n)
    # outer product FIRST: s_ij = d_i*d_j equals s_ji exactly (IEEE mult
    # commutes), so a*s stays bitwise symmetric; (a*d_i)*d_j would not
    a = a * (d[:, None] * d[None, :])
    if target_backend() == "tpu":
        # store the matrix in bf16: BITWISE-identical LOBPCG on TPU while
        # halving both the 400 MB result write and every A-read of the
        # ~30 solver matvecs. Identity argument (measured, ROADMAP r3
        # "bf16 no-op root cause"): XLA:TPU's DEFAULT dot_general
        # precision already rounds f32 inputs to bf16 for a single MXU
        # pass with f32 accumulation — f32-stored and bf16-stored
        # operands produce bit-equal products — and the affinity's ONLY
        # consumer is the solver's matvec (spectral_eigvecs wraps it in
        # a callable so the solver's own iterates stay f32). On CPU XLA
        # runs true f32 matmuls, so f32 storage stays authoritative
        # there (and for the parity test suite).
        a = a.astype(jnp.bfloat16)
    return a


def _dense_sym_from_topk(idx: jax.Array, w: jax.Array, n: int) -> jax.Array:
    """1e-12 + (P + P^T) for P[i, idx[i, kk]] = w[i, kk], WITHOUT XLA scatter.

    A 500k-element scatter into a 400 MB dense buffer was the whole cost of
    the affinity build on v5e (~37 of 41 ms — rewriting the surrounding
    transpose/mask passes moved nothing). Instead: stream (rb, n) row
    blocks and accumulate the k neighbour slots as a statically-unrolled
    chain of compare-selects — XLA fuses the 2k-term sum into one kernel,
    so the accumulator lives in registers/VMEM and HBM sees exactly one
    400 MB result write. The transpose term lands in the same pass by
    comparing every shape's idx column against the block's row ids."""
    k = idx.shape[1]
    rb = min(512, _round_up(n, 8))
    n_pad = _round_up(n, rb)
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, n_pad - n), (0, 0)),
                    constant_values=-1)  # -1 never matches a column id
    w_p = jnp.pad(w, ((0, n_pad - n), (0, 0)))
    col_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
    idx32 = idx.astype(jnp.int32)
    starts = jnp.arange(n_pad // rb, dtype=jnp.int32) * rb

    def block(r0):
        rows_b = (r0 + jnp.arange(rb, dtype=jnp.int32))[:, None]
        idx_b = lax.dynamic_slice_in_dim(idx_p, r0, rb)      # (rb, k)
        w_b = lax.dynamic_slice_in_dim(w_p, r0, rb)
        # background fill rides the accumulator init — no extra pass
        acc = jnp.full((rb, n), 1e-12, jnp.float32)
        for kk in range(k):
            # row term: P[i, idx[i,kk]] += w[i,kk]
            acc = acc + jnp.where(idx_b[:, kk:kk + 1] == col_ids,
                                  w_b[:, kk:kk + 1], 0.0)
            # transpose term: P^T[i, j] += w[j,kk] where idx[j,kk] == i
            acc = acc + jnp.where(idx32[None, :, kk] == rows_b,
                                  w[None, :, kk], 0.0)
        return acc

    return lax.map(block, starts).reshape(n_pad, n)[:n]


@functools.partial(jax.jit, static_argnames=("row_block",))
def compute_entropy(feat: jax.Array, *, row_block: int = 1024) -> jax.Array:
    """Pairwise-distance entropy of a feature set (N, K)
    (reference: src/smooth_normal_matrix.py:95-154).

    interval = per-channel range; average_dst = mean pairwise normalized
    distance; alpha = -ln(0.5)/average_dst; E = mean binary entropy of
    s = exp(-alpha * dst). Two blocked streaming passes, no N x N in HBM."""
    n, _ = feat.shape
    interval = feat.max(0) - feat.min(0)
    g = feat / jnp.where(interval == 0, 1.0, interval)

    rb = min(row_block, _round_up(n, 8))
    n_pad = _round_up(n, rb)
    g_pad = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    row_valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    starts = jnp.arange(n_pad // rb) * rb

    def block_dist(start):
        q = lax.dynamic_slice_in_dim(g_pad, start, rb)
        d2 = jnp.clip(pairwise_sqdist(q, g), min=0.0)
        vm = lax.dynamic_slice_in_dim(row_valid, start, rb)[:, None]
        return jnp.sqrt(d2), vm

    def sum_dst(start):
        d, vm = block_dist(start)
        return jnp.sum(d * vm)

    total = jnp.sum(lax.map(sum_dst, starts))
    average_dst = total / (n * n)
    alpha = -jnp.log(0.5) / average_dst
    eps = 1e-7

    def sum_entropy(start):
        d, vm = block_dist(start)
        s = jnp.exp(-alpha * d)
        ent = -s * jnp.log(s + eps) - (1 - s) * jnp.log(1 - s + eps)
        return jnp.sum(ent * vm)

    return jnp.sum(lax.map(sum_entropy, starts)) / (n * n)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def spectral_eigvecs(affinity: jax.Array, key: jax.Array, k: int = 12,
                     iters: int = 10) -> jax.Array:
    """Top-k eigenvectors via LOBPCG, row-normalized
    (reference: src/smooth_normal_matrix.py:198-199).

    The affinity may arrive in bf16 (TPU storage layout, see
    normal_affinity_topk) — the solver runs through a matvec callable so
    its own iterates/orthonormalizations stay f32; the bf16 @ f32 product
    promotes to f32 and is bit-equal to the f32-stored product on TPU.

    MUST stay jitted at module level: the matvec lambda has a fresh
    identity per call, and an EAGER call re-traces lobpcg_standard's
    internal loop through it every time (~10 s recompile per shape —
    measured as the round-4 0.019 shapes/s eval collapse). Under this
    jit the trace is cached on (shape, dtype, k, iters)."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = affinity.shape[0]
    x0 = jax.random.normal(key, (n, k), jnp.float32)
    if affinity.dtype == jnp.float32:
        _, u, _ = lobpcg_standard(affinity, x0, m=iters)
    else:
        _, u, _ = lobpcg_standard(
            lambda v: jnp.matmul(affinity, v,
                                 preferred_element_type=jnp.float32),
            x0, m=iters)
    return u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-16)


@functools.partial(jax.jit, static_argnames=("k", "sigma", "nearest"))
def normal_affinity_sparse(xyz: jax.Array, normals: jax.Array, *,
                           sigma: float = 0.1, k: int = 50,
                           nearest: bool = False, idx: jax.Array | None = None):
    """Sparse form of normal_affinity_topk: returns (idx (N,k), vals (N,k),
    rsqrt_deg (N,)) such that A = D^-1/2 W D^-1/2 with W the scatter of
    vals at (row, idx). The symmetrized operator (A + A^T)/clamp(M + M^T)
    of the dense path equals (A + A^T)/2 exactly: the dense mask is taken
    after the reference's 1e-12 background fill, so the clamp is a
    constant 2 (see normal_affinity_topk). Pass a precomputed `idx` (N, k)
    to skip the neighbour search (batched callers dispatch the Pallas
    top-k per shape, then vmap the rest)."""
    n = xyz.shape[0]
    if idx is None:
        idx = _neighbor_idx(xyz, k, nearest)
    n_sub = normals[idx]
    cos = jnp.clip(jnp.einsum("nc,nkc->nk", normals, n_sub), -0.99, 0.99)
    w = jnp.exp(-jnp.arccos(cos) ** 2 / (2.0 * sigma * sigma))
    # row degree of the scattered W (duplicates within a row are distinct
    # columns from top_k, so the row sum is just the kernel sum)
    deg = jnp.clip(w.sum(-1), min=1e-12)
    return idx, w, jax.lax.rsqrt(deg)


def default_transpose_mode(vmapped: bool = False) -> str:
    """Preferred A^T v layout for the matfree LOBPCG matvec: the
    compact-vocabulary slab, on every backend (plain scatter for
    vmapped callers — see below).

    Round-5 amortized device time per solve (K dependent solves chained
    in ONE dispatch — the only timing the axon relay cannot pollute),
    v5e, knn=50/k=12: at N=10k dense 33.5 ms, VOCAB 42.0, scatter
    118.6, sorted 177.5, pallas 429, scan 971; at N=32k dense 189.8,
    VOCAB 141.8 (cap 2048), scatter 777.7. The vocab mode rides the
    farthest-quirk structure (the graph's unique-target count is a
    ~300-850 GEOMETRY constant, independent of N — see
    _default_vocab_cap) to turn both matvec directions into MXU
    matmuls: 1.25x dense cost at 10k and FASTER than dense at 32k with
    O(N * u_cap) instead of O(N^2) memory, closing the round-3 "matfree
    <= ~3x dense" target with a 2.8-5.5x margin. Shapes whose
    vocabulary overflows the cap (sphere-dominated geometry) fall back
    to the scatter formulation inside the same jit.

    Pass vmapped=True from callers that vmap the solve over a shape
    batch (predict._hpnet_enrich_batch): under vmap, lax.cond lowers to
    select-both, so the vocab mode's overflow fallback would make every
    batched solve pay the vocab AND the scatter formulation — there the
    plain scatter stays the right default.

    History: the round-3 "scatter 478x slower than dense" was an
    EAGER-dispatch artifact and the round-4 preference for the Pallas
    scan rested on ping-swamped single-dispatch numbers
    (scripts/probe_spectral_gather.py measures 28-35 ms for every
    formulation at any lowering — the relay round trip, not the
    kernel). The scatter/sorted/scan/pallas layouts remain available
    for A/B; all are per-edge gather/scatter-issue-bound."""
    return "scatter" if vmapped else "vocab"


def _sorted_transpose_layout(idx: jax.Array, coef: jax.Array):
    """Once-per-operator layout for scatter-free A^T v.

    Entries e = (src row j, slot kk) with destination idx[j, kk] and
    coefficient coef[j, kk] are sorted by destination; per-destination
    segment END offsets come from a bincount cumsum. Everything here is
    reused across every LOBPCG matvec (~30 per solve), so the one sort
    amortizes — the per-matvec work becomes pure gathers + one segment
    reduction, with no scatter in the iteration.
    Returns (src_sorted (E,), coef_sorted (E,), dest_sorted (E,),
    ends (N,))."""
    n, k = idx.shape
    dest = idx.reshape(-1)
    order = jnp.argsort(dest)                       # (E,)
    src = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)).reshape(-1)[order]
    counts = jnp.zeros((n,), jnp.int32).at[dest].add(1)
    return src, coef.reshape(-1)[order], dest[order], jnp.cumsum(counts)


def _segment_sum_sorted_scan(vals: jax.Array, dest: jax.Array, n: int,
                             ends: jax.Array) -> jax.Array:
    """Exact segment sum of `vals` rows grouped by SORTED `dest` ids,
    with NO scatter and NO cumsum-difference: a segmented inclusive scan
    (log2(E) shift + compare + masked-add passes — every partial is a
    plain pairwise ADD, so there is no cancellation; the prefix-sum +
    boundary-subtract design this replaces lost all precision on the
    quirk-mode affinity's 1e6 dynamic range, see spectral_eigvecs_matfree).
    After the scan the LAST row of each segment holds its full sum; `ends`
    (the per-destination cumulative counts from _sorted_transpose_layout)
    gathers it. Empty destinations return 0.

    Every pass is a fully vectorized (E, m) sweep; traffic is
    ~2 * E * m * 4 bytes per pass, ceil(log2(E)) passes. NOTE (round 5):
    the amortized-device-time A/B that motivated this design turned out
    to favor the plain scatter after all — the earlier "scatter 478x
    slower" figure was an eager-dispatch artifact (default_transpose_mode)
    — so this mode is a kept A/B alternative, not the default.

    vals: (E, m) f32, dest: (E,) int32 ascending, ends: (N,) int32.
    """
    e = vals.shape[0]
    s = 1
    while s < e:
        # shift down by s: row i accumulates row i-s iff same segment
        same = dest[s:] == dest[:-s]                       # (E-s,)
        vals = vals.at[s:].set(
            vals[s:] + jnp.where(same[:, None], vals[:-s], 0.0))
        s *= 2
    counts_pos = ends > jnp.concatenate(
        [jnp.zeros((1,), ends.dtype), ends[:-1]])
    last = vals[jnp.clip(ends - 1, 0, e - 1)]              # (N, m)
    return jnp.where(counts_pos[:, None], last, 0.0)


def _default_vocab_cap(n: int) -> int:
    """Static compact-column capacity for transpose_mode="vocab".

    Measured on synthetic CAD fixtures (4 shapes, N=10k): the farthest-50
    graph's unique-target count is 399-844 (4-8% of N) — the reference
    quirk's `largest=True` top-k (smooth_normal_matrix.py, torch.topk
    default) means only hull-extreme points ever appear as neighbours.
    Crucially the count is a property of the GEOMETRY, not the sampling
    density: the kbench CAD fixture measures 260 unique targets at
    N=10k and 277 at N=32k. So the cap is clamped at 2048 (2.4x the max
    observed) instead of growing with n — the (N, u_cap) slab's padded
    columns are real per-matvec HBM traffic, and the first 32k
    measurement with an n//8=4096 cap spent most of its 161 ms on
    padding. If a shape exceeds the cap (e.g. a pure sphere, where
    every point is some antipode's neighbour) the matvec falls back to
    the scatter path inside the same jit, so the cap only affects
    speed, never values."""
    return min(2048, max(512, _round_up(n // 8, 128)))


def _vocab_layout(idx: jax.Array, coef: jax.Array, n: int, u_cap: int):
    """Once-per-operator compact-column layout for transpose_mode="vocab".

    The farthest-quirk affinity's nonzero COLUMNS concentrate on a small
    target vocabulary (see _default_vocab_cap), so A (N x N, N*k entries)
    is exactly representable as a dense (N, u_cap) slab A_c with
    A_c[i, u] = coef[i, slot] where idx[i, slot] == targets[u]:

        A v   = A_c @ v[targets]                  (one U-row gather)
        A^T v = scatter_u(targets, A_c^T @ v)     (one U-row scatter)

    i.e. both matvec directions become MXU matmuls over a matrix 8-25x
    smaller than dense, with per-edge gathers/scatters eliminated from
    the LOBPCG iteration entirely (they were the whole cost of the
    scatter/sorted/scan/pallas modes — all gather-issue-bound at ~20x
    the row-granular floor, scripts/profile_spectral_matfree.py).

    Returns (targets (u_cap,) int32 — pad slots hold n, so downstream
    gathers mask and scatters drop; a_c (N, u_cap) f32; n_unique traced
    scalar for the overflow fallback). Exact: distinct top-k slots map to
    distinct columns, so no collisions in the A_c scatter; row sums are
    the same f32 terms as the scatter mode, reassociated."""
    flat = jnp.sort(idx.reshape(-1).astype(jnp.int32))            # (E,)
    is_new = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (flat[1:] != flat[:-1]).astype(jnp.int32)])
    rank = jnp.cumsum(is_new) - 1                                  # (E,)
    n_unique = rank[-1] + 1
    targets = jnp.full((u_cap,), n, jnp.int32).at[rank].set(
        flat, mode="drop")
    # original id -> vocab rank (only ever read at target positions)
    lut = jnp.zeros((n,), jnp.int32).at[flat].set(rank)
    cols = lut[idx]                                                # (N, k)
    rows = jnp.broadcast_to(
        jnp.arange(idx.shape[0], dtype=jnp.int32)[:, None], idx.shape)
    a_c = jnp.zeros((idx.shape[0], u_cap), jnp.float32).at[
        rows, cols].add(coef, mode="drop")
    return targets, a_c, n_unique


def _vocab_matvec(idx: jax.Array, coef: jax.Array, n: int, u_cap: int):
    """Symmetrized-matvec closure for transpose_mode="vocab".

    Both directions ride the compact (N, U) slab on the MXU; the only
    irregular ops left in the LOBPCG iteration are a U-row gather and a
    U-row scatter. If the shape's vocabulary overflows u_cap, a lax.cond
    falls back to the per-edge scatter formulation inside the same jit —
    the cap affects speed, never values (one branch executes per solve;
    NOTE it degrades to select-both under vmap, but the matfree solver's
    domain is single big clouds — batched <=16k shapes use dense)."""
    targets, a_c, n_unique = _vocab_layout(idx, coef, n, u_cap)
    t_valid = (targets < n)[:, None]                          # (U, 1)
    t_safe = jnp.minimum(targets, n - 1)

    def _vocab(v):
        # Precision.HIGHEST: the default MXU path rounds f32 inputs to
        # bf16 (measured 2.8e-3 vs 2e-7 rel err on the quirk affinity's
        # 1e6 dynamic range) and these matmuls are HBM-traffic-bound, so
        # the extra passes are free — this keeps the f32-exact class of
        # the per-edge modes.
        hi = lax.Precision.HIGHEST
        tv = jnp.where(t_valid, v[t_safe], 0.0)               # (U, m)
        av = lax.dot_general(a_c, tv, (((1,), (0,)), ((), ())),
                             precision=hi)                    # (N, m)
        atc = lax.dot_general(a_c, v, (((0,), (0,)), ((), ())),
                              precision=hi)                   # (U, m)
        atv = jnp.zeros_like(v).at[targets].add(atc, mode="drop")
        return 0.5 * (av + atv)

    def _fallback(v):
        av = (v[idx] * coef[..., None]).sum(1)
        contrib = coef[..., None] * v[:, None, :]             # (N, k, m)
        atv = jnp.zeros_like(v).at[idx.reshape(-1)].add(
            contrib.reshape(-1, v.shape[1]))
        return 0.5 * (av + atv)

    def matvec(v):  # v: (N, m)
        return lax.cond(n_unique <= u_cap, _vocab, _fallback, v)

    return matvec


@functools.partial(jax.jit, static_argnames=("sigma", "knn", "k", "iters",
                                              "transpose_mode",
                                              "vocab_cap"))
def spectral_eigvecs_matfree(xyz: jax.Array, normals: jax.Array,
                             key: jax.Array, *, sigma: float = 0.1,
                             knn: int = 50, k: int = 12,
                             iters: int = 10,
                             idx: jax.Array | None = None,
                             transpose_mode: str = "scatter",
                             vocab_cap: int | None = None) -> jax.Array:
    """Matrix-free LOBPCG on the symmetrized normalized affinity: never
    materializes the N x N matrix (the N-axis "long-context" plan of
    SURVEY §5). A v is one gather over the N*k sparse entries; A^T v is
    the hard direction, selected by transpose_mode:

      "vocab"    exploits the farthest-quirk structure: the graph's
                 target vocabulary is tiny (4-8% of N on CAD shapes —
                 only hull-extreme points are ever "neighbours"), so the
                 operator is built ONCE as a dense (N, U) compact-column
                 slab and BOTH matvec directions become MXU matmuls plus
                 a U-row gather/scatter (_vocab_layout). Per-edge memory
                 ops leave the iteration entirely; overflowing the U cap
                 falls back to the scatter formulation inside the jit;
      "scatter"  .at[].add per matvec — the per-edge baseline and the
                 fastest such mode on every backend (round-5 amortized
                 device time, see default_transpose_mode);
      "sorted"   one argsort by destination per OPERATOR (amortized over
                 the ~3*iters matvecs), then per matvec: gather + one
                 sorted-segment sum (exact, same f32 sums as scatter);
      "scan"     same sorted layout, but the segment reduction is a
                 segmented inclusive scan — ceil(log2(E)) fully
                 vectorized shift+masked-add passes, NO scatter and no
                 segment_sum lowering anywhere in the iteration (both
                 measured pathologically slow on v5e);
      "pallas"   the scan fused into ONE streaming Pallas kernel
                 (ops.pallas_kernels.segsum_sorted_scan_pallas): the
                 shift passes run in VMEM with a sequential-grid carry,
                 so HBM sees one read + one write of the (E, m) entries
                 instead of ceil(log2(E)) full passes. Same adds in the
                 same order as "scan" (exact). This is the TPU route
                 past the dense-affinity HBM cap.

    A fourth design (prefix-sum + boundary-gather segment reduction, no
    segment op at all) was tried and REJECTED: the quirk-mode affinity's
    rsq spans ~1e6 when farthest-neighbour weights underflow, and the
    cumsum-difference loses all relative precision on small segments
    (measured rel-err > 1 on the unit test's 70-point fixture). The
    "scan" mode keeps exactness because every partial is a pairwise ADD.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    if transpose_mode not in ("scatter", "sorted", "scan", "pallas",
                              "vocab"):
        raise ValueError(f"unknown transpose_mode {transpose_mode!r}")
    n = xyz.shape[0]
    idx, w, rsq = normal_affinity_sparse(xyz, normals, sigma=sigma, k=knn,
                                         idx=idx)
    coef = w * rsq[idx] * rsq[:, None]   # full entry coefficient (N, k)
    if transpose_mode in ("sorted", "scan", "pallas"):
        src_s, coef_s, dest_s, ends_s = _sorted_transpose_layout(idx, coef)
    if transpose_mode == "vocab":
        matvec = _vocab_matvec(idx, coef, n,
                               vocab_cap or _default_vocab_cap(n))
        x0 = jax.random.normal(key, (n, k), jnp.float32)
        _, u, _ = lobpcg_standard(matvec, x0, m=iters)
        return u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-16)

    def _scatter_transpose(v):
        contrib = coef[..., None] * v[:, None, :]            # (N, k, m)
        return jnp.zeros_like(v).at[idx.reshape(-1)].add(
            contrib.reshape(-1, v.shape[1]))

    def matvec(v):  # v: (N, m)
        # A v where A[i, idx[i,j]] = rsq[i] w[i,j] rsq[idx[i,j]]
        av = (v[idx] * coef[..., None]).sum(1)               # (N, m)
        # A^T v: same entries, transposed
        if transpose_mode == "scatter":
            atv = _scatter_transpose(v)
        elif transpose_mode == "sorted":
            vals = coef_s[:, None] * v[src_s]                # (E, m)
            atv = jax.ops.segment_sum(vals, dest_s, num_segments=n,
                                      indices_are_sorted=True)
        elif transpose_mode == "pallas":
            from sednet_tpu.ops.pallas_kernels import (
                segsum_sorted_scan_pallas)

            # build the entries TRANSPOSED: the E axis rides the lanes
            vals_t = coef_s[None, :] * v.T[:, src_s]         # (m, E)
            atv = segsum_sorted_scan_pallas(
                vals_t, dest_s, ends_s,
                interpret=target_backend() != "tpu")
        else:
            vals = coef_s[:, None] * v[src_s]                # (E, m)
            atv = _segment_sum_sorted_scan(vals, dest_s, n, ends_s)
        return 0.5 * (av + atv)

    x0 = jax.random.normal(key, (n, k), jnp.float32)
    _, u, _ = lobpcg_standard(matvec, x0, m=iters)
    return u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-16)


def hpnet_process(
    embedding: jax.Array,          # (N, K) instance embedding (not L2-normed)
    xyz: jax.Array,                # (N, 3)
    normals: jax.Array,            # (N, 3)
    *,
    type_log_prob: jax.Array | None = None,  # (N, 6)
    edge_logits: jax.Array | None = None,    # (N, 2)
    normal_smooth_w: float = 0.5,
    sigma: float = 0.1,
    knn: int = 50,
    eig_k: int = 12,
    key: jax.Array | None = None,
    cached_eigvecs: jax.Array | None = None,
    cached_eig_entropy: jax.Array | None = None,
) -> jax.Array:
    """Entropy-weighted concat of [embedding, normal-spectral eigvecs,
    type(+edge) probabilities] (reference: src/smooth_normal_matrix.py:157-232).

    Pass cached_eigvecs/-entropy to reuse the per-shape disk cache the
    reference keeps (:189-202); see sednet_tpu.predict for the cache.
    """
    parts = []
    weights = []

    feat_ent = 1.7 - compute_entropy(embedding)
    parts.append(embedding)
    weights.append(feat_ent)

    if cached_eigvecs is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        aff = normal_affinity_topk(xyz, normals, sigma=sigma, k=knn)
        v = spectral_eigvecs(aff, key, k=eig_k)
        v_ent = compute_entropy(v)
    else:
        v = cached_eigvecs
        v_ent = (cached_eig_entropy if cached_eig_entropy is not None
                 else compute_entropy(v))
    parts.append(v)
    weights.append(normal_smooth_w - v_ent)

    if type_log_prob is not None:
        t = jnp.exp(type_log_prob)
        if edge_logits is not None:
            t = jnp.concatenate([t, jax.nn.softmax(edge_logits, axis=-1)], -1)
        parts.append(t)
        weights.append(0.25 - compute_entropy(t))

    return jnp.concatenate([p * w for p, w in zip(parts, weights)], axis=-1)


def _entropy_weighted_concat(emb, v, normal_smooth_w):
    """Shared enrichment tail: entropy weighting + concat + L2 norm
    (generate_predictions_aug.py:371-377). ONE implementation — the auto
    policy switches solvers by N, so any weighting drift between the
    dense and matfree variants would make enrichment depend on which
    side of spectral_dense_max_n a shape falls."""
    e = jnp.concatenate([emb * (1.7 - compute_entropy(emb)),
                         v * (normal_smooth_w - compute_entropy(v))], -1)
    return e / jnp.clip(jnp.linalg.norm(e, axis=-1, keepdims=True),
                        min=1e-12)


def hpnet_enrich_dense(emb: jax.Array, xyz: jax.Array, normals: jax.Array,
                       key: jax.Array, *, normal_smooth_w: float = 0.5,
                       sigma: float = 0.1, knn: int = 50, eig_k: int = 12,
                       iters: int = 10) -> jax.Array:
    """hpnet_enrich through the DENSE affinity + LOBPCG — the TPU-fast
    solver while the N x N matrix fits HBM (config.spectral_dense_max_n;
    4.3x faster per solve than the matfree matvec at N=10k on a v5e,
    amortized device time).
    Pure and vmappable: the sharded predict path vmaps this across the
    shape axis when the auto policy picks dense."""
    aff = normal_affinity_topk(xyz, normals, sigma=sigma, k=knn)
    v = spectral_eigvecs(aff, key, k=eig_k, iters=iters)
    return _entropy_weighted_concat(emb, v, normal_smooth_w)


def hpnet_enrich(emb: jax.Array, xyz: jax.Array, normals: jax.Array,
                 key: jax.Array, *, normal_smooth_w: float = 0.5,
                 sigma: float = 0.1, knn: int = 50, eig_k: int = 12,
                 iters: int = 10, idx: jax.Array | None = None,
                 transpose_mode: str = "scatter") -> jax.Array:
    """Single-shape hpnet_process (embedding + eigvecs only, the predict-CLI
    call shape, generate_predictions_aug.py:371-377) as one pure in-graph
    function: matrix-free spectral + entropy weighting + L2 normalization.
    Fully vmappable/shardable — the batched predict path vmaps this across
    the shape axis (reference loops shapes one at a time)."""
    v = spectral_eigvecs_matfree(xyz, normals, key, sigma=sigma, knn=knn,
                                 k=eig_k, iters=iters, idx=idx,
                                 transpose_mode=transpose_mode)
    return _entropy_weighted_concat(emb, v, normal_smooth_w)
