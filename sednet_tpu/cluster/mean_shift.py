"""Differentiable mean-shift clustering on the unit hypersphere.

TPU-native rebuild of the reference's MeanShift (reference:
src/mean_shift.py:11-186): the per-shape Python iteration loop becomes a
fixed-trip `lax.fori_loop`; NMS's numpy `unique` bookkeeping becomes
fixed-shape segment-sums and masked argmaxes (clusters are represented as an
(N,) validity mask + compact ids, never a dynamic count); and the
guarded quantile-retry loop (reference: src/mean_shift.py:81-96,
generate_predictions_aug.py:25-35) is a `lax.while_loop`, so the entire
clustering pipeline jits and can be vmapped across shapes.

Semantics preserved: gaussian kernel exp(-d/b^2/2) with the +-75 exp clamp,
epanechnikov option, bandwidth = mean sqrt(k-th NN distance) over a random
subsample with k = quantile * num_samples, bandwidth clamp >= 0.003, the
update new_X += (K@X)*D - new_X with per-iteration renormalization, and the
neighbour-mass NMS.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from sednet_tpu.ops.guard import guard_exp, guard_sqrt
from sednet_tpu.ops.dispatch import target_backend


class MeanShiftResult(NamedTuple):
    shifted: jax.Array       # (N, E) shifted points (cluster centers per point)
    labels: jax.Array        # (N,) int32 compact cluster ids in [0, num_clusters)
    center_mask: jax.Array   # (N,) bool — rows of `shifted` kept as centers
    num_clusters: jax.Array  # () int32
    bandwidth: jax.Array     # () f32
    quantile: jax.Array      # () f32 (post-retry)
    # guard-divergence telemetry (the reference retries unboundedly with a
    # true dynamic k; these flag the two places the TPU rebuild deviates on
    # pathological shapes so real-data runs can quantify it — VERDICT r2 #6)
    tries: jax.Array = 0     # () int32 guarded retries taken
    capped: jax.Array = False     # () bool — 16-retry cap hit (labels folded)
    bw_capped: jax.Array = False  # () bool — bandwidth k exceeded the lane cap


def _dotT(a, b):
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("num_samples", "method", "interpret"))
def compute_bandwidth(key: jax.Array, x: jax.Array, num_samples: int,
                      quantile: jax.Array, method: str = "auto",
                      interpret: bool = False) -> jax.Array:
    """Mean sqrt of the (quantile*num_samples)-th smallest pairwise distance
    over a random subsample (reference: src/mean_shift.py:115-137).

    `quantile` may be traced (the retry loop scales it); the neighbour count
    is handled by indexing an exact partial-top-k row rather than a dynamic
    top-k. On TPU the fused Pallas kernel supplies the smallest-128
    distances per row without the XLA sort's HBM round-trips (measured
    19 ms -> ~7 ms at m=5000 on a v5e — more than the 50 shift iterations
    cost); k = quantile*m = 75 at the defaults, so 128 lanes cover three
    guarded x1.2 quantile retries, and a lax.cond falls back to the dense
    256-capped XLA path for larger traced k (both caps are documented
    deviations that only bind after repeated retries)."""
    n = x.shape[0]
    m = min(num_samples, n)
    sel = jax.random.permutation(key, n)[:m]
    xs = x[sel]
    if method == "auto":
        from sednet_tpu.ops.flash_topk import pallas_topk_supported

        method = ("pallas" if target_backend() == "tpu"
                  and pallas_topk_supported(m, x.shape[1], 128) else "xla")
    # torch.topk(k, largest=False)[0][:, -1] is the k-th smallest (self
    # distance 0 included), i.e. sorted index k-1 (mean_shift.py:132-135).
    k_cap = min(256, m)
    k = jnp.clip((quantile * m).astype(jnp.int32), 1, min(m - 1, k_cap))

    def dense_kth(_):
        dist = 2.0 - 2.0 * _dotT(xs, xs)  # (m, m)
        neg, _ = lax.top_k(-dist, k_cap)  # column j = -(j+1)-th smallest
        kk = jnp.minimum(k, k_cap)
        return -jnp.take_along_axis(neg, jnp.full((m, 1), kk - 1),
                                    axis=1)[:, 0]

    if method == "pallas":
        from sednet_tpu.ops.flash_topk import topk_pallas

        kp = min(128, m - 1)

        def pallas_kth(_):
            _, dd = topk_pallas(xs, xs, kp, return_distances=True,
                                interpret=interpret)  # (m, kp) ascending
            return jnp.take_along_axis(dd, jnp.full((m, 1), k - 1),
                                       axis=1)[:, 0]

        kth = lax.cond(k <= kp, pallas_kth, dense_kth, None)
    else:
        kth = dense_kth(None)
    return jnp.mean(guard_sqrt(kth, 1e-6))


def _kernel(dist, b, kernel_type: str):
    if kernel_type == "gaussian":
        return guard_exp(-dist / (b * b) / 2.0)
    # epanechnikov (reference: src/mean_shift.py:66-68)
    return jax.nn.relu(0.75 * (1.0 - dist / (b * b)))


# Converged-early exit tolerance for the shift loop. The reference runs a
# fixed 50 iterations (src/mean_shift.py:45); measured on noisy synthetic
# embeddings the max per-point movement decays below 1e-6 by iteration
# ~20, so the back half of the loop moves points by less than the MXU's
# own bf16 input rounding (~6.5e-3 per op, see ROADMAP bf16 root-cause) —
# the final positions differ from the fixed-trip result by O(tol), far
# under the NMS bandwidth scale (>=0.003). tol=0.0 restores the exact
# fixed-trip loop.
DEFAULT_MS_TOL = 1e-6


def _iterate_until(step_fn, x, iterations: int, tol: float):
    """Run `step_fn` up to `iterations` times, stopping early once the max
    per-coordinate movement drops to `tol` (0 disables the early exit)."""
    if tol <= 0.0:
        return lax.fori_loop(0, iterations, lambda _, cur: step_fn(cur), x)

    def cond(state):
        i, _, delta = state
        return jnp.logical_and(i < iterations, delta > tol)

    def body(state):
        i, cur, _ = state
        nxt = step_fn(cur)
        return i + 1, nxt, jnp.max(jnp.abs(nxt - cur))

    _, out, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x, jnp.float32(jnp.inf)))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "kernel_type", "backend", "bf16",
                     "interpret", "tol"))
def mean_shift_iterate(x: jax.Array, bandwidth: jax.Array, iterations: int = 50,
                       kernel_type: str = "gaussian",
                       backend: str = "auto", bf16: bool = False,
                       interpret: bool = False,
                       tol: float = 0.0) -> jax.Array:
    """Mean-shift updates (reference: src/mean_shift.py:45-79).

    x: (N, E), assumed unit-norm. Returns shifted (N, E).

    tol=0.0 (default) runs the reference's exact fixed-trip loop and stays
    reverse-mode differentiable (parsenet_e2e trains through it); tol>0
    switches to a converged-early `lax.while_loop` (eval-only: while_loop
    has no reverse-mode rule).

    backend "pallas" uses the fused flash-style step (gaussian kernel on TPU:
    no N x N matrix in HBM, see sednet_tpu.ops.pallas_kernels); "xla" is the
    reference-shaped fallback; "auto" picks pallas on TPU. interpret runs the
    pallas step in interpreter mode (CPU tests)."""
    if backend == "auto":
        backend = ("pallas" if target_backend() == "tpu"
                   and kernel_type == "gaussian" else "xla")

    if backend == "pallas":
        from sednet_tpu.ops.pallas_kernels import mean_shift_step_pallas

        def step(new_x):
            return mean_shift_step_pallas(new_x, x, bandwidth, bf16=bf16,
                                          interpret=interpret)

        return _iterate_until(step, x, iterations, tol)

    def step(new_x):
        dist = 2.0 - 2.0 * _dotT(new_x, x)
        k = _kernel(dist, bandwidth, kernel_type)
        d = 1.0 / jnp.sum(k, axis=1, keepdims=True)
        new_x = jnp.dot(k, x, precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) * d
        return new_x / jnp.clip(jnp.linalg.norm(new_x, axis=1, keepdims=True),
                                min=1e-12)

    return _iterate_until(step, x, iterations, tol)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _blocked_colmax(rows: jax.Array, cols: jax.Array, col_score,
                    block: int = 1024):
    """For every row r: (max_c score(rows[r] . cols[c], c), its argmax c),
    streaming column blocks so the (R, C) matrix never hits HBM whole.
    Strict > keeps the FIRST maximizing column — jnp.argmax tie semantics.
    col_score(sim_block, c0) -> scored block (R, CB)."""
    r = rows.shape[0]
    c = cols.shape[0]
    cb = min(block, _round_up(c, 8))
    c_pad = _round_up(c, cb)
    cols_p = jnp.pad(cols, ((0, c_pad - c), (0, 0)))

    def body(i, carry):
        best, idx = carry
        c0 = i * cb
        blk = lax.dynamic_slice_in_dim(cols_p, c0, cb)
        sim = _dotT(rows, blk)                            # (R, CB)
        cid = c0 + jnp.arange(cb, dtype=jnp.int32)[None, :]
        scored = jnp.where(cid < c, col_score(sim, cid), -jnp.inf)
        loc = jnp.argmax(scored, axis=1)
        val = jnp.take_along_axis(scored, loc[:, None], 1)[:, 0]
        take = val > best
        return (jnp.where(take, val, best),
                jnp.where(take, (c0 + loc).astype(jnp.int32), idx))

    init = (jnp.full((r,), -jnp.inf, jnp.float32), jnp.zeros((r,), jnp.int32))
    best, idx = lax.fori_loop(0, c_pad // cb, body, init)
    return best, idx


def _colmax(rows, cols, bias, thresh, gain, interpret: bool = False):
    """Unified NMS pass: for each row, (max_c scored, first argmax) with
        scored = gain*sim + bias[c] where (2 - 2*sim) < thresh, else -inf.
    On TPU this is one fused Pallas scan (the (R, C) similarity tile never
    leaves VMEM); elsewhere the XLA column-block stream below. The three
    NMS passes are instances: membership (thresh inf, gain 1, bias 0),
    bandwidth-ball vote (thresh b, gain 0, bias counts), survivor
    assignment (thresh inf, gain 1, bias 0/-inf mask)."""
    if target_backend() == "tpu" and not interpret:
        from sednet_tpu.ops.pallas_kernels import colmax_pallas

        return colmax_pallas(rows, cols, bias, thresh, gain)

    def score(sim, cid):
        return jnp.where(2.0 - 2.0 * sim < thresh,
                         gain * sim + bias[cid[0]][None, :], -jnp.inf)

    return _blocked_colmax(rows, cols, score)


@jax.jit
def nms(centers: jax.Array, x: jax.Array, b: jax.Array):
    """Fixed-shape non-max suppression (reference: src/mean_shift.py:139-179).

    Returns (labels (N,) compact ids, center_mask (N,), num_clusters).
    All three all-pairs steps stream column blocks — at N=10k the dense
    form writes three 400 MB matrices to HBM; this form writes none.
    Jitted: the blocked fori loops must never dispatch eagerly (hundreds of
    tiny ops through the device relay)."""
    n = x.shape[0]
    inf = jnp.float32(jnp.inf)
    one = jnp.float32(1.0)
    zeros = jnp.zeros((n,), jnp.float32)
    # nearest shifted center for every point: argmin dist == argmax dot on
    # the unit sphere == first-index argmax (ties included)
    _, membership = _colmax(x, centers, zeros, inf, one)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), membership,
                                 num_segments=n)                     # (N,)
    occupied = counts > 0
    # centers within bandwidth of each other vote for the heaviest
    # neighbour: rep[i] = argmax_j [dist(c_i, c_j) < b] * counts_j
    _, rep = _colmax(centers, centers, counts, b, jnp.float32(0.0))
    center_mask = jnp.zeros((n,), bool).at[rep].max(occupied)
    # assign every point to its most-aligned surviving center
    masked = jnp.where(center_mask, 0.0, -jnp.inf)
    _, raw = _colmax(x, centers, masked, inf, one)
    compact = (jnp.cumsum(center_mask) - 1).astype(jnp.int32)
    labels = compact[raw]
    # center_mask.sum() equals the number of labels actually assigned (the
    # reference's len(unique(cluster_ids)) retry criterion,
    # generate_predictions_aug.py:30-33): every surviving center is
    # occupied (each voter's ball contains itself, so vote winners have
    # count >= 1), and an occupied survivor's member points re-select it
    # under the same first-index argmax — verified over 200 randomized
    # configs.
    return labels, center_mask, center_mask.sum().astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("num_samples", "iterations", "kernel_type",
                              "bf16", "tol"))
def mean_shift(key, x, *, num_samples=10000, quantile=0.015, iterations=50,
               kernel_type: str = "gaussian", bandwidth=None,
               bf16: bool = False,
               tol: float = 0.0) -> MeanShiftResult:
    """One full clustering pass (reference: src/mean_shift.py:19-43).

    Differentiable w.r.t. x by default (tol=0.0, fixed-trip shift loop);
    eval-only callers pass tol>0 for the converged-early while_loop."""
    q = jnp.asarray(quantile, jnp.float32)
    if bandwidth is None:
        bandwidth = lax.stop_gradient(
            jnp.clip(compute_bandwidth(key, x, num_samples, q), min=0.003))
    shifted = mean_shift_iterate(x, bandwidth, iterations, kernel_type,
                                 bf16=bf16, tol=tol)
    labels, center_mask, num = nms(lax.stop_gradient(shifted),
                                   lax.stop_gradient(x), bandwidth)
    return MeanShiftResult(shifted, labels, center_mask, num, bandwidth, q)


@functools.partial(
    jax.jit, static_argnames=("num_samples", "iterations", "bf16", "tol"))
def _batched_shift(keys, x, quantile, num_samples: int, iterations: int,
                   bf16: bool = False, tol: float = DEFAULT_MS_TOL):
    # unrolled, not vmapped: under vmap the bandwidth path's lax.cond
    # degrades to a both-branches select and the Pallas top-k falls back to
    # its (slower) batching rule; the unrolled calls share one compiled
    # kernel and pipeline fully
    bw = jnp.stack([jnp.clip(
        compute_bandwidth(keys[i], x[i], num_samples, quantile), min=0.003)
        for i in range(x.shape[0])])
    from sednet_tpu.ops.pallas_kernels import mean_shift_step_pallas_batched

    def step(new_x):
        return mean_shift_step_pallas_batched(new_x, x, bw, bf16=bf16)

    # batch-global early exit: runs until EVERY shape's max movement is
    # below tol (a per-shape exit would need a ragged loop; the extra
    # converged-shape steps are no-ops within tol)
    return _iterate_until(step, x, iterations, tol), bw


def cluster_batch_async(key, x, *, num_samples=10000, quantile=0.015,
                        iterations=50, bf16: bool = False,
                        tol: float = DEFAULT_MS_TOL):
    """Enqueue the device half of cluster_batch — batched Pallas shift +
    per-shape NMS — WITHOUT any host sync, so a caller can overlap the
    sync/retry half (cluster_batch_finalize) with the next batch's device
    work. Returns an opaque pending tuple."""
    b = x.shape[0]
    keys = jax.random.split(key, b)
    shifted, bw = _batched_shift(keys, x, jnp.float32(quantile),
                                 min(num_samples, x.shape[1]), iterations,
                                 bf16=bf16, tol=tol)
    # dispatch all NMS programs before any host sync so they pipeline
    results = [nms(shifted[i], x[i], bw[i]) for i in range(b)]
    labels = [r[0] for r in results]
    nums = jnp.stack([r[2] for r in results])
    return (labels, nums, keys, x)


def cluster_batch_finalize(pending, *, num_samples=10000, quantile=0.015,
                           iterations=50, max_clusters: int = 49,
                           retry_factor: float = 1.2, bf16: bool = False,
                           tol: float = DEFAULT_MS_TOL):
    """Host half of cluster_batch: ONE sync on the cluster counts, then
    the rare per-shape guarded retries. Pass the same clustering params
    as the cluster_batch_async call that produced `pending`."""
    import numpy as np

    labels, nums_j, keys, x = pending
    b = len(labels)
    nums = np.asarray(nums_j)  # single sync
    capped = np.zeros((b,), bool)
    bw_capped = np.zeros((b,), bool)
    for i in np.nonzero(nums > max_clusters)[0]:  # rare guarded retries
        res = guard_mean_shift(
            keys[i], x[i], num_samples=num_samples,
            quantile=quantile * retry_factor, iterations=iterations,
            max_clusters=max_clusters, retry_factor=retry_factor,
            bf16=bf16, tol=tol)
        labels[i] = res.labels
        nums[i] = int(res.num_clusters)
        capped[i] = bool(res.capped)
        bw_capped[i] = bool(res.bw_capped)
    return (jnp.stack(labels), jnp.asarray(nums),
            {"capped": capped, "bw_capped": bw_capped})


def cluster_batch(key, x, *, num_samples=10000, quantile=0.015,
                  iterations=50, max_clusters: int = 49,
                  retry_factor: float = 1.2, bf16: bool = False,
                  tol: float = DEFAULT_MS_TOL):
    """Cluster a batch of shapes: one batched Pallas launch for the shift
    iterations (the throughput path, SURVEY §2.9), per-shape NMS, and an
    individual guarded retry only for shapes that exceed max_clusters.

    x: (B, N, E) unit rows. Returns (labels (B, N) int32,
    num_clusters (B,) int32, guard_flags) — guard_flags is a dict of (B,)
    bool arrays {"capped", "bw_capped"} flagging shapes whose guarded
    retry diverged from the reference's unbounded path.
    TPU-only (uses the Pallas step)."""
    pending = cluster_batch_async(key, x, num_samples=num_samples,
                                  quantile=quantile, iterations=iterations,
                                  bf16=bf16, tol=tol)
    return cluster_batch_finalize(pending, num_samples=num_samples,
                                  quantile=quantile, iterations=iterations,
                                  max_clusters=max_clusters,
                                  retry_factor=retry_factor, bf16=bf16,
                                  tol=tol)


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "iterations", "kernel_type",
                     "max_clusters", "retry_factor", "bf16", "tol"))
def guard_mean_shift(key, x, *, num_samples=10000, quantile=0.015,
                     iterations=50, kernel_type: str = "gaussian",
                     max_clusters: int = 49,
                     retry_factor: float = 1.2,
                     bf16: bool = False,
                     tol: float = DEFAULT_MS_TOL) -> MeanShiftResult:
    """Retry with inflated quantile until <= max_clusters clusters
    (reference: generate_predictions_aug.py:25-35 uses x1.2; the library
    variant src/mean_shift.py:81-96 uses x2 — pass retry_factor=2.0)."""

    def attempt(q, k):
        return mean_shift(k, x, num_samples=num_samples, quantile=q,
                          iterations=iterations, kernel_type=kernel_type,
                          bf16=bf16, tol=tol)

    def cond(state):
        res, _, tries = state
        return (res.num_clusters > max_clusters) & (tries < 16)

    def body(state):
        res, key, tries = state
        key, sub = jax.random.split(key)
        q = res.quantile * retry_factor
        out = attempt(q, sub)
        return out._replace(quantile=q), key, tries + 1

    key, sub = jax.random.split(key)
    first = attempt(jnp.asarray(quantile, jnp.float32), sub)
    res, _, tries = lax.while_loop(cond, body, (first, key, jnp.int32(0)))
    # telemetry: whether the retry cap was hit, and whether the final
    # attempt's bandwidth k = int(q*m) exceeded compute_bandwidth's lane
    # cap min(m-1, 256) (both deviations from the reference's unbounded
    # dynamic path; surfaced per shape by the predict CLI)
    m = min(num_samples, x.shape[0])
    res = res._replace(
        tries=tries,
        capped=res.num_clusters > max_clusters,
        bw_capped=(res.quantile * m).astype(jnp.int32) > min(m - 1, 256))

    # the reference retries unboundedly; this loop caps at 16. If a
    # degenerate embedding still exceeds max_clusters, clamp instead of
    # emitting labels >= 50 that crash the one-hot metric stack: clusters
    # are ranked by size, overflow points join the largest cluster.
    def _cap(r):
        n = r.labels.shape[0]
        sizes = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), r.labels,
                                    num_segments=n)
        order = jnp.argsort(-sizes)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        rl = rank[r.labels]
        return r._replace(
            labels=jnp.where(rl < max_clusters, rl, 0),
            num_clusters=jnp.minimum(r.num_clusters,
                                     jnp.int32(max_clusters)))

    res = lax.cond(res.num_clusters > max_clusters, _cap, lambda r: r, res)
    return res
