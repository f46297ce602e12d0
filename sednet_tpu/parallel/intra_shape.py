"""Intra-shape (point-axis) parallelism: ring kNN and sharded mean-shift.

The reference never scales past 10k points per cloud — every N^2 tensor is
chunked in host Python (reference: src/PointNet.py:75-80,
src/smooth_normal_matrix.py:119-152). The single-chip Pallas kernels here
lift that to "whatever fits VMEM" (the (D, N) point set must be resident:
ops/flash_topk.py pallas_topk_supported), which caps around N ~ 40k at
D = 64. This module removes the cap by sharding the POINT axis over the
device mesh — SURVEY §2.9/§5's "sequence parallelism" equivalent for this
workload:

  * ring_knn: flash-attention-style ring. Every device owns one row shard
    (its queries) and one column shard (its candidates). Each of |mesh|
    steps folds the resident column shard into the per-row running top-k,
    then rotates the column shard one hop around the ring (lax.ppermute
    over ICI). After |mesh| steps every row has seen every column — the
    result is the EXACT top-k, equal to the single-device kernel up to tie
    order.
  * mean_shift_iterate_sharded: the fixed-trip mean-shift of
    cluster.mean_shift with the shifted rows sharded. The anchor set is
    all-gathered ONCE; every iteration is then collective-free — each
    device owns an (N/M, N) block of the kernel matrix that never exists
    globally.

Both run under shard_map on the same 1-D mesh the data-parallel train step
uses; collectives ride ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sednet_tpu.parallel.mesh import DATA_AXIS


def _local_topk(q, p, k, metric, w):
    """Exact top-k of q rows vs p rows: (dist ascending, idx)."""
    from sednet_tpu.ops.knn import _points_normals_sqdist, pairwise_sqdist

    if metric == "points_normals":
        d = _points_normals_sqdist(q, p, w)
    else:
        d = pairwise_sqdist(q, p)
    neg, idx = lax.top_k(-d, k)
    return -neg, idx


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "metric", "normal_metric_w"))
def _ring_knn_jit(x, k: int, mesh: Mesh, metric: str, normal_metric_w: float):
    m = mesh.devices.size
    shard = x.shape[0] // m

    def body(x_rows):
        me = lax.axis_index(DATA_AXIS)
        d0, i0 = _local_topk(x_rows, x_rows, k, metric, normal_metric_w)
        best_d, best_i = d0, i0 + me * shard

        def step(t, carry):
            best_d, best_i, cols = carry
            # after the rotate below, the resident shard originated at
            # device (me - t) mod m — its global column offset is arithmetic,
            # no offset needs to ride the ring
            perm = [(j, (j + 1) % m) for j in range(m)]
            cols = lax.ppermute(cols, DATA_AXIS, perm)
            col_start = (lax.rem(me - t + m, m)) * shard
            d1, i1 = _local_topk(x_rows, cols, k, metric, normal_metric_w)
            cat_d = jnp.concatenate([best_d, d1], axis=1)       # (S, 2k)
            cat_i = jnp.concatenate([best_i, i1 + col_start], axis=1)
            neg, pos = lax.top_k(-cat_d, k)
            return -neg, jnp.take_along_axis(cat_i, pos, axis=1), cols

        best_d, best_i, _ = lax.fori_loop(
            1, m, step, (best_d, best_i, x_rows))
        return best_i, best_d

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=P(DATA_AXIS),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )(x)


def ring_knn(x: jax.Array, k: int, mesh: Mesh, *, metric: str = "sqdist",
             normal_metric_w: float = 1.0):
    """Exact self-kNN with the point axis sharded over `mesh`.

    x: (N, D), N divisible by the mesh size. Returns (idx (N, k) int32
    global indices nearest-first, dist (N, k)). Peak per-device memory is
    the (N/M, N/M) local distance block + the (N/M, 2k) merge buffer — the
    N x N matrix never exists anywhere, lifting the single-chip VMEM cap
    (ops.flash_topk.pallas_topk_supported) by the mesh factor.
    """
    m = mesh.devices.size
    if x.shape[0] % m:
        raise ValueError(f"N={x.shape[0]} not divisible by mesh size {m}")
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return _ring_knn_jit(jax.device_put(x, sharding), k, mesh, metric,
                         normal_metric_w)


@functools.partial(
    jax.jit, static_argnames=("iterations", "mesh", "kernel_type"))
def _ms_jit(x, bandwidth, iterations: int, mesh: Mesh, kernel_type: str):
    from sednet_tpu.cluster.mean_shift import _kernel

    def body(x_rows):
        anchors = lax.all_gather(x_rows, DATA_AXIS, tiled=True)  # (N, E)

        def it(_, new_rows):
            dist = 2.0 - 2.0 * new_rows @ anchors.T              # (N/M, N)
            kmat = _kernel(dist, bandwidth, kernel_type)
            d = 1.0 / jnp.sum(kmat, axis=1, keepdims=True)
            new_rows = jnp.dot(kmat, anchors,
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32) * d
            return new_rows / jnp.clip(
                jnp.linalg.norm(new_rows, axis=1, keepdims=True), min=1e-12)

        return lax.fori_loop(0, iterations, it, x_rows)

    return jax.shard_map(body, mesh=mesh, in_specs=P(DATA_AXIS),
                          out_specs=P(DATA_AXIS))(x)


def mean_shift_iterate_sharded(x: jax.Array, bandwidth, mesh: Mesh,
                               iterations: int = 50,
                               kernel_type: str = "gaussian") -> jax.Array:
    """cluster.mean_shift_iterate with the shifted rows sharded over the
    mesh (single-device step: reference src/mean_shift.py:45-79; same
    anchor-on-original-x + row-sum + L2-renormalize math). The anchors are
    all-gathered once; iterations are collective-free — each device holds
    only its (N/M, N) kernel block.
    """
    m = mesh.devices.size
    if x.shape[0] % m:
        raise ValueError(f"N={x.shape[0]} not divisible by mesh size {m}")
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return _ms_jit(jax.device_put(x, sharding),
                   jnp.asarray(bandwidth, jnp.float32), iterations, mesh,
                   kernel_type)
