"""Decompose the matfree ("pallas" scan) spectral solve's cost on TPU.

kbench r4 measured the scan-mode LOBPCG solve at 819 ms vs 55.7 ms dense
at N=10k — 15x, while the HBM floor of its per-matvec traffic is ~1 ms.
This script times each piece of the matvec and the solver harness
separately so the next optimization targets the real cost:

  * LOBPCG with an identity matvec (solver-harness floor: Rayleigh-Ritz,
    orthonormalizations, relay dispatches)
  * A v  : (v[idx] * coef).sum(1) gather+reduce
  * A^T v: transpose-layout gather + Pallas segmented scan, and the two
           sub-pieces (vals_t build / segsum kernel) in isolation
  * the full matvec, the full solve, and the dense-path reference

    python scripts/profile_spectral_matfree.py [--n 10000] [--knn 50]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # force REAL completion with a scalar D2H: block_until_ready through
    # the axon relay returned in 0.03 ms for a full LOBPCG solve (async
    # optimism), so every timing here syncs on a reduced scalar instead
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def timeit(fn, *args, reps=5):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--knn", type=int, default=50)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from sednet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from jax.experimental.sparse.linalg import lobpcg_standard

    from sednet_tpu.cluster.spectral import (
        _sorted_transpose_layout, normal_affinity_sparse,
        normal_affinity_topk, spectral_eigvecs, spectral_eigvecs_matfree)
    from sednet_tpu.data.synthetic import make_synthetic_shape
    from sednet_tpu.ops.pallas_kernels import segsum_sorted_scan_pallas

    n, knn, k = args.n, args.knn, args.k
    m = 3 * k                       # LOBPCG basis width
    shape = make_synthetic_shape(np.random.RandomState(0), n_points=n)
    xyz = jnp.asarray(shape["points"], jnp.float32)
    normals = jnp.asarray(shape["normals"], jnp.float32)
    key = jax.random.PRNGKey(0)

    # ---- full solves ----
    t_full = timeit(
        functools.partial(spectral_eigvecs_matfree, transpose_mode="pallas",
                          sigma=0.1, knn=knn, k=k, iters=args.iters),
        xyz, normals, key)
    print(f"full matfree solve (pallas mode)   {t_full:9.2f} ms", flush=True)

    aff_f = jax.jit(functools.partial(normal_affinity_topk, sigma=0.1, k=knn))
    t_aff = timeit(aff_f, xyz, normals)
    dense_f = jax.jit(functools.partial(spectral_eigvecs, k=k,
                                        iters=args.iters))
    aff = aff_f(xyz, normals)
    t_dense = timeit(dense_f, aff, key)
    print(f"dense: affinity {t_aff:7.2f} ms + lobpcg {t_dense:7.2f} ms",
          flush=True)

    # ---- solver harness floor ----
    @jax.jit
    def lob_ident(x0):
        _, u, _ = lobpcg_standard(lambda v: v * 2.0, x0, m=args.iters)
        return u
    x0 = jax.random.normal(key, (n, k), jnp.float32)
    print(f"lobpcg w/ identity matvec          "
          f"{timeit(lob_ident, x0):9.2f} ms", flush=True)

    # ---- matvec pieces ----
    idx, w, rsq = jax.jit(functools.partial(
        normal_affinity_sparse, sigma=0.1, k=knn))(xyz, normals)
    coef = w * rsq[idx] * rsq[:, None]
    src_s, coef_s, dest_s, ends_s = jax.jit(
        _sorted_transpose_layout)(idx, coef)
    v = jax.random.normal(key, (n, m), jnp.float32)

    av = jax.jit(lambda v: (v[idx] * coef[..., None]).sum(1))
    print(f"A v    gather+reduce (N,{knn},{m})     "
          f"{timeit(av, v):9.2f} ms", flush=True)

    build = jax.jit(lambda v: coef_s[None, :] * v.T[:, src_s])
    print(f"A^T v  vals_t build (m,E) gather   "
          f"{timeit(build, v):9.2f} ms", flush=True)

    vals_t = build(v)
    seg = jax.jit(lambda vt: segsum_sorted_scan_pallas(vt, dest_s, ends_s))
    print(f"A^T v  segsum pallas kernel        "
          f"{timeit(seg, vals_t):9.2f} ms", flush=True)

    @jax.jit
    def matvec(v):
        av_ = (v[idx] * coef[..., None]).sum(1)
        vt = coef_s[None, :] * v.T[:, src_s]
        atv = segsum_sorted_scan_pallas(vt, dest_s, ends_s)
        return 0.5 * (av_ + atv)
    t_mv = timeit(matvec, v)
    print(f"one full matvec (m={m})             {t_mv:9.2f} ms "
          f"(x{args.iters} iters ~ {t_mv * args.iters:.0f} ms)", flush=True)

    # scatter-mode matvec for scale
    @jax.jit
    def matvec_scatter(v):
        av_ = (v[idx] * coef[..., None]).sum(1)
        contrib = coef[..., None] * v[:, None, :]
        atv = jnp.zeros_like(v).at[idx.reshape(-1)].add(
            contrib.reshape(-1, v.shape[1]))
        return 0.5 * (av_ + atv)
    print(f"one scatter-mode matvec            "
          f"{timeit(matvec_scatter, v):9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
