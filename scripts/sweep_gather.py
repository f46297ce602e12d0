"""Measure alternative formulations of the edge-conv neighbour gather.

The forward decomposition (scripts/profile_forward.py) puts the
(B, N, K, C) neighbour gather at ~30 ms/batch-8 per layer — an effective
43 GB/s against ~800 GB/s HBM: XLA's TPU gather is index-issue-bound, not
bandwidth-bound. This sweeps layouts/formulations to find a faster exact
equivalent.

    python scripts/sweep_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, reps=5):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter_ms(make, lo=2, hi=10):
    return (timeit(make(hi)) - timeit(make(lo))) / (hi - lo) * 1e3


B, N, K, C = 8, 10000, 64, 64


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    # locality-realistic indices: neighbours of row i concentrated near i
    # (the encoder gathers in Morton-sorted order)
    base = np.arange(N)[None, :, None]
    off = np.clip(rng.normal(0, 300, (B, N, K)), -2000, 2000).astype(np.int64)
    idx_np = np.clip(base + off, 0, N - 1).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idxr = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))

    def run(name, fn, ii):
        def make(iters):
            @jax.jit
            def g():
                def body(i, s):
                    y = fn(x * (1.0 + 1e-6 * i), ii)
                    return s + y
                return lax.fori_loop(0, iters, body, jnp.float32(0))
            return g
        try:
            t = per_iter_ms(make)
            print(f"{name:44s} {t:8.2f} ms/batch8", flush=True)
        except Exception as ex:
            print(f"{name:44s} FAIL {type(ex).__name__}: {str(ex)[:100]}",
                  flush=True)

    # current: vmapped advanced-index gather, then a max over K (forces the
    # gathered tensor to exist but fuses whatever XLA can)
    def cur(xx, ii):
        g = jax.vmap(lambda xb, ib: xb[ib])(xx, ii)
        return jnp.max(g, axis=2)[0, 0, 0]
    run("vmap x[idx] + max", cur, idx)
    run("vmap x[idx] + max (random idx)", cur, idxr)

    def takeax(xx, ii):
        g = jnp.take_along_axis(xx[:, :, None, :],
                                ii[..., None], axis=1)
        return jnp.max(g, axis=2)[0, 0, 0]
    run("take_along_axis + max", takeax, idx)

    def flat(xx, ii):
        xf = xx.reshape(B * N, C)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        g = xf[(ii + off).reshape(-1)].reshape(B, N, K, C)
        return jnp.max(g, axis=2)[0, 0, 0]
    run("flat (B*N,C) fancy-index + max", flat, idx)

    def lanegather(xx, ii):
        # gather along the LANE axis of a (C, N) transposed table
        xt = jnp.swapaxes(xx, 1, 2)                     # (B, C, N)
        g = jnp.take_along_axis(
            xt[:, :, None, :], ii[:, None, :, 0:K].reshape(B, 1, N * K)[
                :, :, None, :].reshape(B, 1, 1, N * K), axis=3)
        g = g.reshape(B, C, N, K)
        return jnp.max(g, axis=3)[0, 0, 0]
    run("lane-axis gather (C,N) + max", lanegather, idx)

    def onehot(xx, ii):
        # one-hot matmul: rides the MXU; exact for max AFTER gather only if
        # we gather (not for max directly) — here just the gather cost probe
        oh = jax.nn.one_hot(ii.reshape(B, N * K), N, dtype=jnp.float32)
        g = jnp.einsum("bek,bkc->bec", oh, xx).reshape(B, N, K, C)
        return jnp.max(g, axis=2)[0, 0, 0]
    run("one-hot matmul + max", onehot, idx)

    # sorted-idx variant: does gather speed depend on index order?
    idx_sorted = jnp.sort(idx, axis=2)
    run("vmap x[idx] + max (row-sorted idx)", cur, idx_sorted)


if __name__ == "__main__":
    main()
