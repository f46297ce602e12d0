"""Microbench kernels on the real TPU, amortizing the axon-relay dispatch
latency (~20 ms/call round-trip) by looping each kernel inside ONE jitted
fori_loop and differencing two trip counts: per-step = (t_hi - t_lo)/(hi-lo).
Scalar outputs only. Usage: PYTHONPATH includes the repo root."""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, reps=6):
    np.asarray(fn())  # compile; under the axon relay block_until_ready is
    ts = []           # a no-op — only a host transfer synchronizes
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_step_ms(make_looped, lo=4, hi=24):
    f_lo, f_hi = make_looped(lo), make_looped(hi)
    return (timeit(f_hi) - timeit(f_lo)) / (hi - lo) * 1e3


def cad_cloud(rng, n):
    t = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    pts = np.stack([t[:, 0], t[:, 1],
                    0.3 * np.sin(3 * t[:, 0]) * np.cos(2 * t[:, 1])], 1)
    return (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all")
    args = p.parse_args()

    from sednet_tpu.ops.flash_topk import topk_pallas
    from sednet_tpu.cluster.mean_shift import mean_shift_iterate

    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    n = 10000

    if args.what in ("all", "topk"):
        x = jnp.asarray(cad_cloud(rng, n))
        emb = rng.normal(0, 1, (n, 128)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        e = jnp.asarray(emb)

        for name, arr, k_, kw in [
            ("xyz k=64", x, 64, {}),
            ("emb128 k=64", e, 64, {}),
            ("emb128 k=50 largest", e, 50, dict(largest=True)),
        ]:
            def make(iters, arr=arr, k_=k_, kw=kw):
                @jax.jit
                def f():
                    def body(i, s):
                        q = arr * (1.0 + 1e-6 * i)  # defeat CSE
                        idx = topk_pallas(q, q, k_, **kw)
                        return s + idx[0, 0]
                    return lax.fori_loop(0, iters, body, jnp.int32(0))
                return f
            print(f"topk {name:22s} {per_step_ms(make):8.2f} ms/call")

    if args.what in ("all", "ms"):
        emb = rng.normal(0, 1, (n, 128)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        e = jnp.asarray(emb)
        bw = jnp.float32(0.05)

        for backend, bf16 in (("pallas", False), ("pallas", True),
                              ("xla", False)):
            def make(iters, backend=backend, bf16=bf16):
                @jax.jit
                def f():
                    o = mean_shift_iterate(e, bw, iterations=iters,
                                           backend=backend, bf16=bf16)
                    return jnp.sum(o[0])
                return f
            tag = backend + ("/bf16" if bf16 else "")
            print(f"mean_shift step [{tag:11s}] "
                  f"{per_step_ms(make):8.2f} ms/iter")

    if args.what in ("all", "spectral"):
        # matfree transpose-mode A/B vs the dense build+solve (the N>16k
        # escape hatch; scatter measured 478x slower than dense at
        # N=2048 round-3 — the sorted layout is the candidate fix)
        from sednet_tpu.cluster.spectral import (normal_affinity_topk,
                                                 spectral_eigvecs,
                                                 spectral_eigvecs_matfree)

        xyz = jnp.asarray(cad_cloud(rng, n))
        nr = rng.normal(0, 1, (n, 3)).astype(np.float32)
        nr /= np.linalg.norm(nr, axis=1, keepdims=True)
        nrj = jnp.asarray(nr)
        key = jax.random.PRNGKey(0)

        def dense():
            return np.asarray(spectral_eigvecs(
                normal_affinity_topk(xyz, nrj), key)[0, 0])

        print(f"spectral dense aff+lobpcg    {timeit(dense) * 1e3:8.1f} ms")
        for mode in ("scatter", "sorted"):
            def mf(mode=mode):
                return np.asarray(spectral_eigvecs_matfree(
                    xyz, nrj, key, transpose_mode=mode)[0, 0])
            print(f"spectral matfree [{mode:8s}] {timeit(mf) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
