"""Probe XLA gather/scatter formulations for the matfree spectral matvec.

profile_spectral_matfree measured A v = (v[idx] * coef[..., None]).sum(1)
at 35 ms for (N=10k, k=50, m=36) — ~20x over the row-granular gather
floor (ops/graph.py's flat gather moves 64-f32 rows at ~0.8 rows/cycle).
This probes which formulation recovers row-granular issue on this
jaxlib, for the gather (A v) and the scatter (A^T v) directions.

    python scripts/probe_spectral_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, K, M = 10000, 50, 36


def _sync(out):
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
    from sednet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, (N, K)), jnp.int32)
    coef = jnp.asarray(rng.normal(0, 1, (N, K)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (N, M)), jnp.float32)
    v128 = jnp.pad(v, ((0, 0), (0, 128 - M)))
    flat = idx.reshape(-1)

    want = np.asarray((v[idx] * coef[..., None]).sum(1))

    def check(fn, *args, out=None):
        got = np.asarray(fn(*args) if out is None else out)
        return np.allclose(got[:, :M] if got.shape[1] > M else got,
                           want, atol=1e-3)

    gathers = [
        ("baseline v[idx] weighted sum",
         jax.jit(lambda v: (v[idx] * coef[..., None]).sum(1)), v),
        ("flat take reshape",
         jax.jit(lambda v: (jnp.take(v, flat, axis=0).reshape(N, K, M)
                            * coef[..., None]).sum(1)), v),
        ("flat take m=128 pad",
         jax.jit(lambda v: (jnp.take(v, flat, axis=0).reshape(N, K, 128)
                            * coef[..., None]).sum(1)), v128),
        ("einsum nk,nkm",
         jax.jit(lambda v: jnp.einsum("nk,nkm->nm", coef, v[idx])), v),
        ("per-k unrolled row gathers",
         jax.jit(lambda v: sum(coef[:, k:k + 1] * v[idx[:, k]]
                               for k in range(K))), v),
        ("per-k scan row gathers",
         jax.jit(lambda v: jax.lax.scan(
             lambda acc, ic: (acc + ic[1][:, None] * v[ic[0]], None),
             jnp.zeros((N, v.shape[1]), jnp.float32),
             (idx.T, coef.T))[0]), v),
    ]
    print(f"--- A v gather formulations (N={N}, k={K}, m={M}) ---",
          flush=True)
    for name, fn, arg in gathers:
        try:
            ok = check(fn, arg)
            t = timeit(fn, arg)
            print(f"{name:36s} {t:8.2f} ms  exact={ok}", flush=True)
        except Exception as ex:
            print(f"{name:36s} FAIL {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)

    want_s = np.zeros((N, M), np.float32)
    np.add.at(want_s, np.asarray(flat),
              np.asarray((coef[..., None] * v[:, None, :]).reshape(-1, M)))

    def check_s(got):
        g = np.asarray(got)
        return np.allclose(g[:, :M] if g.shape[1] > M else g, want_s,
                           atol=1e-2)

    scatters = [
        ("baseline .at[flat].add",
         jax.jit(lambda v: jnp.zeros_like(v).at[flat].add(
             (coef[..., None] * v[:, None, :]).reshape(-1, v.shape[1]))), v),
        ("scatter m=128 pad",
         jax.jit(lambda v: jnp.zeros_like(v).at[flat].add(
             (coef[..., None] * v[:, None, :]).reshape(-1, v.shape[1]))),
         v128),
        ("per-k unrolled scatters",
         jax.jit(lambda v: sum(
             (jnp.zeros_like(v).at[idx[:, k]].add(coef[:, k:k + 1] * v)
              for k in range(K)),
             start=jnp.zeros_like(v))), v),
        ("segment_sum sorted",
         None, v),  # filled below
    ]
    order = jnp.argsort(flat)
    src_s = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                             (N, K)).reshape(-1)[order]
    coef_s = coef.reshape(-1)[order]
    dest_s = flat[order]
    scatters[3] = (
        "segment_sum sorted",
        jax.jit(lambda v: jax.ops.segment_sum(
            coef_s[:, None] * v[src_s], dest_s, num_segments=N,
            indices_are_sorted=True)), v)

    print(f"--- A^T v scatter formulations ---", flush=True)
    for name, fn, arg in scatters:
        try:
            got = fn(arg)
            ok = check_s(got)
            t = timeit(fn, arg)
            print(f"{name:36s} {t:8.2f} ms  exact={ok}", flush=True)
        except Exception as ex:
            print(f"{name:36s} FAIL {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
