"""Sweep flash-topk kernel parameters (col_halves super-tile width, row_block)
on pre-Morton-sorted inputs — the encoder's actual calling convention
(spatial_sort=False on sorted data). Loop-amortized per-call cost.

    python scripts/sweep_topk.py
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


def cad_cloud(rng, n):
    from sednet_tpu.data import make_synthetic_shape, normalize_points
    d = make_synthetic_shape(rng, n_points=n, n_segments=6)
    return normalize_points(d["points"]).astype(np.float32), d["normals"]


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from sednet_tpu.ops.flash_topk import _locality_order, topk_pallas

    rng = np.random.default_rng(0)
    n = 10000
    xyz, nrm = cad_cloud(np.random.RandomState(0), n)
    x6 = jnp.asarray(np.concatenate([xyz, nrm], -1).astype(np.float32))
    perm = _locality_order(jnp.asarray(xyz))
    x6 = x6[perm]

    # a layer-2-like feature map: smooth over the surface (features are
    # functions of position), 64 channels, sorted by the SAME xyz order
    f = np.tanh(np.asarray(xyz) @ rng.normal(0, 1, (3, 64)) * 3.0)
    f64 = jnp.asarray(f.astype(np.float32))[perm]

    cases = [("xyz+normals pn-metric", x6, dict(metric="points_normals")),
             ("feat64 smooth", f64, {})]

    for name, arr, mkw in cases:
        for ch in (1, 2, 4):
            for rb in (128, 256, 512):
                def make(iters, arr=arr, mkw=mkw, ch=ch, rb=rb):
                    @jax.jit
                    def g():
                        def body(i, s):
                            q = arr * (1.0 + 1e-6 * i)
                            idx = topk_pallas(q, q, 64, spatial_sort=False,
                                              col_halves=ch, row_block=rb,
                                              **mkw)
                            return s + idx[0, 0]
                        return lax.fori_loop(0, iters, body, jnp.int32(0))
                    return g
                try:
                    t = per_iter_ms(make)
                    print(f"{name:24s} halves={ch} rb={rb:4d} {t:8.2f} ms/call",
                          flush=True)
                except Exception as ex:
                    print(f"{name:24s} halves={ch} rb={rb:4d} FAIL "
                          f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
