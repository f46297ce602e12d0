"""Probe Pallas/Mosaic in-VMEM gather mechanics for the edge-conv reduce.

The edge-conv neighbour gather reads random (1, C) rows of a per-shape
(N, C) table. XLA's gather streams those rows from HBM at ~100 GB/s
effective (index-issue-bound). But the table is only N*C*4 = 2.56 MB at
the production shape — it FITS IN VMEM, so a Pallas kernel that keeps the
table resident and gathers in-register pays zero HBM cost for the random
reads; outputs are the three (B, N, C) reductions the factored edge-conv
needs (sum / sum-of-squares / max over the K neighbours).

Round-4 probe findings (v5e, jaxlib in this image) — NEGATIVE RESULT:
  * jnp.take / advanced indexing with indices.shape != operand.shape
    fail Mosaic lowering ("Shape mismatch in input, indices and output")
    — Mosaic's dynamic_gather requires ALL THREE shapes equal.
  * fori_loop + per-k jnp.take fails: dynamic_slice unimplemented
    (Pallas TPU lowering, KernelType.TC).
  * SAME-SHAPE formulations (indices broadcast to the operand shape, the
    row block sized so RB*K == NP — both sublane-axis take_along_axis on
    a (NP, C) table and lane-axis on a pre-transposed (C, NP) table) get
    PAST the shape check and then crash Mosaic itself: INTERNAL
    tpu_compile_helper subprocess exit 1 at (10240, 64)/(64, 10240).
  * XLA flat gather + the three factored-GN reductions: 45.7 ms/batch-8
    at (8, 10k, 64, 64) under host load; ~13 ms of it is the gather
    (scripts/sweep_gather.py, idle host).
Conclusion: an in-VMEM Pallas neighbour gather is NOT lowerable in this
jaxlib/Mosaic build; the edge-conv gather stays on XLA's flat-gather
layout (ops/graph.py gather_neighbors), which is its measured floor.
One-hot/MXU reformulations are FLOP-infeasible (B*N*K*N*C ≈ 3.4e15 MACs
at production shape). Re-probe when jaxlib upgrades.

    python scripts/probe_gather_pallas.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K, C = 8, 10000, 64, 64
NP = ((N + 255) // 256) * 256   # padded rows
RB = NP // K                    # rows per grid step so RB*K == NP (160)
assert RB * K == NP


def timeit(fn, reps=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def make_inputs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (B, NP, C)).astype(np.float32)
    base = np.arange(N)[None, :, None]
    off = np.clip(rng.normal(0, 300, (B, N, K)), -2000, 2000).astype(np.int64)
    idx = np.clip(base + off, 0, N - 1).astype(np.int32)
    idx_pad = np.zeros((B, NP, K), np.int32)
    idx_pad[:, :N] = idx
    return jnp.asarray(a), jnp.asarray(idx_pad)


def xla_ref(a, idx):
    """The production path: flat gather + three reductions."""
    flat = a.reshape(B * NP, C)
    off = (jnp.arange(B, dtype=idx.dtype) * NP)[:, None, None]
    g = flat[(idx + off).reshape(-1)].reshape(B, NP, K, C)
    return jnp.sum(g, 2), jnp.sum(g * g, 2), jnp.max(g, 2)


def _call(kern, transposed_table=False):
    tab_spec = (
        pl.BlockSpec((1, C, NP), lambda b, r: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        if transposed_table else
        pl.BlockSpec((1, NP, C), lambda b, r: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kern,
        grid=(B, NP // RB),
        in_specs=[tab_spec,
                  pl.BlockSpec((1, RB, K), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((1, RB, C), lambda b, r: (b, r, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(3)),
        out_shape=tuple(jax.ShapeDtypeStruct((B, NP, C), jnp.float32)
                        for _ in range(3)),
    )


def _reduce_out(g, s_ref, sq_ref, mx_ref):
    g = g.reshape(RB, K, C)
    s_ref[0] = jnp.sum(g, 1)
    sq_ref[0] = jnp.sum(g * g, 1)
    mx_ref[0] = jnp.max(g, 1)


def kern_sameshape_take(tab_ref, idx_ref, s_ref, sq_ref, mx_ref):
    """jnp.take with a 1-D NP-long index vector: output shape == table."""
    tab = tab_ref[0]                                  # (NP, C)
    idx = idx_ref[0].reshape(NP)                      # RB*K == NP
    g = jnp.take(tab, idx, axis=0)                    # (NP, C)
    _reduce_out(g, s_ref, sq_ref, mx_ref)


def kern_sameshape_tal(tab_ref, idx_ref, s_ref, sq_ref, mx_ref):
    """take_along_axis with indices broadcast to the table's full shape."""
    tab = tab_ref[0]                                  # (NP, C)
    idx = idx_ref[0].reshape(NP, 1)
    idx_b = jnp.broadcast_to(idx, (NP, C))
    g = jnp.take_along_axis(tab, idx_b, axis=0)       # (NP, C)
    _reduce_out(g, s_ref, sq_ref, mx_ref)


def kern_lane_sameshape(tab_ref, idx_ref, s_ref, sq_ref, mx_ref):
    """Lane-axis gather from a PRE-transposed (C, NP) table, same shape."""
    tab_t = tab_ref[0]                                # (C, NP)
    idx = idx_ref[0].reshape(1, NP)
    idx_b = jnp.broadcast_to(idx, (C, NP))
    g = jnp.take_along_axis(tab_t, idx_b, axis=1)     # (C, NP)
    g = g.reshape(C, RB, K)
    s_ref[0] = jnp.sum(g, 2).T
    sq_ref[0] = jnp.sum(g * g, 2).T
    mx_ref[0] = jnp.max(g, 2).T


VARIANTS = [
    ("same-shape jnp.take axis0", kern_sameshape_take, False),
    ("same-shape take_along_axis axis0", kern_sameshape_tal, False),
    ("same-shape lane gather (C,NP)", kern_lane_sameshape, True),
]


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    a, idx = make_inputs()
    a_t = jnp.swapaxes(a, 1, 2).copy()                # (B, C, NP)

    ref = jax.jit(xla_ref)
    want = [np.asarray(x) for x in ref(a, idx)]
    t = timeit(lambda: ref(a, idx))
    print(f"{'XLA flat gather + 3 reductions':40s} {t:8.2f} ms/batch8",
          flush=True)

    for name, kern, transposed in VARIANTS:
        try:
            f = jax.jit(_call(kern, transposed))
            arg = a_t if transposed else a
            got = [np.asarray(x) for x in f(arg, idx)]
            ok = all(np.allclose(g[:, :N], w[:, :N], atol=1e-5)
                     for g, w in zip(got, want))
            t = timeit(lambda: f(arg, idx))
            print(f"{name:40s} {t:8.2f} ms/batch8  exact={ok}", flush=True)
        except Exception as ex:
            msg = str(ex).replace("\n", " ")[:160]
            print(f"{name:40s} FAIL {type(ex).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
