"""Microbench kernels on the real TPU, amortizing the axon-relay dispatch
latency (~20 ms/call round-trip) by looping each kernel inside ONE jitted
fori_loop and differencing two trip counts: per-step = (t_hi - t_lo)/(hi-lo).
Scalar outputs only. Usage: PYTHONPATH includes the repo root.

--json PATH appends the run's records as JSON lines so per-round kernel
numbers are diffable (KBENCH_r{n}.json, VERDICT r3 next-round #8).
"""
import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

RECORDS = []


JSON_PATH = None


def emit(name, ms, unit="ms"):
    print(f"{name:34s} {ms:8.2f} {unit}", flush=True)
    rec = {"kernel": name.strip(), "ms": round(ms, 3), "unit": unit}
    RECORDS.append(rec)
    if JSON_PATH:  # append as we go — a timeout mustn't lose the run
        with open(JSON_PATH, "a") as f:
            f.write(json.dumps(rec) + "\n")


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
    global JSON_PATH
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all")
    p.add_argument("--json", default=None,
                   help="append records to this JSONL file")
    p.add_argument("--n", type=int, default=10000,
                   help="point count (spectral section: use 32768+ to "
                        "measure the beyond-default-cap regime)")
    p.add_argument("--spectral-modes", default="vocab,scatter,pallas,scan",
                   help="comma list of matfree transpose modes to time. "
                        "Round-5 finding (chained amortized device time "
                        "— single-dispatch timings are ~all relay ping): "
                        "scatter 157.8 ms/solve at N=10k beats sorted "
                        "177.5 / pallas 429 / scan 971; dense 36.8. "
                        "Round-3's 'scatter 478x slower' was the EAGER "
                        "relay-dispatch artifact")
    p.add_argument("--spectral-reps", type=int, default=3)
    args = p.parse_args()

    from sednet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from sednet_tpu.ops.flash_topk import topk_pallas
    from sednet_tpu.cluster.mean_shift import mean_shift_iterate

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    n = args.n

    if args.json:
        JSON_PATH = args.json
        meta = {"devices": str(jax.devices()), "n_points": n,
                "what": args.what,
                "time": time.strftime("%Y-%m-%d %H:%M:%S")}
        with open(JSON_PATH, "a") as f:
            f.write(json.dumps(meta) + "\n")

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
            emit(f"topk {name}", per_step_ms(make), "ms/call")

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
            emit(f"mean_shift step [{tag}]", per_step_ms(make), "ms/iter")

    if args.what in ("all", "gather"):
        # edge-conv layer body A/B: direct (gather -> flax GroupNorm over
        # (B,N,K,C) -> leaky -> max) vs factored (one gather pass of
        # sum/sumsq/extremum reductions, stats reconstructed — the (B,N,K,C)
        # tensor never exists). B=8 matches the bench batch.
        import flax.linen as nn

        from sednet_tpu.ops.graph import edge_conv_factored, \
            edge_conv_features
        from sednet_tpu.ops.knn import knn_indices

        b, c = 8, 64
        xs = np.stack([cad_cloud(np.random.default_rng(i), n)
                       for i in range(b)])
        feat = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (b, n, c)) .astype(
                np.float32))
        idx = knn_indices(jnp.asarray(xs), 64)
        dense = nn.Dense(c, use_bias=False)
        dv = dense.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 2 * c), jnp.float32))
        gn = nn.GroupNorm(num_groups=2)
        gv = gn.init(jax.random.PRNGKey(1),
                     jnp.zeros((1, 1, 1, c), jnp.float32))

        def direct(xx, ii):
            f = edge_conv_features(xx, ii,
                                   lambda t: dense.apply(dv, t))
            f = gn.apply(gv, f)
            return jnp.max(nn.leaky_relu(f, negative_slope=0.2), axis=2)

        def factored(xx, ii):
            return edge_conv_factored(
                xx, ii, lambda t: dense.apply(dv, t),
                gv["params"]["scale"], gv["params"]["bias"], groups=2)

        for name, fn in (("edgeconv direct", direct),
                         ("edgeconv factored", factored)):
            def make(iters, fn=fn):
                @jax.jit
                def f():
                    def body(i, s):
                        y = fn(feat * (1.0 + 1e-6 * i), idx)
                        return s + y[0, 0, 0]
                    return lax.fori_loop(0, iters, body, jnp.float32(0))
                return f
            emit(f"{name} (b8 n10k k64 c64)", per_step_ms(make),
                 "ms/batch8")

    if args.what in ("all", "spectral"):
        # matfree transpose-mode A/B vs the dense build+solve (the
        # beyond-dense-cap escape hatch; pass --n 32768 to time the
        # regime the cap decision actually gates)
        from sednet_tpu.cluster.spectral import (normal_affinity_topk,
                                                 spectral_eigvecs,
                                                 spectral_eigvecs_matfree)

        xyz = jnp.asarray(cad_cloud(rng, n))
        nr = rng.normal(0, 1, (n, 3)).astype(np.float32)
        nr /= np.linalg.norm(nr, axis=1, keepdims=True)
        nrj = jnp.asarray(nr)
        key = jax.random.PRNGKey(0)

        # chain K_AMORT dependent solves in ONE dispatch: the relay's
        # ~30 ms ping dominates ANY single-dispatch timing (round-5
        # finding — every gather/scatter formulation "measured" 28-35 ms
        # because that IS the round trip; the round-3/4 mode rankings
        # built on such numbers were artifacts). The fori_loop carry
        # perturbs the input by 0-sized epsilon so XLA cannot CSE the
        # iterations; reported ms are per solve, device-true.
        K_AMORT = 5

        @jax.jit
        def dense_chain(x, m, s):
            def body(i, acc):
                aff = normal_affinity_topk(x + acc[0, 0] * 1e-30, m)
                return spectral_eigvecs(aff, s)
            return jax.lax.fori_loop(
                0, K_AMORT, body, jnp.zeros((x.shape[0], 12), jnp.float32))

        def dense_run():
            return np.asarray(dense_chain(xyz, nrj, key)[0, 0])

        emit("spectral dense aff+lobpcg [amortized]",
             timeit(dense_run) * 1e3 / K_AMORT)
        if "vocab" in args.spectral_modes:
            # visibility guard: if the fixture's farthest-graph target
            # vocabulary overflows the cap, the vocab row below silently
            # times the in-jit scatter fallback — record the size so the
            # row is interpretable
            from sednet_tpu.cluster.spectral import (_default_vocab_cap,
                                                     _neighbor_idx)
            n_uniq = int(np.unique(np.asarray(
                _neighbor_idx(xyz, 50, False))).size)
            rec = {"kernel": "spectral vocab targets",
                   "n_unique": n_uniq, "u_cap": _default_vocab_cap(n)}
            RECORDS.append(rec)
            if JSON_PATH:
                with open(JSON_PATH, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            print(f"spectral vocab targets: {n_uniq} "
                  f"(cap {_default_vocab_cap(n)})")
        for mode in [m for m in args.spectral_modes.split(",") if m]:
            @functools.partial(jax.jit, static_argnames=("mode",))
            def mf_chain(x, m, s, mode):
                def body(i, acc):
                    return spectral_eigvecs_matfree(
                        x + acc[0, 0] * 1e-30, m, s, transpose_mode=mode)
                return jax.lax.fori_loop(
                    0, K_AMORT, body,
                    jnp.zeros((x.shape[0], 12), jnp.float32))

            def mf(mode=mode):
                return np.asarray(mf_chain(xyz, nrj, key, mode)[0, 0])
            emit(f"spectral matfree [{mode}] [amortized]",
                 timeit(mf, reps=args.spectral_reps) * 1e3 / K_AMORT)

    if args.json:
        print(f"wrote {len(RECORDS)} records to {args.json}")


if __name__ == "__main__":
    main()
