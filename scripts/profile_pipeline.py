"""Stage-by-stage TPU timing of the headline bench pipeline (batch 8 x 10k).

Methodology: the axon relay makes block_until_ready a no-op and adds ~20 ms
dispatch latency per call, so each stage is timed by looping it inside ONE
jitted fori_loop at two trip counts and differencing (per-iter cost), with a
scalar host transfer as the only sync."""
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


def per_iter_ms(make, lo=2, hi=8):
    return (timeit(make(hi)) - timeit(make(lo))) / (hi - lo) * 1e3


def main():
    from sednet_tpu.config import Config
    from sednet_tpu.cluster.mean_shift import (compute_bandwidth,
                                               mean_shift_iterate, nms)
    from sednet_tpu.ops.flash_topk import topk_pallas
    from sednet_tpu.train import build_model
    from bench import _shapes, BATCH, N_POINTS

    rng = np.random.RandomState(0)
    shapes = _shapes(rng, BATCH)
    x = jnp.asarray(np.stack([
        np.concatenate([s["points"], s["normals"]], -1) for s in shapes]))

    cfg = Config(num_points=N_POINTS, knn=64, embed=128)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def forward(v, xx):
        out = model.apply(v, xx)
        emb = out.embedding / jnp.clip(
            jnp.linalg.norm(out.embedding, axis=-1, keepdims=True), min=1e-12)
        return emb, out.type_log_prob, out.edge_logits

    def loop(fn, iters, seed_arr):
        @jax.jit
        def f():
            def body(i, s):
                r = fn(seed_arr * (1.0 + 1e-6 * i))
                return s + r
            return lax.fori_loop(0, iters, body, jnp.float32(0))
        return f

    # --- full forward, batch 8
    def fwd(xx):
        emb, _, _ = forward(variables, xx)
        return emb[0, 0, 0]
    t_fwd = per_iter_ms(lambda n: loop(fwd, n, x))
    print(f"forward batch-8 total            {t_fwd:8.1f} ms")

    # --- real intermediates for per-stage kNN timing
    _, inter = model.apply(variables, x, capture_intermediates=True)
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    by_name = {"/".join(str(p) for p in path): v for path, v in flat}
    x1 = x2 = None
    for name, v in by_name.items():
        if "conv1" in name and getattr(v, "ndim", 0) == 3 \
                and v.shape[-1] == 64:
            x1 = v
        if "conv2" in name and getattr(v, "ndim", 0) == 3 \
                and v.shape[-1] == 64:
            x2 = v
    if x1 is None:
        # fall back: run encoder stages manually via nn.apply on submodules
        print("capture_intermediates gave:",
              sorted(by_name)[:20])
        return

    def t_knn(arr, name, **kw):
        def g(a):
            idx = topk_pallas(a[0], a[0], 64, **kw)
            out = idx[0, 0].astype(jnp.float32)
            for b in range(1, BATCH):
                out += topk_pallas(a[b], a[b], 64, **kw)[0, 0]
            return out
        t = per_iter_ms(lambda n: loop(g, n, arr))
        print(f"kNN batch-8 {name:24s} {t:8.1f} ms")

    t_knn(x, "layer1 xyz+normals", metric="points_normals")
    t_knn(x1, "layer2 feat64")
    t_knn(x2, "layer3 feat64")
    t_knn(x1, "layer2 feat64 nosort", spatial_sort=False)

    # --- clustering stages on the real embedding
    emb, _, _ = forward(variables, x)
    e0 = emb[0]

    def bw_fn(a):
        return compute_bandwidth(jax.random.PRNGKey(0), a, 5000,
                                 jnp.float32(0.015))
    print(f"bandwidth (5000 sub, 1 shape)    "
          f"{per_iter_ms(lambda n: loop(bw_fn, n, e0)):8.1f} ms")

    bw = jnp.float32(0.05)

    def ms50(a):
        return mean_shift_iterate(a, bw, iterations=50)[0, 0]
    print(f"mean-shift 50 iters (1 shape)    "
          f"{per_iter_ms(lambda n: loop(ms50, n, e0), lo=1, hi=4):8.1f} ms")

    shifted = mean_shift_iterate(e0, bw, iterations=50)

    def nms_fn(a):
        lab, _, num = nms(a, e0, bw)
        return num.astype(jnp.float32)
    print(f"NMS (1 shape)                    "
          f"{per_iter_ms(lambda n: loop(nms_fn, n, shifted)):8.1f} ms")


if __name__ == "__main__":
    main()
