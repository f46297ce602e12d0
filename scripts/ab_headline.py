"""A/B the round-3 kernel defaults against the round-2 settings.

The driver-recorded headline regressed 10.32 -> 8.70 across round 3 while
the builder's one --all run recorded 11.34; round 4's median-of-10 timing
shows 8.3 shapes/s with 2.4% spread — the regression is real, the 11.34
was the outlier. Round 3 changed three defaults on the headline path:
col_halves 2 -> 4 (512-col kNN super-tiles), the shared-permutation
encoder (sort once at entry instead of per kNN call), and the fused NMS
colmax kernel. This times the forward and the clustering separately under
each toggle to find the regression.

    python scripts/ab_headline.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, N = 8, 10000


def med10(fn):
    import jax

    np.asarray(fn())
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import sednet_tpu.ops.knn as knn_mod
    from sednet_tpu.models import backbone
    from sednet_tpu.cluster import guard_mean_shift
    from sednet_tpu.config import Config
    from sednet_tpu.data import make_synthetic_shape, normalize_points, \
        pca_align
    from sednet_tpu.train import build_model, load_params
    from sednet_tpu.ops.flash_topk import topk_pallas

    cfg = Config(num_points=N, knn=64, embed=128)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    shapes = []
    for _ in range(BATCH):
        d = make_synthetic_shape(rng, n_points=N, n_segments=6)
        p = normalize_points(d["points"])
        p, nr, _ = pca_align(p, d["normals"])
        shapes.append(np.concatenate([p, nr], -1).astype(np.float32))
    x = jnp.asarray(np.stack(shapes))

    ck = load_params(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "bench_10k.npz"))
    variables = {"params": ck["inst"]}

    def forward_t():
        @jax.jit
        def fwd(v, xx):
            out = model.apply(v, xx)
            # scalar reduce on device: syncing through the relay must not
            # ship the 40 MB embedding (that transfer costs seconds and
            # would dominate the measurement)
            return out.embedding.sum()

        return med10(lambda: fwd(variables, x))

    def cluster_t():
        emb = model.apply(variables, x).embedding
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             min=1e-12)
        emb = jnp.asarray(np.asarray(emb))  # settle

        @jax.jit
        def cl(e, k):
            return guard_mean_shift(k, e, num_samples=5000, quantile=0.015,
                                    iterations=50).labels

        def run():
            keys = jax.random.PRNGKey(1)
            labs = [cl(emb[i], jax.random.fold_in(keys, i))
                    for i in range(BATCH)]
            return jnp.stack(labs)

        return med10(run)

    orig_topk = knn_mod.topk_pallas

    def report(name, res):
        m, lo, hi = res
        print(f"{name:46s} {m*1e3:8.1f} ms  [{lo*1e3:.1f}, {hi*1e3:.1f}]",
              flush=True)

    report("forward (r3 defaults: ch=4, shared-perm)", forward_t())
    report("cluster x8 (r3: pallas NMS colmax)", cluster_t())

    knn_mod.topk_pallas = functools.partial(orig_topk, col_halves=2)
    report("forward col_halves=2", forward_t())
    knn_mod.topk_pallas = orig_topk

    backbone.DGCNNEncoder.sort_points = False
    report("forward shared-perm OFF (per-call sort)", forward_t())

    knn_mod.topk_pallas = functools.partial(orig_topk, col_halves=2)
    report("forward ch=2 + shared-perm OFF (r2 config)", forward_t())
    knn_mod.topk_pallas = orig_topk
    backbone.DGCNNEncoder.sort_points = None


if __name__ == "__main__":
    main()
