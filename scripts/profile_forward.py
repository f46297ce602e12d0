"""Fine-grained TPU decomposition of the SEDNet forward (batch 8 x 10k).

The ref-default eval profile (scripts/profile_ref_eval.py) shows the two
model forwards are ~42% of the pipeline at 457 ms/batch-8 each, yet the
known kernel costs (3 fused top-k calls ~185 ms + factored edge convs +
head matmuls) only account for roughly half of that. This script times the
forward's internal stages with the fori_loop-differencing method of
profile_pipeline.py (the axon relay makes block_until_ready a no-op) to
find the gap. Run on the attached TPU:

    python scripts/profile_forward.py
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


def per_iter_ms(make, lo=2, hi=8):
    return (timeit(make(hi)) - timeit(make(lo))) / (hi - lo) * 1e3


def loop(fn, iters, *seed_arrs):
    @jax.jit
    def f():
        def body(i, s):
            r = fn(*[a * (1.0 + 1e-6 * i) if a.dtype.kind == "f" else a
                     for a in seed_arrs])
            return s + r
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    return f


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import flax.linen as nn

    from bench import _shapes, BATCH, N_POINTS
    from sednet_tpu.config import Config
    from sednet_tpu.models.backbone import EdgeConv
    from sednet_tpu.ops.flash_topk import _locality_order, topk_pallas
    from sednet_tpu.ops.graph import edge_conv_features, gather_neighbors
    from sednet_tpu.train import build_model

    rng = np.random.RandomState(0)
    shapes = _shapes(rng, BATCH)
    x = jnp.asarray(np.stack([
        np.concatenate([s["points"], s["normals"]], -1) for s in shapes]))

    cfg = Config(num_points=N_POINTS, knn=64, embed=128)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    enc_p = variables["params"]["encoder"]

    rows = []

    def rec(name, t):
        rows.append((name, t))
        print(f"{name:42s} {t:8.1f} ms/batch8")

    # --- whole forward
    def fwd(xx):
        out = model.apply(variables, xx)
        return out.embedding[0, 0, 0]
    rec("forward total", per_iter_ms(lambda n: loop(fwd, n, x)))

    # --- sort stage (perm + gather of x, inverse gather of feats)
    def sortstage(xx):
        perm = jax.vmap(_locality_order)(xx[..., :3])
        inv = jnp.argsort(perm, axis=1)
        xs = jnp.take_along_axis(xx, perm[..., None], axis=1)
        return xs[0, 0, 0] + inv[0, 0].astype(jnp.float32)
    rec("morton sort + perm gather", per_iter_ms(lambda n: loop(sortstage, n, x)))

    # --- the three kNN builds (sorted-input path, per batch item)
    def knn3(xx):
        out = jnp.float32(0)
        for b in range(BATCH):
            out += topk_pallas(xx[b], xx[b], 64, metric="points_normals",
                               spatial_sort=False)[0, 0].astype(jnp.float32)
        return out
    rec("kNN layer1 (points_normals) x8", per_iter_ms(lambda n: loop(knn3, n, x)))

    f64 = jnp.asarray(np.random.RandomState(1).randn(
        BATCH, N_POINTS, 64).astype(np.float32))
    idx = jnp.asarray(np.random.RandomState(2).randint(
        0, N_POINTS, size=(BATCH, N_POINTS, 64)).astype(np.int32))

    def knnf(ff):
        out = jnp.float32(0)
        for b in range(BATCH):
            out += topk_pallas(ff[b], ff[b], 64,
                               spatial_sort=False)[0, 0].astype(jnp.float32)
        return out
    rec("kNN feat64 x8 (one layer)", per_iter_ms(lambda n: loop(knnf, n, f64)))

    # --- one EdgeConv (64ch) given the graph: gather + GN + lrelu + max
    ec = EdgeConv(out_channels=64, groups=2, k=64, name="conv2")

    def edgeconv(ff, ii):
        y = ec.apply({"params": enc_p["conv2"]}, ff, ii)
        return y[0, 0, 0]
    rec("EdgeConv 64ch (gather+GN+max)",
        per_iter_ms(lambda n: loop(edgeconv, n, f64, idx)))

    # decomposed: factored matmul+gather only
    dense = nn.Dense(64, use_bias=False)
    dvars = {"params": {"kernel": jnp.asarray(
        np.random.RandomState(3).randn(128, 64).astype(np.float32) * 0.1)}}

    def gatheronly(ff, ii):
        f = dense.apply(dvars, jnp.concatenate([ff, jnp.zeros_like(ff)], -1))
        g = gather_neighbors(f, ii)
        return g[0, 0, 0, 0]
    rec("  gather (B,N,K,64) alone",
        per_iter_ms(lambda n: loop(gatheronly, n, f64, idx)))

    def gn_max(ff, ii):
        g = gather_neighbors(ff, ii)[..., :64]
        gn = nn.GroupNorm(num_groups=2)
        y = gn.apply({"params": {"scale": jnp.ones((64,)),
                                 "bias": jnp.zeros((64,))}}, g)
        y = nn.leaky_relu(y, negative_slope=0.2)
        return jnp.max(y, axis=2)[0, 0, 0]
    rec("  gather+GN+lrelu+max",
        per_iter_ms(lambda n: loop(gn_max, n, f64, idx)))

    # --- encoder total
    from sednet_tpu.models.backbone import DGCNNEncoder
    enc = DGCNNEncoder(mode=5, k=64, name="encoder")

    def encfwd(xx):
        g, f = enc.apply({"params": enc_p}, xx)
        return g[0, 0] + f[0, 0, 0]
    rec("encoder total", per_iter_ms(lambda n: loop(encfwd, n, x)))

    # --- heads: forward with encoder_out injected
    g_feat, feats = enc.apply({"params": enc_p}, x)

    def heads(gf, ft):
        out = model.apply(variables, x[:, :, :], encoder_out=(gf, ft))
        return out.embedding[0, 0, 0]
    rec("heads (given encoder output)",
        per_iter_ms(lambda n: loop(heads, n, g_feat, feats)))

    # --- mlp1 (256->1024 + GN + relu + global max)
    f256 = jnp.concatenate([f64, f64, f64, f64], -1)

    def mlp1(ff):
        h = nn.Dense(1024, use_bias=True).apply(
            {"params": {"kernel": jnp.zeros((256, 1024)) + 0.01,
                        "bias": jnp.zeros((1024,))}}, ff)
        h = nn.GroupNorm(num_groups=8).apply(
            {"params": {"scale": jnp.ones((1024,)),
                        "bias": jnp.zeros((1024,))}}, h)
        return jnp.max(nn.relu(h), axis=1)[0, 0]
    rec("mlp1 256->1024 + GN + global max",
        per_iter_ms(lambda n: loop(mlp1, n, f256)))

    tot_known = sum(t for n, t in rows if not n.startswith(("forward",
                                                            "encoder",
                                                            "  ")))
    print(f"\nsum of stage walls (excl. totals): {tot_known:.1f} ms")


if __name__ == "__main__":
    main()
