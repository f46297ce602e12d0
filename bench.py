"""Benchmark: end-to-end shapes/sec/chip on 10k-point clouds.

Runs the inference pipeline (SEDNet forward + mean-shift instance
clustering) on a batch of synthetic 10k-point shapes on the attached TPU and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "shapes/sec/chip", "vs_baseline": N}

vs_baseline divides by BASELINE_SHAPES_PER_SEC below (no published numbers
exist in the reference — BASELINE.json "published" is empty — so the
denominator is our recorded round-1 measurement; later rounds show progress
against it).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_SHAPES_PER_SEC = 2.371  # round-1 measurement on one v5e chip

BATCH = 8
N_POINTS = 10000


def main():
    import jax
    import jax.numpy as jnp

    from sednet_tpu.config import Config
    from sednet_tpu.cluster import guard_mean_shift
    from sednet_tpu.data import make_synthetic_shape, normalize_points, pca_align
    from sednet_tpu.train import build_model

    cfg = Config(num_points=N_POINTS, knn=64, embed=128)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    xs = []
    for _ in range(BATCH):
        d = make_synthetic_shape(rng, n_points=N_POINTS, n_segments=6)
        pts = normalize_points(d["points"])
        pts, nrm, _ = pca_align(pts, d["normals"])
        xs.append(np.concatenate([pts, nrm], -1).astype(np.float32))
    x = jnp.asarray(np.stack(xs))

    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def forward(v, xx):
        out = model.apply(v, xx)
        emb = out.embedding / jnp.clip(
            jnp.linalg.norm(out.embedding, axis=-1, keepdims=True), min=1e-12)
        return emb, out.type_log_prob.argmax(-1)

    @jax.jit
    def cluster_one(e, k):
        # single-shape clustering program; invoked per shape (a vmapped
        # while_loop version compiles pathologically slowly)
        return guard_mean_shift(k, e, num_samples=5000, quantile=0.015,
                                iterations=50).labels

    def pipeline(v, xx, key):
        emb, types = forward(v, xx)
        labels = [cluster_one(emb[i], jax.random.fold_in(key, i))
                  for i in range(xx.shape[0])]
        return jnp.stack(labels), types

    # warm up / compile
    labels, types = pipeline(variables, x, jax.random.PRNGKey(1))
    _ = np.asarray(labels)

    t0 = time.time()
    iters = 3
    for i in range(iters):
        labels, types = pipeline(variables, x, jax.random.PRNGKey(2 + i))
    _ = np.asarray(labels)  # forces completion (axon relay: block is a no-op)
    dt = (time.time() - t0) / iters

    shapes_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "End-to-end shapes/sec/chip (10k-pt clouds), forward + mean-shift",
        "value": round(shapes_per_sec, 4),
        "unit": "shapes/sec/chip",
        "vs_baseline": round(shapes_per_sec / BASELINE_SHAPES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
