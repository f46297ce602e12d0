"""Benchmark: end-to-end shapes/sec/chip on 10k-point clouds.

Default: runs the headline config (batched inference: SEDNet forward +
mean-shift instance clustering, batch of 8 x 10k points) on the attached
TPU and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "shapes/sec/chip", "vs_baseline": N}

--all additionally measures the other BASELINE.json configs (single-shape
forward, full pipeline with fits + residuals, multi-vote TTA, training
step) and prints one JSON line per config BEFORE the headline line.

vs_baseline divides by BASELINE_SHAPES_PER_SEC (the recorded round-1
measurement — the reference publishes no numbers, BASELINE.json
"published" is empty).
"""
import argparse
import json
import time

import numpy as np

BASELINE_SHAPES_PER_SEC = 2.371  # round-1 measurement on one v5e chip

BATCH = 8
N_POINTS = 10000


def _shapes(rng, n):
    from sednet_tpu.data import make_synthetic_shape, normalize_points, pca_align

    out = []
    for _ in range(n):
        d = make_synthetic_shape(rng, n_points=N_POINTS, n_segments=6)
        pts = normalize_points(d["points"])
        pts, nrm, _ = pca_align(pts, d["normals"])
        out.append({**d, "points": pts.astype(np.float32),
                    "normals": nrm.astype(np.float32)})
    return out


def _time(fn, *args, iters=3):
    np.asarray(fn(*args))  # warm-up/compile, forced: under the axon relay
    # block_until_ready is a no-op, so only a host transfer synchronizes
    t0 = time.time()
    r = None
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)  # force completion through the relay
    return (time.time() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from sednet_tpu.config import Config
    from sednet_tpu.cluster import cluster_batch, guard_mean_shift
    from sednet_tpu.train import build_model

    cfg = Config(num_points=N_POINTS, knn=64, embed=128)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    shapes = _shapes(rng, BATCH)
    x = jnp.asarray(np.stack([
        np.concatenate([s["points"], s["normals"]], -1) for s in shapes]))

    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def forward(v, xx):
        out = model.apply(v, xx)
        emb = out.embedding / jnp.clip(
            jnp.linalg.norm(out.embedding, axis=-1, keepdims=True), min=1e-12)
        return emb, out.type_log_prob, out.edge_logits

    @jax.jit
    def forward_idx1(v, xx, idx1):
        out = model.apply(v, xx, idx1)
        emb = out.embedding / jnp.clip(
            jnp.linalg.norm(out.embedding, axis=-1, keepdims=True), min=1e-12)
        return emb, out.type_log_prob, out.edge_logits

    @jax.jit
    def cluster_one(e, k):
        return guard_mean_shift(k, e, num_samples=5000, quantile=0.015,
                                iterations=50).labels

    def pipeline(v, xx, key):
        emb, type_lp, _ = forward(v, xx)
        # sequential per-shape dispatch pipelines fully (no mid-pipeline
        # host sync); measured slightly faster than cluster_batch here
        labels = [cluster_one(emb[i], jax.random.fold_in(key, i))
                  for i in range(xx.shape[0])]
        return jnp.stack(labels), type_lp.argmax(-1)

    results = []

    def emit(rec):
        # print immediately: a later section's failure must not lose
        # earlier configs' numbers
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if args.all:
        # 1. single-shape backbone forward
        dt = _time(lambda: forward(variables, x[:1])[0], iters=5)
        emit({"metric": "single-shape forward (10k pts)",
              "value": round(1.0 / dt, 3), "unit": "shapes/sec"})

        # 3. full pipeline: clustering + batched fits + residual eval
        from sednet_tpu.fit import Evaluation, FittingModule

        ev = Evaluation(FittingModule())

        def full_pipeline():
            labels, types = pipeline(variables, x, jax.random.PRNGKey(3))
            labels, types = np.asarray(labels), np.asarray(types)
            ev.residual_eval_batch([
                {"points": s["points"], "normals": s["normals"],
                 "labels": s["labels"].astype(np.int64),
                 "cluster_ids": labels[i], "pred_primitives": types[i]}
                for i, s in enumerate(shapes)])
            return labels

        full_pipeline()
        t0 = time.time()
        full_pipeline()
        dt_full = time.time() - t0
        emit({"metric": "full pipeline (cluster + fits + residuals)",
              "value": round(BATCH / dt_full, 3),
              "unit": "shapes/sec/chip"})

        # 4. multi-vote TTA pipeline
        from sednet_tpu.predict import make_tta_type_log_prob

        tta = make_tta_type_log_prob(model, cfg, True, False)

        from sednet_tpu.ops.knn import knn_indices_points_normals

        idx1_fn = jax.jit(lambda xx: knn_indices_points_normals(
            xx, cfg.knn, normal_metric_w=cfg.normal_metric_W))

        def tta_pipeline(key):
            # one first-layer graph serves all TTA votes AND the inst
            # forward, like predict_shapes
            idx1 = idx1_fn(x)
            lp = tta(variables["params"], x, idx1)
            emb, _, _ = forward_idx1(variables, x, idx1)
            labels, _ = cluster_batch(key, emb, num_samples=5000,
                                      quantile=0.015, iterations=50)
            return labels

        dt = _time(tta_pipeline, jax.random.PRNGKey(4))
        emit({"metric": "multi-vote TTA pipeline",
              "value": round(BATCH / dt, 3),
              "unit": "shapes/sec/chip"})

        # 5. training step (4-term loss)
        from sednet_tpu.train import TrainState, make_optimizer, make_train_step

        opt = make_optimizer(cfg)
        # deep-copy: the jitted train step DONATES the state buffers, and
        # the headline section still needs `variables` alive afterwards
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        state = TrainState(params, opt.init(params), jnp.int32(0))
        step = make_train_step(model, opt, cfg)
        batch = {
            "points": x[:4, :, :3], "normals": x[:4, :, 3:],
            "labels": jnp.asarray(np.stack(
                [s["labels"] for s in shapes[:4]]).astype(np.int32)),
            "prim": jnp.asarray(np.stack(
                [s["prim"] for s in shapes[:4]]).astype(np.int32)),
            "edges": jnp.asarray(np.stack(
                [s["edges"] for s in shapes[:4]]).astype(np.int32)),
            "edges_w": jnp.asarray(np.stack(
                [s["edges_w"] for s in shapes[:4]]).astype(np.float32)),
        }

        state_box = [state]

        def train_once(key):
            # carry the state: the jitted step donates its buffers, so
            # re-feeding the same state object would use freed memory
            s2, metrics = step(state_box[0], batch, key)
            state_box[0] = s2
            return metrics["loss"]

        dt = _time(train_once, jax.random.PRNGKey(5))
        emit({"metric": "train step (batch 4, 4-term loss)",
              "value": round(4.0 / dt, 3),
              "unit": "shapes/sec/chip"})
        del state_box, state  # release the donated-chain buffers

    # headline (config 2): batched inference, forward + mean-shift
    labels, types = pipeline(variables, x, jax.random.PRNGKey(1))
    _ = np.asarray(labels)
    t0 = time.time()
    iters = 3
    for i in range(iters):
        labels, types = pipeline(variables, x, jax.random.PRNGKey(2 + i))
    _ = np.asarray(labels)
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
