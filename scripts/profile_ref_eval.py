"""Stage-by-stage wall decomposition of the reference-DEFAULT eval path.

The bench's "reference-default eval (hpnet + usecd)" config runs
predict.predict_shapes with cfg.hpnet_embed=True on batch-8 x 10k shapes
(mirroring /root/reference/generate_predictions_aug.py defaults). This
script times each pipeline stage with a forced host sync between stages
(best-of-reps walls), plus the un-decomposed end-to-end call for
comparison — the difference is relay-dispatch overhead the pipelined
production path avoids. Run on the attached TPU:

    python scripts/profile_ref_eval.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wall(fn, reps=3):
    fn()  # warm-up / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import _shapes, BATCH, N_POINTS, CKPT
    from sednet_tpu.config import Config
    from sednet_tpu.cluster import cluster_batch
    from sednet_tpu.cluster.spectral import hpnet_process
    from sednet_tpu.metrics import siou_matched_segments_usecd_batch
    from sednet_tpu.predict import (make_first_layer_idx, make_forward,
                                    make_tta_type_log_prob, predict_shapes,
                                    spectral_embed)
    from sednet_tpu.train import build_model, load_params

    cfg = Config(num_points=N_POINTS, knn=64, embed=128, hpnet_embed=True,
                 ms_num_samples=5000)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    shapes = _shapes(rng, BATCH)
    batch = {k: np.stack([s[k] for s in shapes])
             for k in ("points", "normals", "labels", "prim")}
    x = jnp.asarray(np.concatenate(
        [batch["points"], batch["normals"]], -1).astype(np.float32))

    if os.path.exists(CKPT):
        ck = load_params(CKPT)
        params_type, params_inst = ck["type"], ck["inst"]
    else:
        v = model.init(jax.random.PRNGKey(0), x[:1])
        params_type = params_inst = v["params"]

    tta = make_tta_type_log_prob(model, cfg, False, False)
    fwd = make_forward(model)
    idx_fn = make_first_layer_idx(cfg)

    xyz, nrm = x[..., :3], x[..., 3:]

    # --- stage walls (each forces a host sync) ---
    t_idx1 = wall(lambda: np.asarray(idx_fn(x)[0, 0]))
    idx1 = idx_fn(x)
    t_type = wall(lambda: np.asarray(tta(params_type, x, idx1)[0, 0]))
    type_lp = tta(params_type, x, idx1)

    def inst():
        _, e, el = fwd(params_inst, x, idx1)
        return np.asarray(e[0, 0])
    t_inst = wall(inst)
    _, embedding, edge_logits = fwd(params_inst, x, idx1)

    key = jax.random.PRNGKey(7)

    def spect():
        outs = [spectral_embed(xyz[i], nrm[i], cfg,
                               key=jax.random.fold_in(key, i))
                for i in range(BATCH)]
        return np.asarray(outs[-1][0][0, 0])
    t_spect = wall(spect)
    vs = [spectral_embed(xyz[i], nrm[i], cfg,
                         key=jax.random.fold_in(key, i))
          for i in range(BATCH)]

    def enrich():
        es = [hpnet_process(embedding[i], xyz[i], nrm[i],
                            normal_smooth_w=cfg.normal_smooth_w,
                            cached_eigvecs=vs[i][0],
                            cached_eig_entropy=vs[i][1])
              for i in range(BATCH)]
        return np.asarray(es[-1][0, 0])
    t_enrich = wall(enrich)
    embs = [hpnet_process(embedding[i], xyz[i], nrm[i],
                          normal_smooth_w=cfg.normal_smooth_w,
                          cached_eigvecs=vs[i][0],
                          cached_eig_entropy=vs[i][1])
            for i in range(BATCH)]
    emb_n = jnp.stack([e / jnp.clip(jnp.linalg.norm(e, -1, keepdims=True),
                                    min=1e-12) for e in embs])

    ckey = jax.random.fold_in(key, 1000)

    def clus():
        lab, num, fl = cluster_batch(
            ckey, emb_n, num_samples=5000, quantile=cfg.ms_quantile,
            iterations=cfg.ms_iterations,
            max_clusters=cfg.ms_max_clusters - 1,
            retry_factor=cfg.ms_retry_factor)
        return np.asarray(lab)
    t_clus = wall(clus)
    labels_np = np.asarray(cluster_batch(
        ckey, emb_n, num_samples=5000, quantile=cfg.ms_quantile,
        iterations=cfg.ms_iterations, max_clusters=cfg.ms_max_clusters - 1,
        retry_factor=cfg.ms_retry_factor)[0])

    def heads():
        pp = np.asarray(type_lp.argmax(-1))
        ep = np.asarray(jax.nn.softmax(edge_logits, -1))
        return pp, ep
    t_heads = wall(heads)
    pred_prim = np.asarray(type_lp.argmax(-1))

    def metric():
        return siou_matched_segments_usecd_batch(
            [batch["labels"][i].astype(np.int64) for i in range(BATCH)],
            [labels_np[i].astype(np.int64) for i in range(BATCH)],
            [pred_prim[i].astype(np.int64) for i in range(BATCH)],
            [batch["prim"][i].astype(np.int64) for i in range(BATCH)],
            [batch["points"][i] for i in range(BATCH)])
    t_metric = wall(metric)

    # --- the pipelined end-to-end call the bench times ---
    def e2e():
        return predict_shapes(model, params_type, params_inst, batch, cfg,
                              key=key, tta_fn=tta, forward_fn=fwd)
    t_e2e = wall(e2e)

    stages = [("idx1 first-layer graph", t_idx1),
              ("type forward (TTA off)", t_type),
              ("inst forward (shared idx1)", t_inst),
              ("spectral_embed x8 (affinity+LOBPCG+entropy)", t_spect),
              ("hpnet_process x8 (entropy weights + concat)", t_enrich),
              ("cluster_batch (bandwidth+50 iters+NMS+retry)", t_clus),
              ("argmax/softmax transfers", t_heads),
              ("siou_usecd metric batch (device+Hungarian)", t_metric)]
    tot = sum(t for _, t in stages)
    print(f"\n{'stage':48s} {'ms/batch8':>10s} {'ms/shape':>9s} {'%':>5s}")
    for name, t in stages:
        print(f"{name:48s} {t:10.1f} {t / BATCH:9.1f} {100 * t / tot:5.1f}")
    print(f"{'SUM of synced stages':48s} {tot:10.1f} {tot / BATCH:9.1f}")
    print(f"{'end-to-end predict_shapes (pipelined)':48s} {t_e2e:10.1f} "
          f"{t_e2e / BATCH:9.1f}")
    print(f"\nshapes/sec end-to-end: {BATCH / (t_e2e / 1e3):.2f}")


if __name__ == "__main__":
    main()
