"""Exactness audit of the clustering path at production scale (TPU).

Runs the full test-time clustering stack — HPNet spectral enrichment +
guarded mean-shift — at 10k points with fold5drop+rotation-style conditions,
and asserts:
  1. cluster-count stability across bandwidth-sampling seeds,
  2. label agreement between the fused Pallas mean-shift backend and the
     pure-XLA reference-shaped backend (Hungarian-matched IoU),
  3. IoU stability of the matched clustering vs ground truth across seeds.

Embeddings are oracle-style (one unit direction per GT segment + noise), so
the audit is deterministic and model-free while exercising the exact
production kernels at production shapes (SURVEY §7.4 item 3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/audit_clustering.py
Prints one JSON line with the audit numbers (also asserts the bounds).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def oracle_embedding(rng, labels, dim=128, noise=0.1):
    """One unit direction per GT segment + noise of TOTAL norm ~`noise`
    (per-dim sigma scaled by 1/sqrt(dim) so the within-cluster spread stays
    well under the cross-cluster ~sqrt(2) separation, like a trained
    embedding)."""
    k = labels.max() + 1
    dirs = rng.randn(k, dim)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    emb = dirs[labels] + (noise / np.sqrt(dim)) * rng.randn(
        labels.shape[0], dim)
    return (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(
        np.float32)


def matched_iou(a, b):
    from sednet_tpu.metrics import hungarian_match, relaxed_iou_fast, to_one_hot
    import jax.numpy as jnp

    cost = 1.0 - np.asarray(relaxed_iou_fast(
        jnp.asarray(to_one_hot(a)[None]), jnp.asarray(to_one_hot(b)[None])))[0]
    rows, cols = hungarian_match(cost)
    ious = []
    for r, c in zip(rows, cols):
        ia, ib = a == r, b == c
        if ia.sum() == 0 and ib.sum() == 0:
            continue
        ious.append((ia & ib).sum() / max((ia | ib).sum(), 1))
    return float(np.mean(ious)) if ious else 0.0


def main():
    import jax
    import jax.numpy as jnp

    from sednet_tpu.cluster import guard_mean_shift, hpnet_process
    from sednet_tpu.cluster.mean_shift import (compute_bandwidth,
                                               mean_shift_iterate, nms)
    from sednet_tpu.cluster.spectral import (compute_entropy,
                                             normal_affinity_topk,
                                             spectral_eigvecs)
    from sednet_tpu.data import make_synthetic_shape, normalize_points, pca_align

    n = 10000
    rng = np.random.RandomState(0)
    d = make_synthetic_shape(rng, n_points=n, n_segments=8)
    pts = normalize_points(d["points"])
    pts, nrm, _ = pca_align(pts, d["normals"])
    labels_gt = d["labels"].astype(np.int64)
    emb = oracle_embedding(rng, labels_gt)

    # HPNet spectral enrichment at production settings
    xyz = jnp.asarray(pts, jnp.float32)
    nj = jnp.asarray(nrm, jnp.float32)
    aff = normal_affinity_topk(xyz, nj, sigma=0.1, k=50)
    v = spectral_eigvecs(aff, jax.random.PRNGKey(0), k=12)
    ent = compute_entropy(v)
    enriched = hpnet_process(jnp.asarray(emb), xyz, nj, normal_smooth_w=0.5,
                             cached_eigvecs=v, cached_eig_entropy=ent)
    enriched = enriched / jnp.clip(
        jnp.linalg.norm(enriched, axis=-1, keepdims=True), min=1e-12)

    out = {"n_points": n, "gt_segments": int(labels_gt.max() + 1)}
    counts, ious, labels_by_seed = [], [], []
    for seed in range(3):
        res = guard_mean_shift(jax.random.PRNGKey(seed), enriched,
                               num_samples=5000, quantile=0.015,
                               iterations=50)
        lab = np.asarray(res.labels)
        counts.append(int(res.num_clusters))
        ious.append(matched_iou(labels_gt, lab))
        labels_by_seed.append(lab)
    out["cluster_counts_by_seed"] = counts
    out["iou_by_seed"] = [round(x, 4) for x in ious]

    # pallas vs xla backend drift at fixed bandwidth
    bw = jnp.clip(compute_bandwidth(jax.random.PRNGKey(0), enriched, 5000,
                                    jnp.float32(0.015)), min=0.003)
    shifted_p = mean_shift_iterate(enriched, bw, 50, backend="pallas")
    shifted_x = mean_shift_iterate(enriched, bw, 50, backend="xla")
    lp = np.asarray(nms(shifted_p, enriched, bw)[0])
    lx = np.asarray(nms(shifted_x, enriched, bw)[0])
    drift = float(np.abs(np.asarray(shifted_p) - np.asarray(shifted_x)).max())
    backend_iou = matched_iou(lp, lx)
    out["pallas_vs_xla_max_drift"] = drift
    out["pallas_vs_xla_label_iou"] = round(backend_iou, 6)

    # bf16-step drift (the opt-in config.ms_bf16 fast path): converged
    # positions move by O(bf16 quantization amplified through the kernel
    # exp); what gates enabling it is LABEL agreement after NMS
    shifted_b = mean_shift_iterate(enriched, bw, 50, backend="pallas",
                                   bf16=True)
    lb = np.asarray(nms(shifted_b, enriched, bw)[0])
    bf16_drift = float(np.abs(np.asarray(shifted_b)
                              - np.asarray(shifted_p)).max())
    bf16_iou = matched_iou(lp, lb)
    out["bf16_vs_f32_max_drift"] = bf16_drift
    out["bf16_vs_f32_label_iou"] = round(bf16_iou, 6)

    # converged-early exit A/B (commit 8e48577 made tol=1e-6 the eval-path
    # default AFTER the last on-chip audit — VERDICT r4 weak #5): at the
    # same fixed bandwidth, the while_loop early exit must reproduce the
    # fixed-trip labels on BOTH backends, and the position drift must stay
    # O(tol), far under the >=0.003 NMS bandwidth scale
    import time

    from sednet_tpu.cluster.mean_shift import DEFAULT_MS_TOL

    tol_ab = {"tol": DEFAULT_MS_TOL}
    for backend, l_fixed in (("xla", lx), ("pallas", lp)):
        shifted_t = mean_shift_iterate(enriched, bw, 50, backend=backend,
                                       tol=DEFAULT_MS_TOL)
        lt = np.asarray(nms(shifted_t, enriched, bw)[0])
        base = shifted_x if backend == "xla" else shifted_p
        tol_ab[f"{backend}_label_iou"] = round(matched_iou(l_fixed, lt), 6)
        tol_ab[f"{backend}_max_drift"] = float(
            np.abs(np.asarray(shifted_t) - np.asarray(base)).max())
        tol_ab[f"{backend}_clusters_fixed_vs_tol"] = [
            int(l_fixed.max() + 1), int(lt.max() + 1)]
        # wall delta (relay sync via host transfer; median of 5)
        t_fix, t_tol = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            r = mean_shift_iterate(enriched, bw, 50, backend=backend)
            _ = float(r[0, 0])
            t_fix.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r = mean_shift_iterate(enriched, bw, 50, backend=backend,
                                   tol=DEFAULT_MS_TOL)
            _ = float(r[0, 0])
            t_tol.append(time.perf_counter() - t0)
        tol_ab[f"{backend}_ms_fixed"] = round(np.median(t_fix) * 1e3, 1)
        tol_ab[f"{backend}_ms_tol"] = round(np.median(t_tol) * 1e3, 1)
    out["early_exit_ab"] = tol_ab

    print(json.dumps(out))
    assert max(counts) - min(counts) <= 1, counts
    assert min(ious) > 0.95, ious
    assert backend_iou > 0.999, backend_iou
    assert drift < 1e-3, drift
    assert bf16_iou > 0.999, bf16_iou
    assert tol_ab["xla_label_iou"] > 0.999, tol_ab
    assert tol_ab["pallas_label_iou"] > 0.999, tol_ab
    assert tol_ab["xla_max_drift"] < 1e-3, tol_ab
    assert tol_ab["pallas_max_drift"] < 1e-3, tol_ab
    # stderr: tpu_roundup.sh tees stdout into AUDIT_CLUSTER_r{N}.json, which
    # must stay pure JSONL.
    print("AUDIT OK", file=sys.stderr)


if __name__ == "__main__":
    main()
