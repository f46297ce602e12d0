"""Decompose cluster_batch's wall time: bandwidth vs 50-iter shift vs NMS.

The ref-default eval profile (scripts/profile_ref_eval.py) shows
cluster_batch at ~450 ms/batch-8 while the batched Pallas shift step alone
accounts for ~130 ms — this script times the three sub-stages with forced
syncs to locate the remainder. Run on the attached TPU:

    python scripts/profile_cluster.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wall(fn, reps=3):
    fn()
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

    from sednet_tpu.cluster.mean_shift import (_batched_shift,
                                               compute_bandwidth,
                                               cluster_batch, nms)

    B, N, E = 8, 10000, 128
    rng = np.random.RandomState(0)
    # cluster-structured unit embeddings (the real input regime): 8 blobs
    centers = rng.randn(8, E).astype(np.float32)
    lab = rng.randint(0, 8, size=(B, N))
    e = centers[lab] + 0.05 * rng.randn(B, N, E).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    x = jnp.asarray(e)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)
    q = jnp.float32(0.015)

    t_bw = wall(lambda: np.asarray(jnp.stack(
        [compute_bandwidth(keys[i], x[i], 5000, q) for i in range(B)])))
    bw = jnp.stack([jnp.clip(compute_bandwidth(keys[i], x[i], 5000, q),
                             min=0.003) for i in range(B)])

    t_shift = wall(lambda: np.asarray(
        _batched_shift(keys, x, q, 5000, 50)[0][0, 0]))
    shifted = _batched_shift(keys, x, q, 5000, 50)[0]

    def run_nms():
        rs = [nms(shifted[i], x[i], bw[i]) for i in range(B)]
        return np.asarray(jnp.stack([r[2] for r in rs]))
    t_nms = wall(run_nms)

    def e2e():
        lab, num, fl = cluster_batch(key, x, num_samples=5000,
                                     quantile=0.015, iterations=50,
                                     max_clusters=49)
        return np.asarray(lab)
    t_e2e = wall(e2e)

    print(f"\n{'stage':40s} {'ms/batch8':>10s} {'ms/shape':>9s}")
    for name, t in (("bandwidth x8 (pallas kth-NN)", t_bw),
                    ("batched shift 50 iters (pallas)", t_shift),
                    ("nms x8 (3 blocked colmax passes)", t_nms)):
        print(f"{name:40s} {t:10.1f} {t / B:9.1f}")
    print(f"{'SUM':40s} {t_bw + t_shift + t_nms:10.1f}")
    print(f"{'cluster_batch end-to-end':40s} {t_e2e:10.1f} {t_e2e / B:9.1f}")


if __name__ == "__main__":
    main()
