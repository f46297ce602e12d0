"""Instance re-clustering: split over-merged instances.

Rebuild of reference Fitting_patches_and_edges/inst_cluster.py:27-105 —
instances holding more than `ratio_thresh` of the shape's points are
re-clustered by mean-shift over L2-normalized [normals, points,
one-hot(type)] features (bandwidth quantile 0.5, 25 iterations), and the
resulting sub-clusters receive fresh instance ids.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sednet_tpu.cluster import mean_shift


def resplit_instances(points: np.ndarray, normals: np.ndarray,
                      insts: np.ndarray, types: np.ndarray, *,
                      ratio_thresh: float = 0.15, num_types: int = 6,
                      quantile: float = 0.5, iterations: int = 25,
                      max_instances: int = 50,
                      key=None) -> np.ndarray:
    """Returns a new instance-label array; small instances unchanged,
    oversized ones split by mean-shift sub-clustering."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n = points.shape[0]
    out = insts.copy()
    used = set(np.unique(insts).tolist())
    free = [i for i in range(max_instances) if i not in used]

    for k, pid in enumerate(np.unique(insts)):
        mask = insts == pid
        if mask.sum() < n * ratio_thresh or not free:
            continue
        one_hot = np.eye(num_types, dtype=np.float32)[
            np.clip(types[mask], 0, num_types - 1)]
        feats = np.concatenate([normals[mask], points[mask, :3], one_hot], 1)
        feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
        # num_samples is a static jit argument of mean_shift: bucket to a
        # power of two so distinct instance sizes reuse compilations
        ns = 8
        while ns < feats.shape[0] // 4:
            ns *= 2
        res = mean_shift(jax.random.fold_in(key, k), jnp.asarray(feats),
                         num_samples=ns,
                         quantile=quantile, iterations=iterations)
        sub = np.asarray(res.labels)
        n_sub = int(res.num_clusters)
        if n_sub <= 1:
            continue
        # keep the original id for sub-cluster 0, allocate fresh ids for rest
        for s in range(1, n_sub):
            if not free:
                break
            new_id = free.pop(0)
            sel = np.zeros(n, bool)
            sel[np.nonzero(mask)[0][sub == s]] = True
            out[sel] = new_id
    return out
