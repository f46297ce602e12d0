"""Flash top-k Pallas kernel: exactness vs the XLA top-k path, both metrics,
cross-set queries, and the factored edge-conv identity.

Runs in interpret mode on the CPU test mesh; the same kernel compiles via
Mosaic on TPU (exercised by bench.py and the predict pipeline there).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sednet_tpu.ops.flash_topk import (pallas_topk_supported,
                                       topk_neighbors_pallas, topk_pallas)
from sednet_tpu.ops.knn import knn_indices, knn_indices_points_normals


def _sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


@pytest.mark.parametrize("n,d,k", [(512, 3, 64), (1000, 6, 50),
                                   (300, 64, 128), (129, 3, 8), (128, 3, 1)])
def test_self_knn_matches_exact(rng, n, d, k):
    x = rng.randn(n, d).astype(np.float32)
    idx = np.asarray(topk_neighbors_pallas(jnp.asarray(x), k, interpret=True))
    ref = np.asarray(knn_indices(jnp.asarray(x)[None], k, method="exact")[0])
    d2 = _sqdist(x, x)
    got = np.sort(np.take_along_axis(d2, idx, 1), 1)
    want = np.sort(np.take_along_axis(d2, ref, 1), 1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # nearest-first ordering
    raw = np.take_along_axis(d2, idx, 1)
    assert (np.diff(raw, axis=1) >= -1e-5).all()
    # self is the nearest neighbour
    assert (idx[:, 0] == np.arange(n)).all()


def test_points_normals_metric_matches(rng):
    x = rng.randn(400, 6).astype(np.float32)
    x[:, 3:] /= np.linalg.norm(x[:, 3:], axis=1, keepdims=True)
    idx = np.asarray(topk_pallas(jnp.asarray(x), jnp.asarray(x), 64,
                                 metric="points_normals", interpret=True))
    ref = np.asarray(knn_indices_points_normals(
        jnp.asarray(x)[None], 64, method="hier")[0])
    dp = _sqdist(x[:, :3], x[:, :3])
    dn = 2.0 - 2.0 * x[:, 3:] @ x[:, 3:].T
    d2 = dp * (1.0 + dn)
    got = np.sort(np.take_along_axis(d2, idx, 1), 1)
    want = np.sort(np.take_along_axis(d2, ref, 1), 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cross_set_queries(rng):
    q = rng.randn(200, 3).astype(np.float32)
    p = rng.randn(500, 3).astype(np.float32)
    idx, dist = topk_pallas(jnp.asarray(q), jnp.asarray(p), 3,
                            interpret=True, return_distances=True)
    idx, dist = np.asarray(idx), np.asarray(dist)
    d2 = _sqdist(q, p)
    want_idx = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_allclose(np.take_along_axis(d2, idx, 1),
                               np.take_along_axis(d2, want_idx, 1), atol=1e-4)
    np.testing.assert_allclose(dist, np.take_along_axis(d2, idx, 1),
                               atol=1e-4)


def test_batched_vmap(rng):
    x = rng.randn(3, 256, 3).astype(np.float32)
    idx = np.asarray(topk_neighbors_pallas(jnp.asarray(x), 16,
                                           interpret=True))
    ref = np.asarray(knn_indices(jnp.asarray(x), 16, method="exact"))
    for b in range(3):
        d2 = _sqdist(x[b], x[b])
        np.testing.assert_allclose(
            np.sort(np.take_along_axis(d2, idx[b], 1), 1),
            np.sort(np.take_along_axis(d2, ref[b], 1), 1), atol=1e-4)


def test_duplicate_points_ties(rng):
    """Duplicated points create exact distance ties; the selected distance
    multiset must still match the exact path."""
    base = rng.randn(64, 3).astype(np.float32)
    x = np.concatenate([base, base, base, base], 0)  # 256 pts, 4x duplicates
    idx = np.asarray(topk_neighbors_pallas(jnp.asarray(x), 8, interpret=True))
    d2 = _sqdist(x, x)
    got = np.sort(np.take_along_axis(d2, idx, 1), 1)
    want = np.sort(d2, axis=1)[:, :8]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # no duplicate indices within a row
    assert all(len(set(row)) == len(row) for row in idx)


def test_supported_predicate():
    assert pallas_topk_supported(10000, 6, 64)
    assert pallas_topk_supported(10000, 128, 64)
    assert not pallas_topk_supported(10000, 6, 129)
    assert not pallas_topk_supported(200000, 128, 64)


def test_edge_conv_factorization_identity(rng):
    """edge_conv_features == dense(edge_features) with shared parameters."""
    import flax.linen as nn

    from sednet_tpu.ops.graph import edge_conv_features, edge_features

    class Both(nn.Module):
        @nn.compact
        def __call__(self, x, idx):
            dense = nn.Dense(16, use_bias=False, name="conv")
            return (edge_conv_features(x, idx, dense),
                    dense(edge_features(x, idx)))

    x = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (2, 64, 8)).astype(np.int32))
    m = Both()
    v = m.init(jax.random.PRNGKey(0), x, idx)
    fast, slow = m.apply(v, x, idx)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-5, rtol=1e-5)


def test_largest_mode_matches_xla(rng):
    """largest=True selects the k FARTHEST rows — the spectral enrichment's
    reference quirk (smooth_normal_matrix.py:33-39)."""
    x = rng.randn(300, 3).astype(np.float32)
    idx = np.asarray(topk_pallas(jnp.asarray(x), jnp.asarray(x), 16,
                                 largest=True, interpret=True))
    d2 = _sqdist(x, x)
    want = np.sort(d2, axis=1)[:, -16:]
    got = np.sort(np.take_along_axis(d2, idx, 1), 1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # farthest-first ordering
    raw = np.take_along_axis(d2, idx, 1)
    assert (np.diff(raw, axis=1) <= 1e-5).all()
    _, dist = topk_pallas(jnp.asarray(x), jnp.asarray(x), 16, largest=True,
                          interpret=True, return_distances=True)
    np.testing.assert_allclose(np.asarray(dist), raw, atol=1e-4)


def test_batched_queries_shared_point_set():
    """Docstring contract: q (B, M, D) with a single shared p (N, D)."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((200, 3)).astype(np.float32))
    idx = topk_pallas(q, p, 4, interpret=True)
    assert idx.shape == (2, 64, 4)
    d = np.sum((np.asarray(q)[:, :, None] - np.asarray(p)[None, None]) ** 2,
               -1)
    ref = np.argsort(d, axis=-1)[..., :4]
    got_d = np.take_along_axis(d, np.asarray(idx), axis=-1)
    ref_d = np.take_along_axis(d, ref, axis=-1)
    np.testing.assert_allclose(got_d, ref_d, atol=1e-5)
