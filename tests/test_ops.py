"""Numeric parity tests for core ops vs brute-force numpy references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.ops import (
    chamfer_distance,
    chamfer_index,
    edge_features,
    gather_neighbors,
    guard_exp,
    guard_sqrt,
    knn_indices,
    knn_indices_points_normals,
    nn_distance,
    pairwise_sqdist,
)


def brute_knn(x, k, metric=None):
    # x: (B, N, D)
    out = []
    for xb in x:
        if metric is None:
            d = ((xb[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
        else:
            d = metric(xb)
        out.append(np.argsort(d, axis=-1, kind="stable")[:, :k])
    return np.stack(out)


def test_pairwise_sqdist(rng):
    q = rng.randn(17, 3).astype(np.float32)
    p = rng.randn(33, 3).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(q), jnp.asarray(p)))
    ref = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


@pytest.mark.parametrize("n", [100, 257])
def test_knn_matches_bruteforce(rng, n):
    x = rng.randn(2, n, 3).astype(np.float32)
    k = 8
    idx = np.asarray(knn_indices(jnp.asarray(x), k, row_block=64))
    ref = brute_knn(x, k)
    # compare neighbour *sets* per point (ties may reorder)
    for b in range(2):
        for i in range(n):
            assert set(idx[b, i].tolist()) == set(ref[b, i].tolist()), (b, i)
    # nearest neighbour of each point is itself
    assert (idx[..., 0] == np.arange(n)[None, :]).all()


def test_knn_points_normals_metric(rng):
    pts = rng.randn(1, 60, 3).astype(np.float32)
    nrm = rng.randn(1, 60, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    x = np.concatenate([pts, nrm], -1)
    w = 1.0

    def metric(xb):
        p, nv = xb[:, :3], xb[:, 3:]
        dp = ((p[:, None] - p[None]) ** 2).sum(-1)
        dn = 2 - 2 * nv @ nv.T
        return dp * (1 + w * dn)

    idx = np.asarray(
        knn_indices_points_normals(jnp.asarray(x), 6, row_block=32, normal_metric_w=w)
    )
    ref = brute_knn(x, 6, metric=metric)
    for i in range(60):
        assert set(idx[0, i].tolist()) == set(ref[0, i].tolist()), i


def test_knn_hier_matches_exact(rng):
    # N large enough to trigger the hierarchical path (needs >= 2 chunks)
    x = rng.randn(1, 4096, 3).astype(np.float32)
    hier = np.asarray(knn_indices(jnp.asarray(x), 16, method="hier"))
    exact = np.asarray(knn_indices(jnp.asarray(x), 16, method="exact"))
    for i in range(0, 4096, 97):
        assert set(hier[0, i].tolist()) == set(exact[0, i].tolist()), i


def test_knn_dilation(rng):
    x = rng.randn(1, 64, 3).astype(np.float32)
    idx_full = np.asarray(knn_indices(jnp.asarray(x), 16, 16))
    idx_dil = np.asarray(knn_indices(jnp.asarray(x), 8, 16))
    np.testing.assert_array_equal(idx_dil, idx_full[..., ::2])


def test_edge_features(rng):
    x = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 10, 3)).astype(np.int32)
    f = np.asarray(edge_features(jnp.asarray(x), jnp.asarray(idx)))
    assert f.shape == (2, 10, 3, 8)
    for b in range(2):
        for i in range(10):
            for kk in range(3):
                nbr = x[b, idx[b, i, kk]]
                np.testing.assert_allclose(f[b, i, kk, :4], nbr - x[b, i], atol=1e-6)
                np.testing.assert_allclose(f[b, i, kk, 4:], x[b, i], atol=1e-6)


def test_nn_distance_bruteforce(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    y = rng.randn(2, 37, 3).astype(np.float32)
    d1, d2, i1, i2 = (np.asarray(a) for a in nn_distance(jnp.asarray(x), jnp.asarray(y)))
    for b in range(2):
        full = ((x[b][:, None] - y[b][None]) ** 2).sum(-1)
        np.testing.assert_allclose(d1[b], full.min(1), atol=1e-4)
        np.testing.assert_allclose(d2[b], full.min(0), atol=1e-4)
        np.testing.assert_array_equal(i1[b], full.argmin(1))
        np.testing.assert_array_equal(i2[b], full.argmin(0))


def test_chamfer_zero_for_same_cloud(rng):
    x = rng.randn(1, 30, 3).astype(np.float32)
    c = chamfer_distance(jnp.asarray(x), jnp.asarray(x))
    assert float(c) < 1e-6


@jax.enable_x64(True)
def test_chamfer_grad_matches_finite_difference(rng):
    x = jnp.asarray(rng.randn(1, 12, 3).astype(np.float64))
    y = jnp.asarray(rng.randn(1, 9, 3).astype(np.float64))

    f = lambda a, b: chamfer_distance(a, b)
    g = jax.grad(f, argnums=(0, 1))(x, y)
    eps = 1e-5
    for arg in range(2):
        arrs = [x, y]
        gnum = np.zeros_like(np.asarray(arrs[arg]))
        it = np.nditer(gnum, flags=["multi_index"])
        while not it.finished:
            idx = it.multi_index
            a_p = arrs[arg].at[idx].add(eps)
            a_m = arrs[arg].at[idx].add(-eps)
            args_p = [x, y]
            args_p[arg] = a_p
            args_m = [x, y]
            args_m[arg] = a_m
            gnum[idx] = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            it.iternext()
        np.testing.assert_allclose(np.asarray(g[arg]), gnum, atol=1e-5)


def test_guards():
    assert float(guard_exp(jnp.asarray(100.0))) == pytest.approx(np.exp(75.0), rel=1e-5)
    assert float(guard_sqrt(jnp.asarray(-1.0))) == pytest.approx(np.sqrt(1e-5), rel=1e-5)
