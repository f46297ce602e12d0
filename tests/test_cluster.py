"""Clustering tests: mean-shift recovers planted clusters; NMS bookkeeping;
guarded retry; spectral entropy matches a numpy re-derivation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.cluster import (
    compute_bandwidth,
    guard_mean_shift,
    hpnet_process,
    mean_shift,
    normal_affinity_topk,
)
from sednet_tpu.cluster.spectral import compute_entropy, spectral_eigvecs


def _sphere_clusters(rng, n_clusters, per_cluster, dim=16, noise=0.05):
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts, labels = [], []
    for i, c in enumerate(centers):
        p = c + noise * rng.randn(per_cluster, dim)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        pts.append(p)
        labels.append(np.full(per_cluster, i))
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            np.concatenate(labels))


def _cluster_agreement(pred, gt):
    """Fraction of points whose predicted cluster maps 1:1 onto gt majority."""
    acc = 0
    for c in np.unique(pred):
        mask = pred == c
        vals, counts = np.unique(gt[mask], return_counts=True)
        acc += counts.max()
    return acc / len(gt)


def test_mean_shift_recovers_planted_clusters(rng):
    x, gt = _sphere_clusters(rng, 4, 50)
    res = mean_shift(jax.random.PRNGKey(0), x, num_samples=200, quantile=0.05,
                     iterations=30)
    pred = np.asarray(res.labels)
    assert int(res.num_clusters) == 4
    assert _cluster_agreement(pred, gt) > 0.99
    # labels are compact: 0..num_clusters-1
    assert set(np.unique(pred)) == set(range(int(res.num_clusters)))


def test_bandwidth_positive_and_scales(rng):
    x, _ = _sphere_clusters(rng, 2, 100, noise=0.01)
    b1 = float(compute_bandwidth(jax.random.PRNGKey(0), x, 200,
                                 jnp.float32(0.05)))
    b2 = float(compute_bandwidth(jax.random.PRNGKey(0), x, 200,
                                 jnp.float32(0.5)))
    assert 0 < b1 < b2


@pytest.mark.parametrize("quantile", [0.05, 0.8])
def test_bandwidth_pallas_matches_xla(rng, quantile):
    """The TPU bandwidth path (Pallas partial top-k + big-k lax.cond
    fallback) must agree with the dense XLA path; quantile=0.8 drives the
    traced k past the 128-lane cap, exercising the fallback branch."""
    x, _ = _sphere_clusters(rng, 3, 80, noise=0.03)
    key = jax.random.PRNGKey(1)
    b_xla = float(compute_bandwidth(key, x, 240, jnp.float32(quantile),
                                    method="xla"))
    b_pal = float(compute_bandwidth(key, x, 240, jnp.float32(quantile),
                                    method="pallas", interpret=True))
    assert b_pal == pytest.approx(b_xla, rel=2e-5)


def test_guard_mean_shift_caps_clusters(rng):
    # scatter points uniformly -> tiny bandwidth would give many clusters
    x = rng.randn(300, 8).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    res = guard_mean_shift(jax.random.PRNGKey(1), jnp.asarray(x),
                           num_samples=300, quantile=0.015, iterations=10,
                           max_clusters=20, retry_factor=2.0)
    assert int(res.num_clusters) <= 20
    assert float(res.quantile) >= 0.015 - 1e-6


def test_mean_shift_is_differentiable(rng):
    x, _ = _sphere_clusters(rng, 2, 20, dim=8)

    def f(x):
        res = mean_shift(jax.random.PRNGKey(0), x, num_samples=40,
                         quantile=0.1, iterations=5)
        return jnp.sum(res.shifted ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_compute_entropy_matches_numpy(rng):
    feat = rng.randn(60, 5).astype(np.float32)
    got = float(compute_entropy(jnp.asarray(feat), row_block=16))

    interval = feat.max(0) - feat.min(0)
    diff = (feat[:, None, :] - feat[None, :, :]) / interval
    dst = np.linalg.norm(diff, axis=2)
    avg = dst.sum() / (60 * 60)
    alpha = -np.log(0.5) / avg
    s = np.exp(-alpha * dst)
    eps = 1e-7
    ent = -s * np.log(s + eps) - (1 - s) * np.log(1 - s + eps)
    ref = ent.sum() / (60 * 60)
    assert got == pytest.approx(ref, rel=1e-3)


def test_normal_affinity_symmetric_normalized(rng):
    xyz = rng.randn(80, 3).astype(np.float32)
    nrm = rng.randn(80, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    a = np.asarray(normal_affinity_topk(jnp.asarray(xyz), jnp.asarray(nrm), k=10))
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    assert (a >= 0).all()
    assert np.isfinite(a).all()


def test_spectral_eigvecs_shape(rng):
    xyz = rng.randn(64, 3).astype(np.float32)
    nrm = rng.randn(64, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    a = normal_affinity_topk(jnp.asarray(xyz), jnp.asarray(nrm), k=8)
    v = spectral_eigvecs(a, jax.random.PRNGKey(0), k=4, iters=10)
    assert v.shape == (64, 4)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(v, axis=-1)), 1.0, atol=1e-4)


def test_matfree_matvec_matches_dense(rng):
    from sednet_tpu.cluster.spectral import (normal_affinity_sparse,
                                             spectral_eigvecs_matfree)

    n = 60
    xyz = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    idx, w, rsq = (np.asarray(a) for a in normal_affinity_sparse(
        jnp.asarray(xyz), jnp.asarray(nrm), k=8))
    a = np.zeros((n, n))
    for i in range(n):
        for j in range(8):
            a[i, idx[i, j]] += rsq[i] * w[i, j] * rsq[idx[i, j]]
    a_sym = 0.5 * (a + a.T)

    # validate the implicit operator against the dense reconstruction
    rows = np.broadcast_to(np.arange(n)[:, None], idx.shape)
    rv = rng.randn(n, 4).astype(np.float32)

    def matvec_dense(v):
        return a_sym @ v

    # re-derive the matvec exactly as spectral_eigvecs_matfree does
    gathered = rv[idx] * (w * rsq[idx])[..., None]
    av_half = rsq[:, None] * gathered.sum(1)
    contrib = (w * rsq[idx])[..., None] * (rsq[:, None] * rv)[:, None, :]
    atv = np.zeros_like(rv)
    np.add.at(atv, idx.reshape(-1), contrib.reshape(-1, 4))
    got = 0.5 * (av_half + atv)
    np.testing.assert_allclose(got, matvec_dense(rv), rtol=1e-3, atol=1e-5)

    # and the full path runs and returns finite row-normalized vectors
    v = spectral_eigvecs_matfree(jnp.asarray(xyz), jnp.asarray(nrm),
                                 jax.random.PRNGKey(0), knn=8, k=4, iters=15)
    v = np.asarray(v)
    assert v.shape == (n, 4)
    assert np.isfinite(v).all()
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)


def test_hpnet_process_concat_shapes(rng):
    n = 64
    emb = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tlp = jax.nn.log_softmax(jnp.asarray(rng.randn(n, 6).astype(np.float32)))
    el = jnp.asarray(rng.randn(n, 2).astype(np.float32))
    out = hpnet_process(emb, xyz, jnp.asarray(nrm), type_log_prob=tlp,
                        edge_logits=el, eig_k=4, key=jax.random.PRNGKey(0))
    assert out.shape == (n, 16 + 4 + 8)
    assert np.isfinite(np.asarray(out)).all()


def test_guard_mean_shift_caps_overlimit_labels():
    """When retries cannot reduce the cluster count, the guard must clamp
    labels under max_clusters instead of emitting ids that crash the
    one-hot metric stack (regression: labels >= 50 -> IndexError)."""
    rng = np.random.default_rng(0)
    k, n, dim = 12, 480, 24
    dirs = rng.standard_normal((k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    emb = dirs[rng.integers(0, k, n)] + 0.01 * rng.standard_normal((n, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    res = guard_mean_shift(jax.random.PRNGKey(0), jnp.asarray(
        emb.astype(np.float32)), num_samples=n, quantile=0.015,
        iterations=20, max_clusters=4, retry_factor=1.0 + 1e-6)
    labels = np.asarray(res.labels)
    assert int(res.num_clusters) <= 4
    assert labels.max() < 4
    assert labels.min() >= 0
