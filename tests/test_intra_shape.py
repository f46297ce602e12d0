"""Point-axis (intra-shape) parallelism tests on the virtual 8-device mesh.

ring_knn and mean_shift_iterate_sharded must reproduce the single-device
ops exactly (up to distance-tie order) while never materializing the
global N x N tensors — SURVEY §2.9/§5's sequence-parallel equivalent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sednet_tpu.parallel import make_mesh
from sednet_tpu.parallel.intra_shape import (mean_shift_iterate_sharded,
                                             ring_knn)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_ring_knn_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    idx, dist = ring_knn(x, 8, mesh)
    d_full = np.sum((np.asarray(x)[:, None] - np.asarray(x)[None]) ** 2, -1)
    ref_idx = np.argsort(d_full, axis=1)[:, :8]
    ref_d = np.sort(d_full, axis=1)[:, :8]
    np.testing.assert_allclose(np.asarray(dist), ref_d, atol=1e-3)
    # indices may differ on exact distance ties only
    got_d = np.take_along_axis(d_full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_d, ref_d, atol=1e-3)


def test_ring_knn_points_normals_metric(mesh):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((512, 6)).astype(np.float32)
    x[:, 3:] /= np.linalg.norm(x[:, 3:], axis=1, keepdims=True)
    idx, dist = ring_knn(jnp.asarray(x), 12, mesh,
                         metric="points_normals", normal_metric_w=1.0)
    dp = np.sum((x[:, None, :3] - x[None, :, :3]) ** 2, -1)
    dn = 2.0 - 2.0 * (x[:, 3:] @ x[:, 3:].T)
    d_full = dp * (1.0 + dn)
    ref_d = np.sort(d_full, axis=1)[:, :12]
    np.testing.assert_allclose(np.asarray(dist), ref_d, atol=1e-3)


def test_ring_knn_rejects_indivisible(mesh):
    with pytest.raises(ValueError):
        ring_knn(jnp.zeros((1001, 3)), 4, mesh)


def test_mean_shift_sharded_matches_single_device(mesh):
    from sednet_tpu.cluster.mean_shift import mean_shift_iterate

    rng = np.random.default_rng(2)
    emb = rng.standard_normal((512, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    x = jnp.asarray(emb)
    bw = jnp.float32(0.3)
    ref = mean_shift_iterate(x, bw, iterations=10, backend="xla")
    got = mean_shift_iterate_sharded(x, bw, mesh, iterations=10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_knn_serves_nms_clustering(mesh):
    """End-to-end: sharded mean-shift feeds the standard NMS and recovers
    the ground-truth clusters."""
    from sednet_tpu.cluster.mean_shift import nms

    rng = np.random.default_rng(3)
    kcl, n = 4, 512
    dirs = rng.standard_normal((kcl, 32))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lbl = rng.integers(0, kcl, n)
    emb = dirs[lbl] + 0.02 * rng.standard_normal((n, 32))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    x = jnp.asarray(emb.astype(np.float32))
    shifted = mean_shift_iterate_sharded(x, jnp.float32(0.2), mesh,
                                         iterations=30)
    labels, _, num = nms(shifted, x, jnp.float32(0.2))
    assert int(num) == kcl
    # cluster labels must be a relabeling of the ground truth
    got = np.asarray(labels)
    for c in range(kcl):
        vals = np.unique(got[lbl == c])
        assert vals.shape[0] == 1


def test_big_sednet_forward_matches_model_apply(rng):
    """The point-axis-sharded forward must reproduce model.apply on the
    same params to float tolerance: same Dense kernels, same GroupNorm
    stats (now psum'd across shards by GSPMD), same head wiring."""
    import jax.numpy as jnp

    from sednet_tpu.models import SEDNet
    from sednet_tpu.parallel import big_sednet_forward, make_mesh

    n, k = 256, 8
    mesh = make_mesh(8)
    model = SEDNet(mode=5, k=k, emb_size=16)
    pts = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    x = jnp.asarray(np.concatenate([pts, nrm], -1))
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]

    ref = model.apply({"params": params}, x[None])
    out = big_sednet_forward(params, x, mesh, k=k, mode=5)
    np.testing.assert_allclose(np.asarray(out.embedding),
                               np.asarray(ref.embedding[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.type_log_prob),
                               np.asarray(ref.type_log_prob[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.edge_logits),
                               np.asarray(ref.edge_logits[0]), atol=2e-4)


def test_big_cloud_segment_end_to_end(rng):
    """64k-capability path at test scale: sharded forward -> sharded
    mean-shift -> NMS produces a valid labelling on a multi-segment
    synthetic cloud."""
    import jax.numpy as jnp

    from sednet_tpu.data import make_synthetic_shape
    from sednet_tpu.models import SEDNet
    from sednet_tpu.parallel import big_cloud_segment, make_mesh

    n, k = 512, 8
    mesh = make_mesh(8)
    model = SEDNet(mode=5, k=k, emb_size=16)
    d = make_synthetic_shape(rng, n_points=n, n_segments=4)
    x = jnp.asarray(np.concatenate(
        [d["points"], d["normals"]], -1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]
    labels, num, types, edges = big_cloud_segment(
        params, x, mesh, jax.random.PRNGKey(1), k=k,
        iterations=10, bandwidth_samples=n)
    labels = np.asarray(labels)
    assert labels.shape == (n,)
    assert 1 <= int(num) <= n
    assert labels.min() >= 0 and labels.max() < int(num)
    assert np.asarray(types).shape == (n,)


def test_big_cloud_segment_hpnet_matches_single_device(rng):
    """hpnet=True on the sharded path must reproduce the single-device
    enrichment + clustering: same hpnet_enrich math (sorted-transpose
    matfree spectral) on the same forward embedding, so the label
    partition agrees up to collective reduction-order noise."""
    import jax.numpy as jnp

    from sednet_tpu.cluster.mean_shift import compute_bandwidth, nms, \
        mean_shift_iterate
    from sednet_tpu.cluster.spectral import default_transpose_mode, \
        hpnet_enrich
    from sednet_tpu.data import make_synthetic_shape
    from sednet_tpu.models import SEDNet
    from sednet_tpu.parallel import big_cloud_segment, big_sednet_forward, \
        make_mesh

    n, k = 512, 8
    mesh = make_mesh(8)
    model = SEDNet(mode=5, k=k, emb_size=16)
    d = make_synthetic_shape(rng, n_points=n, n_segments=4)
    x = jnp.asarray(np.concatenate(
        [d["points"], d["normals"]], -1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]

    key = jax.random.PRNGKey(1)
    labels, num, _, _ = big_cloud_segment(
        params, x, mesh, key, k=k, iterations=10, bandwidth_samples=n,
        hpnet=True, spectral_knn=12, spectral_eigvecs=4)
    labels = np.asarray(labels)
    assert labels.shape == (n,)
    assert 1 <= int(num) <= n

    # single-device reference with the same keys
    out = big_sednet_forward(params, x, mesh, k=k, mode=5)
    _, ekey = jax.random.split(key)
    emb = hpnet_enrich(np.asarray(out.embedding), x[:, :3], x[:, 3:6],
                       ekey, knn=12, eig_k=4,
                       transpose_mode=default_transpose_mode())
    bw = jnp.clip(compute_bandwidth(key, emb, n, jnp.float32(0.015)),
                  min=0.003)
    shifted = mean_shift_iterate(emb, bw, 10)
    ref_labels = np.asarray(nms(shifted, emb, bw)[0])
    # identical partition (compact ids may permute)
    mapping = {}
    for a, b in zip(labels.tolist(), ref_labels.tolist()):
        assert mapping.setdefault(a, b) == b, (a, b)
    assert len(set(mapping.values())) == len(mapping)
