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


def test_matfree_transpose_modes_agree(rng):
    """The scatter-free A^T v layout ("sorted" segment-sum) must
    reproduce the scatter baseline: same subspace from LOBPCG and, more
    directly, the same reduction values as numpy. A cumsum-prefix-diff
    variant was rejected here — the quirk-mode affinity's rsq ~1e6 range
    destroys its precision (rel-err > 1 on this very fixture)."""
    from sednet_tpu.cluster.spectral import (_sorted_transpose_layout,
                                             normal_affinity_sparse,
                                             spectral_eigvecs_matfree)

    n, k, m = 70, 9, 5
    xyz = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    idx, w, rsq = (np.asarray(a) for a in normal_affinity_sparse(
        jnp.asarray(xyz), jnp.asarray(nrm), k=k))
    coef = w * rsq[idx] * rsq[:, None]
    v = rng.randn(n, m).astype(np.float32)

    # numpy reference A^T v
    atv_ref = np.zeros((n, m), np.float32)
    np.add.at(atv_ref, idx.reshape(-1),
              (coef[..., None] * v[:, None, :]).reshape(-1, m))

    src_s, coef_s, dest_s, ends = (np.asarray(a) for a in
                                   _sorted_transpose_layout(
                                       jnp.asarray(idx), jnp.asarray(coef)))
    vals = coef_s[:, None] * v[src_s]
    atv_sorted = np.asarray(jax.ops.segment_sum(
        jnp.asarray(vals), jnp.asarray(dest_s), num_segments=n,
        indices_are_sorted=True))
    np.testing.assert_allclose(atv_sorted, atv_ref, rtol=2e-4, atol=1e-5)

    # the segmented-scan reduction (the TPU route past the dense cap —
    # pairwise adds only, so it survives the same 1e6-range fixture)
    from sednet_tpu.cluster.spectral import _segment_sum_sorted_scan

    atv_scan = np.asarray(_segment_sum_sorted_scan(
        jnp.asarray(vals), jnp.asarray(dest_s), n, jnp.asarray(ends)))
    np.testing.assert_allclose(atv_scan, atv_ref, rtol=2e-4, atol=1e-5)

    # the fused one-pass Pallas form of the same reduction (interpret
    # mode off-TPU), on the identical quirk-range fixture
    from sednet_tpu.ops.pallas_kernels import segsum_sorted_scan_pallas

    atv_pl = np.asarray(segsum_sorted_scan_pallas(
        jnp.asarray(vals.T), jnp.asarray(dest_s), jnp.asarray(ends),
        interpret=True))
    np.testing.assert_allclose(atv_pl, atv_ref, rtol=2e-4, atol=1e-5)

    # Eigvec-LEVEL cross-mode agreement is fundamentally not a valid
    # invariant here (measured, round 4): the reference's farthest-
    # neighbour quirk affinity has extremely LOCALIZED top eigenvectors
    # (on a structured 256-pt 4-segment fixture the dense-eigh truth
    # subspace's median row norm is 0.0), so after the row
    # normalization most rows are pure noise and any ulp-level
    # summation-order change flips them — scatter-vs-eigh itself
    # differs by 2.0 in row-Gram. The invariant that matters is the
    # DOWNSTREAM one: the enriched embedding feeds guarded mean-shift,
    # and the label partition must agree across every transpose mode.
    from sednet_tpu.cluster import guard_mean_shift
    from sednet_tpu.cluster.spectral import hpnet_enrich
    from sednet_tpu.data import make_synthetic_shape

    d = make_synthetic_shape(np.random.RandomState(5), n_points=256,
                             n_segments=4)
    xyz2 = jnp.asarray(d["points"].astype(np.float32))
    nrm2 = jnp.asarray(d["normals"].astype(np.float32))
    lab = d["labels"].astype(np.int64)
    oh = np.zeros((256, 8), np.float32)
    oh[np.arange(256), lab] = 1.0
    oh += 0.05 * np.random.RandomState(1).randn(*oh.shape)
    oh /= np.linalg.norm(oh, axis=1, keepdims=True)
    emb0 = jnp.asarray(oh.astype(np.float32))
    outs = {}
    for mode in ("scatter", "sorted", "scan", "pallas", "vocab"):
        e = hpnet_enrich(emb0, xyz2, nrm2, jax.random.PRNGKey(2), knn=12,
                         eig_k=4, transpose_mode=mode)
        res = guard_mean_shift(jax.random.PRNGKey(3), e, num_samples=256,
                               quantile=0.015, iterations=30)
        outs[mode] = (np.asarray(res.labels), int(res.num_clusters))
    k_gt = int(np.unique(lab).shape[0])
    for mode, (l, num) in outs.items():
        assert num == k_gt, (mode, num, k_gt)
        assert (l == outs["scatter"][0]).all(), mode


def test_vocab_layout_matvec_exact(rng):
    """The compact-column "vocab" layout must reproduce BOTH matvec
    directions within the f32-reassociation class (the matmuls run at
    Precision.HIGHEST precisely because the default MXU path's bf16
    input rounding costs 2.8e-3 on the quirk affinity's 1e6 range —
    measured; this test would catch that regression)."""
    from sednet_tpu.cluster.spectral import (_default_vocab_cap,
                                             _vocab_layout,
                                             normal_affinity_sparse)
    from sednet_tpu.data import make_synthetic_shape

    d = make_synthetic_shape(np.random.RandomState(7), n_points=800)
    xyz = jnp.asarray(d["points"].astype(np.float32))
    nrm = jnp.asarray(d["normals"].astype(np.float32))
    idx, w, rsq = normal_affinity_sparse(xyz, nrm, k=20)
    coef = w * rsq[idx] * rsq[:, None]
    n = xyz.shape[0]
    u_cap = _default_vocab_cap(n)
    targets, a_c, n_unique = _vocab_layout(idx, coef, n, u_cap)
    assert int(n_unique) <= u_cap  # CAD fixture vocab fits the cap

    # the compact slab IS the operator: densify both and compare exactly
    idx_n, coef_n = np.asarray(idx), np.asarray(coef, np.float64)
    a_ref = np.zeros((n, n))
    np.add.at(a_ref, (np.broadcast_to(np.arange(n)[:, None],
                                      idx_n.shape).ravel(),
                      idx_n.ravel()), coef_n.ravel())
    tg = np.asarray(targets)
    a_vo = np.zeros((n, n))
    a_vo[:, tg[tg < n]] = np.asarray(a_c, np.float64)[:, tg < n]
    np.testing.assert_array_equal(a_ref, a_vo)

    # matvec values vs f64 numpy, f32-class tolerance
    v = rng.randn(n, 6).astype(np.float32)
    av64 = a_ref @ v.astype(np.float64)
    atv64 = a_ref.T @ v.astype(np.float64)
    from jax import lax
    hi = lax.Precision.HIGHEST
    vj = jnp.asarray(v)
    t_valid = (targets < n)[:, None]
    tv = jnp.where(t_valid, vj[jnp.minimum(targets, n - 1)], 0.0)
    av = lax.dot_general(a_c, tv, (((1,), (0,)), ((), ())), precision=hi)
    atc = lax.dot_general(a_c, vj, (((0,), (0,)), ((), ())), precision=hi)
    atv = jnp.zeros_like(vj).at[targets].add(atc, mode="drop")
    den = np.abs(av64).max()
    assert np.abs(np.asarray(av) - av64).max() / den < 3e-6
    den = np.abs(atv64).max()
    assert np.abs(np.asarray(atv) - atv64).max() / den < 3e-6


def test_vocab_mode_overflow_falls_back(rng):
    """A vocab cap smaller than the shape's unique-target count must
    flip the in-jit lax.cond to the per-edge scatter formulation — the
    cap affects speed, never values. Asserted at MATVEC level (eager,
    op-for-op identical to the scatter-mode expressions) because
    post-LOBPCG eigvec comparison is not a valid invariant here (the
    quirk affinity's localized eigvecs amplify any reassociation — see
    test_matfree_transpose_modes_agree). The full solve is also run to
    pin that the overflow path composes with LOBPCG."""
    from sednet_tpu.cluster.spectral import (_vocab_matvec,
                                             normal_affinity_sparse,
                                             spectral_eigvecs_matfree)
    from sednet_tpu.data import make_synthetic_shape

    d = make_synthetic_shape(np.random.RandomState(9), n_points=300,
                             n_segments=4)
    xyz = jnp.asarray(d["points"].astype(np.float32))
    nrm = jnp.asarray(d["normals"].astype(np.float32))
    idx, w, rsq = normal_affinity_sparse(xyz, nrm, k=10)
    coef = w * rsq[idx] * rsq[:, None]
    n = xyz.shape[0]
    assert np.unique(np.asarray(idx)).size > 8  # cap=8 must overflow

    v = jnp.asarray(rng.randn(n, 5).astype(np.float32))
    got = _vocab_matvec(idx, coef, n, u_cap=8)(v)
    av = (v[idx] * coef[..., None]).sum(1)
    atv = jnp.zeros_like(v).at[idx.reshape(-1)].add(
        (coef[..., None] * v[:, None, :]).reshape(-1, 5))
    # ulp-class only: the cond-compiled branch fuses the k-reduction
    # slightly differently than the op-by-op eager reference (measured
    # max rel 1.8e-7); anything beyond f32 reassociation would mean the
    # fallback predicate picked the (8-column, wrong) vocab slab, whose
    # error on this fixture is O(1).
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(0.5 * (av + atv)),
                               rtol=1e-6, atol=1e-10)

    u_vo = spectral_eigvecs_matfree(xyz, nrm, jax.random.PRNGKey(4),
                                    knn=10, k=4, transpose_mode="vocab",
                                    vocab_cap=8)
    assert np.isfinite(np.asarray(u_vo)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(u_vo), axis=1), 1.0, atol=1e-4)


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


def test_guard_mean_shift_reports_cap_telemetry():
    """The 16-retry fold and the bandwidth lane cap deviate from the
    reference's unbounded retry (generate_predictions_aug.py:25-35); the
    result must FLAG when either bound actually bound so predict can count
    affected shapes (VERDICT r2 weak #6)."""
    rng = np.random.default_rng(0)
    k, n, dim = 12, 480, 24
    dirs = rng.standard_normal((k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    emb = dirs[rng.integers(0, k, n)] + 0.01 * rng.standard_normal((n, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # retry_factor ~1 cannot shrink the count -> cap fires
    res = guard_mean_shift(jax.random.PRNGKey(0), jnp.asarray(
        emb.astype(np.float32)), num_samples=n, quantile=0.015,
        iterations=20, max_clusters=4, retry_factor=1.0 + 1e-6)
    assert bool(res.capped)
    assert int(res.tries) == 16
    # a healthy embedding reports no divergence
    x, _ = _sphere_clusters(np.random.RandomState(1), 4, 100)
    ok = guard_mean_shift(jax.random.PRNGKey(1), x, num_samples=400,
                          quantile=0.05, iterations=30, max_clusters=10)
    assert not bool(ok.capped)
    assert not bool(ok.bw_capped)
    assert int(ok.tries) == 0


def test_predict_surfaces_guard_counters(rng):
    """predict_shapes/run_prediction must carry the guard flags through to
    per-shape results and the summary."""
    from sednet_tpu.config import Config
    from sednet_tpu.models import SEDNet
    from sednet_tpu.predict import predict_shapes
    from sednet_tpu.data import make_synthetic_shape

    n = 100
    cfg = Config(num_points=n, knn=4, embed=16, hpnet_embed=False,
                 ms_num_samples=n, edge_topk=16)
    model = SEDNet(mode=5, k=4)
    items = []
    for _ in range(2):
        d = make_synthetic_shape(rng, n_points=n, n_segments=3)
        items.append(d)
    batch = {k: np.stack([i[k] for i in items]).astype(
        np.float32 if k in ("points", "normals") else np.int64)
        for k in ("points", "normals", "labels", "prim")}
    x = jnp.asarray(np.concatenate(
        [batch["points"], batch["normals"]], -1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    res = predict_shapes(model, params, params, batch, cfg,
                         key=jax.random.PRNGKey(0))
    for r in res:
        assert "guard_capped" in r and "guard_bw_capped" in r
        assert isinstance(r["guard_capped"], bool)


def test_hpnet_enrich_matches_process_composition(rng):
    """hpnet_enrich == normalize(hpnet_process(emb, cached_eigvecs=matfree
    eigvecs)) for the embedding+eigvecs call shape — the batched predict
    path must not drift from the per-shape one."""
    from sednet_tpu.cluster.spectral import (hpnet_enrich,
                                             spectral_eigvecs_matfree)

    n = 120
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm)
    emb = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    key = jax.random.PRNGKey(3)
    e1 = hpnet_enrich(emb, xyz, nrm, key, knn=10, eig_k=4)
    v = spectral_eigvecs_matfree(xyz, nrm, key, knn=10, k=4)
    e2 = hpnet_process(emb, xyz, nrm, cached_eigvecs=v)
    e2 = e2 / jnp.clip(jnp.linalg.norm(e2, axis=-1, keepdims=True),
                       min=1e-12)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_neighbor_idx_blocked_matches_dense(rng):
    """The blocked CPU fallback of _neighbor_idx must select the same
    neighbour SETS as a dense argsort, both farthest (reference quirk) and
    nearest modes."""
    from sednet_tpu.cluster.spectral import _neighbor_idx

    n, k = 200, 8
    xyz = rng.randn(n, 3).astype(np.float32)
    d = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    for nearest in (True, False):
        idx = np.asarray(_neighbor_idx(jnp.asarray(xyz), k, nearest))
        order = np.argsort(d, axis=1)
        want = order[:, :k] if nearest else order[:, ::-1][:, :k]
        for i in range(n):
            got_d = np.sort(d[i, idx[i]])
            want_d = np.sort(d[i, want[i]])
            np.testing.assert_allclose(got_d, want_d, atol=1e-5)


def test_normal_affinity_matches_scatter_construction(rng):
    """The scatter-free row-blocked build (commit ab32cdf) must equal the
    reference construction — scatter -> 1e-12 background fill -> D^-1/2 A
    D^-1/2 -> (a+aT)/2 (smooth_normal_matrix.py:84-92) — from the SAME
    neighbour sets, including rows whose gaussian weights underflow to
    exactly 0 in f32 (antipodal normals in farthest mode)."""
    from sednet_tpu.cluster.spectral import _neighbor_idx

    n, k, sigma = 700, 50, 0.1
    xyz = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    # force exact-zero weights: half the normals point away from the rest
    nrm[: n // 2] *= -1.0
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    a = np.asarray(normal_affinity_topk(jnp.asarray(xyz), jnp.asarray(nrm),
                                        k=k, sigma=sigma))

    idx = np.asarray(_neighbor_idx(jnp.asarray(xyz), k, False))
    cos = np.clip(np.einsum("nc,nkc->nk", nrm, nrm[idx]), -0.99, 0.99)
    w = np.exp(-np.arccos(cos) ** 2 / (2 * sigma * sigma)).astype(np.float32)
    # XLA flushes subnormal exp results to 0; numpy keeps them — mimic XLA
    # so the comparison isolates the matrix CONSTRUCTION
    w[w < np.finfo(np.float32).tiny] = 0.0
    assert (w == 0).any(), "fixture must exercise underflowed weights"
    p = np.zeros((n, n), np.float32)
    np.add.at(p, (np.broadcast_to(np.arange(n)[:, None], idx.shape), idx), w)
    p = np.where(p == 0, 1e-12, p)
    d = 1.0 / np.sqrt(p.sum(-1))
    p = p * d[:, None] * d[None, :]
    ref = (p + p.T) / 2
    # guarantee: exact up to rounding PLUS one ulp of the 1e-12 background
    # (the (w - 1e-12)/2 + background trick cancels at weights << 1e-12 —
    # seven orders below the fill floor, invisible to LOBPCG)
    bound = 2e-5 * np.abs(ref) + 2e-19 * np.outer(d, d)
    assert (np.abs(a - ref) <= bound).all(), (
        f"max excess {(np.abs(a - ref) - bound).max():.3e}")
    np.testing.assert_array_equal(a, a.T)  # bitwise symmetric


def test_spectral_eigvecs_bf16_affinity_path(rng):
    """On TPU the affinity is STORED in bf16 (bitwise-identical matvecs
    there — the MXU rounds f32 dot inputs to bf16 anyway; see
    normal_affinity_topk). Pin that the solver's callable path accepts a
    bf16 matrix and produces finite, unit-row f32 eigvecs."""
    from sednet_tpu.cluster.spectral import spectral_eigvecs

    n = 96
    m = rng.randn(n, n).astype(np.float32) * 0.01
    m = m @ m.T + np.eye(n, dtype=np.float32)
    v = spectral_eigvecs(jnp.asarray(m).astype(jnp.bfloat16),
                         jax.random.PRNGKey(0), k=4)
    v = np.asarray(v)
    assert v.dtype == np.float32 and v.shape == (n, 4)
    assert np.isfinite(v).all()
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # same operator in f32: the row-normalized eigvecs must span the same
    # subspace on CPU up to bf16 entry rounding of a well-conditioned
    # matrix (this fixture's spectrum is far from degenerate)
    v32 = np.asarray(spectral_eigvecs(jnp.asarray(m),
                                      jax.random.PRNGKey(0), k=4))
    gram = v.T @ v32
    s = np.linalg.svd(gram, compute_uv=False)
    assert s.min() > 0.9


def test_mean_shift_early_exit_matches_fixed_trip(rng):
    # eval-path converged-early exit (cluster/mean_shift._iterate_until):
    # identical labels and O(tol) positions vs the reference's fixed-trip
    # 50-iteration loop on a realistic noisy fixture
    x, gt = _sphere_clusters(rng, 4, 60, dim=12, noise=0.15)
    key = jax.random.PRNGKey(3)
    full = mean_shift(key, x, num_samples=240, quantile=0.05,
                      iterations=50, tol=0.0)
    early = mean_shift(key, x, num_samples=240, quantile=0.05,
                       iterations=50, tol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.labels),
                                  np.asarray(early.labels))
    assert float(jnp.max(jnp.abs(full.shifted - early.shifted))) < 1e-4
    assert int(full.num_clusters) == int(early.num_clusters)


def test_mean_shift_early_exit_pallas_backend_parity(rng):
    # ADVICE r4: the early-exit while_loop must also hold for the Pallas
    # step (interpret mode — the same path tests/test_pallas.py pins for
    # the fixed-trip loop)
    from sednet_tpu.cluster.mean_shift import mean_shift_iterate, nms

    x, _ = _sphere_clusters(rng, 4, 60, dim=12, noise=0.15)
    bw = jnp.float32(0.35)
    full = mean_shift_iterate(x, bw, 50, backend="pallas", interpret=True,
                              tol=0.0)
    early = mean_shift_iterate(x, bw, 50, backend="pallas", interpret=True,
                               tol=1e-6)
    assert float(jnp.max(jnp.abs(full - early))) < 1e-4
    lf, _, nf = nms(full, x, bw)
    le, _, ne = nms(early, x, bw)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(le))
    assert int(nf) == int(ne)


def test_batched_shift_early_exit_batch_global(rng):
    # batch-global exit semantics (_batched_shift): the while_loop runs
    # until EVERY shape converges — a tight shape paired with a noisy one
    # must still match the fixed-trip positions on both rows
    from sednet_tpu.cluster.mean_shift import _iterate_until
    from sednet_tpu.ops.pallas_kernels import mean_shift_step_pallas_batched

    xa, _ = _sphere_clusters(rng, 3, 40, dim=8, noise=0.02)  # converges fast
    xb, _ = _sphere_clusters(rng, 4, 30, dim=8, noise=0.2)   # converges slow
    x = jnp.stack([xa, xb])
    bw = jnp.asarray([0.3, 0.4], jnp.float32)

    def step(new_x):
        return mean_shift_step_pallas_batched(new_x, x, bw, interpret=True)

    full = _iterate_until(step, x, 50, 0.0)
    early = _iterate_until(step, x, 50, 1e-6)
    assert float(jnp.max(jnp.abs(full - early))) < 1e-4


def test_guard_mean_shift_early_exit_label_parity(rng):
    x, gt = _sphere_clusters(rng, 3, 50, dim=8, noise=0.1)
    key = jax.random.PRNGKey(11)
    a = guard_mean_shift(key, x, num_samples=150, quantile=0.05,
                         iterations=50, tol=0.0)
    b = guard_mean_shift(key, x, num_samples=150, quantile=0.05,
                         iterations=50)  # default tol=1e-6
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
