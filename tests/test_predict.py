"""Inference pipeline tests: TTA math, end-to-end predict on synthetic data."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.config import Config
from sednet_tpu.data import write_parsenet_h5
from sednet_tpu.models import SEDNet
from sednet_tpu.predict import (SpectralCache, make_tta_type_log_prob,
                                predict_shapes, run_prediction)
from sednet_tpu.train import build_model


N, K = 100, 4


@pytest.fixture(scope="module")
def small_model():
    cfg = Config(num_points=N, knn=K, embed=16, hpnet_embed=False,
                 spectral_knn=10, spectral_eigvecs=4, ms_num_samples=N,
                 edge_topk=16)
    model = build_model(cfg)
    x = jnp.zeros((1, N, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return cfg, model, params


def _batch(rng, b=2):
    from sednet_tpu.data import make_synthetic_shape, normalize_points, pca_align

    items = []
    for _ in range(b):
        d = make_synthetic_shape(rng, n_points=N, n_segments=3)
        pts = normalize_points(d["points"])
        pts, nrm, _ = pca_align(pts, d["normals"])
        items.append({"points": pts.astype(np.float32),
                      "normals": nrm.astype(np.float32),
                      "labels": d["labels"], "prim": d["prim"]})
    return {k: np.stack([i[k] for i in items]) for k in items[0]}


def test_tta_plain_equals_forward(small_model, rng):
    cfg, model, params = small_model
    batch = _batch(rng, 1)
    x = jnp.asarray(np.concatenate([batch["points"], batch["normals"]], -1))
    plain = make_tta_type_log_prob(model, cfg, False, False)(params, x)
    direct = model.apply({"params": params}, x).type_log_prob
    np.testing.assert_allclose(np.asarray(plain), np.asarray(direct),
                               atol=1e-5)


def test_tta_multivote_averages(small_model, rng):
    cfg, model, params = small_model
    batch = _batch(rng, 1)
    x = jnp.asarray(np.concatenate([batch["points"], batch["normals"]], -1))
    mv = make_tta_type_log_prob(model, cfg, True, False)(params, x)

    def fwd(xx):
        return model.apply({"params": params}, xx).type_log_prob

    big = jnp.concatenate([x[..., :3] * 1.15, x[..., 3:]], -1)
    small = jnp.concatenate([x[..., :3] * 0.85, x[..., 3:]], -1)
    ref = (fwd(x) + fwd(big) + fwd(small)) / 3.0
    np.testing.assert_allclose(np.asarray(mv), np.asarray(ref), atol=1e-5)


def test_tta_fold5drop_scatters_votes(small_model, rng):
    cfg, model, params = small_model
    batch = _batch(rng, 1)
    x = jnp.asarray(np.concatenate([batch["points"], batch["normals"]], -1))
    drop = N // 5
    out = make_tta_type_log_prob(model, cfg, False, True,
                                 drop_num=drop)(params, x)

    def fwd(xx):
        return np.asarray(model.apply({"params": params}, xx).type_log_prob)

    ref = fwd(x).copy()
    votes = np.zeros_like(ref)
    for i in range(5):
        keep = np.r_[0: i * drop, (i + 1) * drop: N]
        votes[:, keep] += fwd(x[:, keep])
    ref += votes
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_tta_rotation_fold_combo(small_model, rng):
    """fold5drop + multi_vote: identity and y-flip rotations, each with the
    base + fold-drop votes, summed (reference:
    generate_predictions_aug.py:307-362)."""
    cfg, model, params = small_model
    batch = _batch(rng, 1)
    x = jnp.asarray(np.concatenate([batch["points"], batch["normals"]], -1))
    drop = N // 5
    out = make_tta_type_log_prob(model, cfg, True, True,
                                 drop_num=drop)(params, x)

    def fwd(xx):
        return np.asarray(model.apply({"params": params}, xx).type_log_prob)

    ref = np.zeros((1, N, 6), np.float32)
    for rot in (np.eye(3, dtype=np.float32),
                np.diag([-1, 1, -1]).astype(np.float32)):
        xr = np.concatenate([np.asarray(x)[..., :3] @ rot,
                             np.asarray(x)[..., 3:] @ rot], -1)
        cur = fwd(jnp.asarray(xr)).copy()
        for i in range(5):
            keep = np.r_[0: i * drop, (i + 1) * drop: N]
            cur[:, keep] += fwd(jnp.asarray(xr[:, keep]))
        ref += cur
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_predict_shapes_high_iou_with_oracle_embedding(rng):
    """With a model whose embedding head is replaced by an oracle (one-hot of
    gt segment), the pipeline must produce near-perfect instance IoU —
    validates clustering + matching + metrics wiring end to end."""
    from sednet_tpu.cluster import guard_mean_shift
    from sednet_tpu.metrics import siou_matched_segments_usecd, to_one_hot

    batch = _batch(rng, 1)
    gt = batch["labels"][0]
    emb = np.eye(8, dtype=np.float32)[gt] + 0.01 * rng.randn(N, 8).astype(
        np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    res = guard_mean_shift(jax.random.PRNGKey(0), jnp.asarray(emb),
                           num_samples=N, quantile=0.05, iterations=20)
    cluster_ids = np.asarray(res.labels)
    w = to_one_hot(cluster_ids, max(int(res.num_clusters), 1))
    s_iou, _, _, _, recall = siou_matched_segments_usecd(
        gt.astype(np.int64), cluster_ids,
        batch["prim"][0].astype(np.int64), batch["prim"][0].astype(np.int64),
        w, batch["points"][0])
    assert s_iou > 0.99
    assert recall == pytest.approx(1.0)


def test_run_prediction_end_to_end(tmp_path, small_model):
    cfg, model, params = small_model
    root = str(tmp_path)
    write_parsenet_h5(root, n_shapes=2, n_points=N)
    out_dir = os.path.join(root, "out")
    summary, results = run_prediction(
        cfg, data_root=root, save_viz=True, out_dir=out_dir, batch_size=2,
        params_type=params, params_inst=params, postproc=True)
    assert summary["n_shapes"] == 2
    assert np.isfinite(summary["inst_iou"])
    for sid in range(2):
        for suffix in ("inst", "type", "Vis_inst", "Vis_type", "edge",
                       "GT_points", "GT_inst", "GT_type"):
            assert os.path.exists(os.path.join(out_dir, f"{sid}_{suffix}.txt"))
        # postproc chain: parameters + intersection json + mesh dir
        assert os.path.exists(os.path.join(out_dir, "paras",
                                           f"param_{sid}.txt"))
        assert os.path.exists(os.path.join(out_dir, "paras",
                                           f"param_inter_lines_{sid}.json"))
        assert os.path.isdir(os.path.join(out_dir, f"{sid}_mesh"))


def test_spectral_cache_roundtrip(tmp_path):
    cache = SpectralCache(str(tmp_path), 0.1, 50)
    v = jnp.ones((10, 4))
    cache.put(3, v, jnp.float32(0.5))
    v2, ent = cache.get(3)
    np.testing.assert_allclose(np.asarray(v2), 1.0)
    assert float(ent) == 0.5
    assert cache.get(99) is None


def test_run_prediction_my_dataset_mesh_and_starts(tmp_path, small_model):
    """dataset=="my" tests on the EdgeDataset h5; --mesh shards shape
    batches over the 8-device CPU mesh; starts skips shapes and offsets ids;
    num_test caps the count (reference: generate_predictions_aug.py:69,
    90-98,176)."""
    import dataclasses

    from sednet_tpu.data import write_edge_h5

    cfg, model, params = small_model
    root = str(tmp_path)
    write_edge_h5(root, n_shapes=4, n_points=N)
    cfg2 = dataclasses.replace(cfg, dataset="my", num_test=2)
    out_dir = os.path.join(root, "out")
    summary, results = run_prediction(
        cfg2, data_root=root, save_viz=True, out_dir=out_dir, batch_size=8,
        params_type=params, params_inst=params, starts=1, mesh_devices=8)
    assert summary["n_shapes"] == 2  # capped by num_test, not the 3 left
    assert np.isfinite(summary["inst_iou"])
    # ids offset by starts: first saved shape is 1, shape 0 untouched
    assert os.path.exists(os.path.join(out_dir, "1_inst.txt"))
    assert not os.path.exists(os.path.join(out_dir, "0_inst.txt"))


def test_mesh_sharded_matches_single_device(tmp_path, small_model, rng):
    """The sharded clustering path must give the same metrics quality as the
    per-shape guard path on well-separated synthetic embeddings."""
    from sednet_tpu.parallel import make_mesh

    cfg, model, params = small_model
    batch = _batch(rng, 8)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(8)
    res_mesh = predict_shapes(model, params, params, batch, cfg, key=key,
                              mesh=mesh)
    res_one = predict_shapes(model, params, params, batch, cfg, key=key)
    assert len(res_mesh) == len(res_one) == 8
    for a, b in zip(res_mesh, res_one):
        assert np.isfinite(a["inst_iou"]) and np.isfinite(b["inst_iou"])


def test_mesh_partial_batch_with_hpnet(tmp_path, small_model):
    """The final partial batch is padded to the mesh size; the per-shape
    hpnet path must index shape_ids for padded rows too (regression: ids
    had the unpadded length -> IndexError on the last batch)."""
    import dataclasses

    cfg, model, params = small_model
    root = str(tmp_path)
    write_parsenet_h5(root, n_shapes=3, n_points=N)
    cfg2 = dataclasses.replace(cfg, hpnet_embed=True, num_test=3)
    out_dir = os.path.join(root, "out")
    summary, results = run_prediction(
        cfg2, data_root=root, save_viz=False, out_dir=out_dir, batch_size=8,
        params_type=params, params_inst=params, mesh_devices=8)
    assert summary["n_shapes"] == 3
    assert np.isfinite(summary["inst_iou"])


def test_tta_rotate_fold_combo_without_normals(rng):
    """mode-0 (xyz-only) inputs must survive the rotate+fold5 TTA branch
    (regression: x[..., 3:] @ rot raised on the empty channel block)."""
    import dataclasses

    from sednet_tpu.models import SEDNet
    from sednet_tpu.predict import make_tta_type_log_prob

    cfg2 = Config(num_points=100, knn=6, embed=16, normals=False, mode=0)
    model = SEDNet(mode=0, k=6)
    x = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    fn = make_tta_type_log_prob(model, cfg2, True, True, drop_num=20)
    lp = fn(params, x)
    assert lp.shape == (1, 100, 6)
    assert np.isfinite(np.asarray(lp)).all()


def test_predict_shapes_edgeless_model(rng):
    """edge_module=False models emit edge_logits=None; predict_shapes must
    substitute zero edge probabilities instead of crashing."""
    from sednet_tpu.models import SEDNet
    from sednet_tpu.predict import predict_shapes

    n = 128
    cfg2 = Config(num_points=n, knn=6, embed=16, normals=True,
                  hpnet_embed=False, edge_module=False)
    model = SEDNet(mode=5, k=6, edge_module=False)
    x6 = rng.randn(1, n, 6).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x6))["params"]
    batch = {
        "points": x6[..., :3], "normals": x6[..., 3:],
        "labels": np.zeros((1, n), np.int64),
        "prim": np.ones((1, n), np.int64),
    }
    res = predict_shapes(model, params, params, batch, cfg2,
                         key=jax.random.PRNGKey(1))
    assert len(res) == 1
    assert "edge_prob" not in res[0] or np.allclose(res[0]["edge_prob"], 0.0)


def test_tta_fold5drop_short_input_no_crash(small_model, rng):
    """Inputs shorter than one drop window get no fold votes instead of a
    zero-size forward (regression: folds clamped to >=1 dropped ALL
    points)."""
    cfg, model, params = small_model
    fn = make_tta_type_log_prob(model, cfg, False, True, drop_num=1000)
    x = jnp.asarray(rng.randn(1, N, cfg.normals * 3 + 3).astype(np.float32))
    lp = fn(params, x)
    assert lp.shape[:2] == (1, N)
    assert np.isfinite(np.asarray(lp)).all()


def test_stream_matches_per_batch_predict(small_model, rng):
    """predict_shapes_stream's double-buffered outputs must be IDENTICAL
    (labels, metrics, guard flags) to calling predict_shapes per batch
    with key=fold_in(key, batch_index) — the overlap is scheduling only."""
    from sednet_tpu.predict import make_forward, predict_shapes_stream

    cfg, model, params = small_model
    import dataclasses

    cfg2 = dataclasses.replace(cfg, hpnet_embed=True)
    key = jax.random.PRNGKey(11)
    batches = [_batch(rng, 2) for _ in range(3)]
    tta = make_tta_type_log_prob(model, cfg2, False, False)
    fwd = make_forward(model)

    seq = [predict_shapes(model, params, params, b, cfg2,
                          key=jax.random.fold_in(key, k),
                          tta_fn=tta, forward_fn=fwd)
           for k, b in enumerate(batches)]
    streamed = list(predict_shapes_stream(model, params, params, batches,
                                          cfg2, key=key, tta_fn=tta,
                                          forward_fn=fwd))
    assert len(streamed) == len(seq) == 3
    for rs, ss in zip(seq, streamed):
        for r, s in zip(rs, ss):
            np.testing.assert_array_equal(r["cluster_ids"], s["cluster_ids"])
            np.testing.assert_array_equal(r["pred_primitives"],
                                          s["pred_primitives"])
            assert r["inst_iou"] == s["inst_iou"]
            assert r["type_iou"] == s["type_iou"]
            assert r["inst_recall"] == s["inst_recall"]
            assert r["num_clusters"] == s["num_clusters"]
            assert r["guard_capped"] == s["guard_capped"]
