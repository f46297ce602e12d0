"""Residual evaluation harness tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.data.synthetic import make_synthetic_shape
from sednet_tpu.fit import (
    Evaluation,
    FittingModule,
    match,
    p_coverage,
    separate_losses,
    weights_normalize,
)
from sednet_tpu.fit.residuals import residual_loss


def test_match_identity(rng):
    labels = rng.randint(0, 4, 200)
    rows, cols, ut, up = match(labels, labels)
    for r, c in zip(rows, cols):
        if r < 4:
            assert r == c
    assert set(ut) == set(up) == {0, 1, 2, 3}


def test_weights_normalize_range(rng):
    w = jnp.asarray(rng.rand(5, 100).astype(np.float32))
    p = np.asarray(weights_normalize(w, 0.1))
    assert np.isfinite(p).all()
    assert p.min() >= -1e-6
    assert p.max() <= 1.0 + 1e-5


def test_separate_losses_split_and_clamp():
    gt = {0: np.zeros((200, 3)), 1: np.zeros((200, 3)), 2: None,
          3: np.zeros((50, 3))}
    distance = {0: ["plane", 0.01], 1: ["open-spline", 5.0],
                3: ["plane", 0.2]}
    total, geom, spline = separate_losses(distance, gt, lamb=1.0)
    assert geom == pytest.approx(0.01)
    assert spline == pytest.approx(0.1)   # 5.0 clamped to 0.1
    assert total == pytest.approx((0.01 + 0.1) / 2)


def test_p_coverage_perfect_plane(rng):
    pts = rng.rand(500, 3).astype(np.float32)
    pts[:, 2] = 0.0
    params = {0: ["plane", jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(0.0)]}
    mean_d, cover = p_coverage(pts, params)
    # guard_sqrt floors squared distances at 1e-5 (reference src/guard.py),
    # so a perfect fit reads sqrt(1e-5) ~= 0.0032
    assert mean_d < 0.005
    assert cover == pytest.approx(1.0)


def test_residual_eval_mode_on_synthetic(rng):
    d = make_synthetic_shape(rng, n_points=600, n_segments=3)
    ev = Evaluation(FittingModule(grid_size=5, sample_grid=10, k=4))
    # oracle clustering == gt labels; predicted types == gt types
    loss, params, distance = ev.residual_eval_mode(
        d["points"], d["normals"], d["labels"].astype(np.int64),
        d["labels"].astype(np.int64), d["prim"].astype(np.int64))
    total, geom, spline = loss
    assert geom is not None and geom < 0.02  # sqrt residuals, tight fits
    fitted = [v for v in params.values() if v is not None]
    assert len(fitted) >= 2
    mean_d, cover = p_coverage(d["points"], params)
    assert cover > 0.5


def test_residual_train_mode_on_synthetic(rng):
    d = make_synthetic_shape(rng, n_points=600, n_segments=3)
    ev = Evaluation(FittingModule(grid_size=5, sample_grid=10, k=4))
    k = 3
    centers_emb = np.eye(k, dtype=np.float32)[d["labels"]]
    # center-point similarity (K, N): 1 for own cluster
    weights = jnp.asarray(np.eye(k, dtype=np.float32)[:, d["labels"]])
    loss, params, distance = ev.residual_train_mode(
        d["points"], d["normals"], d["labels"].astype(np.int64),
        d["labels"].astype(np.int64), d["prim"].astype(np.int64),
        weights, bw=0.1)
    total, geom, spline = loss
    assert geom is not None and np.isfinite(geom)


def test_residual_loss_batched_matches_scalar(rng):
    """The padded batched residual path must reproduce residual_loss for
    every primitive family at mixed segment sizes (and sqrt mode)."""
    from sednet_tpu.fit.residuals import residual_loss_batched

    def unit(v):
        return v / np.linalg.norm(v)

    params = {
        0: ("plane", unit(rng.randn(3)).astype(np.float32),
            np.float32(0.3)),
        1: ("sphere", rng.randn(3).astype(np.float32), np.float32(0.8)),
        2: ("cylinder", unit(rng.randn(3)).astype(np.float32),
            rng.randn(3).astype(np.float32), np.float32(0.5)),
        3: ("cone", rng.randn(3).astype(np.float32),
            unit(rng.randn(3)).astype(np.float32), np.float32(0.4)),
        4: ("torus", rng.randn(3).astype(np.float32),
            rng.randn(3).astype(np.float32), np.float32(0.9),
            np.float32(0.2)),
        5: ("open-spline",
            rng.randn(400, 3).astype(np.float32)),
        6: None,  # degenerate segment must be skipped by both
    }
    pts = {k: rng.randn(50 + 37 * k, 3).astype(np.float32)
           for k in params}
    for sqrt in (False, True):
        ref = residual_loss(pts, params, sqrt=sqrt)
        got = residual_loss_batched(pts, params, sqrt=sqrt)
        assert set(ref) == set(got)
        for k in ref:
            assert ref[k][0] == got[k][0]
            np.testing.assert_allclose(float(got[k][1]), float(ref[k][1]),
                                       rtol=2e-4, atol=1e-6)


def test_residual_eval_batch_matches_per_shape(rng):
    """residual_eval_batch must reproduce residual_eval_mode shape by
    shape (same matches, fits, residuals — only the device-call batching
    differs)."""
    from sednet_tpu.data import make_synthetic_shape
    from sednet_tpu.fit import Evaluation, FittingModule

    ev = Evaluation(FittingModule())
    items = []
    for i in range(2):
        d = make_synthetic_shape(np.random.RandomState(10 + i),
                                 n_points=600, n_segments=4)
        items.append({
            "points": d["points"].astype(np.float32),
            "normals": d["normals"].astype(np.float32),
            "labels": d["labels"].astype(np.int64),
            "cluster_ids": d["labels"].astype(np.int64),
            "pred_primitives": d["prim"].astype(np.int64),
        })
    batch = ev.residual_eval_batch(items)
    assert len(batch) == 2
    for it, (loss_b, par_b, dist_b) in zip(items, batch):
        loss_s, par_s, dist_s = ev.residual_eval_mode(
            it["points"], it["normals"], it["labels"], it["cluster_ids"],
            it["pred_primitives"])
        assert set(dist_b) == set(dist_s)
        for k in dist_s:
            assert dist_b[k][0] == dist_s[k][0]
            np.testing.assert_allclose(float(dist_b[k][1]),
                                       float(dist_s[k][1]),
                                       rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(loss_b[0], loss_s[0], rtol=2e-4,
                                   atol=1e-6)
