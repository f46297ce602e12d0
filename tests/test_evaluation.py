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
