"""Fitting-driver tests: dispatch, guards, spline forward, refit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.data.synthetic import sample_cylinder, sample_plane, sample_sphere
from sednet_tpu.fit import (
    FittingModule,
    distance_from_cylinder,
    distance_from_plane,
    fit_one_shape,
    optimize_spline_kronecker,
    remove_outliers,
    up_sample_points_in_range,
)
from sednet_tpu.models import SplineNet


@pytest.fixture(scope="module")
def fitter():
    f = FittingModule(grid_size=5, sample_grid=10, k=4)
    x = jnp.zeros((1, 120, 3), jnp.float32)
    params = f.splinenet.init(jax.random.PRNGKey(0), x)
    f.open_params = params
    f.closed_params = params
    return f


def test_remove_outliers(rng):
    pts = rng.randn(200, 3).astype(np.float32) * 0.1
    pts[:5] += 10.0  # gross outliers
    kept = remove_outliers(pts)
    assert kept.shape[0] <= 195
    assert np.abs(kept).max() < 5.0


def test_up_sample_in_range(rng):
    pts = rng.randn(50, 3).astype(np.float32)
    w = np.ones(50, np.float32)
    p2, w2 = up_sample_points_in_range(pts, w, 120, 150, rng)
    assert p2.shape == (150, 3)
    assert w2.shape == (150,)
    p3, w3 = up_sample_points_in_range(rng.randn(500, 3).astype(np.float32),
                                       np.ones(500, np.float32), 120, 150, rng)
    assert p3.shape == (150, 3)


def test_fit_one_shape_dispatch(rng, fitter):
    pl_pts, pl_nrm, _ = sample_plane(rng, 300)
    cy_pts, cy_nrm, _ = sample_cylinder(rng, 300)
    sp_pts, sp_nrm, _ = sample_sphere(rng, 150)
    segments = [
        {"id": 0, "label": 1, "points": pl_pts, "normals": pl_nrm},
        {"id": 1, "label": 4, "points": cy_pts, "normals": cy_nrm},
        {"id": 2, "label": 5, "points": sp_pts, "normals": sp_nrm},
        {"id": 3, "label": 1, "points": pl_pts[:10], "normals": pl_nrm[:10]},
        {"id": 4, "label": 2, "points": pl_pts[:50], "normals": pl_nrm[:50]},
    ]
    params, recon = fit_one_shape(segments, fitter)
    assert params[0][0] == "plane"
    assert params[1][0] == "cylinder"
    assert params[2][0] == "sphere"
    assert params[3] is None  # <20 points
    assert params[4] is None  # spline with <100 points
    res = float(distance_from_plane(jnp.asarray(pl_pts, jnp.float32),
                                    params[0][1], params[0][2]))
    assert res < 1e-4
    res_cy = float(distance_from_cylinder(jnp.asarray(cy_pts, jnp.float32),
                                          *params[1][1:]))
    assert res_cy < 1e-3


def test_fit_one_shape_spline_paths(rng, fitter):
    pts, nrm, _ = sample_plane(rng, 200)
    segments = [
        {"id": 0, "label": 2, "points": pts, "normals": nrm},   # open spline
        {"id": 1, "label": 0, "points": pts, "normals": nrm},   # closed
    ]
    params, recon = fit_one_shape(segments, fitter, eval_mode=False)
    assert params[0][0] == "open-spline"
    assert recon[0].shape == (100, 3)           # 10x10 sample grid
    assert params[1][0] == "closed-spline"
    assert recon[1].shape == (110, 3)           # 10x10 + wrapped first row
    assert np.isfinite(np.asarray(recon[0])).all()


def test_fit_one_shape_eval_resamples(rng, fitter):
    pts, nrm, _ = sample_plane(rng, 150)
    segments = [{"id": 0, "label": 2, "points": pts, "normals": nrm}]
    params, recon = fit_one_shape(segments, fitter, eval_mode=True)
    assert params[0][0] == "open-spline"


def test_optimize_spline_kronecker_projects_to_cloud(rng):
    # predicted surface offset from the true plane; refit should pull it back
    u, v = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10))
    recon = np.stack([u, v, 0.3 + np.zeros_like(u)], -1).reshape(-1, 3)
    cloud = np.stack([u, v, np.zeros_like(u)], -1).reshape(-1, 3)
    out = optimize_spline_kronecker(recon.astype(np.float32),
                                    cloud.astype(np.float32), new_cp=4,
                                    grid=10)
    assert abs(out[:, 2]).max() < 0.05
