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


def test_batched_fit_matches_individual(rng):
    """fit_all_types_batched with padding == the individual fits."""
    from sednet_tpu.fit.primitives import (fit_all_types_batched, fit_cone,
                                           fit_cylinder, fit_plane,
                                           fit_sphere)

    pl_pts, pl_nrm, _ = sample_plane(rng, 300)
    cy_pts, cy_nrm, _ = sample_cylinder(rng, 211)
    segs = [(pl_pts, pl_nrm, np.abs(rng.rand(300)).astype(np.float32) + 0.1),
            (cy_pts, cy_nrm, np.ones(211, np.float32))]
    p_max, s_pad = 512, 8
    pts = np.zeros((s_pad, p_max, 3), np.float32)
    nrm = np.zeros((s_pad, p_max, 3), np.float32)
    w = np.zeros((s_pad, p_max), np.float32)
    for i, (p, n, ww) in enumerate(segs):
        pts[i, : p.shape[0]] = p
        nrm[i, : p.shape[0]] = n
        w[i, : p.shape[0]] = ww
    out = fit_all_types_batched(jnp.asarray(pts), jnp.asarray(nrm),
                                jnp.asarray(w))
    for i, (p, n, ww) in enumerate(segs):
        pj, nj, wj = map(jnp.asarray, (p, n, ww))
        a, d = fit_plane(pj, wj)
        np.testing.assert_allclose(out["plane"][0][i], a, atol=1e-4)
        np.testing.assert_allclose(out["plane"][1][i], d, atol=1e-4)
        c, r = fit_sphere(pj, wj)
        np.testing.assert_allclose(out["sphere"][0][i], c, atol=1e-3)
        np.testing.assert_allclose(out["sphere"][1][i], r, atol=1e-3)
        ax, c, r = fit_cylinder(pj, nj, wj)
        np.testing.assert_allclose(np.abs(out["cylinder"][0][i] @ ax), 1.0,
                                   atol=1e-3)
        if i == 1:
            # cone fit is only well-posed on the cylinder segment (a plane's
            # identical normals make the cone-axis SVD degenerate, so padded
            # and unpadded runs may pick different arbitrary axes there)
            apex, ax, th = fit_cone(pj, nj, wj)
            np.testing.assert_allclose(out["cone"][2][i], th, atol=5e-3)
            np.testing.assert_allclose(out["cone"][0][i], apex, atol=5e-3)
    # padding rows produce finite (discarded) results
    for name, vals in out.items():
        for v in vals:
            assert np.isfinite(np.asarray(v)).all(), name


def test_outlier_mask_keeps_weights_aligned(rng):
    """Weights must be filtered by the keep mask, not truncated by count
    (the round-1 bug dropped trailing weights regardless of which points
    were removed)."""
    pts = rng.randn(200, 3).astype(np.float32) * 0.1
    pts[7] += 10.0
    pts[130] += 10.0  # interior outliers
    kept, keep = remove_outliers(pts, return_mask=True)
    w = np.arange(200, dtype=np.float32)
    assert not keep[7] and not keep[130]
    np.testing.assert_array_equal(w[keep], np.arange(200)[keep])
    assert kept.shape[0] == keep.sum()


def test_fit_one_shape_single_compiled_geometric_call(rng, fitter):
    """Segments with different point counts inside one bucket share one
    compiled fit (no per-segment-size retrace)."""
    from sednet_tpu.fit import primitives as P

    pl_pts, pl_nrm, _ = sample_plane(rng, 300)
    segments = [
        {"id": i, "label": 1, "points": pl_pts[: 100 + 17 * i],
         "normals": pl_nrm[: 100 + 17 * i]}
        for i in range(6)
    ]
    n_before = P.fit_all_types_batched._cache_size()
    params, _ = fit_one_shape(segments, fitter)
    n_after = P.fit_all_types_batched._cache_size()
    assert n_after <= n_before + 1
    assert all(params[i][0] == "plane" for i in range(6))
