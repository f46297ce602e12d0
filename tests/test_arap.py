"""ARAP refinement: grid deformation toward the cloud + refit improvement
(reference: src/fitting_optimization.py:32-114, primitive_forward.py:157-300)."""
import numpy as np

from sednet_tpu.fit.arap import (arap_deform, boundary_indices,
                                 grid_triangles, match_targets)
from sednet_tpu.fit.driver import optimize_spline_kronecker


def _grid(su, sv, scale=1.0, z=0.0):
    u, v = np.meshgrid(np.linspace(0, 1, su), np.linspace(0, 1, sv),
                       indexing="ij")
    return np.stack([scale * u, scale * v, z + np.zeros_like(u)],
                    -1).reshape(-1, 3)


def test_grid_connectivity():
    tris = grid_triangles(4, 5)
    assert tris.shape == (2 * 3 * 4, 3)
    assert tris.min() == 0 and tris.max() == 19
    b = boundary_indices(4, 5)
    assert set(b) == {0, 4, 5, 9, 10, 14, 15, 19}


def test_match_targets_shape(rng):
    recon = _grid(5, 5)
    cloud = rng.rand(100, 3)
    m = match_targets(recon, cloud, rng)
    assert m.shape == (25, 3)
    # every target is an actual input point
    d = np.linalg.norm(m[:, None] - cloud[None], axis=2).min(1)
    assert d.max() < 1e-12


def test_arap_pulls_boundary_to_cloud(rng):
    """A shrunken predicted grid must expand toward the larger input patch;
    interior stays smooth (finite, bounded)."""
    su = sv = 8
    cloud = _grid(20, 20, scale=1.0)[:, :]  # unit square cloud
    cloud = cloud + 0.001 * rng.randn(*cloud.shape)
    recon = _grid(su, sv, scale=0.5) + np.array([0.25, 0.25, 0.0])  # centered
    out = arap_deform(recon, cloud, su, sv, iters=20, rng=rng)
    assert np.isfinite(out).all()
    # boundary columns must have moved onto the cloud (z ~ 0 and wider span)
    b = boundary_indices(su, sv)
    span_before = np.ptp(recon[b, :2], 0)
    span_after = np.ptp(out[b, :2], 0)
    assert (span_after > span_before + 0.1).all(), (span_before, span_after)
    d = np.linalg.norm(out[b][:, None] - cloud[None], axis=2).min(1)
    assert d.mean() < 0.05


def test_arap_refit_beats_pure_ls(rng):
    """VERDICT criterion: residual with the ARAP step <= the pure-LS refit
    on a synthetic patch whose prediction underestimates the extent."""
    cloud = _grid(25, 25, scale=1.0)
    cloud = cloud + 0.002 * rng.randn(*cloud.shape)
    recon = (_grid(10, 10, scale=0.6) + np.array([0.2, 0.2, 0.05])).astype(
        np.float32)

    def resid(surface):
        d = np.linalg.norm(cloud[:, None] - surface[None], axis=2).min(1)
        return d.mean()

    out_arap = optimize_spline_kronecker(recon, cloud.astype(np.float32),
                                         new_cp=6, grid=10, deform=True)
    out_ls = optimize_spline_kronecker(recon, cloud.astype(np.float32),
                                       new_cp=6, grid=10, deform=False)
    assert resid(out_arap) <= resid(out_ls) + 1e-9, (
        resid(out_arap), resid(out_ls))
