"""B-spline math + spline-loss tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.fit import (
    fit_control_points_kronecker,
    reverse_transformation,
    sample_from_control_grid,
    standardize_points,
    uniform_knot_bspline,
)
from sednet_tpu.losses import (
    control_points_permute_closed_loss,
    control_points_permute_loss,
    laplacian_loss,
    spline_reconstruction_loss,
    spline_reconstruction_loss_one_sided,
)


def test_basis_partition_of_unity():
    nu, nv = uniform_knot_bspline(10, 10, 3, 3, grid_size=25)
    np.testing.assert_allclose(nu.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(nv.sum(1), 1.0, atol=1e-5)
    assert (nu >= 0).all()


def test_sample_from_control_grid_flat_plane():
    """A planar control grid must sample to the same plane."""
    nu, nv = uniform_knot_bspline(6, 6, 3, 3, grid_size=20)
    u, v = np.meshgrid(np.linspace(0, 1, 6), np.linspace(0, 1, 6))
    control = np.stack([u, v, 0.5 * np.ones_like(u)], -1).reshape(1, 36, 3)
    pts = np.asarray(sample_from_control_grid(
        jnp.asarray(nu), jnp.asarray(nv), jnp.asarray(control, jnp.float32),
        6, 6))
    np.testing.assert_allclose(pts[0, :, 2], 0.5, atol=1e-5)
    assert pts[0, :, 0].min() >= -1e-5 and pts[0, :, 0].max() <= 1.0 + 1e-5


def test_kronecker_fit_roundtrip(rng):
    nu, nv = uniform_knot_bspline(6, 6, 3, 3, grid_size=20)
    control = rng.randn(36, 3).astype(np.float32) * 0.3
    surface = np.asarray(sample_from_control_grid(
        jnp.asarray(nu), jnp.asarray(nv), jnp.asarray(control[None]), 6, 6))[0]
    refit = np.asarray(fit_control_points_kronecker(
        jnp.asarray(surface), jnp.asarray(nu), jnp.asarray(nv)))
    resampled = np.asarray(sample_from_control_grid(
        jnp.asarray(nu), jnp.asarray(nv), jnp.asarray(refit[None]), 6, 6))[0]
    # surface round-trips even if control points are not unique
    np.testing.assert_allclose(resampled, surface, atol=1e-3)


def test_standardize_points_properties(rng):
    pts = rng.randn(1000, 3).astype(np.float32) * np.array([4.0, 2.0, 0.1],
                                                           np.float32) + 1.0
    w = np.ones(1000, np.float32)
    std_pts, std, mean, r = standardize_points(jnp.asarray(pts), jnp.asarray(w))
    std_pts = np.asarray(std_pts)
    assert np.isfinite(std_pts).all()
    # smallest axis mapped to x: extent along x smallest after rotation
    ext = std_pts.max(0) - std_pts.min(0)
    # round trip
    back = np.asarray(reverse_transformation(jnp.asarray(std_pts),
                                             mean, std, r))
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_standardize_low_confidence_fallback(rng):
    pts = rng.randn(1000, 3).astype(np.float32)
    w = np.full(1000, 0.5, np.float32)  # nothing above 0.8 -> topk path
    std_pts, std, mean, r = standardize_points(jnp.asarray(pts), jnp.asarray(w))
    assert np.isfinite(np.asarray(std_pts)).all()


def test_permute_loss_invariance(rng):
    g = 5
    control = jnp.asarray(rng.randn(2, g, g, 3).astype(np.float32))
    flipped = jnp.flip(control, 1).reshape(2, g * g, 3)
    loss, best = control_points_permute_loss(flipped, control, g)
    assert float(loss) < 1e-10
    np.testing.assert_allclose(np.asarray(best).reshape(2, g * g, 3),
                               np.asarray(flipped), atol=1e-6)


def test_permute_closed_loss_roll_invariance(rng):
    g = 4
    control = jnp.asarray(rng.randn(1, g, g, 3).astype(np.float32))
    rolled = jnp.roll(control, 2, axis=1).reshape(1, g * g, 3)
    loss, _ = control_points_permute_closed_loss(rolled, control, g, g)
    assert float(loss) < 1e-10


def test_spline_reconstruction_losses(rng):
    nu, nv = uniform_knot_bspline(6, 6, 3, 3, grid_size=10)
    control = jnp.asarray(rng.randn(1, 36, 3).astype(np.float32) * 0.2)
    surface = sample_from_control_grid(jnp.asarray(nu), jnp.asarray(nv),
                                       control, 6, 6)
    loss, reconst = spline_reconstruction_loss(nu, nv, control, surface)
    assert float(loss) < 1e-8
    loss1, _ = spline_reconstruction_loss_one_sided(nu, nv, control, surface)
    assert float(loss1) < 1e-8


def test_laplacian_loss_zero_for_same(rng):
    g = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    assert float(laplacian_loss(g, g)) == 0.0
    g2 = g + 0.5 * jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    assert float(laplacian_loss(g, g2)) > 0.0
