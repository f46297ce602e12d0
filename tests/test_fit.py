"""Primitive-fit round-trip tests: sample a known primitive -> fit ->
compare parameters / residuals (the reference's manual test strategy,
Fitting_patches_and_edges/test_fitting_utils.py, made automatic)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sednet_tpu.data.synthetic import (
    sample_cone as syn_cone,
    sample_cylinder as syn_cylinder,
    sample_plane as syn_plane,
    sample_sphere as syn_sphere,
)
from sednet_tpu.fit import (
    distance_from_cone,
    distance_from_cylinder,
    distance_from_plane,
    distance_from_sphere,
    distance_from_torus,
    fit_cone,
    fit_cylinder,
    fit_plane,
    fit_sphere,
    sample_cylinder,
    sample_plane,
    sample_sphere,
    sample_torus,
)
from sednet_tpu.fit.samplers import sample_cone as smp_cone


def _w(n):
    return jnp.ones((n,), jnp.float32)


def test_plane_roundtrip(rng):
    pts, nrm, par = syn_plane(rng, 500)
    n_fit, d_fit = fit_plane(jnp.asarray(pts, jnp.float32), _w(500))
    n_fit, d_fit = np.asarray(n_fit), float(d_fit)
    # orientation is sign-ambiguous
    if np.dot(n_fit, par["normal"]) < 0:
        n_fit, d_fit = -n_fit, -d_fit
    np.testing.assert_allclose(n_fit, par["normal"], atol=1e-3)
    assert d_fit == pytest.approx(par["distance"], abs=1e-3)
    res = float(distance_from_plane(jnp.asarray(pts, jnp.float32),
                                    jnp.asarray(n_fit), d_fit))
    assert res < 1e-5


def test_sphere_roundtrip(rng):
    pts, _, par = syn_sphere(rng, 400)
    c, r = fit_sphere(jnp.asarray(pts, jnp.float32), _w(400))
    np.testing.assert_allclose(np.asarray(c), par["center"], atol=5e-3)
    assert float(r) == pytest.approx(par["radius"], abs=5e-3)
    res = float(distance_from_sphere(jnp.asarray(pts, jnp.float32), c, r))
    assert res < 1e-4


def test_cylinder_roundtrip(rng):
    pts, nrm, par = syn_cylinder(rng, 600)
    a, c, r = fit_cylinder(jnp.asarray(pts, jnp.float32),
                           jnp.asarray(nrm, jnp.float32), _w(600))
    a = np.asarray(a)
    cos = abs(np.dot(a, par["axis"]))
    assert cos > 0.999
    assert float(r) == pytest.approx(par["radius"], abs=5e-3)
    res = float(distance_from_cylinder(jnp.asarray(pts, jnp.float32),
                                       jnp.asarray(a), c, r))
    assert res < 1e-4


def test_cone_roundtrip(rng):
    pts, nrm, par = syn_cone(rng, 800)
    apex, axis, theta = fit_cone(jnp.asarray(pts, jnp.float32),
                                 jnp.asarray(nrm, jnp.float32), _w(800))
    np.testing.assert_allclose(np.asarray(apex), par["apex"], atol=2e-2)
    assert abs(np.dot(np.asarray(axis), par["axis"])) > 0.995
    assert float(theta) == pytest.approx(par["theta"], abs=2e-2)
    res = float(distance_from_cone(jnp.asarray(pts, jnp.float32), apex, axis,
                                   theta))
    assert res < 1e-3


def test_weighted_fit_ignores_outliers(rng):
    pts, nrm, par = syn_plane(rng, 300)
    outliers = rng.randn(60, 3) * 2 + 5
    all_pts = jnp.asarray(np.concatenate([pts, outliers]), jnp.float32)
    w = jnp.asarray(np.concatenate([np.ones(300), np.zeros(60)]), jnp.float32)
    n_fit, d_fit = fit_plane(all_pts, w)
    n_fit = np.asarray(n_fit)
    if np.dot(n_fit, par["normal"]) < 0:
        n_fit = -n_fit
    np.testing.assert_allclose(n_fit, par["normal"], atol=1e-3)


def test_fits_are_differentiable(rng):
    pts, nrm, _ = syn_cylinder(rng, 200)
    pts, nrm = jnp.asarray(pts, jnp.float32), jnp.asarray(nrm, jnp.float32)

    def f(w):
        a, c, r = fit_cylinder(pts, nrm, jax.nn.sigmoid(w))
        return distance_from_cylinder(pts, a, c, r)

    g = jax.grad(f)(jnp.zeros((200,)))
    assert np.isfinite(np.asarray(g)).all()


def test_fits_vmappable(rng):
    batches = [syn_sphere(rng, 128) for _ in range(4)]
    pts = jnp.asarray(np.stack([b[0] for b in batches]), jnp.float32)
    w = jnp.ones((4, 128))
    centers, radii = jax.vmap(fit_sphere)(pts, w)
    for i, (_, _, par) in enumerate(batches):
        np.testing.assert_allclose(np.asarray(centers[i]), par["center"],
                                   atol=1e-2)


def test_samplers_on_their_own_surfaces(rng):
    c = np.array([0.1, -0.2, 0.3])
    pts = sample_sphere(0.5, c, 200)
    np.testing.assert_allclose(np.linalg.norm(pts - c, axis=1), 0.5, atol=1e-6)

    axis = np.array([0.0, 0.0, 1.0])
    pts = sample_cylinder(0.3, c, axis, height=1.0)
    rad = np.linalg.norm((pts - c)[:, :2], axis=1)
    np.testing.assert_allclose(rad, 0.3, atol=1e-6)

    pts = sample_plane(0.4, np.array([0.0, 1.0, 0.0]), np.zeros(3))
    np.testing.assert_allclose(pts[:, 1], 0.4, atol=1e-6)

    apex = np.zeros(3)
    pts = smp_cone(apex, axis, 0.5, height=1.0)
    ang = np.arccos((pts @ axis) / np.linalg.norm(pts, axis=1))
    np.testing.assert_allclose(ang, 0.5, atol=1e-5)

    pts = sample_torus(0.5, 0.1, c, axis)
    d = float(np.asarray(distance_from_torus(
        jnp.asarray(pts, jnp.float32), jnp.asarray(axis), jnp.asarray(c),
        0.5, 0.1)))
    assert d < 1e-6
