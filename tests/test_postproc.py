"""Post-processing tests: robust fits, boundary masks, intersections, and the
full pipeline on an analytic two-plane + cylinder construction."""
import numpy as np
import pytest

from sednet_tpu.postproc import (
    RobustFitter,
    boundary_edge_mask,
    circle_segmentation,
    face_adjacency,
    fit_circle_2d,
    intersect,
    line_circle_intersection,
    line_line_intersection,
    majority_type_with_priors,
    plane_cone,
    plane_cylinder,
    plane_plane,
    plane_sphere,
    process_shape,
    save_shape_parameters,
)


def test_fit_circle_2d(rng):
    t = rng.rand(100) * 2 * np.pi
    x = 1.5 + 0.7 * np.cos(t)
    y = -0.3 + 0.7 * np.sin(t)
    xc, yc, r = fit_circle_2d(x, y)
    assert (xc, yc, r) == pytest.approx((1.5, -0.3, 0.7), abs=1e-6)


def test_circle_segmentation_3d(rng):
    t = rng.rand(200) * 2 * np.pi
    axis = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    x_axis = np.array([0.0, 0.0, 1.0])
    y_axis = np.cross(axis, x_axis)
    pts = (0.4 * (np.cos(t)[:, None] * x_axis + np.sin(t)[:, None] * y_axis)
           + np.array([0.1, 0.2, 0.3]))
    center, r, normal = circle_segmentation(pts)
    np.testing.assert_allclose(center, [0.1, 0.2, 0.3], atol=1e-6)
    assert r == pytest.approx(0.4, abs=1e-6)
    assert abs(np.dot(normal, axis)) > 0.999


def test_robust_plane_with_contamination(rng):
    # plane z=0.2 plus far-away junk; nearest-50% filter should ignore it
    pts = np.concatenate([
        np.c_[rng.rand(300) - 0.5, rng.rand(300) - 0.5, 0.2 * np.ones(300)],
        rng.randn(40, 3) * 0.1 + 3.0])
    nrm = np.tile([0.0, 0.0, 1.0], (340, 1))
    f = RobustFitter()
    name, a, d = f.fit_plane(pts, nrm)
    if a[2] < 0:
        a, d = -a, -d
    np.testing.assert_allclose(a, [0, 0, 1], atol=1e-2)
    assert d == pytest.approx(0.2, abs=1e-2)


def test_robust_cylinder(rng):
    t = rng.rand(800) * 2 * np.pi
    z = rng.rand(800) - 0.5
    pts = np.c_[0.3 * np.cos(t), 0.3 * np.sin(t), z]
    nrm = np.c_[np.cos(t), np.sin(t), np.zeros(800)]
    f = RobustFitter()
    name, a, c, r = f.fit_cylinder(pts, nrm)
    assert abs(a[2]) > 0.999
    assert r == pytest.approx(0.3, abs=5e-3)
    np.testing.assert_allclose(c[:2], [0, 0], atol=5e-3)


def test_robust_cone_axis_snap(rng):
    # cone along z: half-angle 0.4, apex at origin
    t = np.sqrt(rng.rand(600)) * 0.8 + 0.05
    phi = rng.rand(600) * 2 * np.pi
    r = t * np.tan(0.4)
    pts = np.c_[r * np.cos(phi), r * np.sin(phi), t]
    nrm = np.c_[np.cos(0.4) * np.cos(phi), np.cos(0.4) * np.sin(phi),
                -np.sin(0.4) * np.ones(600)]
    f = RobustFitter()
    name, apex, a, theta = f.fit_cone(pts, nrm)
    assert abs(a[2]) == 1.0  # snapped to coordinate axis
    np.testing.assert_allclose(apex, 0.0, atol=0.1)
    assert theta == pytest.approx(0.4, abs=0.05)


def test_majority_type_priors():
    # 60% closed-spline, 30% cylinder -> cylinder wins by prior
    types = np.array([0] * 60 + [2] * 30 + [1] * 10)
    assert majority_type_with_priors(types) == 2
    # 85% closed, 15% plane -> plane wins (>10%)
    types = np.array([0] * 85 + [1] * 15)
    assert majority_type_with_priors(types) == 1
    # pure sphere stays sphere
    assert majority_type_with_priors(np.array([4] * 50)) == 4


def test_boundary_mask_two_slabs(rng):
    a = np.c_[rng.rand(200), rng.rand(200), np.zeros(200)]
    b = np.c_[rng.rand(200) + 0.98, rng.rand(200), np.zeros(200)]
    pts = np.concatenate([a, b])
    insts = np.r_[np.zeros(200, np.int32), np.ones(200, np.int32)]
    mask = boundary_edge_mask(pts, insts, strict=False)
    # boundary points concentrated near x ~= 1
    assert mask.sum() > 0
    assert np.abs(pts[mask][:, 0] - 1.0).mean() < 0.3


def test_face_adjacency(rng):
    a = np.c_[rng.rand(300), rng.rand(300), np.zeros(300)]
    b = np.c_[rng.rand(300) + 0.99, rng.rand(300), np.zeros(300)]
    c = np.c_[rng.rand(300) + 10, rng.rand(300), np.zeros(300)]  # far away
    pts = np.concatenate([a, b, c])
    insts = np.r_[np.zeros(300, np.int32), np.ones(300, np.int32),
                  np.full(300, 2, np.int32)]
    adj = face_adjacency(pts, insts, np.array([0, 1, 2]), nn_num_thresh=2)
    assert adj[0, 1] and adj[1, 0]
    assert not adj[0, 2]
    assert adj[2].any()  # lonely instance linked to its nearest


def test_plane_plane_line():
    p1 = ("plane", np.array([0.0, 0, 1]), 0.0)       # z = 0
    p2 = ("plane", np.array([0.0, 1, 0]), 0.5)       # y = 0.5
    kind, k, d = plane_plane(p1, p2)
    assert kind == "line"
    assert abs(abs(k[0]) - 1) < 1e-6                 # line along x
    assert d[2] == pytest.approx(0.0, abs=1e-6)
    assert d[1] == pytest.approx(0.5, abs=1e-6)
    # parallel planes -> none
    assert plane_plane(p1, ("plane", np.array([0.0, 0, 1]), 1.0))[0] is None


def test_plane_cylinder_cases():
    cyl = ("cylinder", np.array([0.0, 0, 1]), np.zeros(3), 0.5)
    # plane z = 0.2 orthogonal to axis -> circle
    kind, c, x, y, r = plane_cylinder(("plane", np.array([0.0, 0, 1]), 0.2),
                                      cyl)
    assert kind == "circle" and r == pytest.approx(0.5)
    np.testing.assert_allclose(c, [0, 0, 0.2], atol=1e-8)
    # plane x = 0.2 parallel to axis -> two lines
    out = plane_cylinder(("plane", np.array([1.0, 0, 0]), 0.2), cyl)
    assert out[0] == "two-line"
    for base in (out[2], out[3]):
        assert np.hypot(base[0], base[1]) == pytest.approx(0.5, abs=1e-6)
    # plane x = 2 misses -> none
    assert plane_cylinder(("plane", np.array([1.0, 0, 0]), 2.0), cyl)[0] is None
    # oblique -> ellipse
    n = np.array([0.0, 1.0, 1.0]) / np.sqrt(2)
    out = plane_cylinder(("plane", n, 0.0), cyl)
    assert out[0] == "ellipse"
    assert out[4] == pytest.approx(0.5 * np.sqrt(2), rel=1e-3)


def test_plane_cone_and_sphere():
    cone = ("cone", np.zeros(3), np.array([0.0, 0, 1]), 0.4)
    kind, c, x, y, r = plane_cone(("plane", np.array([0.0, 0, 1]), 0.5), cone)
    assert kind == "circle"
    assert r == pytest.approx(0.5 * np.tan(0.4), rel=1e-5)

    sph = ("sphere", np.zeros(3), 1.0)
    kind, c, x, y, r = plane_sphere(("plane", np.array([0.0, 0, 1]), 0.6), sph)
    assert kind == "circle"
    assert r == pytest.approx(0.8, rel=1e-6)
    assert plane_sphere(("plane", np.array([0.0, 0, 1]), 1.5), sph)[0] is None


def test_line_line_intersection():
    p = line_line_intersection([1, 0, 0], [0, 0, 0], [0, 1, 0], [0.3, 0, 0])
    np.testing.assert_allclose(p, [0.3, 0, 0], atol=1e-6)
    # skew lines (offset in z) far apart -> None
    assert line_line_intersection([1, 0, 0], [0, 0, 0],
                                  [0, 1, 0], [0.3, 0, 0.5]) is None


def test_line_circle_intersection():
    circle = (np.zeros(3), np.array([1.0, 0, 0]), np.array([0.0, 1, 0]), 0.5)
    pts = line_circle_intersection((np.array([1.0, 0, 0]),
                                    np.array([0.0, 0, 0])), circle)
    assert pts is not None and len(pts) == 2
    got = sorted(p[0] for p in pts)
    assert got == pytest.approx([-0.5, 0.5], abs=1e-6)


def _box_shape(rng, n=400):
    """A floor with three walls: the floor has 3 neighbours, so wall-wall
    corner points on the floor are discoverable (corner search needs an
    instance with >= 3 intersection curves, like the reference)."""
    m = n // 4
    floor = np.c_[rng.rand(m), rng.rand(m), np.zeros(m)]
    wall_a = np.c_[np.zeros(m), rng.rand(m), rng.rand(m)]        # x = 0
    wall_b = np.c_[rng.rand(m), np.zeros(m), rng.rand(m)]        # y = 0
    wall_c = np.c_[np.ones(m), rng.rand(m), rng.rand(m)]         # x = 1
    pts = np.concatenate([floor, wall_a, wall_b, wall_c])
    nrm = np.concatenate([np.tile([0.0, 0, 1], (m, 1)),
                          np.tile([1.0, 0, 0], (m, 1)),
                          np.tile([0.0, 1, 0], (m, 1)),
                          np.tile([1.0, 0, 0], (m, 1))])
    insts = np.r_[np.zeros(m, np.int32), np.ones(m, np.int32),
                  np.full(m, 2, np.int32), np.full(m, 3, np.int32)]
    types = np.ones(4 * m, np.int32)  # all planes
    return pts, nrm, insts, types


def test_process_shape_with_spline_fitter_and_dump(rng, tmp_path):
    """Spline segments route through spline_fitter and dump their surface to
    a separate txt (reference: primitive_forward_v2.py:1221-1223)."""
    pts, nrm, insts, types = _box_shape(rng, 400)
    types[insts == 3] = 0  # one closed-spline instance

    def fake_spline_fitter(p, n, closed):
        return ("closed-spline" if closed else "open-spline",
                p[:50].astype(np.float32))

    result = process_shape(pts, nrm, insts, types, min_points=30,
                           corner_dist_thresh=0.2,
                           spline_fitter=fake_spline_fitter)
    assert result["parameters"][3][0] == "closed-spline"
    save_shape_parameters(str(tmp_path), "s", result)
    import os
    assert os.path.exists(tmp_path / "s_3_close_spline.txt")
    text = open(tmp_path / "paras" / "param_s.txt").read()
    assert "closed-spline" in text
    assert "..." not in text  # no numpy truncation


def test_process_shape_box_corner(rng, tmp_path):
    pts, nrm, insts, types = _box_shape(rng, 800)
    # corner_dist_thresh scaled up: with ~200 points/face the nearest sample
    # to the corner is ~0.07 away (the reference uses 0.01 at 10k points)
    result = process_shape(pts, nrm, insts, types, min_points=30,
                           corner_dist_thresh=0.2, filter_bad_points=True)
    # all four planes fitted
    fitted = [v for v in result["parameters"].values() if v is not None]
    assert len(fitted) == 4
    assert all(v[0] == "plane" for v in fitted)
    # three intersection lines, one shared corner at the origin
    assert result["edges"].shape[0] > 0
    assert result["corners"].shape[0] >= 1
    assert np.linalg.norm(result["corners"], axis=1).min() < 0.05

    save_shape_parameters(str(tmp_path), "7", result)
    import os
    assert os.path.exists(tmp_path / "paras" / "param_7.txt")
    assert os.path.exists(tmp_path / "paras" / "param_inter_lines_7.json")
    assert os.path.exists(tmp_path / "7_final_edges.txt")


def test_robust_fit_weights_follow_nearest_fraction():
    """Weights must be filtered by the same distance-sort index as the
    points (reference: primitive_forward_v2.py:722-727) — regression:
    truncation by count paired points with unrelated weights."""
    from sednet_tpu.postproc.robust_fits import RobustFitter, \
        _nearest_fraction

    rng = np.random.RandomState(0)
    n = 200
    pts = rng.randn(n, 3)
    pts[:, 2] = 0.0
    nrm = np.tile([0.0, 0.0, 1.0], (n, 1))
    w = rng.rand(n).astype(np.float64)
    f = RobustFitter()
    got = f.fit_plane(pts, nrm, weights=w)
    # manual reference: filter all three by the same keep index, then the
    # unfiltered fit
    pk, nk, wk = _nearest_fraction(pts, nrm, w, fraction=0.5)
    ref = f.fit_plane(pk, nk, weights=wk, nofilter=True)
    np.testing.assert_allclose(np.abs(got[1] @ ref[1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(got[2], ref[2], atol=1e-8)


def test_cone_mesh_v2_axis_convention():
    """The v2 cone fit points the axis from the body toward the apex; the
    mesh must land on the side the boundary curves actually lie on
    (regression: clamped-to-apex sliver)."""
    from sednet_tpu.postproc.arg2mesh import cone_mesh

    apex = np.array([0.0, 0.0, 1.0])
    a = np.array([0.0, 0.0, 1.0])   # toward apex == AWAY from the body
    theta = np.pi / 6
    # boundary circle at z = 0 (offset -1 along a), radius tan(theta)
    r = np.tan(theta)
    phi = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    circle = ("circle", np.array([0.0, 0.0, 0.0]),
              np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), r)
    verts, faces = cone_mesh(("cone", apex, a, theta), {0: circle})
    # vertices must span down to the boundary circle, not a 1e-3 sliver
    z = verts[:, 2]
    assert z.min() < 0.05, z.min()
    assert z.max() <= 1.0 + 1e-6
    # and lie on the cone: radial distance == tan(theta) * (apex_z - z)
    rad = np.linalg.norm(verts[:, :2], axis=1)
    np.testing.assert_allclose(rad, np.tan(theta) * (1.0 - z), atol=1e-6)


def test_cylinder_cone_circle_on_body_side():
    """Coaxial cylinder x cone circle sits at apex - a*h (the reference's
    effective always-flip, proj_2_edge_utils.py:297-300)."""
    from sednet_tpu.postproc.intersections import cylinder_cone

    apex = np.array([0.0, 0.0, 1.0])
    a = np.array([0.0, 0.0, 1.0])   # v2 convention: toward apex
    theta = np.pi / 4
    cyl = ("cylinder", a, np.zeros(3), 0.5)
    res = cylinder_cone(cyl, ("cone", apex, a, theta))
    assert res[0] == "circle"
    h = 0.5 / np.tan(theta)
    np.testing.assert_allclose(res[1], apex - a * h, atol=1e-9)
