"""arg2mesh tests: full pipeline -> param dumps -> OBJ meshes."""
import os

import numpy as np
import pytest

from sednet_tpu.postproc import process_shape, save_shape_parameters
from sednet_tpu.postproc.arg2mesh import (arg2mesh, parse_inter_lines,
                                          parse_param_file, save_obj)


def _box(rng, n=800):
    m = n // 4
    floor = np.c_[rng.rand(m), rng.rand(m), np.zeros(m)]
    wall_a = np.c_[np.zeros(m), rng.rand(m), rng.rand(m)]
    wall_b = np.c_[rng.rand(m), np.zeros(m), rng.rand(m)]
    wall_c = np.c_[np.ones(m), rng.rand(m), rng.rand(m)]
    pts = np.concatenate([floor, wall_a, wall_b, wall_c])
    nrm = np.concatenate([np.tile([0.0, 0, 1], (m, 1)),
                          np.tile([1.0, 0, 0], (m, 1)),
                          np.tile([0.0, 1, 0], (m, 1)),
                          np.tile([1.0, 0, 0], (m, 1))])
    insts = np.repeat(np.arange(4, dtype=np.int32), m)
    types = np.ones(4 * m, np.int32)
    return pts, nrm, insts, types


def test_param_roundtrip_and_mesh(rng, tmp_path):
    pts, nrm, insts, types = _box(rng)
    result = process_shape(pts, nrm, insts, types, min_points=30,
                           corner_dist_thresh=0.2)
    save_shape_parameters(str(tmp_path), "3", result)

    params = parse_param_file(tmp_path / "paras" / "param_3.txt")
    assert len(params) == 4
    for key, par in params.items():
        assert par[0] == "plane"
        orig = result["parameters"][key]
        np.testing.assert_allclose(np.asarray(par[1]),
                                   np.asarray(orig[1]), atol=1e-3)

    inter = parse_inter_lines(tmp_path / "paras" / "param_inter_lines_3.json")
    assert len(inter) >= 2

    out = str(tmp_path / "mesh")
    built = arg2mesh(out, str(tmp_path / "paras" / "param_3.txt"),
                     str(tmp_path / "paras" / "param_inter_lines_3.json"))
    assert len(built) == 4
    objs = [f for f in os.listdir(out) if f.endswith(".obj")]
    assert "combined.obj" in objs
    assert len(objs) == 5
    # sanity: planar instance vertices lie on their plane
    for key, (verts, faces) in built.items():
        par = params[key]
        n = np.asarray(par[1])
        d = float(par[2])
        assert np.abs(verts @ n - d).max() < 1e-6
        assert len(faces) > 0


def test_mesh_builders_quadrics(tmp_path):
    from sednet_tpu.postproc.arg2mesh import (cone_mesh, cylinder_mesh,
                                              sphere_mesh)

    cyl = ["cylinder", np.array([0.0, 0, 1]), np.zeros(3), 0.4]
    v, f = cylinder_mesh(cyl, {})
    np.testing.assert_allclose(np.hypot(v[:, 0], v[:, 1]), 0.4, atol=1e-6)
    assert len(f) > 0

    cone = ["cone", np.zeros(3), np.array([0.0, 0, 1]), 0.5]
    v, f = cone_mesh(cone, {})
    ang = np.arccos(v[:, 2] / np.linalg.norm(v, axis=1))
    np.testing.assert_allclose(ang, 0.5, atol=1e-5)

    sph = ["sphere", np.array([1.0, 0, 0]), 0.3]
    v, f = sphere_mesh(sph, {})
    np.testing.assert_allclose(np.linalg.norm(v - [1, 0, 0], axis=1), 0.3,
                               atol=1e-6)

    save_obj(str(tmp_path / "t.obj"), v, f)
    text = open(tmp_path / "t.obj").read()
    assert text.count("v ") == v.shape[0]
