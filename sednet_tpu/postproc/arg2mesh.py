"""Trimmed-mesh generation from fitted parameters + intersection curves.

Rebuild of reference arg2mesh/arg2mesh.py (:237-803): consumes
param_{id}.txt and param_inter_lines_{id}.json (as written by
sednet_tpu.postproc.pipeline.save_shape_parameters) and emits per-instance
OBJ meshes with vertex colors plus a combined OBJ.

Per primitive:
  * plane: boundary samples from its trimmed intersection curves are
    projected into plane coordinates, ordered angularly around their
    centroid, and fan-triangulated (the reference walks the polygon edge
    graph, :237-332; the angular ordering covers the same convex/star cases
    robustly);
  * cylinder/cone: parametric lateral surfaces clipped to the axial range
    spanned by their intersection curves (:346-511);
  * sphere: UV sphere (clipped to the side of a single circle cut when one
    exists).
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, List

import numpy as np

from sednet_tpu.utils.vis import COLORS_TYPE

TWO_PI = 2 * np.pi
CIRCLE_V = 64


def save_obj(path: str, vertices: np.ndarray, faces: List[List[int]],
             colors: np.ndarray | None = None) -> None:
    """OBJ with optional per-vertex colors (reference: arg2mesh.py:642-664).
    faces are 1-indexed."""
    with open(path, "w") as f:
        for i, v in enumerate(vertices):
            line = f"v {v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = colors[i]
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        f.write("\n")
        for face in faces:
            f.write("f " + " ".join(str(i) for i in face) + "\n")


def parse_param_file(path: str) -> Dict[int, list]:
    """Parse param_{id}.txt (format written by save_shape_parameters)."""
    out = {}
    num = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")
    for line in open(path):
        m = re.match(r"id (\S+):\s*(.*)", line.strip())
        if not m:
            continue
        key = int(m.group(1))
        parts = [p.strip() for p in m.group(2).split(",") if p.strip()]
        name = parts[0]
        vals = [np.array([float(x) for x in num.findall(p)]) for p in parts[1:]]
        vals = [v.item() if v.size == 1 else v for v in vals]
        out[key] = [name] + vals
    return out


def parse_inter_lines(path: str) -> Dict[int, Dict[int, list]]:
    raw = json.load(open(path))
    out = {}
    for k, v in raw.items():
        out[int(k)] = {}
        for k2, curve in v.items():
            curve = [np.asarray(c) if isinstance(c, list) else c
                     for c in curve]
            out[int(k)][int(k2)] = curve
    return out


def _curve_boundary_points(curve) -> np.ndarray:
    """Sample a trimmed curve ([..., range] format from pipeline.py)."""
    kind = curve[0]
    if kind == "line":
        k, d, rng = np.asarray(curve[1], float), np.asarray(curve[2], float), \
            curve[3]
        if not isinstance(rng, (list, np.ndarray)) or len(rng) < 2:
            return np.zeros((0, 3))
        t = np.linspace(float(rng[0]), float(rng[1]), 16)
        return d[None] + t[:, None] * k[None]
    if kind == "circle":
        c = np.asarray(curve[1], float)
        x = np.asarray(curve[2], float)
        y = np.asarray(curve[3], float)
        r = float(curve[4])
        rng = curve[5] if len(curve) > 5 else [0.0, TWO_PI]
        a = np.linspace(float(rng[0]), float(rng[1]), CIRCLE_V)
        return c[None] + r * (np.cos(a)[:, None] * x[None]
                              + np.sin(a)[:, None] * y[None])
    if kind == "ellipse":
        c = np.asarray(curve[1], float)
        x = np.asarray(curve[2], float)
        y = np.asarray(curve[3], float)
        rx, ry = float(curve[4]), float(curve[5])
        a = np.linspace(0, TWO_PI, CIRCLE_V)
        return c[None] + rx * np.cos(a)[:, None] * x[None] \
            + ry * np.sin(a)[:, None] * y[None]
    return np.zeros((0, 3))


def _plane_axes(n: np.ndarray):
    h = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0.0, 1, 0])
    x = np.cross(n, h)
    x /= np.linalg.norm(x) + 1e-12
    return x, np.cross(n, x)


def plane_mesh(par, curves: Dict[int, list]):
    """Fan-triangulated polygon bounded by the plane's trimmed curves."""
    n = np.asarray(par[1], float).reshape(3)
    n /= np.linalg.norm(n) + 1e-12
    d = float(par[2])
    boundary = [
        _curve_boundary_points(c) for c in curves.values()]
    boundary = [b for b in boundary if b.shape[0]]
    if not boundary:
        # unbounded plane: default square patch
        x, y = _plane_axes(n)
        c = n * d
        s = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
        verts = c[None] + s[:, :1] * x[None] + s[:, 1:] * y[None]
        return verts, [[1, 2, 3], [1, 3, 4]]
    pts = np.concatenate(boundary)
    x, y = _plane_axes(n)
    origin = n * d
    uv = np.stack([(pts - origin) @ x, (pts - origin) @ y], 1)
    centroid = uv.mean(0)
    ang = np.arctan2(uv[:, 1] - centroid[1], uv[:, 0] - centroid[0])
    order = np.argsort(ang)
    uv = uv[order]
    # dedup near-identical boundary samples
    keep = [0]
    for i in range(1, uv.shape[0]):
        if np.abs(uv[i] - uv[keep[-1]]).sum() > 1e-4:
            keep.append(i)
    uv = uv[keep]
    verts3 = origin[None] + uv[:, :1] * x[None] + uv[:, 1:] * y[None]
    center3 = origin + centroid[0] * x + centroid[1] * y
    verts = np.concatenate([center3[None], verts3])
    m = uv.shape[0]
    faces = [[1, 2 + i, 2 + (i + 1) % m] for i in range(m)]
    return verts, faces


def _axial_range(axis, origin, curves, default=(-0.5, 0.5)):
    ts = []
    for c in curves.values():
        pts = _curve_boundary_points(c)
        if pts.shape[0]:
            ts.extend(((pts - origin) @ axis).tolist())
    if not ts:
        return default
    lo, hi = min(ts), max(ts)
    if hi - lo < 1e-4:
        lo, hi = lo - 0.25, hi + 0.25
    return lo, hi


def _grid_faces(nu: int, nv: int, wrap_u: bool):
    faces = []
    for i in range(nu - (0 if wrap_u else 1)):
        i2 = (i + 1) % nu
        for j in range(nv - 1):
            a = i * nv + j + 1
            b = i2 * nv + j + 1
            faces.append([a, b, b + 1, a + 1])
    return faces


def cylinder_mesh(par, curves):
    a = np.asarray(par[1], float).reshape(3)
    a /= np.linalg.norm(a) + 1e-12
    c = np.asarray(par[2], float).reshape(3)
    r = float(par[3])
    lo, hi = _axial_range(a, c, curves)
    x, y = _plane_axes(a)
    theta = np.linspace(0, TWO_PI, CIRCLE_V, endpoint=False)
    z = np.linspace(lo, hi, 12)
    verts = []
    for t in theta:
        ring_dir = np.cos(t) * x + np.sin(t) * y
        for zz in z:
            verts.append(c + r * ring_dir + zz * a)
    return np.asarray(verts), _grid_faces(CIRCLE_V, len(z), wrap_u=True)


def cone_mesh(par, curves):
    apex = np.asarray(par[1], float).reshape(3)
    a = np.asarray(par[2], float).reshape(3)
    a /= np.linalg.norm(a) + 1e-12
    theta = float(par[3])
    lo, hi = _axial_range(a, apex, curves, default=(0.02, 0.8))
    lo = max(lo, 0.0)
    hi = max(hi, lo + 1e-3)
    x, y = _plane_axes(a)
    phi = np.linspace(0, TWO_PI, CIRCLE_V, endpoint=False)
    t = np.linspace(lo, hi, 12)
    verts = []
    for p in phi:
        ring_dir = np.cos(p) * x + np.sin(p) * y
        for tt in t:
            verts.append(apex + tt * a + tt * np.tan(theta) * ring_dir)
    return np.asarray(verts), _grid_faces(CIRCLE_V, len(t), wrap_u=True)


def sphere_mesh(par, curves):
    c = np.asarray(par[1], float).reshape(3)
    r = float(par[2])
    nu, nv = 32, 17
    u = np.linspace(0, TWO_PI, nu, endpoint=False)
    v = np.linspace(1e-3, np.pi - 1e-3, nv)
    verts = []
    for uu in u:
        for vv in v:
            verts.append(c + r * np.array([np.sin(vv) * np.cos(uu),
                                           np.sin(vv) * np.sin(uu),
                                           np.cos(vv)]))
    verts = np.asarray(verts)
    # clip to one side of a single circle cut, if present
    circles = [cv for cv in curves.values() if cv[0] == "circle"]
    if len(circles) == 1:
        cv = circles[0]
        n = np.cross(np.asarray(cv[2], float), np.asarray(cv[3], float))
        plane_pt = np.asarray(cv[1], float)
        side = (verts - plane_pt) @ n
        keep_side = 1.0 if (side > 0).sum() >= (side < 0).sum() else -1.0
        # (vertex-level clipping keeps the larger cap; faces filtered below)
        keep = side * keep_side >= -1e-6
    else:
        keep = np.ones(len(verts), bool)
    faces_all = _grid_faces(nu, nv, wrap_u=True)
    remap = -np.ones(len(verts), int)
    remap[keep] = np.arange(keep.sum())
    verts = verts[keep]
    faces = []
    for f in faces_all:
        idx = [remap[i - 1] for i in f]
        if all(i >= 0 for i in idx):
            faces.append([i + 1 for i in idx])
    return verts, faces


_BUILDERS = {"plane": plane_mesh, "cylinder": cylinder_mesh,
             "cone": cone_mesh, "sphere": sphere_mesh}


def arg2mesh(output_dir: str, param_path: str, inter_lines_path: str):
    """Build per-instance OBJs + combined OBJ (reference: arg2mesh.py:739-800).
    Returns {instance_id: (vertices, faces)}."""
    os.makedirs(output_dir, exist_ok=True)
    params = parse_param_file(param_path)
    inter = parse_inter_lines(inter_lines_path)

    all_v, all_f, all_c = [], [], []
    built = {}
    for key, par in params.items():
        builder = _BUILDERS.get(par[0])
        if builder is None:
            continue
        curves = inter.get(key, {})
        verts, faces = builder(par, curves)
        if verts.shape[0] == 0:
            continue
        built[key] = (verts, faces)
        color = COLORS_TYPE[key % len(COLORS_TYPE)] / 255.0
        colors = np.tile(color, (verts.shape[0], 1))
        save_obj(os.path.join(output_dir, f"{key}_{par[0]}.obj"),
                 verts, faces, colors)
        offset = len(all_v)
        all_v.extend(verts.tolist())
        all_c.extend(colors.tolist())
        all_f.extend([[i + offset for i in f] for f in faces])
    if all_v:
        save_obj(os.path.join(output_dir, "combined.obj"),
                 np.asarray(all_v), all_f, np.asarray(all_c))
    return built


def batch_arg2mesh(src_dir: str, out_root: str, shape_ids):
    """Batch driver (reference: arg2mesh/batch_main.py)."""
    for sid in shape_ids:
        param = os.path.join(src_dir, "paras", f"param_{sid}.txt")
        inter = os.path.join(src_dir, "paras", f"param_inter_lines_{sid}.json")
        if os.path.exists(param) and os.path.exists(inter):
            arg2mesh(os.path.join(out_root, str(sid)), param, inter)
