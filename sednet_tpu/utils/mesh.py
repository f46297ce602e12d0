"""Mesh/visualization utilities.

Rebuild of the useful parts of reference src/VisUtils.py: tessalate_points
(:163-175, regular UV point grid -> triangle mesh) and grid layout of many
clouds for side-by-side inspection (open3d-free: we emit OBJ/xyz files).
"""
from __future__ import annotations

import numpy as np


def tessellate_points(points: np.ndarray, size_u: int, size_v: int,
                      viz: bool = False):
    """(size_u*size_v, 3) grid points -> (vertices, triangle faces 1-indexed)
    (reference: src/VisUtils.py:163-175)."""
    del viz
    verts = np.asarray(points).reshape(size_u * size_v, 3)
    faces = []
    for i in range(size_u - 1):
        for j in range(size_v - 1):
            a = i * size_v + j + 1
            b = (i + 1) * size_v + j + 1
            faces.append([a, b, b + 1])
            faces.append([a, b + 1, a + 1])
    return verts, faces


def grid_pointclouds(clouds, cols: int = 5, spacing: float = 1.5):
    """Lay out point clouds on a grid for one combined dump
    (reference: src/VisUtils.py grid visualization helpers)."""
    out = []
    for i, c in enumerate(clouds):
        c = np.asarray(c)[:, :3]
        c = c - c.mean(0, keepdims=True)
        offset = np.array([(i % cols) * spacing, -(i // cols) * spacing, 0.0])
        out.append(c + offset)
    return np.concatenate(out, 0) if out else np.zeros((0, 3))
