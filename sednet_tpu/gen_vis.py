"""Batch visualization tool: colored per-point txt dumps for pred/GT
type/instance labels.

Rebuild of reference gen_test_vis.py:51-92 — reads the predict CLI's
{id}_type/inst (+ optional GT) txt dumps and writes {id}_{kind}.txt files
with xyz;rgb rows, in parallel across shapes.

CLI: python -m sednet_tpu.gen_vis SRC_DIR [--ids 0 1 2] [--workers 8]
"""
from __future__ import annotations

import argparse
import concurrent.futures as cf
import os

import numpy as np

from sednet_tpu.utils import COLORS_TYPE, instance_palette, visual_labels


def gen_vis(src: str, shape_id) -> dict:
    """Reference gen_test_vis.gen_vis (:61-75)."""
    types = np.loadtxt(os.path.join(src, f"{shape_id}_type.txt")).astype(int)
    insts = np.loadtxt(os.path.join(src, f"{shape_id}_inst.txt")).astype(int)
    pts = np.loadtxt(os.path.join(src, f"{shape_id}_GT_points.txt"),
                     delimiter=";")[:, :3]
    out = {
        "pred_type": visual_labels(pts, types, COLORS_TYPE),
        "pred_inst": visual_labels(
            pts, insts, instance_palette(max(insts.max() + 1, 2))),
    }
    gt_type_path = os.path.join(src, f"{shape_id}_GT_type.txt")
    gt_inst_path = os.path.join(src, f"{shape_id}_GT_inst.txt")
    if os.path.exists(gt_type_path) and os.path.exists(gt_inst_path):
        gt_types = np.loadtxt(gt_type_path).astype(int)
        gt_insts = np.loadtxt(gt_inst_path).astype(int)
        out["GT_type"] = visual_labels(pts, gt_types, COLORS_TYPE)
        out["GT_inst"] = visual_labels(
            pts, gt_insts, instance_palette(max(gt_insts.max() + 1, 2)))
    return out


def _one(src, dst, shape_id, keep: bool = False):
    from sednet_tpu.data.native import savetxt_fast

    out = gen_vis(src, shape_id)
    for kind, arr in out.items():
        savetxt_fast(os.path.join(dst, f"{shape_id}_{kind}.txt"), arr,
                     delimiter=";", fmt="%0.4f")
    # only the --images pass needs the arrays back; returning them
    # unconditionally would pin every shape's decoded clouds in memory
    # (10+ GB over a reference-scale 2700-shape dump dir)
    return out if keep else None


def gen_total_vis(src: str, ids=None, workers: int = 8,
                  images: bool = False) -> str:
    """Reference gen_test_vis.gen_total_vis (:84-89) with a thread pool.
    images=True additionally renders one offscreen grid PNG per kind
    (pred/GT x type/inst) across all shapes — the open3d screenshot half
    of the reference's vis flow (VisUtils.py:264-283), headless here."""
    dst = os.path.join(src, "VIS")
    os.makedirs(dst, exist_ok=True)
    if ids is None:
        ids = sorted({f.split("_")[0] for f in os.listdir(src)
                      if f.endswith("_type.txt") and "GT" not in f})
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        outs = list(ex.map(lambda i: _one(src, dst, i, keep=images), ids))
    if images and ids:
        from sednet_tpu.utils import render_pointclouds_grid

        # reuse the arrays the pool just computed — no second load pass
        by_kind: dict[str, list] = {}
        for out in outs:
            for kind, arr in out.items():
                by_kind.setdefault(kind, []).append(arr)
        for kind, arrs in by_kind.items():
            render_pointclouds_grid(
                arrs, os.path.join(dst, f"grid_{kind}.png"))
    return dst


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("--ids", nargs="*", default=None)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--images", action="store_true",
                   help="also render grid PNGs of the colored dumps")
    a = p.parse_args(argv)
    gen_total_vis(a.src, ids=a.ids, workers=a.workers, images=a.images)


if __name__ == "__main__":
    main()
