"""SplineNet training: supervised control-point regression.

Rebuild of reference Fitting_patches_and_edges/splinenet/
train_open_splines.py (287 LoC) and train_closed_control_points.py (279 LoC):

  loss = loss_weight * permute-invariant control-grid regression
         + (1 - loss_weight) * (one-sided reconstruction chamfer + laplacian)
  (train_open_splines.py:169-188); the closed trainer swaps in the
  roll-invariant regression (train_closed_control_points.py).

Data: h5 of spline patches with gt control grids (the reference's
DataSetControlPointsPoisson schema: points (B, N, 3) + controlpoints
(B, g, g, 3)); `write_spline_h5` generates synthetic fixtures by sampling
random control grids and evaluating the surface with the same basis.

CLI: python -m sednet_tpu.splinenet_train {open|closed} --data FILE    (train)
     python -m sednet_tpu.splinenet_train eval {open|closed} --ckpt DIR
         --data FILE [--save-meshes --out-dir D]                        (eval)
     python -m sednet_tpu.splinenet_train dump CONFIG [--out H5]       (dump)

The eval subcommand mirrors the reference's standalone trained-checkpoint
evaluators (splinenet/test_open_splines.py:85-211,
test_closed_control_points.py): loads a saved SplineNet, reports mean
test_reg / test_cd (sqrt two-sided chamfer) / test_lap over the test split
and optionally dumps tessellated pred/gt meshes + gt point txts. The dump
subcommand mirrors splinenet/generate_predictions.py:125-164: runs the
segmentation model + guarded mean-shift over the test h5 and writes
predictions.h5 {seg_id, prim}.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sednet_tpu.fit.bspline import sample_from_control_grid, uniform_knot_bspline
from sednet_tpu.losses.spline import (control_points_permute_closed_loss,
                                      control_points_permute_loss,
                                      laplacian_loss,
                                      spline_reconstruction_loss,
                                      spline_reconstruction_loss_one_sided)
from sednet_tpu.models import SplineNet

logger = logging.getLogger("sednet_tpu.splinenet_train")


def _poisson_like_select(surf: np.ndarray, n_points: int,
                         rng: np.random.RandomState) -> np.ndarray:
    """Blue-noise point selection via farthest-point sampling — matches the
    evenly spaced Poisson-disk sampling of the reference's pre-generated
    spline h5 (DataSetControlPointsPoisson) far better than uniform choice.
    Falls back to with-replacement choice when the surface has fewer samples
    than requested."""
    m = surf.shape[0]
    if m < n_points:
        return rng.choice(m, n_points, replace=True)
    sel = np.empty(n_points, np.int64)
    sel[0] = rng.randint(m)
    d = ((surf - surf[sel[0]]) ** 2).sum(1)
    for i in range(1, n_points):
        sel[i] = int(np.argmax(d))
        d = np.minimum(d, ((surf - surf[sel[i]]) ** 2).sum(1))
    return sel


def write_spline_h5(path: str, *, n_patches=32, n_points=700, grid=20,
                    seed=0, closed=False):
    """Synthetic spline-patch fixtures in the reference's schema."""
    import h5py

    rng = np.random.RandomState(seed)
    nu, nv = uniform_knot_bspline(grid, grid, 3, 3, 40)
    ctrls, points = [], []
    for _ in range(n_patches):
        u, v = np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid))
        bumps = 0.3 * rng.randn(4, 4)
        z = sum(b[0] * np.sin(b[1] * u + b[2] * v + b[3]) for b in bumps)
        ctrl = np.stack([u, v, 0.3 * z], -1).astype(np.float32)
        if closed:
            theta = (u + 1) * np.pi
            r = 0.5 + 0.15 * z
            ctrl = np.stack([r * np.cos(theta), r * np.sin(theta), v], -1)
        surf = np.asarray(sample_from_control_grid(
            jnp.asarray(nu), jnp.asarray(nv),
            jnp.asarray(ctrl.reshape(1, grid * grid, 3)), grid, grid))[0]
        sel = _poisson_like_select(surf, n_points, rng)
        points.append(surf[sel] + 0.005 * rng.randn(n_points, 3))
        ctrls.append(ctrl)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("points", data=np.stack(points).astype(np.float32))
        hf.create_dataset("controlpoints",
                          data=np.stack(ctrls).astype(np.float32))
    return path


def load_spline_h5(path: str):
    import h5py

    with h5py.File(path, "r") as hf:
        return np.array(hf["points"]), np.array(hf["controlpoints"])


class SplineTrainState(NamedTuple):
    variables: dict
    opt_state: object
    step: jax.Array


def make_spline_train_step(model: SplineNet, optimizer, nu, nv, *,
                           closed: bool, loss_weight: float, grid: int):
    nu_j, nv_j = jnp.asarray(nu), jnp.asarray(nv)

    def loss_fn(params, batch_stats, points, gt_ctrl):
        ctrl, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, points,
            train=True, mutable=["batch_stats"])
        if closed:
            l_reg, permuted = control_points_permute_closed_loss(
                ctrl, gt_ctrl, grid, grid)
        else:
            l_reg, permuted = control_points_permute_loss(ctrl, gt_ctrl, grid)
        cd, _ = spline_reconstruction_loss_one_sided(nu_j, nv_j, ctrl, points)
        lap = laplacian_loss(ctrl.reshape(-1, grid, grid, 3), permuted)
        total = (l_reg * loss_weight + (cd + lap) * (1.0 - loss_weight))
        metrics = {"loss": total, "l_reg": l_reg, "cd": cd, "lap": lap}
        return total, (metrics, updates["batch_stats"])

    @jax.jit
    def step(state: SplineTrainState, points, gt_ctrl):
        params = state.variables["params"]
        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state.variables["batch_stats"],
                                   points, gt_ctrl)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        return SplineTrainState(
            {"params": params, "batch_stats": new_bs}, opt_state,
            state.step + 1), metrics

    @jax.jit
    def evaluate(variables, points, gt_ctrl):
        ctrl = model.apply(variables, points, train=False)
        if closed:
            l_reg, _ = control_points_permute_closed_loss(ctrl, gt_ctrl,
                                                          grid, grid)
        else:
            l_reg, _ = control_points_permute_loss(ctrl, gt_ctrl, grid)
        cd, _ = spline_reconstruction_loss_one_sided(nu_j, nv_j, ctrl, points)
        return {"l_reg": l_reg, "cd": cd}

    return step, evaluate


def train_splinenet(*, data_path: str, closed=False, grid=20, k=10,
                    batch_size=4, lr=1e-3, loss_weight=0.9, steps=100,
                    eval_every=50, run_dir="trains/splinenet", seed=0):
    points, ctrl = load_spline_h5(data_path)
    n = points.shape[0]
    n_train = max(int(n * 0.9), 1)
    os.makedirs(run_dir, exist_ok=True)

    model = SplineNet(grid_size=grid, k=k)
    nu, nv = uniform_knot_bspline(grid, grid, 3, 3, 30)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.asarray(points[:1]))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    optimizer = optax.adam(lr)
    state = SplineTrainState(variables, optimizer.init(variables["params"]),
                             jnp.int32(0))
    step_fn, eval_fn = make_spline_train_step(
        model, optimizer, nu, nv, closed=closed, loss_weight=loss_weight,
        grid=grid)

    rng = np.random.RandomState(seed)
    history = []
    for it in range(steps):
        sel = rng.choice(n_train, batch_size, replace=n_train < batch_size)
        state, metrics = step_fn(state, jnp.asarray(points[sel]),
                                 jnp.asarray(ctrl[sel]))
        if (it + 1) % eval_every == 0 or it + 1 == steps:
            ev = eval_fn(state.variables, jnp.asarray(points[n_train:]),
                         jnp.asarray(ctrl[n_train:])) if n > n_train else \
                {k2: jnp.nan for k2 in ("l_reg", "cd")}
            rec = {"step": it + 1,
                   **{k2: float(v) for k2, v in metrics.items()},
                   **{"ts_" + k2: float(v) for k2, v in ev.items()}}
            history.append(rec)
            logger.info("%s", rec)
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(
            run_dir, "closed" if closed else "open")),
        jax.device_get(state.variables), force=True)
    with open(os.path.join(run_dir, "history.json"), "w") as f:
        json.dump(history, f)
    return state, history


def eval_splinenet(*, ckpt: str, data_path: str, closed=False, grid=20,
                   k=10, batch_size=4, num_points=700, test_fraction=0.1,
                   out_dir: str | None = None, save_meshes=False, seed=0):
    """Standalone trained-checkpoint evaluation (reference:
    splinenet/test_open_splines.py:85-211): chamfer (sqrt, two-sided)
    between the predicted surface and the input points, permute-invariant
    control-grid regression, laplacian — means over the test split.
    save_meshes dumps tessellated pred/gt surfaces as OBJ and the gt
    points as txt, the reference's per-shape artifacts (:153-195)."""
    import orbax.checkpoint as ocp

    points, ctrl = load_spline_h5(data_path)
    n = points.shape[0]
    n_train = max(int(n * (1 - test_fraction)), 1)
    pts_test, ctrl_test = points[n_train:], ctrl[n_train:]
    if pts_test.shape[0] == 0:  # tiny fixture: evaluate on everything
        pts_test, ctrl_test = points, ctrl

    model = SplineNet(grid_size=grid, k=k)
    variables = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
    nu, nv = uniform_knot_bspline(grid, grid, 3, 3, 30)
    nu_j, nv_j = jnp.asarray(nu), jnp.asarray(nv)

    @jax.jit
    def fwd(pts):
        ctrl_pred = model.apply(variables, pts, train=False)
        cd, reconst = spline_reconstruction_loss(nu_j, nv_j, ctrl_pred, pts,
                                                 sqrt=True)
        return ctrl_pred, cd, reconst

    rng = np.random.RandomState(seed)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    test_reg, test_cd, test_lap = [], [], []
    m = pts_test.shape[0]
    for b0 in range(0, m, batch_size):
        pts_b = pts_test[b0:b0 + batch_size]
        ctrl_b = ctrl_test[b0:b0 + batch_size]
        # the reference shuffles and subsamples the input to num_points
        # (test_open_splines.py:105-108)
        sel = rng.permutation(pts_b.shape[1])[:min(num_points,
                                                   pts_b.shape[1])]
        ctrl_pred, cd, reconst = fwd(jnp.asarray(pts_b[:, sel]))
        if closed:
            l_reg, permuted = control_points_permute_closed_loss(
                ctrl_pred, jnp.asarray(ctrl_b), grid, grid)
        else:
            l_reg, permuted = control_points_permute_loss(
                ctrl_pred, jnp.asarray(ctrl_b), grid)
        lap = laplacian_loss(
            ctrl_pred.reshape(-1, grid, grid, 3), permuted)
        test_reg.append(float(l_reg))
        test_cd.append(float(cd))
        test_lap.append(float(lap))
        if save_meshes and out_dir:
            from sednet_tpu.postproc.arg2mesh import save_obj
            from sednet_tpu.utils.mesh import tessellate_points

            gt_surf = np.asarray(sample_from_control_grid(
                nu_j, nv_j, jnp.asarray(
                    ctrl_b.reshape(-1, grid * grid, 3)), grid, grid))
            reconst = np.asarray(reconst)
            for bi in range(pts_b.shape[0]):
                sid = b0 + bi
                v, f = tessellate_points(reconst[bi], 30, 30)
                save_obj(os.path.join(out_dir, f"pred_{sid}.obj"), v, f)
                v, f = tessellate_points(gt_surf[bi], 30, 30)
                save_obj(os.path.join(out_dir, f"gt_{sid}.obj"), v, f)
                np.savetxt(os.path.join(out_dir, f"gt_points_{sid}.txt"),
                           pts_b[bi], fmt="%0.4f", delimiter=";")
    results = {"test_reg": float(np.mean(test_reg)),
               "test_cd": float(np.mean(test_cd)),
               "test_lap": float(np.mean(test_lap)),
               "n_shapes": int(m)}
    logger.info("Test Reg Loss: %(test_reg)s, Test CD Loss: %(test_cd)s, "
                "Test Lap: %(test_lap)s", results)
    print(json.dumps(results))
    return results


def dump_predictions(config_path: str, *, data_root=".", out_path=None,
                     limit=None):
    """Prediction-dump tool (reference:
    splinenet/generate_predictions.py:125-164): segmentation model forward
    + guarded mean-shift over the test split, packed into predictions.h5
    {seg_id (S, N), prim (S, N)}."""
    import h5py

    from sednet_tpu.config import load_config
    from sednet_tpu.predict import run_prediction

    cfg = load_config(config_path)
    summary, metrics = run_prediction(cfg, data_root=data_root,
                                      save_viz=False, limit=limit)
    seg = np.stack([m["cluster_ids"] for m in metrics])
    prim = np.stack([m["pred_primitives"] for m in metrics])
    out_path = out_path or "predictions.h5"
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with h5py.File(out_path, "w") as hf:
        hf.create_dataset("seg_id", data=seg.astype(np.int32))
        hf.create_dataset("prim", data=prim.astype(np.int32))
    logger.info("wrote %s: %s shapes, summary %s", out_path, seg.shape[0],
                summary)
    return out_path, summary


def main(argv=None):
    import sys as _sys

    logging.basicConfig(level=logging.INFO)
    argv = list(_sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "eval":
        p = argparse.ArgumentParser(prog="splinenet_train eval")
        p.add_argument("kind", choices=["open", "closed"])
        p.add_argument("--ckpt", required=True)
        p.add_argument("--data", required=True)
        p.add_argument("--grid", type=int, default=20)
        p.add_argument("--k", type=int, default=10)
        p.add_argument("--batch-size", type=int, default=4)
        p.add_argument("--num-points", type=int, default=700)
        p.add_argument("--out-dir", default=None)
        p.add_argument("--save-meshes", action="store_true")
        a = p.parse_args(argv[1:])
        eval_splinenet(ckpt=a.ckpt, data_path=a.data,
                       closed=a.kind == "closed", grid=a.grid, k=a.k,
                       batch_size=a.batch_size, num_points=a.num_points,
                       out_dir=a.out_dir, save_meshes=a.save_meshes)
        return
    if argv and argv[0] == "dump":
        p = argparse.ArgumentParser(prog="splinenet_train dump")
        p.add_argument("config")
        p.add_argument("--data-root", default=".")
        p.add_argument("--out", default="predictions.h5")
        p.add_argument("--limit", type=int, default=None)
        a = p.parse_args(argv[1:])
        dump_predictions(a.config, data_root=a.data_root, out_path=a.out,
                         limit=a.limit)
        return
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["open", "closed"])
    p.add_argument("--data", required=True)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--grid", type=int, default=20)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--loss-weight", type=float, default=0.9)
    p.add_argument("--run-dir", default="trains/splinenet")
    a = p.parse_args(argv)
    train_splinenet(data_path=a.data, closed=a.kind == "closed",
                    grid=a.grid, k=a.k, batch_size=a.batch_size, lr=a.lr,
                    loss_weight=a.loss_weight, steps=a.steps,
                    run_dir=a.run_dir)


if __name__ == "__main__":
    main()
