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

CLI: python -m sednet_tpu.splinenet_train {open|closed} --data FILE
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


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
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
