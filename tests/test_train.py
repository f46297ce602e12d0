"""End-to-end training smoke test on the virtual CPU mesh + synthetic data."""
import json
import os

import numpy as np
import jax
import pytest

from sednet_tpu.config import load_config
from sednet_tpu.data import write_edge_h5, write_parsenet_h5
from sednet_tpu.train import train, load_params


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    write_parsenet_h5(root, n_shapes=8, n_points=128)
    write_edge_h5(root, n_shapes=4, n_points=128)
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "config_test_tiny.yml"))
    run_dir = str(tmp_path_factory.mktemp("run"))
    state, history = train(cfg, data_root=root, max_steps=12,
                           run_dir=run_dir)
    return cfg, state, history, run_dir


def test_config_parse():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "config_test_tiny.yml"))
    assert cfg.batch_size == 4
    assert cfg.knn == 8
    assert cfg.epochs == 2
    assert cfg.mesh_shape == 2
    assert cfg.input_drop == 0.0
    assert cfg.optim == "adamW"


def test_train_runs_and_improves(tiny_run):
    cfg, state, history, run_dir = tiny_run
    assert int(state.step) == 12
    assert len(history) == 2  # eval at steps 6 and 12
    for rec in history:
        for k in ("TrL", "TsL", "TrP", "TsP", "TrE", "TsE", "TsI",
                  "TrEdgeCls", "TrEdgeEmbed", "criterion", "lr"):
            assert np.isfinite(rec[k]), k
    # training signal: later train loss below the first
    assert history[-1]["TrL"] < history[0]["TrL"] * 1.5  # no blow-up


def test_checkpoints_written_and_loadable(tiny_run):
    cfg, state, history, run_dir = tiny_run
    ckpt_root = os.path.join(run_dir, "ckpts")
    assert os.path.isdir(os.path.join(ckpt_root, "best_total"))
    assert os.path.isdir(os.path.join(ckpt_root, "latest"))
    params = load_params(os.path.join(ckpt_root, "latest"))
    live = jax.device_get(state.params)
    flat_l, _ = jax.tree_util.tree_flatten(live)
    flat_c, _ = jax.tree_util.tree_flatten(params)
    assert len(flat_l) == len(flat_c)
    np.testing.assert_allclose(np.asarray(flat_l[0]), np.asarray(flat_c[0]))


def test_tolerant_preload(tiny_run, tmp_path):
    """Shape-mismatched leaves are dropped, matching ones loaded
    (reference: train_sed_net.py on_load_checkpoint)."""
    import jax.numpy as jnp
    from sednet_tpu.train import build_model, load_params_tolerant
    from sednet_tpu.config import Config

    cfg, state, history, run_dir = tiny_run
    ckpt = os.path.join(run_dir, "ckpts", "latest")
    # template with a DIFFERENT embedding size -> final head mismatched
    cfg2 = Config(**{**cfg.asdict(), "embed": cfg.embed * 2})
    model2 = build_model(cfg2)
    template = model2.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, cfg.num_points, 6)))["params"]
    merged = load_params_tolerant(template, ckpt)
    # matching layer adopted from the checkpoint
    trained = jax.device_get(state.params)
    np.testing.assert_allclose(
        np.asarray(merged["conv1"]["kernel"]),
        np.asarray(trained["conv1"]["kernel"]))
    # mismatched final head kept at its init shape
    assert merged["mlp_seg_prob2"]["kernel"].shape[1] == cfg.embed * 2


def test_optimizer_resume(tiny_run, tmp_path_factory):
    """Training resumes from latest + latest_opt (reference's
    pretrain_opti_path path, train_sed_net.py:170-176)."""
    from sednet_tpu.data import write_parsenet_h5
    from sednet_tpu.train import train

    cfg, state, history, run_dir = tiny_run
    assert os.path.isdir(os.path.join(run_dir, "ckpts", "latest_opt"))
    root = str(tmp_path_factory.mktemp("data2"))
    write_parsenet_h5(root, n_shapes=8, n_points=cfg.num_points)
    cfg2 = type(cfg)(**{**cfg.asdict(),
                        "preload_model": True,
                        "pretrain_model_path": os.path.join(
                            run_dir, "ckpts", "latest"),
                        "pretrain_opti_path": os.path.join(
                            run_dir, "ckpts", "latest_opt"),
                        "lr": 5e-4})
    run2 = str(tmp_path_factory.mktemp("run2"))
    state2, history2 = train(cfg2, data_root=root, max_steps=6, run_dir=run2)
    assert int(state2.step) == 6
    assert np.isfinite(history2[-1]["TrL"])
    assert history2[-1]["lr"] == pytest.approx(5e-4)


def test_metrics_jsonl_written(tiny_run):
    _, _, _, run_dir = tiny_run
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    assert len(lines) >= 2
    rec = json.loads(lines[0])
    assert "criterion" in rec and "saved" in rec
    assert os.path.exists(os.path.join(run_dir, "config.json"))


def test_cosine_scheduler_matches_torch():
    """CosineScheduler must follow torch.optim CosineAnnealingLR exactly —
    including PAST T_max, where the cosine reflects instead of restarting
    (reference: train_sed_net.py:205-206)."""
    import torch

    from sednet_tpu.train import CosineScheduler

    lr = 1e-4
    sched = CosineScheduler(lr, t_max=10)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    ref = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=10, eta_min=lr / 20)
    for _ in range(25):
        ref.step()
        got = sched.step(0.0)
        want = opt.param_groups[0]["lr"]
        assert abs(got - want) < 1e-12, (sched.t, got, want)


def test_warmup_and_grad_clip(tmp_path):
    """cfg.warmup_steps ramps the injected lr linearly; cfg.grad_clip wraps
    the optimizer in a global-norm clip whose chained state
    set_learning_rate still reaches."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sednet_tpu.config import load_config
    from sednet_tpu.data import write_edge_h5, write_parsenet_h5
    from sednet_tpu.train import make_optimizer, set_learning_rate, train

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "config_test_tiny.yml"))
    cfg = dataclasses.replace(cfg, warmup_steps=4, grad_clip=1.0)

    # unit level: grad_clip wraps the optimizer in a chain whose state is
    # a plain tuple (clip stage + injected adamw) that set_learning_rate
    # still reaches, and a huge gradient still yields finite updates
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros((3,))}
    st = opt.init(params)
    assert isinstance(st, tuple) and not hasattr(st, "hyperparams")
    assert any(hasattr(s, "hyperparams") for s in st)
    st = set_learning_rate(st, 0.5)
    lr_holder = next(s for s in st if hasattr(s, "hyperparams"))
    assert float(lr_holder.hyperparams["learning_rate"]) == 0.5
    grads = {"w": jnp.full((3,), 1e6)}
    updates, _ = opt.update(grads, st, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # clip-free config: bare inject state, no chain tuple
    opt0 = make_optimizer(dataclasses.replace(cfg, grad_clip=0.0))
    st0 = opt0.init(params)
    assert hasattr(st0, "hyperparams")
    # the clip stage really bounds the gradient: with clipping the adamw
    # moments see norm<=1 grads, so the FIRST update must equal the
    # unclipped one (adam is scale-invariant on step one) but the second
    # moment state must differ by the clip factor
    _, s1 = opt.update(grads, st, params)
    _, s0 = opt0.update(grads, set_learning_rate(st0, 0.5), params)
    mx1 = max(float(np.max(np.abs(np.asarray(v))))
              for v in jax.tree.leaves(s1) if hasattr(v, "dtype"))
    mx0 = max(float(np.max(np.abs(np.asarray(v))))
              for v in jax.tree.leaves(s0) if hasattr(v, "dtype"))
    assert mx1 < mx0 / 1e3, (mx1, mx0)  # clipped moments are ~1e6x smaller

    root = str(tmp_path / "d")
    write_parsenet_h5(root, n_shapes=8, n_points=128)
    write_edge_h5(root, n_shapes=4, n_points=128)
    run = str(tmp_path / "r")
    state, history = train(cfg, data_root=root, max_steps=6, run_dir=run)
    # eval fires at step 6 (eval_T=6): warmup over, scheduler lr = cfg.lr
    assert history[-1]["lr"] == cfg.lr
    assert np.isfinite(history[-1]["TrL"])
