"""Tests: ParseNet legacy model, e2e fitting loss, splinenet trainer,
instance re-clustering, tessellation."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sednet_tpu.config import Config
from sednet_tpu.models.parsenet import ParseNetEmbedding
from sednet_tpu.utils.mesh import grid_pointclouds, tessellate_points


def test_parsenet_embedding_concat_shapes(rng):
    model = ParseNetEmbedding(emb_size=16, num_primitives=6, mode=0, k=4,
                              late_fusion=True, edge_module=True)
    x = jnp.asarray(rng.randn(1, 48, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    # emb_size + 6 softmax types + 2 softmax edges
    assert out.embedding.shape == (1, 48, 24)
    probs = np.asarray(out.embedding[0, :, 16:22].sum(-1))
    np.testing.assert_allclose(probs, 1.0, atol=1e-4)


def test_e2e_fitting_loss_grad_flows(rng):
    from sednet_tpu.parsenet_e2e import (MAX_SEGS, build_match_arrays,
                                         cluster_for_matching,
                                         e2e_fitting_loss)
    from sednet_tpu.data.synthetic import make_synthetic_shape

    d = make_synthetic_shape(rng, n_points=300, n_segments=3)
    # oracle embedding, slightly noisy
    emb = np.eye(8, dtype=np.float32)[d["labels"]] + \
        0.05 * rng.randn(300, 8).astype(np.float32)
    emb = jnp.asarray(emb)
    cid, cmask, bw = cluster_for_matching(jax.random.PRNGKey(0), emb,
                                          num_samples=300, quantile=0.2)
    cr, st, gm, pm = build_match_arrays(np.asarray(cid), np.asarray(cmask),
                                        d["labels"], d["prim"])
    assert (st > 0).sum() >= 2  # geometric segments matched

    def f(e):
        return e2e_fitting_loss(e, jnp.asarray(d["points"]),
                                jnp.asarray(d["normals"]),
                                jnp.asarray(cr), jnp.asarray(st),
                                jnp.asarray(gm), bw)

    loss = float(f(emb))
    assert np.isfinite(loss) and loss < 0.1  # near-perfect clusters fit well
    g = jax.grad(f)(emb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_e2e_train_step_runs(rng):
    from sednet_tpu.parsenet_e2e import E2EState, e2e_train_batch, make_e2e_train_step
    from sednet_tpu.data.synthetic import make_synthetic_shape
    from sednet_tpu.train import build_model

    cfg = Config(num_points=128, knn=4, embed=8, edge_topk=16)
    model = build_model(cfg)
    shapes = [make_synthetic_shape(rng, 128, 3) for _ in range(2)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in shapes]))
             for k in ("points", "normals", "labels", "prim")}
    batch["labels"] = batch["labels"].astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 6)))["params"]
    opt = optax.adam(1e-4)
    state = E2EState(params, opt.init(params), jnp.int32(0))
    step = make_e2e_train_step(model, opt, cfg)
    state, metrics = e2e_train_batch(model, state, batch, cfg, step,
                                     jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["fit"]))
    assert int(state.step) == 1


def test_splinenet_trainer(tmp_path):
    from sednet_tpu.splinenet_train import (load_spline_h5, train_splinenet,
                                            write_spline_h5)

    path = str(tmp_path / "splines.h5")
    write_spline_h5(path, n_patches=6, n_points=120, grid=5)
    pts, ctrl = load_spline_h5(path)
    assert pts.shape == (6, 120, 3) and ctrl.shape == (6, 5, 5, 3)

    state, history = train_splinenet(
        data_path=path, grid=5, k=4, batch_size=2, steps=8, eval_every=4,
        run_dir=str(tmp_path / "run"))
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    assert os.path.isdir(tmp_path / "run" / "open")


def test_resplit_instances(rng):
    from sednet_tpu.postproc.inst_cluster import resplit_instances

    # two well-separated blobs mislabeled as one instance
    a = rng.randn(120, 3) * 0.05
    b = rng.randn(120, 3) * 0.05 + np.array([3.0, 0, 0])
    pts = np.concatenate([a, b]).astype(np.float32)
    nrm = np.tile([0.0, 0, 1], (240, 1)).astype(np.float32)
    insts = np.zeros(240, np.int32)
    types = np.ones(240, np.int32)
    out = resplit_instances(pts, nrm, insts, types, ratio_thresh=0.5,
                            quantile=0.2)
    assert len(np.unique(out)) >= 2
    # the split should separate the blobs
    assert len(np.unique(out[:120])) == 1
    assert len(np.unique(out[120:])) == 1
    assert out[0] != out[200]


def test_tessellate_points():
    u, v = np.meshgrid(np.linspace(0, 1, 4), np.linspace(0, 1, 3))
    pts = np.stack([u.ravel(), v.ravel(), np.zeros(12)], 1)
    verts, faces = tessellate_points(pts, 4, 3)
    assert verts.shape == (12, 3)
    assert len(faces) == 2 * 3 * 2
    assert max(max(f) for f in faces) == 12

    g = grid_pointclouds([pts, pts, pts], cols=2)
    assert g.shape == (36, 3)


def test_splinenet_eval_cli_roundtrip(tmp_path):
    """Train -> saved checkpoint -> standalone eval subcommand (reference:
    splinenet/test_open_splines.py protocol): the eval must load the ckpt
    the trainer wrote and report finite reg/cd/lap means; save-meshes dumps
    the per-shape artifacts."""
    from sednet_tpu.splinenet_train import (eval_splinenet, main,
                                            train_splinenet, write_spline_h5)

    path = str(tmp_path / "splines.h5")
    write_spline_h5(path, n_patches=6, n_points=120, grid=5)
    train_splinenet(data_path=path, grid=5, k=4, batch_size=2, steps=6,
                    eval_every=6, run_dir=str(tmp_path / "run"))
    out_dir = str(tmp_path / "evalout")
    res = eval_splinenet(ckpt=str(tmp_path / "run" / "open"),
                         data_path=path, grid=5, k=4, batch_size=2,
                         num_points=120, out_dir=out_dir, save_meshes=True)
    assert np.isfinite(res["test_cd"]) and np.isfinite(res["test_reg"])
    assert os.path.exists(os.path.join(out_dir, "pred_0.obj"))
    assert os.path.exists(os.path.join(out_dir, "gt_points_0.txt"))
    # CLI wiring: the eval subcommand parses and runs end to end
    main(["eval", "open", "--ckpt", str(tmp_path / "run" / "open"),
          "--data", path, "--grid", "5", "--k", "4", "--batch-size", "2",
          "--num-points", "120"])


def test_splinenet_dump_predictions(tmp_path):
    """The dump subcommand mirrors splinenet/generate_predictions.py:
    predictions.h5 with {seg_id, prim} stacked over test shapes."""
    import h5py
    import json

    from sednet_tpu.config import Config
    from sednet_tpu.data import write_parsenet_h5
    from sednet_tpu.models import SEDNet
    from sednet_tpu.splinenet_train import dump_predictions
    from sednet_tpu.train import build_model

    root = str(tmp_path)
    n = 100
    write_parsenet_h5(root, n_shapes=3, n_points=n)
    cfg = Config(num_points=n, knn=4, embed=16, hpnet_embed=False,
                 ms_num_samples=n, edge_topk=16, num_test=3)
    model = build_model(cfg)
    x = jnp.zeros((1, n, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    import orbax.checkpoint as ocp

    ckpt = str(tmp_path / "ckpt")
    ocp.PyTreeCheckpointer().save(ckpt, jax.device_get(params), force=True)
    cfg.pretrain_model_path = ckpt
    cfg.pretrain_model_type_path = ckpt
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    out = str(tmp_path / "pred" / "predictions.h5")
    dump_predictions(cfg_path, data_root=root, out_path=out)
    with h5py.File(out) as hf:
        assert hf["seg_id"].shape == (3, n)
        assert hf["prim"].shape == (3, n)
