"""Training: data-parallel train/eval steps, schedules, 3-criteria checkpoints.

TPU-native rebuild of reference train_sed_net.py:
  * loss = triplet + label-smoothed type CE + weighted edge CE +
    0.25 * edge-embedding loss (train_sed_net.py:252-270);
  * type labels remapped {9,6,7}->0, 8->2 before the type loss (:254-255);
  * eval every eval_T iterations with criterion = pull/push embed loss +
    0.15 * type NLL (:298-356);
  * ReduceLROnPlateau(factor 0.5, patience, min_lr 5e-5) or cosine schedule
    stepped at eval time (:205-210, 361-364);
  * three best checkpoints (total / inst / type) + latest (:367-395) via
    orbax.

The train step is one jit-compiled program over a 1-D device mesh: batch
sharded on the data axis, params replicated, gradient all-reduce inserted
by the partitioner (replaces torch DataParallel, :149-150).

CLI: python -m sednet_tpu.train <config.yml> [--data-root DIR] [--steps N]
"""
from __future__ import annotations

import functools
import json
import logging
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sednet_tpu.config import Config, load_config
from sednet_tpu.losses import (
    TripletConfig,
    edge_cls_loss,
    edge_embedding_loss,
    evaluate_type_miou,
    label_smoothing_nll,
    primitive_nll,
    pull_push_embedding_loss,
    triplet_loss,
)
from sednet_tpu.models import SEDNet
from sednet_tpu.parallel import make_mesh, replicate, shard_batch

logger = logging.getLogger("sednet_tpu.train")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def build_model(cfg: Config) -> SEDNet:
    return SEDNet(
        emb_size=cfg.embed,
        num_primitives=cfg.num_primitives,
        mode=5 if cfg.normals else 0,
        k=cfg.knn,
        normal_metric_w=cfg.normal_metric_W,
        w_pos_enc=cfg.w_pos_enc,
        edge_module=cfg.edge_module,
        late_fusion=cfg.late_fusion,
        combine_label_prim=cfg.combine_label_prim,
        predict_normal=cfg.predict_normal,
        dtype=jnp.bfloat16 if cfg.model_bf16 else jnp.float32,
        factored_gn=cfg.factored_gn,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.optim == "adam":
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    else:
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay)
    if cfg.grad_clip > 0:
        # stability lever for production-scale (10k-pt) runs: the triplet
        # loss's hard-negative spikes are the suspected source of the
        # cross-seed inst_iou spread (ROADMAP round-3 item 3); clip BEFORE
        # the adam moments so a single spiked batch can't poison them
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def model_input(batch: dict, normals: bool) -> jax.Array:
    pts = batch["points"]
    if normals:
        return jnp.concatenate([pts, batch["normals"]], axis=-1)
    return pts


def remap_train_types(prim: jax.Array) -> jax.Array:
    """{9,6,7}->0, 8->2 (reference: train_sed_net.py:254-255)."""
    prim = jnp.where((prim == 9) | (prim == 6) | (prim == 7), 0, prim)
    return jnp.where(prim == 8, 2, prim)


def make_train_step(model: SEDNet, optimizer, cfg: Config):
    tri_cfg = TripletConfig(margin=cfg.triplet_margin,
                            max_segments=cfg.ms_max_clusters)

    def loss_fn(params, batch, key):
        out = model.apply({"params": params}, model_input(batch, cfg.normals))
        prim = remap_train_types(batch["prim"])
        emb_loss = triplet_loss(key, out.embedding, batch["labels"], tri_cfg)
        p_loss = label_smoothing_nll(out.type_log_prob, prim, cfg.smooth)
        e_loss = edge_cls_loss(out.edge_logits, batch["edges"],
                               batch["edges_w"])
        ee_loss = edge_embedding_loss(
            out.edge_logits, out.embedding, batch["labels"],
            edges_num=min(cfg.edge_topk, cfg.num_points),
            use_type=True, primitives=prim,
            type_log_prob=out.type_log_prob,
            max_segments=cfg.ms_max_clusters + 1)
        total = emb_loss + p_loss + e_loss + cfg.w_edge_embed_loss * ee_loss
        metrics = {"loss": total, "emb": emb_loss, "type": p_loss,
                   "edge_cls": e_loss, "edge_embed": ee_loss,
                   # train-side type mIoU = the reference's TrI
                   # (train_sed_net.py:339-354)
                   "iou": evaluate_type_miou(prim, out.type_log_prob)}
        return total, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model: SEDNet, cfg: Config):
    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, model_input(batch, cfg.normals))
        prim = remap_train_types(batch["prim"])
        emb_loss, _, _ = pull_push_embedding_loss(
            out.embedding, batch["labels"],
            max_segments=cfg.ms_max_clusters + 1)
        p_loss = primitive_nll(out.type_log_prob, prim)
        miou = evaluate_type_miou(prim, out.type_log_prob)
        return {"emb": emb_loss, "type": p_loss, "iou": miou,
                "loss": emb_loss + p_loss}

    return eval_step


class PlateauScheduler:
    """ReduceLROnPlateau equivalent (reference: train_sed_net.py:208-210):
    halve LR when the criterion hasn't improved for `patience` evals."""

    def __init__(self, lr: float, factor=0.5, patience=5, min_lr=5e-5):
        self.lr, self.factor, self.patience, self.min_lr = (
            lr, factor, patience, min_lr)
        self.best = float("inf")
        self.bad = 0

    def step(self, criterion: float) -> float:
        if criterion < self.best:
            self.best = criterion
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr


class CosineScheduler:
    """CosineAnnealingLR(T_max=10, eta_min=lr/20) stepped per eval
    (reference: train_sed_net.py:205-206)."""

    def __init__(self, lr: float, t_max=10):
        self.base, self.eta_min, self.t_max = lr, lr / 20, t_max
        self.t = 0

    def step(self, _criterion: float) -> float:
        # torch's closed form eta_min + (base-eta_min)(1+cos(pi t/T))/2 does
        # NOT reset at T_max: past it the cosine reflects back up (period
        # 2*T_max). A `t % t_max` sawtooth would snap to base lr every T_max.
        self.t += 1
        cos = (1 + np.cos(np.pi * self.t / self.t_max)) / 2
        return self.eta_min + (self.base - self.eta_min) * cos


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning_rate hyperparam in place. Handles both
    a bare inject_hyperparams state and the (clip, inject) chain tuple
    that cfg.grad_clip > 0 produces."""
    target = opt_state
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        target = next(s for s in opt_state if hasattr(s, "hyperparams"))
    target.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class CheckpointManager:
    """3-criteria best + latest checkpoints via orbax
    (reference: train_sed_net.py:367-395)."""

    def __init__(self, root: str):
        import orbax.checkpoint as ocp

        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        self.best_total = float("inf")
        self.best_inst = float("inf")
        self.best_type = float("inf")

    def _save(self, name: str, params):
        path = os.path.join(self.root, name)
        self._ckpt.save(path, params, force=True)

    def update(self, params, criterion: float, emb: float, type_loss: float,
               opt_state=None):
        saved = []
        if criterion < self.best_total:
            self.best_total = criterion
            self._save("best_total", params)
            saved.append("best_total")
        if emb < self.best_inst:
            self.best_inst = emb
            self._save("best_inst", params)
            saved.append("best_inst")
        if type_loss < self.best_type:
            self.best_type = type_loss
            self._save("best_type", params)
            saved.append("best_type")
        self._save("latest", params)
        if opt_state is not None:
            # optimizer state for resume (reference: pretrain_opti_path,
            # train_sed_net.py:170-176)
            self._save("latest_opt", jax.device_get(opt_state))
        return saved

    def load(self, name: str):
        return self._ckpt.restore(os.path.join(self.root, name))


def save_params_npz(path: str, params) -> None:
    """Flatten a param pytree into one .npz ("a/b/c" keys) — a portable,
    versionable single-file checkpoint (the bench's trained-weights
    artifact)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    np.savez_compressed(path, **flat)


def load_params(path: str):
    """Load a checkpoint: orbax directory, a flat .npz (save_params_npz),
    or a reference torch .pth (converted through utils.torch_import —
    released SED-Net weights load directly)."""
    if path.endswith((".pth", ".pt")):
        from sednet_tpu.utils.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    if path.endswith(".npz"):
        flat = np.load(path)
        tree: dict = {}
        for key in flat.files:
            node = tree
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(flat[key])
        return tree
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def load_params_tolerant(template, path: str):
    """Shape-mismatch-tolerant checkpoint load: keep checkpoint leaves whose
    shape matches the template, keep the template's init elsewhere
    (reference: train_sed_net.py on_load_checkpoint :97-113)."""
    loaded = load_params(path)
    if isinstance(loaded, dict) and set(loaded) == {"params"}:
        loaded = loaded["params"]

    def merge(tpl, new):
        if isinstance(tpl, dict):
            return {k: (merge(tpl[k], new[k]) if isinstance(new, dict)
                        and k in new else tpl[k]) for k in tpl}
        try:
            if np.shape(tpl) == np.shape(new):
                return jnp.asarray(new)
        except Exception:
            pass
        logger.info("dropping mismatched checkpoint leaf %s vs %s",
                    np.shape(new) if new is not None else None,
                    np.shape(tpl))
        return tpl

    return merge(template, loaded)


def train(cfg: Config, *, data_root: str = ".", max_steps: int | None = None,
          run_dir: str | None = None, use_edge_dataset: bool = True,
          log_every: int = 10):
    """Full training driver. Returns (final TrainState, history list)."""
    from sednet_tpu.data import (BatchLoader, EdgeDataset, MixedDataset,
                                 PrefetchLoader,
                                 ParseNetDataset)

    model_name = cfg.model_path.format("mix", cfg.lr, cfg.mode, cfg.knn)
    run_dir = run_dir or os.path.join("trains", model_name)
    os.makedirs(run_dir, exist_ok=True)
    cfg.save(os.path.join(run_dir, "config.json"))
    # snapshot the entry script alongside the config, like the reference
    # run-dir convention (train_sed_net.py:73-79)
    try:
        import shutil

        shutil.copy(os.path.abspath(__file__),
                    os.path.join(run_dir, "train_entry.py"))
    except OSError:
        pass
    logging.basicConfig(level=logging.INFO)

    mesh = make_mesh(cfg.mesh_shape)
    model = build_model(cfg)
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    sample_shape = (cfg.batch_size, cfg.num_points, 6 if cfg.normals else 3)
    params = model.init(init_key, jnp.zeros(sample_shape, jnp.float32))["params"]
    if cfg.preload_model and cfg.pretrain_model_path:
        logger.info("preloading params from %s", cfg.pretrain_model_path)
        params = load_params_tolerant(params, cfg.pretrain_model_path)
    opt_state = optimizer.init(params)
    if cfg.preload_model and cfg.pretrain_opti_path:
        # optimizer resume with LR override (reference: train_sed_net.py:170-176)
        import orbax.checkpoint as ocp

        logger.info("preloading optimizer from %s", cfg.pretrain_opti_path)
        opt_state = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(cfg.pretrain_opti_path),
            item=jax.device_get(opt_state))
        opt_state = set_learning_rate(opt_state, cfg.lr)
    state = TrainState(replicate(params, mesh), replicate(opt_state, mesh),
                       jnp.int32(0))

    train_ds = ParseNetDataset(data_root, train=True, normals=cfg.normals,
                               num_points=cfg.num_points,
                               max_segments=cfg.ms_max_clusters)
    if use_edge_dataset:
        try:
            edge_ds = EdgeDataset(data_root, train=True, normals=cfg.normals,
                                  num_points=cfg.num_points,
                                  max_segments=cfg.ms_max_clusters)
            train_ds = MixedDataset(train_ds, edge_ds)
        except (FileNotFoundError, OSError):
            logger.info("edge dataset not found; training on ParseNet only")
    test_ds = ParseNetDataset(data_root, train=False, normals=cfg.normals,
                              num_points=cfg.num_points,
                              max_segments=cfg.ms_max_clusters)

    loader = PrefetchLoader(
        BatchLoader(train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed))
    test_loader = BatchLoader(test_ds, cfg.batch_size, shuffle=False,
                              seed=cfg.seed)

    train_step = make_train_step(model, optimizer, cfg)
    eval_step = make_eval_step(model, cfg)
    sched = (CosineScheduler(cfg.lr) if cfg.sche == "cos"
             else PlateauScheduler(cfg.lr, patience=cfg.patience))
    ckpts = CheckpointManager(os.path.join(run_dir, "ckpts"))
    history = []
    metrics_log = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    step = 0
    train_accum: list[dict] = []
    done = False
    n_epochs = cfg.epochs if max_steps is None else 10 ** 9
    if len(loader) == 0:
        raise ValueError(
            f"empty train loader: dataset of {len(train_ds)} shapes yields "
            f"no batch at batch_size={cfg.batch_size} (drop_last) — the "
            "max_steps loop would spin through empty epochs forever")
    for epoch in range(n_epochs):
        if done:
            break
        for batch in loader:
            batch = shard_batch(batch, mesh)
            key, step_key = jax.random.split(key)
            if cfg.warmup_steps and step < cfg.warmup_steps:
                state = state._replace(opt_state=set_learning_rate(
                    state.opt_state,
                    cfg.lr * (step + 1) / cfg.warmup_steps))
            state, metrics = train_step(state, batch, step_key)
            train_accum.append(jax.device_get(metrics))
            step += 1
            if step % log_every == 0:
                m = {k: float(np.mean([a[k] for a in train_accum[-log_every:]]))
                     for k in train_accum[-1]}
                logger.info("epoch %d step %d %s", epoch, step,
                            {k: round(v, 4) for k, v in m.items()})

            if step % cfg.eval_T == 0 or (max_steps and step >= max_steps):
                evals = [jax.device_get(eval_step(state.params,
                                                  shard_batch(b, mesh)))
                         for b in test_loader]
                ts_e = float(np.mean([e["emb"] for e in evals]))
                ts_p = float(np.mean([e["type"] for e in evals]))
                ts_i = float(np.mean([e["iou"] for e in evals]))
                criterion = ts_e + 0.15 * ts_p  # reference :356
                lr = sched.step(criterion)
                state = state._replace(
                    opt_state=set_learning_rate(state.opt_state, lr))
                record = {
                    "step": step, "epoch": epoch,
                    "TrL": float(np.mean([a["loss"] for a in train_accum])),
                    "TsL": ts_e + ts_p,
                    "TrP": float(np.mean([a["type"] for a in train_accum])),
                    "TsP": ts_p,
                    "TrE": float(np.mean([a["emb"] for a in train_accum])),
                    "TsE": ts_e,
                    "TrI": float(np.mean([a["iou"] for a in train_accum])),
                    "TsI": ts_i,
                    "TrEdgeCls": float(np.mean([a["edge_cls"]
                                                for a in train_accum])),
                    "TrEdgeEmbed": float(np.mean([a["edge_embed"]
                                                  for a in train_accum])),
                    "criterion": criterion, "lr": lr,
                }
                saved = ckpts.update(jax.device_get(state.params), criterion,
                                     ts_e, ts_p, opt_state=state.opt_state)
                record["saved"] = saved
                history.append(record)
                metrics_log.write(json.dumps(record) + "\n")
                metrics_log.flush()
                logger.info("eval %s", {k: (round(v, 4)
                                            if isinstance(v, float) else v)
                                        for k, v in record.items()})
                train_accum = []
            if max_steps and step >= max_steps:
                done = True
                break
    metrics_log.close()
    return state, history


def main(argv=None):
    import argparse

    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--data-root", default=".")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--run-dir", default=None)
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    train(cfg, data_root=args.data_root, max_steps=args.steps,
          run_dir=args.run_dir)


if __name__ == "__main__":
    main()
