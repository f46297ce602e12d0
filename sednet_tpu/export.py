"""AOT export / serving artifacts for SEDNet inference.

The reference has no deployment story at all — inference is the
`generate_predictions_aug.py` research script run from a torch checkout
(reference: generate_predictions_aug.py:76-198). On TPU the natural
production form is an ahead-of-time compiled artifact: `jax.export`
serializes the jitted forward — StableHLO plus the Mosaic custom calls
of the Pallas kNN kernels — into a version-stamped byte blob that a
serving process can deserialize and run WITHOUT the model source, flax,
or this package (only jax itself). Parameters are embedded as
constants, so one file is the whole model.

A "bundle" is a directory holding:
    type_model.jaxexport    exported forward of the type/edge model
    inst_model.jaxexport    exported forward of the instance model
    meta.json               config snapshot + input spec + jax version

Shapes are static (the framework-wide design stance, SURVEY §7.1): one
artifact per (batch, num_points) serving shape; export several batch
sizes if the server bucketizes.

CLI:
    python -m sednet_tpu.export <cfg.yml> --type-ckpt C1 --inst-ckpt C2 \
        --out bundle_dir [--batch 8] [--platforms tpu,cpu]
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from sednet_tpu.config import Config


def _forward_fn(model, params):
    """Self-contained inference forward: x (B, N, C) -> dict of arrays.

    Returns a plain dict (not the SEDNetOutput struct) so the artifact's
    calling convention is stable across package versions and the
    deserializing process needs no pytree registrations beyond dict.
    """

    def fn(x):
        out = model.apply({"params": params}, x)
        res = {"embedding": out.embedding,
               "type_log_prob": out.type_log_prob,
               "type_logits": out.type_logits}
        if out.edge_logits is not None:
            res["edge_logits"] = out.edge_logits
        if out.normals_pred is not None:
            res["normals_pred"] = out.normals_pred
        return res

    return fn


def export_forward(model, params, batch_size: int, num_points: int,
                   channels: int, *, platforms=None) -> jax_export.Exported:
    """AOT-export the inference forward at a fixed serving shape.

    platforms: list like ["tpu"] / ["tpu", "cpu"] — cross-platform
    lowering happens at export time, no TPU needed to produce a TPU
    artifact. Default: the current backend.

    Kernel dispatch (Pallas vs XLA fallback) is a trace-time decision, so
    the trace runs under ops.dispatch.force_backend matching the TARGET:
    a single-platform ["tpu"] export embeds the fused Mosaic kernel path
    regardless of the exporting host, and a ["cpu"] or multi-platform
    list forces the portable pure-XLA path (one jaxpr must serve every
    listed platform, and the Mosaic calls only lower on TPU) — also when
    exporting FROM a TPU host.
    """
    from sednet_tpu.ops.dispatch import force_backend, target_backend

    fn = jax.jit(_forward_fn(model, params))
    spec = jax.ShapeDtypeStruct((batch_size, num_points, channels),
                                jnp.float32)
    kwargs = {}
    want = target_backend()
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
        want = platforms[0] if len(platforms) == 1 else "cpu"
    if want != target_backend():
        with force_backend(want):
            return jax_export.export(fn, **kwargs)(spec)
    return jax_export.export(fn, **kwargs)(spec)


def save_bundle(out_dir: str, cfg: Config, exported: dict[str, jax_export.Exported]) -> None:
    """Write exported models + a meta.json describing them."""
    os.makedirs(out_dir, exist_ok=True)
    meta = {"jax_version": jax.__version__,
            "config": cfg.asdict(),
            "models": {}}
    for name, exp in exported.items():
        path = os.path.join(out_dir, f"{name}.jaxexport")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        meta["models"][name] = {
            "file": f"{name}.jaxexport",
            "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
        }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_bundle(bundle_dir: str):
    """Load a bundle for serving: returns (meta, {name: callable}).

    Each callable takes x (B, N, C) f32 at the exported shape and returns
    the output dict. Runs on any platform the artifact was exported for.
    """
    with open(os.path.join(bundle_dir, "meta.json")) as f:
        meta = json.load(f)
    fns = {}
    for name, info in meta["models"].items():
        with open(os.path.join(bundle_dir, info["file"]), "rb") as f:
            exp = jax_export.deserialize(f.read())
        fns[name] = jax.jit(exp.call)
    return meta, fns


def export_serving_bundle(cfg: Config, params_type, params_inst,
                          out_dir: str, *, batch_size: int | None = None,
                          platforms=None) -> None:
    """Export the two-checkpoint inference API (type model + inst model,
    the reference's convention, generate_predictions_aug.py:142-198) as
    one serving bundle."""
    from sednet_tpu.train import build_model

    model = build_model(cfg)
    b = batch_size or cfg.batch_size
    c = 6 if cfg.normals else 3
    exported = {
        "type_model": export_forward(model, params_type, b, cfg.num_points,
                                     c, platforms=platforms),
        "inst_model": export_forward(model, params_inst, b, cfg.num_points,
                                     c, platforms=platforms),
    }
    save_bundle(out_dir, cfg, exported)


def main(argv=None):
    import argparse

    from sednet_tpu.config import load_config
    from sednet_tpu.train import load_params

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--type-ckpt", required=True)
    ap.add_argument("--inst-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated, e.g. tpu,cpu")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    pt = load_params(args.type_ckpt)
    pi = load_params(args.inst_ckpt)
    for p in (pt, pi):
        if isinstance(p, dict) and set(p) == {"params"}:
            raise SystemExit("pass raw param trees, not {'params': ...}")
    platforms = args.platforms.split(",") if args.platforms else None
    export_serving_bundle(cfg, pt, pi, args.out, batch_size=args.batch,
                          platforms=platforms)
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in sorted(os.listdir(args.out))}
    print(json.dumps({"bundle": args.out, "files": sizes}))


if __name__ == "__main__":
    main()
