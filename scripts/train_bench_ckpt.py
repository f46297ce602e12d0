"""Production-shape training: stability sweep + the bench's trained weights.

Trains SEDNet at the reference's production shape (10k points, k=64,
emb=128) on synthetic data for each requested seed, evaluates the full
reference-default predict path (HPNet spectral + guarded mean-shift +
matched IoU) on held-out shapes, prints one JSON line per seed, and
(--save) writes the best seed's {type, inst} checkpoints to
checkpoints/bench_10k.npz — the artifact bench.py picks up so every bench
config runs on trained weights.

Usage: python scripts/train_bench_ckpt.py --steps 400 --seeds 0,1,2 --save
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed(args, root, seed):
    import jax

    from sednet_tpu.config import Config
    from sednet_tpu.predict import run_prediction
    from sednet_tpu.train import load_params, train

    cfg = Config(
        num_points=args.n_points, knn=args.knn, embed=args.embed,
        batch_size=args.batch_size, lr=args.lr,
        eval_T=max(args.steps // 3, 10), epochs=10 ** 6,
        ms_num_samples=min(5000, args.n_points),
        edge_topk=min(2000, args.n_points), mesh_shape=1, seed=seed,
        warmup_steps=args.warmup, grad_clip=args.grad_clip,
    )
    run_dir = os.path.join(args.workdir, f"run_seed{seed}")
    t0 = time.time()
    state, history = train(cfg, data_root=root, max_steps=args.steps,
                           run_dir=run_dir, use_edge_dataset=False,
                           log_every=50)
    train_s = time.time() - t0

    ckpts = os.path.join(run_dir, "ckpts")
    cfg.pretrain_model_path = os.path.join(ckpts, "best_type")
    cfg.pretrain_model_type_path = os.path.join(ckpts, "best_inst")
    cfg.hpnet_embed = True  # reference-default eval path
    t0 = time.time()
    summary, _ = run_prediction(
        cfg, data_root=root, save_viz=False,
        out_dir=os.path.join(args.workdir, f"pred_seed{seed}"),
        batch_size=args.eval_shapes, limit=args.eval_shapes)
    rec = {
        "seed": seed, "steps": args.steps, "lr": args.lr,
        "warmup": args.warmup, "grad_clip": args.grad_clip,
        "n_points": args.n_points,
        "inst_iou": round(summary["inst_iou"], 4),
        "type_iou": round(summary["type_iou"], 4),
        "inst_recall": round(summary["inst_recall"], 4),
        "TsE": round(history[-1]["TsE"], 4),
        "TsP": round(history[-1]["TsP"], 4),
        "train_s": round(train_s, 1),
        "eval_s": round(time.time() - t0, 1),
    }
    print("SEED_RESULT " + json.dumps(rec), flush=True)
    return rec, ckpts, load_params


def oracle_rows(root, args):
    """Quality CEILING rows for the synthetic fixtures (VERDICT r3 #4).

    (a) metric identity: GT labels through the full SIOU_usecd stack must
        score 1.0 — validates the metric implementation end to end.
    (b) clustering ceiling: guarded mean-shift (the reference protocol's
        exact clustering, quantile 0.015 / 50 iters / <=49-cluster guard)
        on embeddings built from GT one-hots — what a PERFECT embedding
        network would let the clustering stage achieve on these shapes.
    (c) same with 0.05-sigma gaussian corruption on the one-hot rows — a
        near-perfect-embedding bound, more honest about bandwidth
        estimation than the orthogonal ideal.
    """
    import jax
    import jax.numpy as jnp

    from sednet_tpu.cluster import guard_mean_shift
    from sednet_tpu.data.datasets import ParseNetDataset
    from sednet_tpu.metrics import siou_matched_segments_usecd, to_one_hot

    ds = ParseNetDataset(root, train=False, normals=True)
    n_eval = min(args.eval_shapes, len(ds))
    rows = {"metric_identity": [], "cluster_onehot": [], "cluster_noisy": []}
    rng = np.random.RandomState(0)
    for i in range(n_eval):
        item = ds[i]
        labels = np.asarray(item["labels"]).astype(np.int64)
        prim = np.asarray(item["prim"]).astype(np.int64)
        points = np.asarray(item["points"], np.float32)

        def usecd(pred):
            w = to_one_hot(pred, max(int(pred.max()) + 1, 1))
            s_iou, _, _, _, _ = siou_matched_segments_usecd(
                labels, pred, prim, prim, w, points)
            return float(s_iou)

        rows["metric_identity"].append(usecd(labels))

        emb0 = to_one_hot(labels, max(int(labels.max()) + 1, 2))
        for key_name, noise in (("cluster_onehot", 0.0),
                                ("cluster_noisy", 0.05)):
            emb = emb0 + noise * rng.randn(*emb0.shape).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12
            res = guard_mean_shift(
                jax.random.PRNGKey(i), jnp.asarray(emb),
                num_samples=min(5000, emb.shape[0]), quantile=0.015,
                iterations=50)
            rows[key_name].append(usecd(np.asarray(res.labels)
                                        .astype(np.int64)))
    rec = {k: round(float(np.mean(v)), 4) for k, v in rows.items()}
    rec["n_shapes"] = n_eval
    print("ORACLE " + json.dumps(rec), flush=True)
    assert rec["metric_identity"] > 0.999, (
        "GT-through-SIOU must be 1.0; the metric stack is broken: "
        f"{rec['metric_identity']}")
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--seeds", default="0")
    p.add_argument("--n-points", type=int, default=10000)
    p.add_argument("--knn", type=int, default=64)
    p.add_argument("--embed", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=0,
                   help="linear lr warmup steps (config.warmup_steps)")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="global-norm gradient clip (config.grad_clip)")
    p.add_argument("--n-train", type=int, default=48)
    p.add_argument("--eval-shapes", type=int, default=8)
    p.add_argument("--workdir", default="/tmp/sednet_bench_ckpt")
    p.add_argument("--save", action="store_true",
                   help="write checkpoints/bench_10k.npz from the best seed")
    p.add_argument("--stability-out", default="",
                   help="write the cross-seed STABILITY table to this path "
                        "(scripts/quality_gate.py --stability reads it)")
    p.add_argument("--oracle", action="store_true",
                   help="print metric-identity and clustering-ceiling rows "
                        "for the eval fixtures (no training)")
    args = p.parse_args()

    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from sednet_tpu.data import write_parsenet_h5

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir, f"data_{args.n_points}")
    if not os.path.exists(os.path.join(root, "data_parsenet")):
        print("generating synthetic dataset ...", flush=True)
        write_parsenet_h5(root, n_shapes=args.n_train,
                          n_points=args.n_points, seed=0)

    if args.oracle:
        oracle_rows(root, args)
        return

    seeds = [int(s) for s in args.seeds.split(",")]
    results = []
    best = None
    for seed in seeds:
        rec, ckpts, load_params = run_seed(args, root, seed)
        results.append(rec)
        if best is None or rec["inst_iou"] > best[0]["inst_iou"]:
            best = (rec, ckpts)

    ious = [r["inst_iou"] for r in results]
    table = {"seeds": seeds, "steps": args.steps, "inst_iou": ious,
             "type_iou": [r["type_iou"] for r in results],
             "inst_recall": [r["inst_recall"] for r in results],
             "spread": round(max(ious) - min(ious), 4),
             "mean": round(float(sum(ious) / len(ious)), 4)}
    print("STABILITY " + json.dumps(table), flush=True)
    if args.stability_out:
        with open(args.stability_out, "w") as f:
            json.dump(table, f, indent=1)
        print(f"WROTE {args.stability_out}", flush=True)

    if args.save and best is not None:
        from sednet_tpu.train import save_params_npz

        out = os.path.join(REPO, "checkpoints", "bench_10k.npz")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        ck = {"type": load_params(os.path.join(best[1], "best_type")),
              "inst": load_params(os.path.join(best[1], "best_inst"))}
        save_params_npz(out, ck)
        print(f"SAVED {out} (seed {best[0]['seed']}, "
              f"inst_iou {best[0]['inst_iou']})", flush=True)


if __name__ == "__main__":
    main()
