"""Full-system demo: train SEDNet on synthetic shapes (TPU), then run the
prediction pipeline with the trained checkpoints and report matched IoU.

Usage: python scripts/demo_train_predict.py [--steps 300] [--n-points 2048]
Writes everything under --workdir (default /tmp/sednet_demo).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--n-points", type=int, default=2048)
    p.add_argument("--knn", type=int, default=32)
    p.add_argument("--embed", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-train", type=int, default=48)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--workdir", default="/tmp/sednet_demo")
    p.add_argument("--hpnet", action="store_true")
    # matrix-free spectral is the config default now; --dense-spectral
    # selects the dense-affinity fallback path instead
    p.add_argument("--dense-spectral", action="store_true")
    args = p.parse_args()

    from sednet_tpu.config import Config
    from sednet_tpu.data import write_parsenet_h5
    from sednet_tpu.predict import run_prediction
    from sednet_tpu.train import train

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir, "data")
    if not os.path.exists(os.path.join(root, "data_parsenet")):
        print("generating synthetic dataset ...", flush=True)
        write_parsenet_h5(root, n_shapes=args.n_train,
                          n_points=args.n_points, seed=0)

    cfg = Config(
        num_points=args.n_points, knn=args.knn, embed=args.embed,
        batch_size=args.batch_size, lr=1e-3, eval_T=max(args.steps // 3, 10),
        epochs=10 ** 6, hpnet_embed=args.hpnet,
        spectral_matfree=(False if args.dense_spectral else None),
        ms_num_samples=min(5000, args.n_points), edge_topk=min(
            2000, args.n_points),
        mesh_shape=1,
    )
    run_dir = os.path.join(args.workdir, "run")
    t0 = time.time()
    state, history = train(cfg, data_root=root, max_steps=args.steps,
                           run_dir=run_dir, use_edge_dataset=False,
                           log_every=25)
    print(f"training {args.steps} steps took {time.time() - t0:.0f}s",
          flush=True)
    print("history:", json.dumps(history[-1]), flush=True)

    ckpts = os.path.join(run_dir, "ckpts")
    cfg.pretrain_model_path = os.path.join(ckpts, "best_type")
    cfg.pretrain_model_type_path = os.path.join(ckpts, "best_inst")
    t0 = time.time()
    summary, _ = run_prediction(
        cfg, data_root=root, save_viz=True,
        out_dir=os.path.join(args.workdir, "pred"),
        batch_size=args.n_test, limit=args.n_test)
    print(f"prediction took {time.time() - t0:.0f}s", flush=True)
    print("FINAL:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
