"""Production-scale quality gate: fail on regression.

Loads the committed trained checkpoint (checkpoints/bench_10k.npz), runs
the reference-default predict path (HPNet spectral + guarded mean-shift +
Hungarian-matched IoU, generate_predictions_aug.py defaults) on the same
held-out synthetic 10k-point shapes scripts/train_bench_ckpt.py evaluates
on, and exits nonzero if any metric falls below its floor.

Floors sit a fixed margin under the committed checkpoint's own measured
scores on this fixed held-out set (single-artifact policy — see the FLOORS
comment below); update them together with the checkpoint. Cross-seed
training stability is gated separately by the looser STABILITY_FLOORS via
--stability (reads the committed stability sweep record). Runs on the real
TPU (~4 min warm).

Usage: python scripts/quality_gate.py [--eval-shapes 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "bench_10k.npz")

# The committed checkpoint is the 6000-step seed-0 run (round 5,
# train_bench_ckpt.py --steps 6000 --n-train 128): measured inst_iou
# 0.9071, type_iou 0.9509, recall 1.0 through the reference-default eval
# path on the RESERVED eval stream (synthetic.EVAL_STREAM_SEED — fixtures
# no training chain can contain; the 2000-step predecessor scores
# 0.8202/0.8723/1.0 on the same set). The gate measures THIS artifact on
# that fixed held-out set with fixed keys, so the floors sit a tight
# ~0.05 under its measured scores (single-artifact policy; cross-seed
# variance is gated separately via --stability).
FLOORS = {"inst_iou": 0.85, "type_iou": 0.90, "inst_recall": 0.95}

# Cross-seed training stability (ADVICE r4: the tight single-artifact
# floors no longer cover seed variance at all). --stability checks the
# committed multi-seed sweep record (STABILITY.json, written by
# scripts/train_bench_ckpt.py --stability-out) against looser floors:
# every seed's trained-out inst_iou and the cross-seed spread.
STABILITY = os.path.join(REPO, "STABILITY.json")
STABILITY_FLOORS = {"min_inst_iou": 0.70, "max_spread": 0.12}


def check_stability():
    if not os.path.exists(STABILITY):
        print(f"SKIP: no stability record at {STABILITY} "
              "(run scripts/train_bench_ckpt.py --seeds 0,1,2 "
              "--stability-out first)")
        return 0
    with open(STABILITY) as f:
        rec = json.load(f)
    ious = rec["inst_iou"]
    out = {"seeds": rec["seeds"], "inst_iou": ious,
           "spread": rec["spread"], "steps": rec.get("steps"),
           "floors": STABILITY_FLOORS}
    failed = []
    if not (min(ious) >= STABILITY_FLOORS["min_inst_iou"]):
        failed.append("min_inst_iou")
    if not (rec["spread"] <= STABILITY_FLOORS["max_spread"]):
        failed.append("max_spread")
    out["status"] = "FAIL" if failed else "PASS"
    out["failed"] = failed
    print("STABILITY_GATE " + json.dumps(out))
    return 1 if failed else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--eval-shapes", type=int, default=8)
    p.add_argument("--n-points", type=int, default=10000)
    p.add_argument("--workdir", default="/tmp/sednet_quality_gate")
    p.add_argument("--stability", action="store_true",
                   help="check the committed multi-seed stability record "
                        "instead of re-evaluating the checkpoint")
    args = p.parse_args()

    if args.stability:
        return check_stability()

    if not os.path.exists(CKPT):
        print(f"SKIP: no checkpoint at {CKPT} "
              "(run scripts/train_bench_ckpt.py --save first)")
        return 0

    from sednet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from sednet_tpu.config import Config
    from sednet_tpu.data import write_parsenet_h5
    from sednet_tpu.predict import run_prediction
    from sednet_tpu.train import load_params

    from sednet_tpu.data.synthetic import EVAL_STREAM_SEED

    root = os.path.join(args.workdir, f"data_eval_{args.n_points}")
    if not os.path.exists(os.path.join(root, "data_parsenet")):
        # the RESERVED eval stream (see synthetic.EVAL_STREAM_SEED): the
        # old seed-0 chain put these fixtures INSIDE any train split
        # generated with --n-train > 48 from the same stream — the gate
        # must stay held out regardless of how the checkpoint was trained
        write_parsenet_h5(root, n_shapes=args.eval_shapes,
                          n_points=args.n_points, seed=EVAL_STREAM_SEED)

    cfg = Config(num_points=args.n_points, knn=64, embed=128,
                 hpnet_embed=True, ms_num_samples=min(5000, args.n_points))
    ck = load_params(CKPT)
    summary, _ = run_prediction(
        cfg, data_root=root, save_viz=False,
        out_dir=os.path.join(args.workdir, "pred"),
        batch_size=args.eval_shapes, limit=args.eval_shapes,
        params_type=ck["type"], params_inst=ck["inst"])
    rec = {k: round(summary[k], 4)
           for k in ("inst_iou", "type_iou", "inst_recall")}
    rec["floors"] = FLOORS
    # `not >=` (rather than `<`) so a NaN metric FAILS the gate instead of
    # slipping past the comparison
    failed = [k for k, floor in FLOORS.items() if not (summary[k] >= floor)]
    rec["status"] = "FAIL" if failed else "PASS"
    rec["failed"] = failed
    print("QUALITY_GATE " + json.dumps(rec))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
