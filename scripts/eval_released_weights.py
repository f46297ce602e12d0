"""Day-one real-data parity runbook: released SED-Net weights + ParseNet h5.

The image carries no ABC/ParseNet data and no released checkpoints, so all
in-repo quality numbers run on synthetic fixtures. The moment the real
artifacts exist, THIS script reproduces the reference evaluation protocol
(reference: generate_predictions_aug.py, readme.md:18-22) end to end:

    python scripts/eval_released_weights.py \
        --h5 /path/test_data.h5 \
        --pth-type  /path/SEDNet_type_best.pth \
        --pth-inst  /path/SEDNet_inst_best.pth \
        [--config configs/config_SEDNet_normal_test.yml] \
        [--multi-vote] [--fold5drop] [--limit N] [--out predictions/real]

.pth checkpoints load through utils.torch_import (module.-prefix stripping
matches generate_predictions_aug.py:191-198; layer mapping is the one the
torch-parity test pins, tests/test_torch_parity.py). The h5 must follow the
ParseNet schema (points/labels/normals/prim keys, dataset_segments.py:
363-371) or the SED-Net edge schema for --dataset my.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", required=True, help="test h5 (ParseNet schema)")
    ap.add_argument("--pth-type", required=True)
    ap.add_argument("--pth-inst", required=True)
    ap.add_argument("--config",
                    default="configs/config_SEDNet_normal_test.yml")
    ap.add_argument("--dataset", default="parsenet",
                    choices=["parsenet", "my"])
    ap.add_argument("--multi-vote", action="store_true")
    ap.add_argument("--fold5drop", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default="predictions/real")
    ap.add_argument("--mesh", type=int, default=None,
                    help="shard shape batches over N devices")
    args = ap.parse_args()

    for p in (args.h5, args.pth_type, args.pth_inst):
        if not os.path.exists(p):
            raise SystemExit(
                f"missing artifact: {p}\n"
                "This runbook needs the released SED-Net weights and the "
                "ParseNet/ABC test h5 (not shipped in this image).")

    import tempfile

    from sednet_tpu.config import load_config
    from sednet_tpu.predict import run_prediction
    from sednet_tpu.train import load_params

    cfg = load_config(args.config)
    cfg.dataset = args.dataset
    if args.limit is not None:
        cfg.num_test = args.limit

    # stage the h5 under the reference's directory convention
    # (data_parsenet/test_data.h5 or data/test_data_withEdge.h5 —
    # reference: generate_predictions_aug.py:95-98)
    root = tempfile.mkdtemp(prefix="sednet_real_")
    if args.dataset == "my":
        sub, name = "data", "test_data_withEdge.h5"
    else:
        sub, name = "data_parsenet", "test_data.h5"
    os.makedirs(os.path.join(root, sub), exist_ok=True)
    os.symlink(os.path.abspath(args.h5), os.path.join(root, sub, name))

    summary, _ = run_prediction(
        cfg,
        data_root=root,
        save_viz=True,
        out_dir=args.out,
        params_type=load_params(args.pth_type),
        params_inst=load_params(args.pth_inst),
        multi_vote=args.multi_vote,
        fold5drop=args.fold5drop,
        mesh_devices=args.mesh or 0,
    )
    print("FINAL:", summary)


if __name__ == "__main__":
    main()
