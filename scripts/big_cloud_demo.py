"""Big-cloud demo: one 64k-point cloud through the FULL sharded pipeline.

Runs a single cloud far beyond the reference's 10k single-device cap
(generate_predictions_aug.py:62) end to end on a virtual 8-device mesh:
ring-kNN graph builds (ppermute) -> SEDNet forward with GSPMD-collective
GroupNorm/global-max -> row-sharded mean-shift -> blocked NMS -> matched
IoU vs the synthetic ground truth. The N x N tensors never exist on any
device: peak per-device distance blocks are (N/8, N/8) in the ring and
(N/8, N) streamed in the mean-shift.

Usage: python scripts/big_cloud_demo.py [--n-points 65536] [--devices 8]
(CPU virtual mesh by default — the image has one TPU chip; on a real pod
drop the JAX_PLATFORMS override and the same code runs over ICI.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-points", type=int, default=65536)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--embed", type=int, default=16)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--segments", type=int, default=6)
    p.add_argument("--hpnet", action="store_true",
                   help="reference-default eval enrichment (spectral + "
                        "entropy weighting, sorted-transpose matfree) on "
                        "the sharded cloud before clustering")
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sednet_tpu.data import make_synthetic_shape
    from sednet_tpu.metrics import siou_matched_segments, to_one_hot
    from sednet_tpu.models import SEDNet
    from sednet_tpu.parallel import big_cloud_segment, make_mesh

    n = args.n_points
    mesh = make_mesh(args.devices)
    rng = np.random.RandomState(0)
    print(f"generating {n}-point cloud ...", flush=True)
    d = make_synthetic_shape(rng, n_points=n, n_segments=args.segments)
    x = jnp.asarray(np.concatenate(
        [d["points"], d["normals"]], -1).astype(np.float32))

    model = SEDNet(mode=5, k=args.k, emb_size=args.embed)
    params = model.init(jax.random.PRNGKey(0), x[None, :256])["params"]

    t0 = time.time()
    labels, num, types, _ = big_cloud_segment(
        params, x, mesh, jax.random.PRNGKey(1), k=args.k,
        iterations=args.iterations, bandwidth_samples=min(5000, n),
        hpnet=args.hpnet)
    labels = np.asarray(labels)
    types = np.asarray(types)
    dt = time.time() - t0

    # the metric stack's one-hot caps at 50 clusters (reference
    # segment_utils.py:536); random-init weights can blow past it — fold
    # overflow labels into the most-populated cluster, like the guarded
    # mean-shift cap does (cluster/mean_shift.py)
    if int(num) > 49:
        keep = np.argsort(-np.bincount(labels, minlength=int(num)))[:49]
        remap = np.full(int(num), -1, np.int64)
        remap[keep] = np.arange(49)
        folded = remap[labels]
        folded[folded < 0] = 0
        labels = folded.astype(labels.dtype)
        num = labels.max() + 1
    w = to_one_hot(labels, max(int(num), 1))
    s_iou, p_iou, _, _, _ = siou_matched_segments(
        d["labels"].astype(np.int64), labels.astype(np.int64),
        types.astype(np.int64), d["prim"].astype(np.int64), w)
    print(json.dumps({
        "n_points": n, "devices": args.devices,
        "clusters": int(num), "wall_s": round(dt, 1),
        "inst_iou_random_init": round(float(s_iou), 4),
        "note": "random-init weights; the demo proves the sharded "
                "capability (compile + execute + metric), not quality",
    }), flush=True)


if __name__ == "__main__":
    main()
