"""Measure the REFERENCE pipeline's CPU throughput on this host.

The north star in BASELINE.md is "x10 CPU-reference throughput", but until
round 4 the denominator had never been measured — bench.py divided by this
repo's own round-1 TPU number. This script runs the reference code itself
(imported from /root/reference, torch CPU) through the two stages our bench
configs time, and writes REFERENCE_CPU.json:

  - fwd:   one SEDNet forward, (1, 6, 10000) — reference
           generate_predictions_aug.py:224-229 runs TWO of these per shape
           (type model + inst model)
  - ms:    guarded mean-shift (quantile 0.015, 50 iters, <=49 clusters) —
           generate_predictions_aug.py:25-35,377-384
  - hpnet: HPNet spectral enrichment (entropy + 50-NN normal affinity +
           lobpcg k=12) — smooth_normal_matrix.py:157-232, the shipped
           default (HPNet_embed=True, generate_predictions_aug.py:58)

Derived shapes/sec:
  headline_comparable   = 1 / (fwd + ms)            [our bench headline]
  ref_default_comparable= 1 / (2*fwd + hpnet + ms)  [ref-default eval cfg]

The reference imports CUDA-only idioms (`.cuda()`, torch.device('cuda'))
and two unavailable packages (positional_encodings — instantiated but
unused in forward, SEDNet.py:285 — and pykdtree); we stub/patch those
before import. No reference code is copied: it is executed in place.

    python scripts/bench_reference_cpu.py [--iters 2] [--skip-hpnet]
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def _install_stubs():
    import torch

    # positional_encodings: SEDNet.py:11-13 imports four names; only
    # PositionalEncoding1D is instantiated (SEDNet.py:285) and it is never
    # called in forward — a constructor-only dummy preserves behavior.
    class _Dummy:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    pe = types.ModuleType("positional_encodings")
    pet = types.ModuleType("positional_encodings.torch_encodings")
    for name in ("PositionalEncoding1D", "PositionalEncoding2D",
                 "PositionalEncoding3D", "Summer"):
        setattr(pet, name, _Dummy)
    pe.torch_encodings = pet
    sys.modules["positional_encodings"] = pe
    sys.modules["positional_encodings.torch_encodings"] = pet

    # turtle (SEDNet.py:3 imports `forward, position` — dead) needs tkinter;
    # audioop (SEDNet.py:2 imports `bias` — dead) is gone in py3.13.
    for mod, names in (("turtle", ("forward", "position")),
                       ("audioop", ("bias",))):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except Exception:
                m = types.ModuleType(mod)
                for nm in names:
                    setattr(m, nm, None)
                sys.modules[mod] = m

    # pykdtree (smooth_normal_matrix.py:3): same query API as scipy cKDTree
    from scipy.spatial import cKDTree

    pk = types.ModuleType("pykdtree")
    pkk = types.ModuleType("pykdtree.kdtree")

    class KDTree:
        def __init__(self, pts, **k):
            self._t = cKDTree(np.asarray(pts))

        def query(self, q, k=1, **kw):
            d, i = self._t.query(np.asarray(q), k=k)
            return d.astype(np.float32), i.astype(np.uint32)

    pkk.KDTree = KDTree
    pk.kdtree = pkk
    sys.modules["pykdtree"] = pk
    sys.modules["pykdtree.kdtree"] = pkk

    # CPU-ify the reference's CUDA idioms:
    #   .cuda() on tensors/modules (mean_shift.py:155-157, SEDNet.py:343,
    #   generate_predictions_aug.py:169-170) -> identity
    #   torch.device('cuda') (PointNet.py:148,185,220) -> cpu
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _dev = torch.device

    def device(*a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return _dev("cpu")
        return _dev(*a, **k)

    torch.device = device


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2,
                    help="timed repeats per stage (min is reported)")
    ap.add_argument("--skip-hpnet", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "REFERENCE_CPU.json"))
    args = ap.parse_args()

    import torch

    _install_stubs()
    sys.path.insert(0, os.path.join(REF, "src"))
    sys.path.insert(0, REF)

    # hpnet caches eigvecs to a relative src/normal_smooth_cache/ path
    # (smooth_normal_matrix.py:189-202); /root/reference is read-only, so
    # run from a scratch cwd and pass id=None-equivalent fresh ids.
    workdir = "/tmp/refbench"
    os.makedirs(os.path.join(workdir, "src", "normal_smooth_cache"),
                exist_ok=True)
    os.chdir(workdir)

    from SEDNet import SEDNet  # noqa: E402  (reference, in place)
    from mean_shift import MeanShift  # noqa: E402

    def build():
        m = SEDNet(embedding=True, emb_size=128, primitives=True,
                   num_primitives=6, loss_function=None, mode=5,
                   num_channels=6, combine_label_prim=True, edge_module=True,
                   late_fusion=True, nn_nb=64)
        m.eval()
        return m

    # exact generate_predictions_aug.py:142-170 construction (two models)
    model_type, model_inst = build(), build()

    # a CAD-like normalized cloud (same generator our bench uses)
    from sednet_tpu.data import make_synthetic_shape, normalize_points, pca_align

    d = make_synthetic_shape(np.random.RandomState(0), n_points=10000,
                             n_segments=6)
    pts = normalize_points(d["points"])
    pts, nrm, _ = pca_align(pts, d["normals"])
    points = torch.from_numpy(pts.astype(np.float32))[None]
    normals = torch.from_numpy(nrm.astype(np.float32))[None]
    _input = torch.cat([points, normals], 2).permute(0, 2, 1)  # (1, 6, N)

    host = {"nproc": os.cpu_count(), "torch": torch.__version__,
            "torch_threads": torch.get_num_threads()}
    print(f"host: {host}", flush=True)

    def timeit(name, fn, iters):
        ts = []
        out = None
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:34s} {best:9.2f} s  (runs: "
              + ", ".join(f"{t:.2f}" for t in ts) + ")", flush=True)
        return best, out

    rec = {"host": host, "n_points": 10000, "stages_sec": {}}

    with torch.no_grad():
        t_fwd, out = timeit(
            "SEDNet forward (1 shape, 10k pts)",
            lambda: model_inst(_input, None, False), args.iters)
        rec["stages_sec"]["forward"] = round(t_fwd, 3)
        embedding, _, _, edges_pred = out
        t_fwd2, out2 = timeit(
            "type-model forward", lambda: model_type(_input, None, False), 1)
        prim_log_prob = out2[1]

        emb_plain = torch.nn.functional.normalize(embedding[0].T, p=2, dim=1)
        ms = MeanShift()

        def guarded(emb):
            # generate_predictions_aug.py:25-35
            quantile = 0.015
            while True:
                _, center, bandwidth, cluster_ids = ms.mean_shift(
                    emb, 10000, quantile, 50, kernel_type="gaussian")
                if torch.unique(cluster_ids).shape[0] > 49:
                    quantile *= 1.2
                else:
                    break
            return cluster_ids

        t_ms, cl = timeit("guarded mean-shift (50 iters)",
                          lambda: guarded(emb_plain), args.iters)
        rec["stages_sec"]["mean_shift"] = round(t_ms, 3)
        print(f"  clusters: {int(torch.unique(cl).shape[0])}", flush=True)

        if not args.skip_hpnet:
            from smooth_normal_matrix import hpnet_process

            box = [0]

            def hp():
                box[0] += 1  # fresh id -> no disk-cache hit
                e = hpnet_process(
                    embedding.transpose(1, 2), points, normals, id=box[0],
                    types=prim_log_prob.transpose(1, 2),
                    edges=edges_pred.transpose(1, 2),
                    normal_smooth_w=0.5, CHUNK=1000, gpu="cpu")
                return torch.nn.functional.normalize(e[0], p=2, dim=1)

            t_hp, emb_hp = timeit("hpnet spectral enrichment",
                                  lambda: hp(), args.iters)
            rec["stages_sec"]["hpnet"] = round(t_hp, 3)
            t_ms2, cl2 = timeit("guarded mean-shift (hpnet emb)",
                                lambda: guarded(emb_hp), 1)
            rec["stages_sec"]["mean_shift_hpnet"] = round(t_ms2, 3)

    rec["shapes_per_sec"] = {
        # our bench headline times ONE forward + mean-shift per shape
        "headline_comparable": round(1.0 / (t_fwd + t_ms), 4),
    }
    if not args.skip_hpnet:
        # ref-default eval: two forwards + hpnet + mean-shift per shape
        # (generate_predictions_aug.py per-shape loop, metrics excluded —
        # lapsolver is not installed here; metric cost excluded on BOTH
        # sides would only shrink the denominator anyway)
        rec["shapes_per_sec"]["ref_default_comparable"] = round(
            1.0 / (t_fwd + t_fwd2 + t_hp + rec["stages_sec"]
                   ["mean_shift_hpnet"]), 4)
    print(json.dumps(rec, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
