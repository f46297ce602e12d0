"""Experiment configuration.

One dataclass-based config, YAML/INI-loadable, reproducing the reference's
key vocabulary (reference: read_config.py:6-84 and
configs/config_SEDNet_normal.yml) plus the test-time knobs the reference
hardcodes as module constants (reference: generate_predictions_aug.py:58-68).
"""
from __future__ import annotations

import dataclasses
import json
import re
from dataclasses import dataclass
from typing import Optional


@dataclass
class Config:
    # bookkeeping
    comment: str = ""
    model_path: str = "SEDNet_{}_lr_{}_mode_{}_k{}"
    dataset: str = ""
    preload_model: bool = False
    pretrain_model_path: str = ""
    pretrain_model_type_path: str = ""
    pretrain_opti_path: str = ""

    # inputs
    normals: bool = True
    num_points: int = 10000
    num_train: int = 16000
    num_val: int = 2700
    num_test: int = 2700

    # model
    mode: int = 5                # 0: xyz only, 5: xyz + normals-aware first-layer knn
    embed: int = 128             # embedding dim
    knn: int = 64                # neighbours per edge-conv (ref default 64)
    num_primitives: int = 6
    grid_size: int = 20          # splinenet control grid
    normal_metric_W: float = 1.0  # weight of normal term in first-layer knn metric
    w_pos_enc: float = 0.2       # early/late fusion weight (ref SEDNet.py:219)
    edge_module: bool = True
    late_fusion: bool = True
    combine_label_prim: bool = True
    predict_normal: bool = False

    # optimisation
    batch_size: int = 4
    lr: float = 1e-4
    optim: str = "adamW"         # "adam" | "adamW"
    sche: str = "reduce"         # "cos" | "reduce"
    lr_sch: bool = True
    patience: int = 5
    weight_decay: float = 0.002
    epochs: int = 200
    smooth: float = 0.025        # label smoothing for the type loss
    loss_weight: float = 100.0
    input_drop: float = 0.0
    eval_T: int = 2000
    seed: int = 0

    # losses (ref train_sed_net.py:270)
    w_edge_embed_loss: float = 0.25
    triplet_margin: float = 1.0
    pull_margin: float = 0.5
    push_margin: float = 1.5
    edge_topk: int = 2000

    # clustering / eval-time knobs (ref generate_predictions_aug.py:58-68)
    ms_quantile: float = 0.015
    ms_iterations: int = 50
    ms_num_samples: int = 10000
    ms_max_clusters: int = 50
    ms_retry_factor: float = 1.2
    # converged-early exit for the shift loop: stop once the max
    # per-point movement drops below this (the reference always runs the
    # full ms_iterations, src/mean_shift.py:45; measured on v5e the loop
    # converges below 1e-6 by iteration ~20, so this halves the shift
    # stage at a position drift orders below the NMS bandwidth floor
    # 0.003). 0.0 restores the exact fixed-trip loop.
    ms_tol: float = 1e-6
    # bf16 inputs for the mean-shift step matmuls (f32 accumulation).
    # MEASURED no-win on v5e (round 3): default Mosaic matmul precision
    # already rounds f32 dot inputs to bf16 (bitwise-equal labels,
    # 0.33 vs 0.34 ms/iter — the step is exp/VPU-bound); the flag only
    # halves tile bytes. Kept for explicitness, audited by
    # scripts/audit_clustering.py if ever enabled
    ms_bf16: bool = False
    # bf16 activations through the model's conv/GN stacks (f32 params,
    # f32 GN statistics, f32 logits/embedding outputs, f32 kNN builds).
    # MEASURED no-win at 10k pts on v5e: 11.0 vs 11.3 shapes/s — the
    # forward is dominated by the f32-pinned top-k and the casts cost
    # more than the saved gather/normalize bandwidth. Off by default
    model_bf16: bool = False
    # training stability levers (beyond the reference, which has neither;
    # motivated by the measured cross-seed inst_iou spread of the
    # production-scale 10k-pt config — ROADMAP round-3 item 3). 0 = off.
    warmup_steps: int = 0    # linear lr ramp 0 -> lr over this many steps
    grad_clip: float = 0.0   # global-norm clip before the adam moments
    hpnet_embed: bool = True
    normal_smooth_w: float = 0.5
    spectral_sigma: float = 0.1
    spectral_knn: int = 50
    spectral_eigvecs: int = 12
    spectral_matfree: Optional[bool] = None  # matrix-free LOBPCG.
    # None = auto: dense affinity up to spectral_dense_max_n points,
    # matrix-free beyond. TRUE device time on a v5e (round 5, K solves
    # chained per dispatch): dense 36.8 ms/solve at N=10k vs matfree
    # [scatter] 157.8 — 4.3x, gather/scatter-bandwidth-bound (the round-3
    # "478x" figure was an EAGER-dispatch artifact; see
    # cluster.spectral.default_transpose_mode). The dense 400 MB N=10k
    # affinity is a cheap transient on a 16 GB chip. Matfree is exact for
    # the same operator (test_matfree_matvec_matches_dense) and remains
    # the out-of-HBM escape hatch (N > dense cap, sharded enrichment):
    # 932 ms/solve at N=32k.
    spectral_dense_max_n: int = 16384
    # factored edge-conv GroupNorm: ONE gather pass of (sum, sumsq,
    # signed-extremum) reductions reconstructs the GN statistics exactly
    # (fixed K items per point), so the (B, N, K, C) gathered tensor never
    # reaches HBM — forward AND backward (the stats totals are the same
    # quantities the direct path differentiates). Exact up to float
    # reassociation; same parameter tree as the direct path. On by default
    factored_gn: bool = True
    fused_encoder: bool = False  # index-free fused edge-conv inference
    # encoder (ops.fused_edgeconv): no kNN index/gather materialization;
    # exact on CPU, ~7e-3 rad embedding drift on TPU (bf16 matmul fp-order
    # flips deep-layer neighbour sets) -- type argmax unchanged.

    # runtime
    gpu: str = ""                # kept for config-file compat; unused on TPU
    mesh_shape: Optional[int] = None  # data-parallel devices; None = all

    def asdict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.asdict(), f, indent=2)


_BOOL = {"true": True, "false": False, "1": True, "0": False}


def _coerce(value: str, target_type):
    value = value.strip().strip('"').strip("'")
    if target_type is bool:
        return _BOOL[value.lower()]
    if target_type is int:
        return int(value)
    if target_type is float:
        return float(value)
    if target_type == Optional[int]:
        return None if value.lower() in ("none", "") else int(value)
    if target_type == Optional[bool]:
        return (None if value.lower() in ("none", "")
                else _BOOL[value.lower()])
    return value


def load_config(path: str) -> Config:
    """Load a Config from an INI-ish yml file (the reference's format),
    or from a JSON file produced by ``Config.save``."""
    import typing

    text = open(path).read()
    known = {f.name for f in dataclasses.fields(Config)}
    if path.endswith(".json"):
        data = json.loads(text)
        return Config(**{k: v for k, v in data.items() if k in known})

    hints = typing.get_type_hints(Config)
    # reference key -> our key (read_config.py:52,72)
    aliases = {"num_epochs": "epochs", "encoder_drop": "input_drop"}
    kwargs = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or line.startswith("["):
            continue
        m = re.match(r"^(\w+)\s*=\s*(.*)$", line)
        if not m:
            continue
        key, value = m.group(1), m.group(2)
        key = aliases.get(key, key)
        if key not in known:
            continue
        kwargs[key] = _coerce(value, hints[key])
    return Config(**kwargs)
