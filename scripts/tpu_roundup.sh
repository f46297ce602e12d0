#!/bin/bash
# TPU follow-up queue for round 3 (written during the axon relay outage
# of 2026-08-17/18). Run when the relay is back; each step appends to
# /tmp/tpu_roundup.log and continues past failures.
#
#   bash scripts/tpu_roundup.sh
#
# 1. clustering audit (now includes the bf16-vs-f32 label-parity gate)
# 2. matfree transpose-mode microbench (scatter vs sorted vs dense)
# 3. full bench matrix (now includes the bf16 fast-path config)
# 4. serving-artifact execution check (deserialize + run on the chip)
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_roundup.log
: > "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site python scripts/audit_clustering.py \
    2>&1 | tail -3 | tee -a "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site python scripts/kbench.py --what spectral \
    2>&1 | tail -4 | tee -a "$LOG"
PYTHONPATH=/root/repo:/root/.axon_site python scripts/kbench.py --what ms \
    2>&1 | tail -4 | tee -a "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site python bench.py --all 2>&1 | tee /tmp/bench_all.log | grep '^{' | tee -a "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site python - 2>&1 <<'EOF' | tail -3 | tee -a "$LOG"
import tempfile, numpy as np, jax, jax.numpy as jnp
from sednet_tpu.config import Config
from sednet_tpu.train import build_model, load_params
from sednet_tpu.export import export_serving_bundle, load_bundle
cfg = Config(num_points=10000, knn=64, embed=128)
ck = load_params("checkpoints/bench_10k.npz")
d = tempfile.mkdtemp()
export_serving_bundle(cfg, ck["type"], ck["inst"], d, batch_size=1,
                      platforms=["tpu"])
meta, fns = load_bundle(d)
x = jnp.asarray(np.random.RandomState(0).randn(1, 10000, 6).astype(np.float32))
out = fns["type_model"](x)
print("on-TPU artifact run OK:", {k: v.shape for k, v in out.items()})
EOF

echo DONE | tee -a "$LOG"
