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

PYTHONPATH=/root/repo:/root/.axon_site python - 2>&1 <<'EOF' | tail -6 | tee -a "$LOG"
import time, numpy as np, jax, jax.numpy as jnp
from sednet_tpu.cluster.spectral import (normal_affinity_topk,
                                         spectral_eigvecs,
                                         spectral_eigvecs_matfree)
rng = np.random.default_rng(0)
n = 10000
xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
nrm = rng.normal(size=(n, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
nrm = jnp.asarray(nrm)
key = jax.random.PRNGKey(0)

def t(fn, reps=3):
    np.asarray(fn()); ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)

td = t(lambda: spectral_eigvecs(normal_affinity_topk(xyz, nrm), key))
print("dense affinity+LOBPCG      %.3f s" % td)
for mode in ("scatter", "sorted"):
    tm = t(lambda m=mode: spectral_eigvecs_matfree(xyz, nrm, key,
                                                   transpose_mode=m))
    print("matfree transpose=%-8s %.3f s" % (mode, tm))
EOF

python bench.py --all 2>&1 | tee /tmp/bench_all.log | grep '^{' | tee -a "$LOG"

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
