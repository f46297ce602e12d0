#!/bin/bash
# Round-end measurement ritual (VERDICT r4 next-round #7): one command whose
# committed outputs ARE the round's record. Runs, in order, on the real TPU:
#
#   1. bench.py --all            -> BENCH_ALL_r{N}.json   (full perf matrix)
#   2. perf_gate.py              against that file        (throughput floors)
#   3. quality_gate.py           (+ --stability if STABILITY.json exists)
#   4. kbench.py --json          -> KBENCH_r{N}.json      (per-kernel numbers)
#   5. audit_clustering.py       -> AUDIT_CLUSTER_r{N}.json (exactness + tol A/B)
#
# FAILS LOUDLY: exits nonzero on the first gate/audit failure, so a round
# cannot end instrument-rich and evidence-poor (round 4 built the perf gate,
# the fit-metric emission and two major speedups, then never measured them
# together — VERDICT r4 missing #1).
#
#   bash scripts/tpu_roundup.sh <round-number>     e.g. ... 5
set -e -o pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: tpu_roundup.sh <round-number>}"
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

echo "=== 1/5 bench.py --all -> BENCH_ALL_r0${N}.json ==="
python bench.py --all 2> /tmp/roundup_bench.err | tee "BENCH_ALL_r0${N}.json"

echo "=== 2/5 perf_gate ==="
python scripts/perf_gate.py "BENCH_ALL_r0${N}.json"

echo "=== 3/5 quality_gate ==="
python scripts/quality_gate.py
if [ -f STABILITY.json ]; then
    python scripts/quality_gate.py --stability
fi

echo "=== 4/5 kbench -> KBENCH_r0${N}.json ==="
python scripts/kbench.py --json "KBENCH_r0${N}.json" 2> /tmp/roundup_kbench.err

echo "=== 5/5 clustering audit -> AUDIT_CLUSTER_r0${N}.json ==="
python scripts/audit_clustering.py 2> /tmp/roundup_audit.err \
    | tee "AUDIT_CLUSTER_r0${N}.json"

echo "ROUNDUP OK — commit BENCH_ALL_r0${N}.json KBENCH_r0${N}.json AUDIT_CLUSTER_r0${N}.json"
