"""Throughput regression gate (VERDICT r3 weak #5 / next-round #1).

quality_gate.py pins metric floors; nothing pinned throughput, and the
exact failure mode that allows happened in round 3 (headline 10.32 ->
8.70 driver-recorded with no flag raised). This gate reads a bench
record file — one JSON object per line, the format bench.py prints and
the driver stores as BENCH_ALL_r{n}.json — and fails if any known
config's shapes/sec drops below its floor.

Floors are set ~15% below the round-5 measured values (BENCH_ALL_r05,
one v5e chip through the axon relay). Round 5 measured the same build
twice in different sessions and found dispatch-sensitive configs vary
up to 2x with relay round-trip latency (single-shape synced: 4.10 vs
2.07 shapes/s at ping ~25 vs ~48 ms) while compute-dominated configs
agree within 3% (headline 10.08/10.03, train 8.11/8.09, bf16
9.31/9.33). Floors for dispatch-sensitive configs therefore sit 15%
under the WORST observed session, and every record now carries a
`ping_ms` field so a floor breach can be attributed to tunnel vs
build. The relay-independent gate for the forward is the
"device-only chained" metric (10 dependent calls per dispatch).
Raise floors as kernels improve — a floor that trails the state of
the art by more than one round is not a gate.

    python scripts/perf_gate.py BENCH_ALL_r04.json
    python scripts/perf_gate.py --latest   # newest BENCH_ALL_r*.json
"""
import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric-name prefix -> shapes/sec floor. First matching prefix wins,
# so the longer "device-only chained" key must precede the synced
# "single-shape forward" key. r5 measured values in the comments.
FLOORS = {
    "End-to-end shapes/sec/chip": 8.5,            # r5: 10.08 / 10.03
    "single-shape forward (10k pts, device-only": 8.7,   # r5: 10.25 relay-free
    "single-shape forward": 1.75,                 # r5: 4.10 / 2.07 (ping!)
    # full pipeline: 2.6 since the 6000-step checkpoint — it actually
    # RECOVERS ~all 6 GT segments per shape (inst_iou 0.93 vs 0.83), so
    # the fits+residuals stage processes ~2x the matched segments of the
    # old under-segmenting checkpoint (4.87 -> 3.09 with residual
    # 0.0135 -> 0.0078, p_cover 0.806 -> 0.964 in the same record). The
    # floor gates the NEW workload; a code regression still trips it.
    "full pipeline": 2.6,                         # r5: 3.09 (6k-step ckpt)
    "multi-vote TTA": 2.85,                       # r5: 3.37 / 3.36
    "reference-default eval device pipeline": 4.0,   # r5: 4.76 relay-free
    "reference-default eval (hpnet + usecd, streamed)": 2.75,  # r5: 3.39
    "reference-default eval (hpnet + usecd)": 2.7,   # r5: 3.53 / 3.22
    "reference-default eval (hpnet + fold5drop)": 1.55,  # r5: 1.82 / 1.81
    "bf16 fast path": 7.9,                        # r5: 9.33 / 9.31
    "train step": 6.9,                            # r5: 8.11 / 8.09
}


def load_records(path):
    recs = []
    with open(path) as f:
        text = f.read()
    # the driver's BENCH_r{n}.json wraps the headline in {"parsed": ...};
    # BENCH_ALL files are plain JSONL
    for line in text.splitlines():
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "parsed" in obj and isinstance(obj["parsed"], dict):
            obj = obj["parsed"]
        if "metric" in obj and "value" in obj:
            recs.append(obj)
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", help="bench JSONL file")
    ap.add_argument("--latest", action="store_true",
                    help="use the newest BENCH_ALL_r*.json in the repo")
    args = ap.parse_args()

    path = args.path
    if args.latest or path is None:
        cands = sorted(glob.glob(os.path.join(REPO, "BENCH_ALL_r*.json")))
        if not cands:
            print("perf_gate: no BENCH_ALL_r*.json found", file=sys.stderr)
            sys.exit(2)
        path = cands[-1]
    print(f"perf_gate: checking {path}")

    recs = load_records(path)
    if not recs:
        print("perf_gate: no bench records parsed", file=sys.stderr)
        sys.exit(2)

    failures, checked = [], 0
    for rec in recs:
        for prefix, floor in FLOORS.items():
            if rec["metric"].startswith(prefix):
                checked += 1
                v = float(rec["value"])
                status = "OK " if v >= floor else "FAIL"
                print(f"  [{status}] {rec['metric'][:52]:52s} "
                      f"{v:7.3f} (floor {floor})")
                if v < floor:
                    failures.append((rec["metric"], v, floor))
                break

    if checked == 0:
        print("perf_gate: no known configs in the file", file=sys.stderr)
        sys.exit(2)
    if failures:
        print(f"perf_gate: {len(failures)} config(s) below floor",
              file=sys.stderr)
        sys.exit(1)
    print(f"perf_gate: all {checked} checked configs above floors")


if __name__ == "__main__":
    main()
