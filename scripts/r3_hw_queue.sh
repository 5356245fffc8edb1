#!/bin/bash
# Round-3 hardware work queue: run the pending TPU experiments in value
# order the moment the tunnel is back.  Each step is independent and
# logs one JSON/status line to $OUT; a step failure does not block the
# rest.  Pre-generated relations are expected in /tmp/hjk_data (cli
# write); steps that need them check first.
#
#   bash scripts/r3_hw_queue.sh [outfile]
#
# Queue (see NEXT.md #2 and the r3 session notes):
#   0. tpu_smoke battery (now covers both gather-select engines)
#   1. A/B: flat vs hier boundary select at the production geometry
#   2. small-bench sanity (verify surface 1)
#   3. tile-2048 high-C sort points (C=80/88: the unmeasured region the
#      window-feasibility cap admits at the smaller tile)
#   4. headline bench refresh (full-scale, publishes floor fractions)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r3_hw_queue.log}"
: > "$OUT"
note() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT"; }

note "step 0: tpu_smoke battery"
timeout 2400 python scripts/tpu_smoke.py >> "$OUT" 2>&1
note "step 0 exit $?"

if [ -f /tmp/hjk_data/ok_256000000.txt ]; then
  note "step 1: gather-select A/B (flat vs hier), production geometry"
  for SEL in flat hier; do
    HJK_GATHER_SELECT=$SEL timeout 2400 \
      python scripts/bench_probe_ab.py >> "$OUT" 2>&1
    note "step 1 select=$SEL exit $?"
  done
else
  note "step 1 SKIPPED: /tmp/hjk_data relations missing"
fi

note "step 2: small bench (verify surface 1)"
HJK_BENCH_INNER=1000000 HJK_BENCH_OUTER=8000000 HJK_BENCH_REPS=3 \
  timeout 1700 python bench.py >> "$OUT" 2>&1
note "step 2 exit $?"

if [ -f /tmp/hjk_data/ok_256000000.txt ]; then
  note "step 3: tile-2048 high-C probe points"
  for C in 80 88; do
    HJK_AB_PLAN="{\"tile\": 2048, \"probe_chunks\": $C}" timeout 2400 \
      python scripts/bench_probe_ab.py >> "$OUT" 2>&1
    note "step 3 C=$C exit $?"
  done
fi

note "step 4: headline bench refresh"
timeout 3000 python bench.py >> "$OUT" 2>&1
note "step 4 exit $?"

note "step 5: the reference's own published workload shape (200Mx200M,"
note "  KNL best: PHJ 4.4 s = 45.45 M tuples/s aggregate)"
HJK_BENCH_INNER=200000000 HJK_BENCH_OUTER=200000000 \
  timeout 3600 python bench.py >> "$OUT" 2>&1
note "step 5 exit $?"
note "queue done"
