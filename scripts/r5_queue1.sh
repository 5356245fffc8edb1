#!/bin/bash
# r5 hardware queue 1: headline decomposition + tile sweep at C=64.
#
# VERDICT r4 lead task: the engine has sat at 1.27 s for three rounds,
# 75 ms above the 80%-of-feasible-floor line.  The select-op family is
# closed (flat/hier/rowbase all measured); the levers never measured:
#   (a) the GATHER kernel's tile size -- tile 3072 was chosen for the
#       dense-kernel era; at C=64 the window (and with it the flat
#       select's (W,128) reduce cost) scales ~linearly with tile, so a
#       smaller tile trades select width against per-tile fixed costs.
#   (b) unique_build on the headline (the workload IS unique-build;
#       num_keys=1 cuts the build sort's payload permutation).
#   (c) a jax.profiler trace of the fused program (never captured).
# Protocol per PERF_NOTES "measurement caveat": every variant runs the
# production staged pipeline in a FRESH process.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r5_queue1.log}"
: > "$OUT"
note() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT"; }

note "step 1: fused headline control (bench.py)"
timeout 2400 python bench.py >> "$OUT" 2>&1
note "step 1 exit $?"

note "step 2: staged baseline tile 3072 C=64 flat"
timeout 2400 python scripts/bench_probe_ab.py >> "$OUT" 2>&1
note "step 2 exit $?"

for TILE in 2048 2560 1536; do
  note "step tile=$TILE: staged C=64 flat"
  HJK_AB_PLAN="{\"tile\": $TILE}" \
    timeout 2400 python scripts/bench_probe_ab.py >> "$OUT" 2>&1
  note "step tile=$TILE exit $?"
done

note "step unique_build: staged tile 3072 C=64 unique_build=true"
HJK_AB_PLAN='{"unique_build": true}' \
  timeout 2400 python scripts/bench_probe_ab.py >> "$OUT" 2>&1
note "step unique_build exit $?"

note "step trace: jax.profiler trace of the fused headline"
timeout 2400 python scripts/profile_headline.py >> "$OUT" 2>&1
note "step trace exit $?"

echo DONE | tee -a "$OUT"
