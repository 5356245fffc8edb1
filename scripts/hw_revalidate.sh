#!/bin/bash
# Hardware revalidation queue: run after any tunnel/compiler-service
# update (or at round start) to re-establish the measured environment
# facts this engine's plans depend on.  Each step is independent; one
# JSON/status line per step lands in $OUT.
#
#   bash scripts/hw_revalidate.sh [outfile]
#
# Why this exists: r4 measured the remote compile service CHANGING
# between rounds -- the dense kernel's scoped-vmem boundary moved
# (PERF_NOTES "Scoped-vmem drift") and the zipf z=1.0 throughput
# drifted 181.5 -> 174 M/s at identical code (PERF_NOTES "zipf z=1.0
# drift").  Compile ceilings and recorded throughputs are environment
# facts; re-verify them rather than hunting phantom regressions.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/hw_revalidate.log}"
: > "$OUT"
note() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT"; }

note "step 0: differential battery (18 digest checks, every engine)"
timeout 3000 python scripts/tpu_smoke.py >> "$OUT" 2>&1
note "step 0 exit $?"

note "step 1: dense-kernel scoped-vmem bracket (the NPJ window ceiling)"
timeout 1500 python - >> "$OUT" 2>&1 <<'PY'
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, ".")
from hash_join_codes_knl_tpu.ops.merge_probe_pallas import merge_probe_pallas
tile, rows_total, n_tiles = 2048, 4128, 8
probe = jnp.zeros(n_tiles * tile, jnp.uint32)
bhk = jnp.zeros((rows_total, 128), jnp.uint32)
bval = jnp.zeros((rows_total, 128), jnp.uint32)
wrow = jnp.zeros(n_tiles, jnp.int32)
# current budget = 2048 rowchunks = 128 chunks at 16 rows; probe one
# step above and below the recorded boundary (144 OK / 160 FAIL, r4)
for w_chunks in (128, 144, 160):
    window = w_chunks * 128
    f = jax.jit(lambda p, k, v, w: merge_probe_pallas(p, k, v, w, tile, window))
    try:
        f.lower(probe, bhk, bval, wrow).compile()
        print(f"dense w_chunks={w_chunks}: COMPILES", flush=True)
    except Exception as e:
        m = str(e); i = m.find("Scoped allocation")
        print(f"dense w_chunks={w_chunks}: FAIL {m[i:i+60] if i>=0 else m[:80]}",
              flush=True)
print("if 144 now FAILS or 160 now COMPILES, re-bracket and update "
      "DENSE_ROWCHUNK_BUDGET (engine/phj.py -- the single source for "
      "both the NPJ window ceiling AND the merge-side explicit-window "
      "guard) + PERF_NOTES")
PY
note "step 1 exit $?"

note "step 2: headline bench (floor fractions; drift-sensitive)"
timeout 2400 python bench.py > /tmp/hw_reval_bench.json 2>> "$OUT"
cat /tmp/hw_reval_bench.json >> "$OUT"
note "step 2 exit $?"

note "step 2b: anchor drift vs the previous round (live-anchor diff)"
python scripts/diff_anchors.py /tmp/hw_reval_bench.json >> "$OUT" 2>&1
note "step 2b exit $? (1 = anchors drifted; re-ratify before comparing floors)"

note "step 3: drift-sensitive matrix rows (zipf re-planned geometry)"
timeout 3600 python scripts/bench_configs.py --only phj_zipf_1.0 >> "$OUT" 2>&1
note "step 3 exit $?"

echo DONE | tee -a "$OUT"
