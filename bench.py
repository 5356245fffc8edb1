"""Headline benchmark: PHJ join throughput on the BASELINE workload.

Workload: 16M build x 256M probe uniform u32 relations from the reference
generator semantics (BASELINE.json config matrix).  Metric: probe tuples per
second per chip, steady state (post-compile, median of timed runs).
vs_baseline compares against the reference suite's best published number:
PHJ at ~4.4 s on 200M x 200M on a 64-core KNL in cache mode == ~45.45M
probe-tuples/s aggregate (README.md:17, figures/perf.png; BASELINE.md).

Prints exactly one JSON line.  Scale can be overridden with
HJK_BENCH_INNER/HJK_BENCH_OUTER (tuple counts) for smoke runs.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TUPLES_PER_S = 200_000_000 / 4.4  # reference best (PHJ, KNL cache)


def main():
    inner_n = int(os.environ.get("HJK_BENCH_INNER", 16_000_000))
    outer_n = int(os.environ.get("HJK_BENCH_OUTER", 256_000_000))
    reps = int(os.environ.get("HJK_BENCH_REPS", 5))

    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.phj import phj_join
    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.relgen.generate import generate
    from hash_join_codes_knl_tpu.relation import expected_join_tuples

    mode = "ref" if outer_n <= inner_n else "uniform"
    inner, outer, _ = generate(
        seed=42, inner_tuples=inner_n, outer_tuples=outer_n, mode=mode
    )
    plan = plan_join(inner_n, outer_n)

    ik = jax.device_put(jnp.asarray(inner.keys))
    iv = jax.device_put(jnp.asarray(inner.vals))
    ok = jax.device_put(jnp.asarray(outer.keys))
    ov = jax.device_put(jnp.asarray(outer.vals))

    def run(rep: int):
        # vary payloads per rep (the remote-execution layer can memoize
        # identical computations) and sync via a host scalar transfer --
        # block_until_ready alone is not a reliable fence on this backend
        res = phj_join(ik, iv, ok, ov ^ jnp.uint32(rep), plan)
        return int(res.join_tuples)

    got = run(0)  # compile + warm
    want = expected_join_tuples(inner_n, outer_n) % (1 << 32)
    if got != want:
        print(
            json.dumps(
                {
                    "metric": "phj_join_throughput",
                    "value": 0.0,
                    "unit": "probe-tuples/s/chip",
                    "vs_baseline": 0.0,
                    "error": f"wrong cardinality: got {got} want {want}",
                }
            )
        )
        sys.exit(1)

    times = []
    for rep in range(1, reps + 1):
        t0 = time.perf_counter()
        run(rep)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    tput = outer_n / dt

    # roofline context: minimum HBM traffic any implementation of the full
    # join must move (read both relations once, write the aligned output
    # once) vs the chip's peak bandwidth (utils/roofline.py)
    from hash_join_codes_knl_tpu.utils.roofline import hbm_peak_bytes_per_s

    floor_bytes = 8 * (inner_n + outer_n) + 16 * outer_n
    pct_floor = 100 * floor_bytes / dt / hbm_peak_bytes_per_s()[0]

    # achievable floor for a SORT-BASED engine on this chip (PERF_NOTES.md
    # "Roofline honesty"): the absolute stream floor above is unreachable
    # for ANY engine here (grouping 256M tuples requires a bulk reorder
    # and v5e's only reorder primitives are the vector-ALU-bound sort, a
    # 115M elem/s gather, and no scatter).  The achievable bound =
    # cheapest measured probe chunk-sort + build pair sort + output
    # write, scaled linearly from the measured v5e anchors (probe side:
    # batched (8192, n/8192) pair sort 0.47 s per 256M pairs; build:
    # 2-key 16M-pair sort 0.122 s; output: aligned 16 B/row at ~700 GB/s
    # effective).  This is the honest denominator the engine is actually
    # chasing; pct_hbm_stream_floor is kept for cross-hardware context.
    # Anchors (PERF_NOTES.md): probe chunk-sort 0.65 s / 256M pairs
    # (C=2048 batched), build 2-key sort 0.12 s / 16M pairs (the staged
    # partition_build measurement, same sync convention as the probe
    # anchor -- r4 correction: the earlier 0.16 anchor was looser than
    # its own cited measurement and inflated both floor fractions),
    # output write at ~700 GB/s effective.
    achievable_s = (
        outer_n * (0.65 / 256e6)
        + inner_n * (0.12 / 16e6)
        + outer_n * 16 / 700e9
    )
    pct_achievable = 100 * achievable_s / dt

    # the r3 probe-row span invariant (PERF_NOTES "Why C >= 512 chunk
    # sorts are NOT unlockable") proves the 0.65 s C=2048 sort anchor
    # cannot be PROBED by any select+gather variant on this chip: 128
    # consecutive chunk-sorted probes span ~128*C*ni/no build slots, so
    # C is capped near the measured optimum C=64 (0.83 s, tuner-timed,
    # .hjk_tune.json).  pct_achievable_floor therefore divides by a
    # LOWER BOUND no engine configuration attains; pct_feasible_floor
    # divides by the cheapest PROBE-ABLE configuration's floor -- the
    # fraction of genuinely reachable performance this engine delivers.
    feasible_s = (
        outer_n * (0.83 / 256e6)
        + inner_n * (0.12 / 16e6)
        + outer_n * 16 / 700e9
    )
    pct_feasible = 100 * feasible_s / dt
    print(
        json.dumps(
            {
                "metric": f"phj_join_throughput_{inner_n//10**6}Mx{outer_n//10**6}M",
                "value": round(tput, 1),
                "unit": "probe-tuples/s/chip",
                "vs_baseline": round(tput / BASELINE_TUPLES_PER_S, 3),
                "seconds": round(dt, 4),
                "join_tuples": got,
                "pct_hbm_stream_floor": round(pct_floor, 2),
                "pct_achievable_floor": round(pct_achievable, 1),
                "pct_feasible_floor": round(pct_feasible, 1),
                "plan": {"tile": plan.tile, "probe_chunks": plan.probe_chunks,
                         "p_bits": plan.p_bits},
            }
        )
    )


if __name__ == "__main__":
    main()
