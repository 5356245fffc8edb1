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

# static anchor fallbacks (PERF_NOTES.md measurements, v5e, 2026-08):
# used only when the live sources below are unavailable.  The floor's
# output term stays static: at 16 B/row over ~700 GB/s it is ~0.6% of
# the floor -- drift there is immaterial, unlike the sort anchors,
# which r4 proved move under unchanged code (environment drift).
STATIC_PROBE_SORT_S_PER_256M = 0.83  # C=64 batched pair sort (tuner, r3)
STATIC_BUILD_SORT_S_PER_16M = 0.12  # 2-key 16M pair sort (staged, r4)
OUT_GBPS = 700e9  # effective HBM stream (elementwise-pass measurement)


def _live_probe_sort_anchor(outer_n: int, plan) -> tuple[float, str]:
    """Probe-sort floor term from the tuner cache (.hjk_tune.json): the
    tuner already timed THIS geometry's batched pair sort on THIS chip
    under THIS jax release -- the freshest measurement of the floor's
    dominant term.  Falls back to the static r3 constant (scaled
    linearly) when no matching cache row exists (e.g. C forced by the
    window cap, or smoke shapes the tuner never timed)."""
    try:
        import jax

        from hash_join_codes_knl_tpu.engine.tune import (
            _cache_path,
            _load_cache,
        )

        dev = jax.devices()[0]
        prefix = f"{outer_n}|{plan.tile}|"
        suffix = f"|{jax.__version__}|{dev.device_kind}"
        cache = _load_cache(_cache_path())
        for key, row in cache.items():
            if key.startswith(prefix) and key.endswith(suffix):
                t = row["times"].get(str(plan.probe_chunks))
                if t is not None:
                    return float(t), f"tuner:{key}"
    except Exception:
        pass
    return (
        outer_n * (STATIC_PROBE_SORT_S_PER_256M / 256e6),
        "static:PERF_NOTES r3 C=64 anchor (no tuner row for this geometry)",
    )


def _live_build_sort_anchor(ik, iv, plan, reps: int = 2) -> tuple[float, str]:
    """Build-sort floor term measured IN-PROCESS: the production
    2-key (hashed-key, value) pair sort at the actual build size, timed
    with the engine's sync convention (a host scalar transfer -- the
    sorted head depends on every input element).  ~0.3 s of bench time
    buys an anchor that cannot rot between hand audits."""
    import time

    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.phj import _merge_sort_side
    from hash_join_codes_knl_tpu.utils.hashing import hashed_key

    ni = ik.shape[0]
    pad = -(-ni // 128) * 128

    @jax.jit
    def run(k, v):
        ks, vs = _merge_sort_side(hashed_key(k, plan.factor), v, pad,
                                  num_keys=2)
        return ks[0] + vs[0]

    try:
        float(run(ik, iv))  # compile + warm
        ts = []
        for r in range(1, reps + 1):
            # vary the payload: the remote-execution layer memoizes
            # identical dispatches
            v = iv ^ jnp.uint32(r)
            float(v[0])  # fence generation out of the timed region
            t0 = time.perf_counter()
            float(run(ik, v))
            ts.append(time.perf_counter() - t0)
        return min(ts), f"measured-in-process:min-of-{reps}"
    except Exception as e:
        return (
            ni * (STATIC_BUILD_SORT_S_PER_16M / 16e6),
            f"static:PERF_NOTES r4 anchor (measurement failed: "
            f"{type(e).__name__})",
        )


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
    # write.  The C=2048 probe-sort anchor (0.65 s / 256M pairs) stays
    # STATIC: the probe-row span invariant proves no engine
    # configuration can probe it, so it is a lower bound, not a live
    # operating point, and re-timing it would cost a multi-minute
    # remote compile per bench run.  This is context, not the target.
    build_anchor_s, build_src = _live_build_sort_anchor(ik, iv, plan)
    out_s = outer_n * 16 / OUT_GBPS
    achievable_s = outer_n * (0.65 / 256e6) + build_anchor_s + out_s
    pct_achievable = 100 * achievable_s / dt

    # pct_feasible_floor divides by the cheapest PROBE-ABLE
    # configuration's floor -- the fraction of genuinely reachable
    # performance this engine delivers.  Its anchors are LIVE (r5, per
    # the r4 verdict: frozen constants rot silently in a
    # proven-drifting environment): the probe-sort term comes from the
    # tuner cache (timed on this chip under this jax release), the
    # build-sort term is re-measured in-process above; provenance for
    # both is published in the "anchors" field and diffed
    # round-over-round by scripts/diff_anchors.py (hw_revalidate).
    probe_anchor_s, probe_src = _live_probe_sort_anchor(outer_n, plan)
    feasible_s = probe_anchor_s + build_anchor_s + out_s
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
                "anchors": {
                    "probe_sort_s": round(probe_anchor_s, 4),
                    "probe_sort_src": probe_src,
                    "build_sort_s": round(build_anchor_s, 4),
                    "build_sort_src": build_src,
                    "out_gbps": OUT_GBPS / 1e9,
                    "feasible_floor_s": round(feasible_s, 4),
                },
                "plan": {"tile": plan.tile, "probe_chunks": plan.probe_chunks,
                         "p_bits": plan.p_bits},
            }
        )
    )


if __name__ == "__main__":
    main()
