"""Staged-phase A/B harness for probe-kernel variants (real TPU).

Runs the PRODUCTION staged merge pipeline (the fixed HLO that compiles
deterministically -- PERF_NOTES "measurement caveat": standalone kernel
microbenches are per-compile bimodal, production programs are not) on
relations pre-generated to disk, and prints per-phase seconds as one
JSON line.  Compare variants across FRESH processes, e.g.:

    HJK_GATHER_ROW_SKIP=0 python scripts/bench_probe_ab.py
    HJK_GATHER_ROW_SKIP=1 python scripts/bench_probe_ab.py

Env: HJK_DATA (default /tmp/hjk_data) with ik_/iv_/ok_/ov_ files from
`cli write`; HJK_AB_INNER/HJK_AB_OUTER sizes (default 16M/256M);
HJK_AB_REPS timed reps (default 3); HJK_AB_PLAN a JSON object of
JoinPlan overrides (e.g. '{"probe_chunks": 21, "window": 15232}' for
the zipf re-planned geometry); HJK_AB_REPLAN=1 runs the full join()
re-planner first and uses the final plan (for skewed data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    d = os.environ.get("HJK_DATA", "/tmp/hjk_data")
    ni = int(os.environ.get("HJK_AB_INNER", 16_000_000))
    no = int(os.environ.get("HJK_AB_OUTER", 256_000_000))
    reps = int(os.environ.get("HJK_AB_REPS", 3))

    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.engine.phj import phj_join_merge_staged
    from hash_join_codes_knl_tpu.utils.timing import PhaseTimer

    d_outer = os.environ.get("HJK_DATA_OUTER", d)

    def load(tag, n, base=None):
        a = np.fromfile(os.path.join(base or d, f"{tag}_{n}.txt"),
                        dtype="<u4")
        assert len(a) == n, (tag, len(a), n)
        return a

    ik = jnp.asarray(load("ik", ni))
    iv = jnp.asarray(load("iv", ni))
    ok = jnp.asarray(load("ok", no, d_outer))
    ov = jnp.asarray(load("ov", no, d_outer))
    plan = plan_join(ni, no)
    if os.environ.get("HJK_AB_PLAN"):
        import dataclasses

        over = json.loads(os.environ["HJK_AB_PLAN"])
        if "pass_bits" in over:
            over["pass_bits"] = tuple(over["pass_bits"])
        plan = dataclasses.replace(plan, **over)
    if os.environ.get("HJK_AB_REPLAN") == "1":
        from hash_join_codes_knl_tpu.engine.phj import join as auto_join

        _, plan = auto_join(ik, iv, ok, ov, plan)

    import jax

    # per-rep payload variation with a DONATED buffer: an eager
    # `ov ^ rep` materializes an extra 1 GB, which is exactly the HBM
    # headroom a replanned 256M-row zipf staged run needs
    vary = jax.jit(lambda v, r: v ^ r, donate_argnums=0)

    phases = []
    total = None
    jt = None
    res = None
    for rep in range(reps + 1):
        res = None  # free the previous rep's outputs first
        ov = vary(ov, jnp.uint32(rep))
        timer = PhaseTimer()
        t0 = time.perf_counter()
        res = phj_join_merge_staged(ik, iv, ok, ov, plan, timer)
        jt = int(res.join_tuples)
        dt = time.perf_counter() - t0
        if rep == 0:
            continue  # compile + warm
        phases.append(dict(timer.phases))
        total = dt if total is None else min(total, dt)
    med = {k: float(np.median([p[k] for p in phases])) for k in phases[0]}
    print(json.dumps({
        "row_skip": os.environ.get("HJK_GATHER_ROW_SKIP", "0"),
        "select": os.environ.get("HJK_GATHER_SELECT", "flat"),
        "phases": {k: round(v, 4) for k, v in med.items()},
        "staged_total": round(sum(med.values()), 4),
        "join_tuples": jt,
        "plan": {"tile": plan.tile, "probe_chunks": plan.probe_chunks,
                 "window": plan.window},
    }))


if __name__ == "__main__":
    main()
