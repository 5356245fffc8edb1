"""A/B: does emitting the merge join's padded columns in chunk-row 2-D
form (C, L) beat the flat (cap,) contract on the fused headline?

Motivation (NEXT.md #2, r5 trace): the four output columns leave the
fused program through (C, L)/3-D -> flat reshapes -- physical retilings
on TPU (T(8,128) -> T(1024)), ~5 ms per column in the cheap direction.
Emitting 2-D lets XLA collapse every internal reshape pair (the kernels
already consume/produce the row-tiled form), saving ~4 column copies.

Both arms jit the SAME unjitted production body (phj_join_merge's
wrapped function) and return join_tuples plus all five leaves; arm B
reshapes the four padded columns to (C, L) at the jit boundary, which
the XLA simplifier collapses with the internal flattening reshapes.
Sync convention is the headline's: one host int() of join_tuples per
rep, payload varied per rep (the remote layer memoizes dispatches).

Usage: python scripts/bench_2d_ab.py --arm flat|2d [--reps N] ...
ONE arm per process: the two output sets are ~4.3 GB each and the warm
buffers of both arms together exhaust HBM; separate processes also
satisfy the fresh-process measurement protocol (PERF_NOTES
"measurement caveat").  Prints one JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=("flat", "2d"), required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=16_000_000)
    ap.add_argument("--outer", type=int, default=256_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine import phj as P
    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.relgen.generate import generate

    inner, outer, _ = generate(
        seed=42, inner_tuples=args.inner, outer_tuples=args.outer,
        mode="uniform",
    )
    plan = plan_join(args.inner, args.outer)
    C = max(1, plan.probe_chunks)

    ik = jax.device_put(jnp.asarray(inner.keys))
    iv = jax.device_put(jnp.asarray(inner.vals))
    ok = jax.device_put(jnp.asarray(outer.keys))
    ov = jax.device_put(jnp.asarray(outer.vals))

    body = P.phj_join_merge.__wrapped__  # unjitted production body

    # each arm pins its output shapes explicitly, so the A/B stays
    # meaningful whichever form the production body natively returns
    @jax.jit
    def run_flat(ik, iv, ok, ov):
        res = body(ik, iv, ok, ov, plan)
        r = lambda x: x.reshape(-1)
        return (
            r(res.probe_keys), r(res.probe_vals), r(res.match_vals),
            r(res.match_cnts), res.build_counts,
        ), res.join_tuples

    @jax.jit
    def run_2d(ik, iv, ok, ov):
        res = body(ik, iv, ok, ov, plan)
        r = lambda x: x.reshape(C, -1)
        return (
            r(res.probe_keys), r(res.probe_vals), r(res.match_vals),
            r(res.match_cnts), res.build_counts,
        ), res.join_tuples

    def time_arm(name, fn):
        out, jt = fn(ik, iv, ok, ov ^ jnp.uint32(0))  # compile + warm
        want = int(jt)
        del out, jt  # the ~4.3 GB output set must not outlive the rep
        ts = []
        for rep in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out, jt = fn(ik, iv, ok, ov ^ jnp.uint32(rep))
            got = int(jt)
            ts.append(time.perf_counter() - t0)
            del out, jt
            assert got == want, (name, got, want)
        med = float(np.median(ts))
        print(json.dumps({
            "arm": name, "seconds": round(med, 4),
            "tuples_per_s": round(args.outer / med / 1e6, 1),
            "all": [round(t, 4) for t in ts],
        }))
        return med

    time_arm(args.arm, run_2d if args.arm == "2d" else run_flat)


if __name__ == "__main__":
    main()
