"""BASELINE.json config-matrix runner.

Runs the benchmark configurations from BASELINE.json on the available
hardware and writes structured metrics to bench_results.json:

  1. NPJ   uniform 16M x 256M   (BASELINE shape + the scaled-down
                                 4M x 16M row; NPJ is the one-global-
                                 table engine, see --npj-scale note)
  2. PHJ   uniform 16M x 256M   (headline; same as bench.py)
  3. CPRA  on the local mesh    (single chip here; multi-chip on pods)
  4. PHJ   Zipf z=0.75 and z=1.0 outer skew
  5. scale-out                  (requires a multi-chip mesh; skipped on one)
 plus: hash aggregate over a 256M-row column (the de-scattered
 sort-group-reduce) and the reference CPRA 4096-way fanout
 (pass_bits=(6,6)) through the padded radix engine.

Every run validates cardinality (uniform/ref) or the output digest against
the host oracle (zipf, small sizes) before timing.

Usage: python scripts/bench_configs.py [--small] [--only substr]
(--only runs matching rows and MERGES into the existing results file.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _sync_run(fn, reps=3):
    fn(0)
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="smoke sizes (CI / CPU)")
    ap.add_argument("--out", default="bench_results.json")
    ap.add_argument("--only", default=None,
                    help="run only rows whose name contains this "
                         "substring; merge results into --out instead "
                         "of overwriting")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.engine.npj import (
        npj_build,
        npj_probe,
        npj_probe_sorted,
        plan_npj,
    )
    from hash_join_codes_knl_tpu.engine.phj import phj_join
    from hash_join_codes_knl_tpu.parallel.cpra import cpra_join
    from hash_join_codes_knl_tpu.relation import expected_join_tuples
    from hash_join_codes_knl_tpu.relgen.generate import generate

    if args.small:
        I, O = 200_000, 1_600_000
        npj_I, npj_O = 100_000, 400_000
    else:
        I, O = 16_000_000, 256_000_000
        npj_I, npj_O = 4_000_000, 16_000_000

    results = {}

    # gate -> published row names, so --only matches EITHER the internal
    # gate or any recorded bench_results.json row name (a user copying
    # "hash_aggregate_256M" must not get a silent no-op rerun)
    GATE_ROWS = {
        "phj_uniform": ("phj_uniform",),
        "aggregate": ("hash_aggregate_256M",
                      "hash_aggregate_chunked_256M_64Kgroups",
                      "hash_aggregate_256M_64Kgroups"),
        "npj_uniform_full": ("npj_uniform_full",
                             "npj_uniform_full_sorted_order"),
        "zipf": ("phj_zipf_0.75", "phj_zipf_1.0"),
        "cpra": ("cpra",),
        "radix_4096": ("phj_radix_4096way",),
        "npj_uniform": ("npj_uniform",),
        "npj_chain": ("npj_chain", "npj_chain_unique"),
    }

    def want(gate):
        if args.only is None or args.only in gate:
            return True
        return any(args.only in row for row in GATE_ROWS.get(gate, ()))

    def record(name, outer_n, seconds, extra=None):
        results[name] = {
            "seconds": round(seconds, 4),
            "tuples_per_s": round(outer_n / seconds, 1),
            **(extra or {}),
        }
        print(f"{name:24s} {seconds:8.4f}s  {outer_n/seconds/1e6:9.1f} M/s",
              flush=True)

    # stage only what the selected rows touch: a 256M-row upload costs
    # ~50 s through this box's tunnel, so --only reruns must not pay for
    # relations their rows never read
    need_full = [want(n) for n in
                 ("phj_uniform", "aggregate", "npj_uniform_full", "zipf",
                  "cpra")]
    need_ik = want("phj_uniform") or want("npj_uniform_full") \
        or want("zipf") or want("cpra")
    need_ok = want("phj_uniform") or want("aggregate") \
        or want("npj_uniform_full")

    # config 2 (headline): PHJ uniform
    inner = outer = None
    if any(need_full):
        inner, outer, _ = generate(seed=42, inner_tuples=I, outer_tuples=O,
                                   mode="uniform" if O > I else "ref")
    # plan_join at full size pays the on-device probe-chunk tuner; only
    # the phj_uniform/zipf rows consume the plan
    plan = plan_join(I, O) if (want("phj_uniform") or want("zipf")) else None
    if need_ik:
        ik, iv = jnp.asarray(inner.keys), jnp.asarray(inner.vals)
    if need_ok:
        ok, ov = jnp.asarray(outer.keys), jnp.asarray(outer.vals)

    if want("phj_uniform"):
        def run_phj(rep):
            res = phj_join(ik, iv, ok, ov ^ jnp.uint32(rep), plan)
            got = int(res.join_tuples)
            assert got == expected_join_tuples(I, O) % (1 << 32), got
            return got

        record("phj_uniform", O, _sync_run(run_phj))
        del run_phj

    if want("aggregate"):
        # hash aggregate over a 256M-row column set: the de-scattered
        # sort-group-reduce (ops/aggregate.py) at join-output scale.
        # Groups = the outer multiset by key (I distinct groups).
        from hash_join_codes_knl_tpu.ops.aggregate import hash_aggregate

        # fold the per-rep variation INSIDE the jit: an eager `ov ^ rep`
        # materializes an extra 1 GB the 256M-row double sort can't spare
        @jax.jit
        def _agg_xor(k, v, rep):
            return hash_aggregate(k, v ^ rep)

        def run_agg(rep):
            ng, gk, s, c = _agg_xor(ok, ov, jnp.uint32(rep))
            got = int(ng)
            assert got == I, got  # every build key drawn at least once
            return got

        record(f"hash_aggregate_{O//10**6}M", O, _sync_run(run_agg, reps=2),
               {"groups": I, "note": "sort-group-reduce, no scatter"})
        del run_agg

        # two-level chunked aggregate at a low-cardinality grouping
        # (64K groups over the same 256M rows): the batched chunk sorts
        # + partial re-aggregation move the compaction sort from input
        # size to partial size (ops/aggregate.py
        # hash_aggregate_chunked).  Keys fold to 64K groups by masking;
        # exactness cross-checked against the single-level result once.
        from hash_join_codes_knl_tpu.ops.aggregate import (
            hash_aggregate_chunked,
        )

        G_BITS = 16

        @jax.jit
        def _agg2_xor(k, v, rep):
            kk = (k & jnp.uint32((1 << G_BITS) - 1)) + jnp.uint32(1)
            return hash_aggregate_chunked(kk, v ^ rep, chunks=64,
                                          partial_cap=1 << 23)

        ng0, gk0, s0, c0, ovf0 = _agg2_xor(ok, ov, jnp.uint32(0))
        assert int(ovf0) == 0
        g0 = int(ng0)

        @jax.jit
        def _agg1_xor(k, v, rep):
            kk = (k & jnp.uint32((1 << G_BITS) - 1)) + jnp.uint32(1)
            return hash_aggregate(kk, v ^ rep)

        ng1, gk1, s1, c1 = _agg1_xor(ok, ov, jnp.uint32(0))
        assert int(ng1) == g0
        assert np.array_equal(np.asarray(gk1)[:g0], np.asarray(gk0)[:g0])
        assert np.array_equal(np.asarray(s1)[:g0], np.asarray(s0)[:g0])
        del ng1, gk1, s1, c1, ng0, gk0, s0, c0

        def run_agg2(rep):
            ng, gk, s, c, ovf = _agg2_xor(ok, ov, jnp.uint32(rep))
            assert int(ovf) == 0
            assert int(ng) == g0
            return g0

        record(f"hash_aggregate_chunked_{O//10**6}M_64Kgroups", O,
               _sync_run(run_agg2, reps=2),
               {"groups": g0, "chunks": 64,
                "note": "two-level batched-chunk sorts + partial "
                        "re-aggregation; exact vs single-level"})

        def run_agg1_lowcard(rep):
            ng, gk, s, c = _agg1_xor(ok, ov, jnp.uint32(rep))
            assert int(ng) == g0
            return g0

        record(f"hash_aggregate_{O//10**6}M_64Kgroups", O,
               _sync_run(run_agg1_lowcard, reps=2),
               {"groups": g0,
                "note": "single-level baseline for the chunked row"})
        del run_agg2, run_agg1_lowcard

    if want("npj_uniform_full"):
        # config 1 at the BASELINE shape: NPJ (one global table, sorted
        # probe) on the same 16M x 256M workload -- the NPJ-vs-PHJ story
        # at the headline size, not an extrapolation from 4M x 16M.
        nplan_f = plan_npj(I)
        nwin_f = nplan_f.auto_window(O)

        def run_npj_full(rep):
            tk, tv, _, max_disp = npj_build(ik, iv ^ jnp.uint32(rep),
                                            nplan_f)
            mv, mc, wovf = npj_probe_sorted(tk, tv, ok, nplan_f, max_disp,
                                            nwin_f)
            assert int(wovf) == 0
            got = int(jnp.sum(mc.astype(jnp.uint32)))
            assert got == expected_join_tuples(I, O) % (1 << 32)
            return got

        record("npj_uniform_full", O, _sync_run(run_npj_full, reps=2),
               {"note": f"{I}x{O}: global-table sorted probe, "
                        "BASELINE shape",
                "window": nwin_f})
        del run_npj_full

        # sorted-order output contract (the PHJ merge contract): one
        # probe-side 3-column sort instead of two -- no index carry, no
        # inverse sort (engine/npj.py order="sorted")
        def run_npj_sorted(rep):
            tk, tv, _, max_disp = npj_build(ik, iv ^ jnp.uint32(rep),
                                            nplan_f)
            k_s, v_s, mv, mc, wovf = npj_probe_sorted(
                tk, tv, ok, nplan_f, max_disp, nwin_f,
                probe_vals=ov, order="sorted",
            )
            assert int(wovf) == 0
            got = int(jnp.sum(mc.astype(jnp.uint32)))
            assert got == expected_join_tuples(I, O) % (1 << 32)
            return got

        record("npj_uniform_full_sorted_order", O,
               _sync_run(run_npj_sorted, reps=2),
               {"note": f"{I}x{O}: sorted-aligned output (PHJ merge "
                        "contract) -- one probe-side sort instead of "
                        "two", "window": nwin_f})
        del run_npj_sorted

    # free the uniform probe side before staging the zipf one: two
    # 256M-row probe sides plus join internals exceed one chip's HBM
    if need_ok:
        del ok, ov

    # config 4: PHJ under Zipf outer skew.  Skewed probe tiles span wider
    # build windows than the uniform-derived auto window; join() re-plans
    # until overflow-free, and the timed runs use that final plan.
    from hash_join_codes_knl_tpu.engine.phj import join as phj_auto_join

    if want("zipf"):
        for z in (0.75, 1.0):
            # per-ROW --only filter: "--only phj_zipf_1.0" must not pay
            # the other z's 256M-row generation + upload + timed reps
            if args.only is not None and args.only not in f"phj_zipf_{z}":
                continue
            _, outer_z, _ = generate(seed=43, inner_tuples=I,
                                     outer_tuples=O, mode="zipf", zipf=z)
            okz = jnp.asarray(outer_z.keys)
            ovz = jnp.asarray(outer_z.vals)
            res0, zplan = phj_auto_join(ik, iv, okz, ovz, plan)
            if args.small:
                # digest validation vs the host oracle (small sizes
                # only; at 256M the oracle itself is the bottleneck --
                # the TPU smoke battery covers full-scale zipf digests)
                from hash_join_codes_knl_tpu.engine.oracle import (
                    join_oracle,
                    multiset_digest,
                )
                from hash_join_codes_knl_tpu.engine.phj import materialize

                got_d = multiset_digest(*materialize(res0))
                want_d = multiset_digest(*join_oracle(
                    inner.keys, inner.vals, outer_z.keys, outer_z.vals))
                assert got_d == want_d, f"zipf z={z} digest mismatch"
            # free the throwaway re-plan result BEFORE the timed reps:
            # its cap-sized leaves (~3-4 GB at 256M rows) would otherwise
            # stay live through the loop (and into the cpra row)
            res0 = None

            # xor the per-rep variation INSIDE the jit: an eager
            # `ovz ^ rep` materializes an extra 1 GB, which is exactly
            # the HBM headroom the 256M-row zipf join needs
            import functools as _ft

            @_ft.partial(jax.jit, static_argnames=("plan",))
            def _join_xor(ik, iv, ok, ov, rep, plan):
                return phj_join(ik, iv, ok, ov ^ rep, plan)

            def run_zipf(rep, zplan=zplan, okz=okz, ovz=ovz,
                         _join_xor=_join_xor):
                res = _join_xor(ik, iv, okz, ovz, jnp.uint32(rep), zplan)
                assert int(np.asarray(res.build_counts)[0]) == 0
                return int(res.join_tuples)

            extra = {"window": zplan.window or "auto",
                     "probe_chunks": zplan.probe_chunks,
                     "tile": zplan.tile}
            if z == 1.0:
                # carried in the SCRIPT so --only re-records keep it
                extra["note"] = (
                    "181.5 M/s in the r3 session; the unchanged r3 code "
                    "re-measured 174.4 in r4 (control run) -- "
                    "environment drift, not a code regression "
                    "(PERF_NOTES 'zipf z=1.0 drift')")
            record(f"phj_zipf_{z}", O, _sync_run(run_zipf), extra)
            del run_zipf, okz, ovz

    # config 1: NPJ -- one global table, no partition passes.  The sorted
    # probe (home-bucket-ordered window sweep, engine/npj.py) is the
    # production engine; the while_loop chain walk is kept below as the
    # gather-bound ablation (the -D_NO_VECTOR analog) at reduced size.
    need_npj = (want("npj_uniform") or want("radix_4096")
                or want("npj_chain"))
    if need_npj:
        inner_n, outer_n, _ = generate(seed=44, inner_tuples=npj_I,
                                       outer_tuples=npj_O, mode="uniform")
        nik, niv = jnp.asarray(inner_n.keys), jnp.asarray(inner_n.vals)
        nok = jnp.asarray(outer_n.keys)
        nov = jnp.asarray(outer_n.vals)

    if want("npj_uniform"):
        nplan = plan_npj(npj_I)
        nwindow = nplan.auto_window(npj_O)

        def run_npj(rep):
            tk, tv, _, max_disp = npj_build(nik, niv ^ jnp.uint32(rep),
                                            nplan)
            mv, mc, wovf = npj_probe_sorted(tk, tv, nok, nplan, max_disp,
                                            nwindow)
            assert int(wovf) == 0
            got = int(jnp.sum(mc.astype(jnp.uint32)))
            assert got == expected_join_tuples(npj_I, npj_O) % (1 << 32)
            return got

        record("npj_uniform", npj_O, _sync_run(run_npj),
               {"note": f"{npj_I}x{npj_O}: global-table sorted probe",
                "window": nwindow})
        del run_npj

    if want("radix_4096") and not args.small:
        # hardware row only: the 64-region multipass unroll + 4096-region
        # probe is minutes-slow under CPU interpret mode (the CPU-side
        # correctness of this fanout lives in tests/test_phj.py and the
        # full join in scripts/tpu_smoke.py)
        # the reference CPRA's fixed operating point, NUM_PARTITIONS=4096
        # (cpra2.cpp:2023), as two 6-bit passes through the padded radix
        # engine (the parity mode; partition-as-sort is the speed mode --
        # this row records the fanout's measured cost, not a headline)
        from hash_join_codes_knl_tpu.engine.config import JoinPlan
        from hash_join_codes_knl_tpu.engine.oracle import (
            join_oracle,
            multiset_digest,
        )

        rplan = JoinPlan(p_bits=12, slots=1024, tile=2048,
                         pass_bits=(6, 6), partition_impl="radix",
                         probe_impl="pallas")

        def run_radix(rep):
            res = phj_join(nik, niv ^ jnp.uint32(rep), nok, nov, rplan)
            assert int(np.asarray(res.build_counts)[-1]) == 0
            return int(res.join_tuples)

        got = run_radix(0)
        assert got == expected_join_tuples(npj_I, npj_O) % (1 << 32), got
        record("phj_radix_4096way", npj_O, _sync_run(run_radix, reps=2),
               {"note": f"{npj_I}x{npj_O}: padded radix engine, "
                        "pass_bits=(6,6) -- the cpra2.cpp:2023 fanout. "
                        "Deliberately NOT run at the 16Mx256M headline "
                        "shape: the pass pads every region to ~4x the "
                        "mean (its VMEM run bound), so the probe side "
                        "alone would stage ~2x 4 GB double-buffered "
                        "padded copies -- past the 16 GB chip with the "
                        "relations resident (OOM, not an oversight); "
                        "merge mode is the at-scale engine, this row "
                        "records the reference fanout's measured cost",
                "pass_bits": [6, 6]})
        del run_radix

    if want("npj_chain"):
        # chain-walk ablation (+ _UNIQUE first-match retirement,
        # npj.cpp:954-956) at 1/8 probe volume: ~200x slower than the
        # sorted probe (gather-bound by design)
        import dataclasses as _dc

        nplan = plan_npj(npj_I)
        nok8 = nok[: max(1, npj_O // 8)]
        for name, uniq in (("npj_chain", False),
                           ("npj_chain_unique", True)):
            cplan = _dc.replace(nplan, unique=uniq, probe_impl="chain")

            def run_chain(rep, cplan=cplan):
                tk, tv, _, _ = npj_build(nik, niv ^ jnp.uint32(rep), cplan)
                mv, mc = npj_probe(tk, tv, nok8, cplan)
                return int(jnp.sum(mc.astype(jnp.uint32)))

            record(name, len(nok8), _sync_run(run_chain, reps=1),
                   {"note": "gather-bound ablation, 1/8 probe volume"})
        del nok8

    if want("cpra"):
        # config 3: CPRA on the local mesh (free the NPJ device arrays
        # first -- the full-size exchange needs the HBM headroom)
        if need_npj:
            del nik, niv, nok, nov
        n_dev = len(jax.devices())
        n_dev = 1 << (n_dev.bit_length() - 1)
        mesh = jax.make_mesh((n_dev,), ("x",))

        # ik/iv are already on the device (need_ik covers cpra); the
        # probe side was freed for the zipf rows, so re-stage only it
        cik, civ = ik, iv
        cok, cov = jnp.asarray(outer.keys), jnp.asarray(outer.vals)

        def run_cpra(rep):
            res, _ = cpra_join(cik, civ, cok, cov ^ jnp.uint32(rep), mesh,
                               slack=3.0)
            return int(np.asarray(res.join_tuples).sum())

        got = run_cpra(0)
        assert got == expected_join_tuples(I, O) % (1 << 32), got
        record("cpra", O, _sync_run(run_cpra, reps=1),
               {"devices": n_dev})

    if args.only is not None:
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged.update(results)
        results = merged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
