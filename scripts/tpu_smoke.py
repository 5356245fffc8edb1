"""Real-TPU correctness battery: digest-level differential checks ON
HARDWARE.

The pytest suite runs on a forced CPU mesh, where Pallas kernels execute
in interpret mode -- faithful to the kernel SEMANTICS but not to the
Mosaic lowering (e.g. dynamic-gather operand-shape constraints only
surface on real lowering).  This script runs the kernel matrix on the
attached chip and compares every result against the jnp oracles and the
host golden join, at sizes small enough to finish in a few minutes:

  1. merge probe: dense vs gather vs jnp at several (tile, window)
  2. chunk-sorted probe plans (C in {0, 8, 64}) vs oracle digests
  3. NPJ sorted probe vs chain walk
  4. padded radix mode (pass_bits) vs oracle
  5. CPRA single-mesh step (sort pack AND radix pack) vs oracle
  6. zipf + duplicate-heavy workloads through join() re-planning

Exit 0 and one JSON line on success; first failure aborts with detail.

Usage: python scripts/tpu_smoke.py  (~3-6 min incl. compiles)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.config import JoinPlan, plan_join
    from hash_join_codes_knl_tpu.engine.oracle import (
        join_oracle,
        multiset_digest,
    )
    from hash_join_codes_knl_tpu.engine.phj import (
        join,
        materialize,
        materialize_expanded,
        phj_join,
    )

    t0 = time.time()
    checks = 0

    def check(name, got, want):
        nonlocal checks
        assert got == want, f"{name}: MISMATCH"
        checks += 1
        print(f"ok: {name}", file=sys.stderr)

    rng = np.random.default_rng(3)
    ik = np.unique(rng.integers(1, 2**32, 400_000, dtype=np.uint32))[:262144]
    iv = rng.integers(0, 2**32, len(ik), dtype=np.uint32)
    hits = ik[rng.integers(0, len(ik), 3_000_000)]
    miss = rng.integers(1, 2**32, 500_000, dtype=np.uint32)
    ok = np.concatenate([hits, miss]).astype(np.uint32)
    rng.shuffle(ok)
    ov = rng.integers(0, 2**32, len(ok), dtype=np.uint32)
    want = multiset_digest(*join_oracle(ik, iv, ok, ov))

    # 1+2: probe engines x chunk plans (gather picked automatically at
    # wide windows; dense at narrow; forced variants too)
    for label, plan in [
        ("merge auto C=0", dataclasses.replace(
            plan_join(len(ik), len(ok), tile=2048, probe_chunks=0))),
        ("merge auto C=8", dataclasses.replace(
            plan_join(len(ik), len(ok), tile=2048, probe_chunks=8))),
        ("merge auto C=64 tile3072", dataclasses.replace(
            plan_join(len(ik), len(ok), tile=3072, probe_chunks=64))),
        ("merge dense forced", dataclasses.replace(
            plan_join(len(ik), len(ok), tile=2048, probe_chunks=0),
            probe_impl="merge_pallas")),
        ("padded pallas", JoinPlan(p_bits=10, slots=1024, tile=2048,
                                   pass_bits=(10,), probe_impl="pallas")),
        ("padded radix pass_bits=(5,5)", JoinPlan(
            p_bits=10, slots=1024, tile=2048, pass_bits=(5, 5),
            partition_impl="radix", probe_impl="pallas")),
        # the reference CPRA's fixed 4096-way fanout (cpra2.cpp:2023) as
        # two 6-bit passes -- its pass loop's only operating point
        ("padded radix 4096-way pass_bits=(6,6)", JoinPlan(
            p_bits=12, slots=1024, tile=2048, pass_bits=(6, 6),
            partition_impl="radix", probe_impl="pallas")),
    ]:
        res, _ = join(ik, iv, ok, ov, plan)
        check(label, multiset_digest(*materialize(res)), want)

    # 1b: BOTH gather-select engines (flat reduce vs two-level "hier"
    # boundary count) at a production-width window, directly against the
    # jnp oracle.  join() picks one engine per run (HJK_GATHER_SELECT);
    # the hier path's Mosaic lowering (sublane iota + an 8-wide lane
    # gather refinement) is exactly the hardware-only surface this
    # battery exists for.
    from hash_join_codes_knl_tpu.engine.phj import _merge_windows
    from hash_join_codes_knl_tpu.ops.merge_probe_gather import (
        merge_probe_gather,
    )
    from hash_join_codes_knl_tpu.ops.merge_probe_pallas import (
        merge_probe_jnp,
    )
    from hash_join_codes_knl_tpu.utils.hashing import hashed_key as _hk

    FACTORG = 0x9E3779B1
    g_rows = 130
    bhk_g = np.asarray(
        jnp.sort(_hk(jnp.asarray(ik[: g_rows * 128]), FACTORG)))
    bval_g = iv[: g_rows * 128]
    order_g = np.lexsort((bval_g, bhk_g))
    bhk_g, bval_g = bhk_g[order_g], bval_g[order_g]
    ohk_g = np.sort(np.asarray(_hk(jnp.asarray(
        ik[rng.integers(0, g_rows * 128, 64 * 1024)]), FACTORG)))
    wrow_g, stats_g = _merge_windows(
        jnp.asarray(bhk_g), jnp.asarray(ohk_g), 1024, 118 * 128, g_rows)
    assert int(stats_g[0]) == 0, "gather-select smoke window overflow"
    mv_o, mc_o = merge_probe_jnp(
        jnp.asarray(ohk_g), jnp.asarray(bhk_g).reshape(g_rows, 128),
        jnp.asarray(bval_g).reshape(g_rows, 128), wrow_g, 1024, 118 * 128)
    for sel in ("flat", "hier", "rowbase"):
        mv_g, mc_g, sovf_g = merge_probe_gather(
            jnp.asarray(ohk_g), jnp.asarray(bhk_g).reshape(g_rows, 128),
            jnp.asarray(bval_g).reshape(g_rows, 128), wrow_g,
            1024, 118 * 128, select=sel, k_sel=40)
        assert int(sovf_g) == 0, (sel, int(sovf_g))
        assert np.array_equal(np.asarray(mc_g), np.asarray(mc_o)), sel
        assert np.array_equal(np.asarray(mv_g), np.asarray(mv_o)), sel
        checks += 1
        print(f"ok: gather select={sel} @118 chunks", file=sys.stderr)

    # 3: NPJ sorted vs chain (chain at reduced probe count: gather-bound)
    from hash_join_codes_knl_tpu.engine.npj import npj_join, plan_npj

    mv, mc, nplan = npj_join(ik, iv, ok, ov)
    m = np.asarray(mc) == 1
    check("npj sorted",
          multiset_digest(ok[m], ov[m], np.asarray(mv)[m]), want)
    ok8 = ok[:65536]
    mv1, mc1, _ = npj_join(ik, iv, ok8, ok8)
    mv0, mc0, _ = npj_join(
        ik, iv, ok8, ok8,
        dataclasses.replace(nplan, probe_impl="chain", window=0))
    assert np.array_equal(np.asarray(mc1), np.asarray(mc0))
    assert np.array_equal(np.asarray(mv1), np.asarray(mv0))
    checks += 1
    print("ok: npj sorted == chain", file=sys.stderr)

    # 3a: the sorted-order output contract (one probe-side sort) must
    # carry the same row multiset as input order on real hardware.
    # INDEPENDENT probe values (not aliases of the keys): the new
    # surface under test is the value column riding the lax.sort in
    # place of the index carry -- aliased values would mask a corrupted
    # carry column
    ov8 = rng.integers(0, 2**32, len(ok8), dtype=np.uint32)
    k_s, v_s, mvs, mcs, _ = npj_join(ik, iv, ok8, ov8, order="sorted")
    k_s, v_s = np.asarray(k_s), np.asarray(v_s)
    mvs, mcs = np.asarray(mvs), np.asarray(mcs)
    live = k_s != 0
    assert live.sum() == len(ok8) and mcs[~live].sum() == 0
    a = np.lexsort((np.asarray(mc1), np.asarray(mv1), ov8, ok8))
    b = np.lexsort((mcs[live], mvs[live], v_s[live], k_s[live]))
    assert np.array_equal(ok8[a], k_s[live][b])
    assert np.array_equal(ov8[a], v_s[live][b])
    assert np.array_equal(np.asarray(mv1)[a], mvs[live][b])
    assert np.array_equal(np.asarray(mc1)[a], mcs[live][b])
    checks += 1
    print("ok: npj sorted-order contract", file=sys.stderr)

    # 3c: two-level chunked aggregate == single-level on hardware
    from hash_join_codes_knl_tpu.ops.aggregate import (
        hash_aggregate,
        hash_aggregate_chunked,
    )

    ka = (ok[:4_000_000] & jnp.uint32(0xFFFF)) + jnp.uint32(1)
    va = ov[:4_000_000]
    ng0, gk0, s0, c0 = hash_aggregate(ka, va)
    ng1, gk1, s1, c1, aovf = hash_aggregate_chunked(
        ka, va, chunks=16, partial_cap=1 << 21
    )
    g0 = int(ng0)
    assert int(aovf) == 0 and int(ng1) == g0
    assert np.array_equal(np.asarray(gk1)[:g0], np.asarray(gk0)[:g0])
    assert np.array_equal(np.asarray(s1)[:g0], np.asarray(s0)[:g0])
    assert np.array_equal(np.asarray(c1)[:g0], np.asarray(c0)[:g0])
    checks += 1
    print("ok: chunked aggregate == single-level", file=sys.stderr)

    # 3b: heavy-hitter probe tiles with a bucket-colliding distinct key
    # interleaved -- the dense kernel's constant-tile fast path must not
    # hand the collider the hot key's matches.  Only the REAL Mosaic
    # lowering has the fast path (the jnp oracle sweeps every row), so
    # this belongs in the hardware battery.
    from hash_join_codes_knl_tpu.utils.hashing import np_range_hash

    h0n = np_range_hash(ik, nplan.factor, nplan.buckets)
    ordn = np.argsort(h0n, kind="stable")
    dupn = np.flatnonzero(np.diff(h0n[ordn]) == 0)
    assert len(dupn), "no bucket collision in the build draw"
    hot, col = ik[ordn[dupn[0]]], ik[ordn[dupn[0] + 1]]
    okh = np.full(8 * nplan.tile, hot, np.uint32)
    okh[nplan.tile // 2] = col  # inside the first hot tile
    mvh, mch, _ = npj_join(ik, iv, okh, okh)
    mvc, mcc, _ = npj_join(
        ik, iv, okh, okh,
        dataclasses.replace(nplan, probe_impl="chain", window=0))
    assert np.array_equal(np.asarray(mch), np.asarray(mcc))
    assert np.array_equal(np.asarray(mvh), np.asarray(mvc))
    checks += 1
    print("ok: npj const-tile collider", file=sys.stderr)

    # 4: duplicate-heavy build through re-planning + expansion
    dup = np.concatenate([ik[:1000]] * 40 + [ik]).astype(np.uint32)
    dv = rng.integers(0, 2**32, len(dup), dtype=np.uint32)
    okd = ik[rng.integers(0, len(ik), 500_000)].astype(np.uint32)
    ovd = rng.integers(0, 2**32, len(okd), dtype=np.uint32)
    res, _ = join(dup, dv, okd, ovd)
    wantd = join_oracle(dup, dv, okd, ovd)
    assert int(res.join_tuples) == len(wantd[0])
    check("M:N expansion",
          multiset_digest(*materialize_expanded(res, dup, dv)),
          multiset_digest(*wantd))

    # 5: CPRA on the (single-chip) mesh -- digest-checked, not just run
    from hash_join_codes_knl_tpu.parallel.cpra import cpra_join

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((1 << (n_dev.bit_length() - 1),), ("x",))
    n_even = len(ok) // mesh.shape["x"] * mesh.shape["x"]
    res, _ = cpra_join(ik, iv, ok[:n_even], ov[:n_even], mesh)
    check("cpra mesh step",
          multiset_digest(*materialize(res)),
          multiset_digest(*join_oracle(ik, iv, ok[:n_even], ov[:n_even])))

    # 5b: the radix-pack exchange engine's Pallas lowering ON HARDWARE.
    # A 1-chip mesh degenerates the owner exchange (c_bits=0 skips the
    # radix pack entirely), so exercise pack_by_owner_radix directly at
    # c_bits=2 and compare every bucket's multiset against the pass
    # oracle -- this is exactly the hardware-only surface (dynamic
    # gathers, run-aligned DMAs) the battery exists to cover.
    from hash_join_codes_knl_tpu.parallel.cpra import pack_by_owner_radix
    from hash_join_codes_knl_tpu.ops.radix_partition_pallas import (
        radix_partition_oracle,
    )
    from hash_join_codes_knl_tpu.utils.hashing import hashed_key

    FACTOR = 0x9E3779B1
    bk, bv, cnts, ovf = pack_by_owner_radix(
        jnp.asarray(ok[:1_000_000]), jnp.asarray(ov[:1_000_000]),
        FACTOR, 2,
    )
    assert int(ovf) == 0, "radix pack overflow"
    bk, bv, cnts = np.asarray(bk), np.asarray(bv), np.asarray(cnts)
    hk = np.asarray(hashed_key(jnp.asarray(ok[:1_000_000]), FACTOR))
    want_buckets = radix_partition_oracle(hk, ov[:1_000_000], 2)
    capr = len(bk) // 4
    for c in range(4):
        reg_k = bk[c * capr : (c + 1) * capr]
        reg_v = bv[c * capr : (c + 1) * capr]
        live = reg_k != 0
        wk, wv = want_buckets[c]
        assert live.sum() == cnts[c] == len(wk), f"bucket {c} count"
        assert (sorted(zip(reg_k[live].tolist(), reg_v[live].tolist()))
                == sorted(zip(wk.tolist(), wv.tolist()))), f"bucket {c}"
    checks += 1
    print("ok: radix-pack exchange engine on hardware", file=sys.stderr)

    print(json.dumps({
        "metric": "tpu_smoke", "value": checks, "unit": "checks_passed",
        "seconds": round(time.time() - t0, 1),
        "platform": jax.devices()[0].platform,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
