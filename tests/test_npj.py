"""NPJ engine vs the golden oracle; table-structure invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from hash_join_codes_knl_tpu.engine.npj import NpjPlan, npj_build, npj_join, plan_npj
from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest
from hash_join_codes_knl_tpu.relgen.generate import generate
from hash_join_codes_knl_tpu.utils.hashing import np_range_hash


def test_npj_build_findable_invariant():
    # every key must be reachable from its home bucket scanning forward to
    # the first empty slot
    rng = np.random.default_rng(0)
    keys = rng.integers(1, 2**32, 3000, dtype=np.uint32)
    vals = keys * np.uint32(3)
    plan = plan_npj(len(keys), load=0.75)
    tk, tv, ov, max_disp = npj_build(jnp.asarray(keys), jnp.asarray(vals),
                                     plan)
    assert int(ov) == 0
    tk = np.asarray(tk)
    # displacement bound: every key sits within max_disp of its home bucket
    h_all = np_range_hash(keys, plan.factor, plan.buckets)
    occupied = np.flatnonzero(tk != 0)
    assert int(max_disp) >= 0
    h = np_range_hash(keys, plan.factor, plan.buckets)
    for k, hh in zip(keys[:500], h[:500]):
        s = int(hh)
        while True:
            assert tk[s] != 0, "hit empty before finding key"
            if tk[s] == k:
                break
            s += 1


@pytest.mark.parametrize(
    "kw",
    [
        dict(inner_tuples=4096, outer_tuples=4096, mode="ref"),
        dict(inner_tuples=1024, outer_tuples=8192, mode="uniform"),
        dict(inner_tuples=1024, outer_tuples=8192, mode="zipf", zipf=1.0),
    ],
)
def test_npj_matches_oracle(kw):
    inner, outer, _ = generate(seed=37, prefer_native=False, **kw)
    mv, mc, _ = npj_join(inner.keys, inner.vals, outer.keys, outer.vals)
    mv, mc = np.asarray(mv), np.asarray(mc)
    assert mc.max() <= 1  # unique build keys on these workloads
    m = mc == 1
    got = multiset_digest(outer.keys[m], outer.vals[m], mv[m])
    want = multiset_digest(
        *join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    )
    assert got == want


def test_npj_duplicate_build_keys_counted():
    ik = np.array([5, 5, 9], dtype=np.uint32)
    iv = np.array([1, 2, 3], dtype=np.uint32)
    ok = np.array([5, 9, 7], dtype=np.uint32)
    mv, mc, _ = npj_join(ik, iv, ok, ok)
    np.testing.assert_array_equal(np.asarray(mc), [2, 1, 0])
    assert int(np.asarray(mv)[0]) == 2  # max of matched vals


def test_npj_sorted_probe_matches_chain_walk():
    """The sorted window probe and the chain-walk oracle must agree
    exactly, including duplicate build keys and missing probes."""
    import dataclasses

    rng = np.random.default_rng(77)
    ik = rng.integers(1, 4000, 3000, dtype=np.uint32)  # many duplicates
    iv = rng.integers(0, 2**32, 3000, dtype=np.uint32)
    ok = np.concatenate(
        [ik[rng.integers(0, 3000, 5000)],
         rng.integers(1, 2**32, 3000, dtype=np.uint32)]
    ).astype(np.uint32)
    mv0, mc0, plan = npj_join(ik, iv, ok, ok)
    assert plan.probe_impl == "sorted"
    chain = dataclasses.replace(plan, probe_impl="chain", window=0)
    mv1, mc1, _ = npj_join(ik, iv, ok, ok, chain)
    np.testing.assert_array_equal(np.asarray(mc0), np.asarray(mc1))
    np.testing.assert_array_equal(np.asarray(mv0), np.asarray(mv1))


def test_npj_sorted_probe_window_replan():
    """A deliberately tiny window must overflow (a value, not silent) and
    npj_join must re-plan to a clean window."""
    import dataclasses

    rng = np.random.default_rng(78)
    ik = np.unique(rng.integers(1, 2**32, 5000, dtype=np.uint32))[:4096]
    iv = ik * np.uint32(3)
    ok = ik[rng.integers(0, 4096, 8192)].astype(np.uint32)
    from hash_join_codes_knl_tpu.engine.npj import npj_build, npj_probe_sorted

    plan = plan_npj(4096)
    tk, tv, _, max_disp = npj_build(jnp.asarray(ik), jnp.asarray(iv), plan)
    _, _, wovf = npj_probe_sorted(tk, tv, jnp.asarray(ok), plan, max_disp,
                                  128)
    assert int(wovf) > 0  # 8192 probes over 8K buckets: spans >> 128
    tiny = dataclasses.replace(plan, window=128)
    mv, mc, final = npj_join(ik, iv, ok, ok, tiny)
    assert int(np.asarray(mc).sum()) == 8192
    assert final.window > 128  # re-planned


def test_npj_unique_mode_matches_default():
    """_UNIQUE analog (npj.cpp:954-956): with distinct build keys, early
    lane retirement must not change any result."""
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(61)
    ik = np.unique(rng.integers(1, 2**32, 5000, dtype=np.uint32))[:4096]
    iv = ik * np.uint32(3)
    ok = ik[rng.integers(0, 4096, 16384)].astype(np.uint32)
    mv0, mc0, plan = npj_join(ik, iv, ok, ok)
    # unique-mode early retirement only exists on the chain walk
    plan_u = dataclasses.replace(plan, unique=True, probe_impl="chain",
                                 window=0)
    mv1, mc1, _ = npj_join(ik, iv, ok, ok, plan_u)
    np.testing.assert_array_equal(np.asarray(mv0), np.asarray(mv1))
    np.testing.assert_array_equal(np.asarray(mc0), np.asarray(mc1))


def test_npj_explicit_window_wider_than_table():
    """An explicit window wider than the whole table must clamp to
    whole-table coverage (unclamped it would compute NEGATIVE window
    rows -- an out-of-bounds DMA on hardware) and still probe exactly."""
    import dataclasses

    from hash_join_codes_knl_tpu.engine.npj import npj_probe_sorted

    rng = np.random.default_rng(81)
    ik = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    iv = ik * np.uint32(5)
    ok = np.concatenate(
        [ik[rng.integers(0, 2048, 3000)],
         rng.integers(1, 2**32, 1096, dtype=np.uint32)]
    ).astype(np.uint32)
    plan = plan_npj(2048)
    tk, tv, bovf, max_disp = npj_build(jnp.asarray(ik), jnp.asarray(iv),
                                       plan)
    assert int(bovf) == 0
    huge = int(tk.shape[0]) * 4  # far wider than the table
    mv, mc, wovf = npj_probe_sorted(tk, tv, jnp.asarray(ok), plan,
                                    max_disp, huge)
    assert int(wovf) == 0
    mv, mc = np.asarray(mv), np.asarray(mc)
    m = mc == 1
    got = multiset_digest(ok[m], ok[m], mv[m])
    want = multiset_digest(*join_oracle(ik, iv, ok, ok))
    assert got == want


def test_npj_sorted_const_tile_bucket_collision(monkeypatch):
    """A probe tile filled with ONE hot key plus a bucket-colliding
    distinct key interleaved: the Pallas kernel's constant-tile fast
    path (first == last -> broadcast row 0) must not hand the collider
    the hot key's matches.  Probes are (h0, key)-sorted so first==last
    still implies a one-key tile (regression: h0-only sorting let the
    stable sort keep the collider INSIDE the run).  Runs the real
    kernel in interpret mode -- the jnp oracle has no fast path."""
    from jax.experimental.pallas import tpu as pltpu

    from hash_join_codes_knl_tpu.engine import npj as npj_mod

    rng = np.random.default_rng(5)
    ik = np.unique(rng.integers(1, 2**32, 60_000, dtype=np.uint32))[:32768]
    iv = (np.arange(len(ik), dtype=np.uint32) + 1) * np.uint32(7)
    plan = plan_npj(len(ik))
    h0 = np_range_hash(ik, plan.factor, plan.buckets)
    order = np.argsort(h0, kind="stable")
    dup = np.flatnonzero(np.diff(h0[order]) == 0)
    assert len(dup), "need at least one bucket collision in the build"
    a = ik[order[dup[0]]]
    b = ik[order[dup[0] + 1]]
    assert a != b and h0[order[dup[0]]] == h0[order[dup[0] + 1]]
    ok = np.full(plan.tile, a, np.uint32)
    ok[plan.tile // 2] = b  # stable h0-sort would leave b mid-run
    tk, tv, ovf, max_disp = npj_build(jnp.asarray(ik), jnp.asarray(iv),
                                      plan)
    assert int(ovf) == 0
    window = plan.auto_window(len(ok), disp=int(max_disp) + 128)
    monkeypatch.setattr(npj_mod, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        mv, mc, wovf = npj_mod.npj_probe_sorted(
            tk, tv, jnp.asarray(ok), plan, max_disp, window
        )
    assert int(wovf) == 0
    mv, mc = np.asarray(mv), np.asarray(mc)
    va = int(iv[ik == a][0])
    vb = int(iv[ik == b][0])
    i_b = plan.tile // 2
    assert mc[i_b] == 1 and mv[i_b] == vb, "collider got the hot key's row"
    assert mc[0] == 1 and mv[0] == va


def test_npj_sorted_span_clamps_to_table_end():
    """A long mid-table cluster (max_disp > margin, no build overflow)
    probed near the last bucket: the required span clamps to the table
    end, so a whole-table window is NOT flagged as overflow (regression:
    hi + max_disp + 1 overshot `size` and npj_join raised on a join the
    window fully covered)."""
    # margin 4096, size 12288 slots = 96 window chunks -- inside the
    # dense kernel's r4-recalibrated ROWCHUNK_BUDGET ceiling (a 1<<14
    # table needs a 160-chunk whole-table window, past the measured
    # scoped-vmem boundary; the clamp semantics under test are
    # size-independent)
    plan = NpjPlan(buckets=1 << 13)
    rng = np.random.default_rng(9)
    pool = np.unique(rng.integers(1, 2**32, 400_000, dtype=np.uint32))
    h0 = np_range_hash(pool, plan.factor, plan.buckets)
    mid = pool[(h0 >= 2000) & (h0 < 2200)][:4500]  # one dense cluster
    tail = pool[h0 == plan.buckets - 1][:2]        # keys at the last bucket
    assert len(mid) == 4500 and len(tail) >= 1
    ik = np.concatenate([mid, tail]).astype(np.uint32)
    iv = (np.arange(len(ik), dtype=np.uint32) + 1)
    tk, tv, ovf, max_disp = npj_build(jnp.asarray(ik), jnp.asarray(iv),
                                      plan)
    assert int(ovf) == 0
    assert int(max_disp) > plan.margin  # the scenario's premise
    ok = np.concatenate([tail, mid[:100]]).astype(np.uint32)
    mv, mc, _ = npj_join(ik, iv, ok, ok, plan)
    assert np.asarray(mc).min() == 1  # every probe found its row


def test_npj_sorted_tile_shrink_replan():
    """Probe counts a small fraction of the table: tile spans exceed the
    widest compilable window at tile 2048 (the r4 scoped-vmem ceiling),
    and the driver must shrink the TILE (spans scale with tile, the cap
    scales inversely) instead of raising."""
    plan = NpjPlan(buckets=1 << 17)  # table 135168 slots >> window cap
    rng = np.random.default_rng(13)
    ik = np.unique(rng.integers(1, 2**32, 400_000, dtype=np.uint32))[:100_000]
    iv = (np.arange(len(ik), dtype=np.uint32) + 1)
    ok = ik[rng.integers(0, len(ik), 2048)].astype(np.uint32)
    # premise: the auto window at tile 2048 cannot cover a tile's span
    assert plan.auto_window(len(ok)) >= plan.max_window or \
        plan.table_size > plan.max_window
    mv, mc, plan_out = npj_join(ik, iv, ok, ok, plan)
    assert plan_out.tile < 2048  # the shrink happened
    assert np.asarray(mc).min() == 1  # every probe found its row
    assert np.array_equal(np.asarray(mv), iv[np.searchsorted(ik, ok)])


def test_npj_sorted_order_output_matches_input_order():
    """order='sorted' (one probe-side sort, PHJ-style sorted-aligned
    output) must produce the same row multiset as the default
    input-order contract, including M:N counts and misses."""
    rng = np.random.default_rng(83)
    ik = rng.integers(1, 4000, 3000, dtype=np.uint32)  # duplicates
    iv = rng.integers(0, 2**32, 3000, dtype=np.uint32)
    ok = np.concatenate(
        [ik[rng.integers(0, 3000, 5000)],
         rng.integers(1, 2**32, 2000, dtype=np.uint32)]
    ).astype(np.uint32)
    ov = rng.integers(0, 2**32, len(ok), dtype=np.uint32)
    mv0, mc0, plan0 = npj_join(ik, iv, ok, ov)
    k_s, v_s, mv1, mc1, plan1 = npj_join(ik, iv, ok, ov, order="sorted")
    assert plan1.window == plan0.window
    k_s, v_s = np.asarray(k_s), np.asarray(v_s)
    mv1, mc1 = np.asarray(mv1), np.asarray(mc1)
    live = k_s != 0
    assert live.sum() == len(ok)
    # pads carry zero counts
    assert mc1[~live].sum() == 0
    # row-multiset equality of (key, val, match_val, cnt)
    a = np.lexsort((np.asarray(mc0), np.asarray(mv0), ov, ok))
    b = np.lexsort((mc1[live], mv1[live], v_s[live], k_s[live]))
    np.testing.assert_array_equal(ok[a], k_s[live][b])
    np.testing.assert_array_equal(ov[a], v_s[live][b])
    np.testing.assert_array_equal(np.asarray(mv0)[a], mv1[live][b])
    np.testing.assert_array_equal(np.asarray(mc0)[a], mc1[live][b])
    with pytest.raises(ValueError, match="sorted probe engine only"):
        import dataclasses

        npj_join(ik, iv, ok, ov,
                 dataclasses.replace(plan0, probe_impl="chain", window=0),
                 order="sorted")
