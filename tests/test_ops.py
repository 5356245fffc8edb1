"""Operator tests: compact, filter, aggregate, sort, M:N expansion."""

import numpy as np
import jax.numpy as jnp

from hash_join_codes_knl_tpu.ops.aggregate import hash_aggregate
from hash_join_codes_knl_tpu.ops.compact import compact_rows
from hash_join_codes_knl_tpu.ops.expand import expand_join
from hash_join_codes_knl_tpu.ops.filter import filter_relation
from hash_join_codes_knl_tpu.ops.sort import sort_relation
from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest


def _data(n, seed, hi=2**32):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(1, hi, n, dtype=np.uint32),
        rng.integers(0, 2**32, n, dtype=np.uint32),
    )


def test_compact_rows():
    keys, vals = _data(1000, 0)
    flags = (keys % 3 == 0).astype(np.uint32)
    cnt, ck, cv = compact_rows(jnp.asarray(flags), jnp.asarray(keys),
                               jnp.asarray(vals))
    cnt = int(cnt)
    assert cnt == flags.sum()
    np.testing.assert_array_equal(np.asarray(ck)[:cnt], keys[flags == 1])
    np.testing.assert_array_equal(np.asarray(cv)[:cnt], vals[flags == 1])


def test_filter_relation():
    keys, vals = _data(5000, 1)
    cnt, fk, fv = filter_relation(
        jnp.asarray(keys), jnp.asarray(vals),
        lambda k, v: k > jnp.uint32(2**31),
    )
    cnt = int(cnt)
    m = keys > 2**31
    assert cnt == m.sum()
    np.testing.assert_array_equal(np.asarray(fk)[:cnt], keys[m])


def test_hash_aggregate_matches_numpy():
    keys, vals = _data(10_000, 2, hi=200)  # many repeats
    n_groups, gk, sums, counts = hash_aggregate(
        jnp.asarray(keys), jnp.asarray(vals)
    )
    n_groups = int(n_groups)
    gk, sums, counts = (np.asarray(x)[:n_groups] for x in (gk, sums, counts))
    uk = np.unique(keys)
    assert n_groups == len(uk)
    np.testing.assert_array_equal(np.sort(gk), uk)
    order = np.argsort(gk)
    for k, s, c in zip(gk[order][:50], sums[order][:50], counts[order][:50]):
        m = keys == k
        assert c == m.sum()
        assert s == np.sum(vals[m].astype(np.uint32), dtype=np.uint32)


def test_hash_aggregate_empty_input():
    """Aggregating an empty (fully filtered) relation returns zero
    groups instead of a trace-time shape error."""
    n_groups, gk, sums, counts = hash_aggregate(
        jnp.zeros(0, jnp.uint32), jnp.zeros(0, jnp.uint32)
    )
    assert int(n_groups) == 0
    assert gk.shape == sums.shape == counts.shape == (0,)


def test_hash_aggregate_ignores_nulls():
    keys = np.array([0, 5, 0, 5, 9], dtype=np.uint32)
    vals = np.array([7, 1, 7, 2, 3], dtype=np.uint32)
    n_groups, gk, sums, counts = hash_aggregate(jnp.asarray(keys),
                                                jnp.asarray(vals))
    assert int(n_groups) == 2
    got = {int(k): (int(s), int(c))
           for k, s, c in zip(np.asarray(gk)[:2], np.asarray(sums)[:2],
                              np.asarray(counts)[:2])}
    assert got == {5: (3, 2), 9: (3, 1)}


def test_sort_relation():
    keys, vals = _data(4096, 3)
    sk, sv = sort_relation(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), keys[order])
    np.testing.assert_array_equal(np.asarray(sv), vals[order])


def test_expand_join_full_mn():
    rng = np.random.default_rng(4)
    ik = rng.integers(1, 50, 300, dtype=np.uint32)  # heavy duplication
    iv = rng.integers(0, 2**32, 300, dtype=np.uint32)
    ok = rng.integers(1, 80, 500, dtype=np.uint32)
    ov = rng.integers(0, 2**32, 500, dtype=np.uint32)
    want_rows = join_oracle(ik, iv, ok, ov)
    cap = len(want_rows[0]) + 64
    total, k, v, t = expand_join(
        jnp.asarray(ik), jnp.asarray(iv), jnp.asarray(ok), jnp.asarray(ov),
        capacity=cap,
    )
    total = int(total)
    assert total == len(want_rows[0])
    got = multiset_digest(
        np.asarray(k)[:total], np.asarray(v)[:total], np.asarray(t)[:total]
    )
    assert got == multiset_digest(*want_rows)


def test_aggregate_join_result_single_chip():
    import collections

    import jax.numpy as jnp
    import numpy as np

    from hash_join_codes_knl_tpu.engine.phj import join
    from hash_join_codes_knl_tpu.ops.aggregate import aggregate_join_result
    from hash_join_codes_knl_tpu.relgen.generate import generate

    inner, outer, _ = generate(seed=37, inner_tuples=512,
                               outer_tuples=8192, mode="uniform",
                               prefer_native=False)
    res, _ = join(inner.keys, inner.vals, outer.keys, outer.vals)
    ng, gk, gs, gc = aggregate_join_result(res)
    gk, gs, gc = np.asarray(gk), np.asarray(gs), np.asarray(gc)
    # oracle: group (probe key -> sum of matched build vals)
    want_sum = collections.defaultdict(int)
    want_cnt = collections.defaultdict(int)
    bval = dict(zip(inner.keys.tolist(), inner.vals.tolist()))
    for k in outer.keys.tolist():
        if k in bval:
            want_sum[k] = (want_sum[k] + bval[k]) % (1 << 32)
            want_cnt[k] += 1
    assert int(ng) == len(want_sum)
    m = gk != 0
    got = dict(zip(gk[m].tolist(), gs[m].tolist()))
    gotc = dict(zip(gk[m].tolist(), gc[m].tolist()))
    assert got == dict(want_sum)
    assert gotc == dict(want_cnt)


def test_aggregate_join_output_distributed_disjoint_keys():
    import numpy as np

    import jax

    from hash_join_codes_knl_tpu.engine.config import JoinPlan
    from hash_join_codes_knl_tpu.ops.aggregate import aggregate_join_result
    from hash_join_codes_knl_tpu.parallel.cpra import cpra_join
    from hash_join_codes_knl_tpu.relgen.generate import generate

    inner, outer, _ = generate(seed=41, inner_tuples=1024,
                               outer_tuples=8192, mode="uniform",
                               prefer_native=False)
    mesh = jax.make_mesh((4,), ("x",))
    plan = JoinPlan(p_bits=5, slots=128, tile=128, pass_bits=(5,))
    res, _ = cpra_join(inner.keys, inner.vals, outer.keys, outer.vals,
                       mesh, plan, slack=4.0)
    # per-chip aggregation: shard-local group keys must be globally disjoint
    # because the exchange routed equal keys to one owner
    import jax.numpy as jnp

    # result leaves are globally concatenated per-chip locals (P("x"))
    pk = np.asarray(res.probe_keys).reshape(4, -1)
    mc = np.asarray(res.match_cnts).reshape(4, -1)
    all_groups = set()
    for c in range(4):
        keys_c = set(pk[c][(mc[c] == 1)].tolist())
        assert not (all_groups & keys_c), "keys span chips"
        all_groups |= keys_c
    # and the flat aggregate matches the expected distinct-match count
    ng, gk, gs, gc = aggregate_join_result(
        type(res)(
            jnp.asarray(pk.reshape(-1)),
            jnp.asarray(np.asarray(res.probe_vals).reshape(-1)),
            jnp.asarray(np.asarray(res.match_vals).reshape(-1)),
            jnp.asarray(mc.reshape(-1)),
            jnp.asarray(np.asarray(res.build_counts).reshape(-1)),
        )
    )
    assert int(ng) == len(all_groups)


def test_aggregate_join_result_rejects_multimatch():
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from hash_join_codes_knl_tpu.engine.phj import JoinResult, join
    from hash_join_codes_knl_tpu.ops.aggregate import aggregate_join_result

    # duplicate-key build -> match counts > 1: the aggregate must refuse
    # (silently dropping those rows would be a quietly wrong aggregate)
    ik = np.array([7, 7, 9], dtype=np.uint32)
    iv = np.array([1, 2, 3], dtype=np.uint32)
    ok = np.array([7, 9, 11], dtype=np.uint32)
    ov = np.array([10, 20, 30], dtype=np.uint32)
    res, _ = join(ik, iv, ok, ov)
    with pytest.raises(ValueError, match="multi-match"):
        aggregate_join_result(res)


def test_expand_join_padded_sides():
    """PAD_KEY (0) rows on EITHER side must stay inert.  The build-side
    sort must leave keys globally ascending (nulls sort FIRST under a
    plain key sort); a null-last order would break searchsorted's
    precondition and silently drop matches for real keys."""
    rng = np.random.default_rng(11)
    ik = rng.integers(1, 40, 256, dtype=np.uint32)
    iv = rng.integers(0, 2**32, 256, dtype=np.uint32)
    ok = rng.integers(1, 60, 400, dtype=np.uint32)
    ov = rng.integers(0, 2**32, 400, dtype=np.uint32)
    # interleave pad rows mid-array on both sides
    ikp = np.concatenate([ik[:100], np.zeros(64, np.uint32), ik[100:]])
    ivp = np.concatenate([iv[:100], np.zeros(64, np.uint32), iv[100:]])
    okp = np.concatenate([ok[:200], np.zeros(32, np.uint32), ok[200:]])
    ovp = np.concatenate([ov[:200], np.zeros(32, np.uint32), ov[200:]])
    want_rows = join_oracle(ik, iv, ok, ov)
    cap = len(want_rows[0]) + 64
    total, k, v, t = expand_join(
        jnp.asarray(ikp), jnp.asarray(ivp), jnp.asarray(okp),
        jnp.asarray(ovp), capacity=cap,
    )
    total = int(total)
    assert total == len(want_rows[0])
    got = multiset_digest(
        np.asarray(k)[:total], np.asarray(v)[:total], np.asarray(t)[:total]
    )
    assert got == multiset_digest(*want_rows)


def test_hash_aggregate_chunked_matches_single_level():
    """Two-level chunked aggregate == single-level on every column,
    including u32 wraparound sums, null handling, and non-divisible
    chunk geometry."""
    from hash_join_codes_knl_tpu.ops.aggregate import (
        hash_aggregate_auto,
        hash_aggregate_chunked,
    )

    rng = np.random.default_rng(23)
    for n, g_keys, chunks in ((30000, 400, 8), (9999, 77, 16),
                              (5000, 4999, 4)):
        pool = np.unique(
            rng.integers(1, 2**32, g_keys + 100, dtype=np.uint32)
        )[:g_keys]
        keys = pool[rng.integers(0, g_keys, n)].astype(np.uint32)
        keys[rng.integers(0, n, n // 20)] = 0  # nulls
        vals = rng.integers(0, 2**32, n, dtype=np.uint32)
        n0, k0, s0, c0 = hash_aggregate(jnp.asarray(keys),
                                        jnp.asarray(vals))
        n1, k1, s1, c1, ovf = hash_aggregate_chunked(
            jnp.asarray(keys), jnp.asarray(vals), chunks=chunks,
            partial_cap=chunks * -(-n // chunks),
        )
        g = int(n0)
        assert int(ovf) == 0
        assert int(n1) == g, (n, g_keys, chunks)
        np.testing.assert_array_equal(np.asarray(k1)[:g],
                                      np.asarray(k0)[:g])
        np.testing.assert_array_equal(np.asarray(s1)[:g],
                                      np.asarray(s0)[:g])
        np.testing.assert_array_equal(np.asarray(c1)[:g],
                                      np.asarray(c0)[:g])
        # pad hygiene past the packed groups
        assert not np.asarray(k1)[g:].any()
        assert not np.asarray(s1)[g:].any()
        # auto wrapper agrees regardless of whether a tiny cap forces
        # the single-level fallback
        ra = hash_aggregate_auto(keys, vals, chunks=chunks,
                                 partial_cap=64)
        assert int(ra[0]) == g
        np.testing.assert_array_equal(np.asarray(ra[1])[:g],
                                      np.asarray(k0)[:g])
        np.testing.assert_array_equal(np.asarray(ra[2])[:g],
                                      np.asarray(s0)[:g])


def test_hash_aggregate_chunked_overflow_is_counted():
    """A partial cap below a chunk's distinct-group count must COUNT
    the dropped partials (never silently truncate the group set)."""
    from hash_join_codes_knl_tpu.ops.aggregate import (
        hash_aggregate_chunked,
    )

    rng = np.random.default_rng(29)
    keys = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    vals = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    # 2048 distinct keys over 4 chunks, 64 partial slots per chunk
    _, _, _, _, ovf = hash_aggregate_chunked(
        jnp.asarray(keys), jnp.asarray(vals), chunks=4, partial_cap=256
    )
    assert int(ovf) == 2048 - 256


def test_reduce_runs_helper_properties():
    """The shared run-reduction helper directly: multiple value
    columns, all-null rows, and C>1 vs C==1 path equivalence."""
    from hash_join_codes_knl_tpu.ops.aggregate import (
        _null_last_sort,
        _reduce_runs,
    )

    rng = np.random.default_rng(31)
    C, m = 4, 512
    keys = rng.integers(1, 40, (C, m)).astype(np.uint32)
    keys[2] = 0  # an all-null row
    va = rng.integers(0, 2**32, (C, m), dtype=np.uint32)
    vb = rng.integers(0, 2**32, (C, m), dtype=np.uint32)
    k_s, a_s, b_s = _null_last_sort(jnp.asarray(keys),
                                    (jnp.asarray(va), jnp.asarray(vb)),
                                    dimension=1)
    gk, (sa, sb), cnts, g = _reduce_runs(k_s, (a_s, b_s))
    gk, sa, sb, cnts, g = (np.asarray(x) for x in (gk, sa, sb, cnts, g))
    assert g[2] == 0 and not gk[2].any()
    for r in range(C):
        kr = keys[r]
        live = kr != 0
        uniq = np.unique(kr[live])
        assert g[r] == len(uniq)
        assert np.array_equal(np.sort(gk[r][: g[r]]), uniq)
        for j, key in enumerate(gk[r][: g[r]]):
            mm = kr == key
            assert sa[r, j] == np.uint32(va[r][mm].sum())
            assert sb[r, j] == np.uint32(vb[r][mm].sum())
            assert cnts[r, j] == mm.sum()
        # pad hygiene
        assert not gk[r][g[r]:].any()
        assert not sa[r][g[r]:].any()
    # C==1 internal 1-D sort path agrees with the batched path row-wise
    for r in range(C):
        k1, a1, b1 = _null_last_sort(jnp.asarray(keys[r]),
                                     (jnp.asarray(va[r]),
                                      jnp.asarray(vb[r])))
        gk1, (sa1, sb1), c1, g1 = _reduce_runs(
            k1.reshape(1, m), (a1.reshape(1, m), b1.reshape(1, m))
        )
        assert int(g1[0]) == g[r]
        np.testing.assert_array_equal(np.asarray(gk1)[0, : g[r]],
                                      gk[r][: g[r]])
        np.testing.assert_array_equal(np.asarray(sa1)[0, : g[r]],
                                      sa[r][: g[r]])
        np.testing.assert_array_equal(np.asarray(c1)[0, : g[r]],
                                      cnts[r][: g[r]])


def test_aggregate_join_result_expanded_mn():
    """Device-side M:N aggregate (r5): the streamed expand->partial
    pipeline must match a numpy groupby over the oracle's expanded
    rows -- across multiple blocks, and through the measured budget
    re-plan (a partial_budget below the true per-block group count)."""
    import collections

    from hash_join_codes_knl_tpu.engine.phj import join
    from hash_join_codes_knl_tpu.ops.aggregate import (
        aggregate_join_result_expanded,
    )

    rng = np.random.default_rng(61)
    base = np.unique(rng.integers(1, 2**32, 900, dtype=np.uint32))[:512]
    reps = rng.integers(1, 7, 512)  # duplicate build keys -> M:N
    ik = np.repeat(base, reps).astype(np.uint32)
    iv = rng.integers(0, 2**32, len(ik), dtype=np.uint32)
    ok = base[rng.integers(0, 512, 4096)].astype(np.uint32)
    ov = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    res, _ = join(ik, iv, ok, ov)
    assert int(np.asarray(res.match_cnts).max()) > 1  # genuinely M:N

    ek, _ev, et = join_oracle(ik, iv, ok, ov)
    want_sum = collections.defaultdict(int)
    want_cnt = collections.defaultdict(int)
    for k, t in zip(ek.tolist(), et.tolist()):
        want_sum[k] = (want_sum[k] + t) % (1 << 32)
        want_cnt[k] += 1

    def check(ng, gk, gs, gc):
        g = int(ng)
        gk, gs, gc = np.asarray(gk), np.asarray(gs), np.asarray(gc)
        assert g == len(want_sum)
        m = gk != 0
        assert dict(zip(gk[m].tolist(), gs[m].tolist())) == dict(want_sum)
        assert dict(zip(gk[m].tolist(), gc[m].tolist())) == dict(want_cnt)
        # pad hygiene
        assert not gk[g:].any() and not gs[g:].any()

    # single block, ample budget
    check(*aggregate_join_result_expanded(res, ik, iv))
    # many blocks: expansion streamed through 512-row device blocks
    check(*aggregate_join_result_expanded(res, ik, iv, block_rows=512))
    # budget overflow: 128 partial slots < per-block group count ->
    # measured re-plan (second pass at the observed max, exact)
    check(*aggregate_join_result_expanded(res, ik, iv, block_rows=2048,
                                          partial_budget=128))


def test_aggregate_join_result_expanded_matches_aligned_on_1to1():
    """On a unique-build workload the streamed M:N aggregate and the
    aligned fast path must produce identical groups."""
    from hash_join_codes_knl_tpu.engine.phj import join
    from hash_join_codes_knl_tpu.ops.aggregate import (
        aggregate_join_result,
        aggregate_join_result_expanded,
    )
    from hash_join_codes_knl_tpu.relgen.generate import generate

    inner, outer, _ = generate(seed=43, inner_tuples=512,
                               outer_tuples=8192, mode="uniform",
                               prefer_native=False)
    res, _ = join(inner.keys, inner.vals, outer.keys, outer.vals)
    n0, k0, s0, c0 = aggregate_join_result(res)
    n1, k1, s1, c1 = aggregate_join_result_expanded(
        res, inner.keys, inner.vals, block_rows=1024
    )
    g = int(n0)
    assert int(n1) == g
    np.testing.assert_array_equal(np.asarray(k1)[:g], np.asarray(k0)[:g])
    np.testing.assert_array_equal(np.asarray(s1)[:g], np.asarray(s0)[:g])
    np.testing.assert_array_equal(np.asarray(c1)[:g], np.asarray(c0)[:g])


def test_hash_aggregate_auto_measured_replan():
    """The auto wrapper must recover from a partial-budget overflow by
    RE-PLANNING the chunked engine from the measured dropped count (one
    guaranteed-clean retry), not by abandoning two-level for the 2x
    single-level cliff; only groups ~ rows (re-planned partials >= the
    input) may fall back to single-level."""
    import hash_join_codes_knl_tpu.ops.aggregate as agg

    rng = np.random.default_rng(67)
    # 512 distinct groups over 20000 rows, 4 chunks: cap 256 (64/chunk)
    # overflows; re-planned cap 4*(64+dropped) << n stays two-level
    pool = np.unique(rng.integers(1, 2**32, 800, dtype=np.uint32))[:512]
    keys = pool[rng.integers(0, 512, 20000)].astype(np.uint32)
    vals = rng.integers(0, 2**32, 20000, dtype=np.uint32)
    n0, k0, s0, c0 = agg.hash_aggregate(jnp.asarray(keys),
                                        jnp.asarray(vals))
    g = int(n0)

    calls = {"single": 0, "chunked": 0}
    real_single, real_chunked = agg.hash_aggregate, agg.hash_aggregate_chunked

    def spy_single(*a, **kw):
        calls["single"] += 1
        return real_single(*a, **kw)

    def spy_chunked(*a, **kw):
        calls["chunked"] += 1
        return real_chunked(*a, **kw)

    agg.hash_aggregate, agg.hash_aggregate_chunked = spy_single, spy_chunked
    try:
        ra = agg.hash_aggregate_auto(keys, vals, chunks=4, partial_cap=256)
    finally:
        agg.hash_aggregate, agg.hash_aggregate_chunked = (
            real_single, real_chunked
        )
    assert calls == {"single": 0, "chunked": 2}, calls
    assert int(ra[0]) == g
    np.testing.assert_array_equal(np.asarray(ra[1])[:g], np.asarray(k0)[:g])
    np.testing.assert_array_equal(np.asarray(ra[2])[:g], np.asarray(s0)[:g])
    np.testing.assert_array_equal(np.asarray(ra[3])[:g], np.asarray(c0)[:g])

    # groups ~ rows: nearly all-distinct keys -- the re-planned partial
    # size reaches the input and single-level is the right engine
    keys2 = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    vals2 = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    n2, k2, s2, c2 = agg.hash_aggregate(jnp.asarray(keys2),
                                        jnp.asarray(vals2))
    calls = {"single": 0, "chunked": 0}
    agg.hash_aggregate, agg.hash_aggregate_chunked = spy_single, spy_chunked
    try:
        rb = agg.hash_aggregate_auto(keys2, vals2, chunks=4,
                                     partial_cap=256)
    finally:
        agg.hash_aggregate, agg.hash_aggregate_chunked = (
            real_single, real_chunked
        )
    assert calls["single"] == 1, calls
    assert int(rb[0]) == int(n2)
    np.testing.assert_array_equal(np.asarray(rb[1])[:int(n2)],
                                  np.asarray(k2)[:int(n2)])
