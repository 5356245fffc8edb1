"""Multi-column join layer vs a pandas-free host oracle."""

import numpy as np

from hash_join_codes_knl_tpu.engine.columns import (
    fold_key64,
    join_columns,
    join_columns_u64,
)


def _oracle_rows(ik, ok):
    """(outer_idx, inner_idx) pairs of the equi-join, as a multiset."""
    import collections

    by_key = collections.defaultdict(list)
    for i, k in enumerate(ik.tolist()):
        by_key[k].append(i)
    out = []
    for o, k in enumerate(ok.tolist()):
        for i in by_key.get(k, ()):
            out.append((o, i))
    return collections.Counter(out)


def test_join_columns_unique_build():
    rng = np.random.default_rng(11)
    ik = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    ok = np.concatenate(
        [ik[rng.integers(0, 2048, 6000)],
         rng.integers(1, 2**32, 1000, dtype=np.uint32)]
    ).astype(np.uint32)
    inner_cols = {
        "price": rng.random(2048) * 100,          # float64
        "flag": rng.integers(0, 2, 2048, dtype=np.int8),
        "name": ik.astype(np.uint64) * 3,         # uint64
    }
    outer_cols = {
        "qty": rng.integers(1, 9, len(ok), dtype=np.int16),
        "flag": rng.integers(0, 2, len(ok), dtype=np.int8),  # name clash
    }
    out, _ = join_columns(ik, inner_cols, ok, outer_cols)
    want = _oracle_rows(ik, ok)
    n = sum(want.values())
    assert len(out["qty"]) == n
    assert set(out) == {"qty", "outer_flag", "inner_flag", "price", "name"}
    # row-level check through an invertible reconstruction: rebuild the
    # (outer_idx, inner_idx) pairs from the materialized columns
    import collections

    # the name column encodes the inner key *3; check multisets of
    # (key-derived, column) tuples
    got = collections.Counter()
    for j in range(n):
        got[(int(out["name"][j]), int(out["qty"][j]))] += 1
    want_cols = collections.Counter()
    for (o, i), c in want.items():
        want_cols[(int(ik[i]) * 3, int(outer_cols["qty"][o]))] += c
    assert got == want_cols


def test_join_columns_mn_duplicates():
    rng = np.random.default_rng(13)
    base = np.unique(rng.integers(1, 2**32, 500, dtype=np.uint32))[:256]
    reps = rng.integers(1, 4, 256)
    ik = np.repeat(base, reps).astype(np.uint32)
    ok = base[rng.integers(0, 256, 3000)].astype(np.uint32)
    inner_cols = {"v": np.arange(len(ik), dtype=np.int64) * 7}
    outer_cols = {"w": np.arange(len(ok), dtype=np.float32)}
    out, _ = join_columns(ik, inner_cols, ok, outer_cols)
    want = _oracle_rows(ik, ok)
    assert len(out["v"]) == sum(want.values())
    import collections

    got = collections.Counter(
        (int(v), float(w)) for v, w in zip(out["v"], out["w"])
    )
    want_cols = collections.Counter()
    for (o, i), c in want.items():
        want_cols[(i * 7, float(o))] += c
    assert got == want_cols


def test_fold_key64_nonzero_and_mixing():
    rng = np.random.default_rng(17)
    ks = rng.integers(0, 2**63, 200_000, dtype=np.uint64) * 2 + rng.integers(
        0, 2, 200_000, dtype=np.uint64
    )
    h = fold_key64(ks)
    assert h.dtype == np.uint32
    assert (h != 0).all()  # engine null key never produced
    assert int(fold_key64(np.zeros(1, np.uint64))[0]) != 0
    # every-bit sensitivity: flipping any single bit changes the fold
    # for a sample key (a weak but cheap avalanche check)
    k = np.uint64(0xDEADBEEFCAFEF00D)
    base = int(fold_key64(np.array([k]))[0])
    flips = fold_key64(k ^ (np.uint64(1) << np.arange(64, dtype=np.uint64)))
    assert (flips != base).all()


def test_join_columns_u64():
    """u64-key join: exact against the host oracle on keys spread over
    the full 64-bit domain (where u32 truncation would collide)."""
    rng = np.random.default_rng(19)
    ik = np.unique(rng.integers(1, 2**64, 3000, dtype=np.uint64))[:2048]
    # adversarial pairs for TRUNCATION (same low 32 bits) -- the fold
    # must still separate them
    ik[0], ik[1] = (1 << 40) | 12345, (7 << 40) | 12345
    ok = np.concatenate(
        [ik[rng.integers(0, 2048, 6000)],
         rng.integers(1, 2**64, 1000, dtype=np.uint64)]
    ).astype(np.uint64)
    inner_cols = {"v": np.arange(2048, dtype=np.int64) * 7}
    outer_cols = {"w": np.arange(len(ok), dtype=np.int32)}
    out, _ = join_columns_u64(ik, inner_cols, ok, outer_cols)
    want = _oracle_rows(ik, ok)
    assert len(out["v"]) == sum(want.values())
    import collections

    got = collections.Counter(
        (int(v), int(w)) for v, w in zip(out["v"], out["w"])
    )
    want_cols = collections.Counter()
    for (o, i), c in want.items():
        want_cols[(i * 7, o)] += c
    assert got == want_cols
    # internal key columns must not leak into the output
    assert set(out) == {"v", "w"}


def test_join_columns_u64_fold_collisions_filtered():
    """Two DIFFERENT u64 keys that fold to the same u32 engine key must
    not join: the host-side equality pass removes the candidates.
    Collisions are found by birthday search over the real fold."""
    rng = np.random.default_rng(23)
    sample = rng.integers(1, 2**64, 400_000, dtype=np.uint64)
    h = fold_key64(sample)
    vals, counts = np.unique(h, return_counts=True)
    dup_vals = vals[counts >= 2]
    if len(dup_vals) == 0:  # astronomically unlikely at 400K draws
        import pytest

        pytest.skip("no fold collision in the sample")
    # take one colliding pair (a, b): a on the build side, b probing
    hv = dup_vals[0]
    pair = sample[h == hv][:2]
    a, b = np.uint64(pair[0]), np.uint64(pair[1])
    assert a != b and fold_key64(pair[:1])[0] == fold_key64(pair[1:2])[0]
    ik = np.array([a, 111, 222], np.uint64)
    ok = np.array([b, 111, 333, b, 111], np.uint64)
    out, _ = join_columns_u64(
        ik, {"iv": np.array([10, 20, 30], np.int32)},
        ok, {"ov": np.arange(5, dtype=np.int32)},
    )
    # only the two 111-rows join (outer idx 1 and 4); the folded-equal
    # (a, b) pairs are filtered by the exact u64 check
    assert sorted(out["iv"].tolist()) == [20, 20]
    assert sorted(out["ov"].tolist()) == [1, 4]


def test_join_columns_u64_no_reserved_names():
    """The u64 verification runs on row INDICES (no injected columns),
    so any user column name -- including the once-reserved '__k64' --
    passes through untouched."""
    ik = np.array([1, 2, 3], dtype=np.uint64)
    ok = np.array([2, 3, 4], dtype=np.uint64)
    out, _ = join_columns_u64(
        ik, {"__k64": np.array([10, 20, 30])},
        ok, {"w": np.array([7, 8, 9])},
    )
    got = sorted(zip(out["__k64"].tolist(), out["w"].tolist()))
    assert got == [(20, 7), (30, 8)]


def _mode_oracle(ik, ok, how):
    """(outer_idx, inner_idx) multiset for any join mode; inner_idx is
    None on anti rows and on semi rows (outer columns only)."""
    import collections

    pairs = _oracle_rows(ik, ok)
    matched = {o for (o, _) in pairs}
    if how == "inner":
        return pairs
    if how == "semi":
        return collections.Counter((o, None) for o in matched)
    if how == "anti":
        return collections.Counter(
            (o, None) for o in range(len(ok)) if o not in matched
        )
    # left: inner pairs + one null row per unmatched outer row
    left = collections.Counter(pairs)
    for o in range(len(ok)):
        if o not in matched:
            left[(o, None)] += 1
    return left


def _mode_workload(seed=31):
    rng = np.random.default_rng(seed)
    ik = rng.integers(1, 300, 900, dtype=np.uint32)  # heavy duplication
    ok = np.concatenate(
        [ik[rng.integers(0, 900, 2000)],
         rng.integers(1, 2**32, 700, dtype=np.uint32)]
    ).astype(np.uint32)
    inner_cols = {"iv": np.arange(900, dtype=np.int64) + 1}
    outer_cols = {"ov": np.arange(len(ok), dtype=np.int64) + 1}
    return ik, inner_cols, ok, outer_cols


def _check_mode(out, ik, ok, inner_cols, outer_cols, how):
    import collections

    want = _mode_oracle(ik, ok, how)
    got = collections.Counter()
    if how in ("semi", "anti"):
        assert set(out) == {"ov"}
        for ov in out["ov"].tolist():
            got[(ov - 1, None)] += 1
    else:
        for ov, iv in zip(out["ov"].tolist(), out["iv"].tolist()):
            got[(ov - 1, iv - 1 if iv else None)] += 1
    assert got == want, how


def test_join_columns_modes():
    """left/semi/anti against the host oracle on a duplicate-heavy M:N
    workload (left_fill=0 marks null inner rows; iv column is 1-based
    so 0 is unambiguous)."""
    ik, inner_cols, ok, outer_cols = _mode_workload()
    for how in ("inner", "left", "semi", "anti"):
        out, _ = join_columns(ik, inner_cols, ok, outer_cols, how=how)
        _check_mode(out, ik, ok, inner_cols, outer_cols, how)


def test_join_columns_key_zero_rows_survive():
    """Key 0 is the ENGINE's reserved null; the columns layer must not
    let that leak into its row contract: a real key-0 outer row shows
    up in left/anti output and matches a key-0 build row (regression:
    such rows were silently dropped as engine padding).  join_columns
    detects key 0 and routes through the fold+verify path, which remaps
    0 off the null slot."""
    ik = np.array([0, 5, 9], np.uint32)
    inner_cols = {"iv": np.arange(3, dtype=np.int64) + 1}
    ok = np.array([0, 5, 7, 0], np.uint32)
    outer_cols = {"ov": np.arange(4, dtype=np.int64) + 1}
    for how in ("inner", "left", "semi", "anti"):
        out, _ = join_columns(ik, inner_cols, ok, outer_cols, how=how)
        _check_mode(out, ik, ok, inner_cols, outer_cols, how)


def test_join_columns_u64_modes_exact_under_fold_collisions():
    """semi/anti on u64 keys must classify by TRUE key equality: a fold
    collision (two different u64 keys, same folded u32) must not turn
    an anti row into a semi row.  Collision pairs found by birthday
    search over the real fold."""
    rng = np.random.default_rng(41)
    sample = rng.integers(1, 2**64, 400_000, dtype=np.uint64)
    h = fold_key64(sample)
    vals, counts = np.unique(h, return_counts=True)
    dup_vals = vals[counts >= 2]
    assert len(dup_vals) >= 4, "need fold collisions for this test"
    a, b = [], []
    for dv in dup_vals[:8]:
        pair = np.unique(sample[h == dv])[:2]
        if len(pair) == 2:
            a.append(pair[0])
            b.append(pair[1])
    a, b = np.array(a, np.uint64), np.array(b, np.uint64)
    # build side holds the a's; probe side holds their fold-colliding
    # b twins (must all be ANTI) plus the a's themselves (all SEMI)
    ik = a
    ok = np.concatenate([b, a])
    inner_cols = {"iv": np.arange(len(ik), dtype=np.int64) + 1}
    outer_cols = {"ov": np.arange(len(ok), dtype=np.int64) + 1}
    semi, _ = join_columns_u64(ik, inner_cols, ok, outer_cols, how="semi")
    anti, _ = join_columns_u64(ik, inner_cols, ok, outer_cols, how="anti")
    assert sorted(semi["ov"].tolist()) == list(
        range(len(b) + 1, len(ok) + 1)
    )
    assert sorted(anti["ov"].tolist()) == list(range(1, len(b) + 1))


def test_join_columns_multi_composite_keys():
    """Composite (two-column) keys vs a host oracle built on the exact
    tuples; all four modes.  Key tuples share many column values but
    few full tuples, so a combine that ignored either column would
    fail loudly."""
    from hash_join_codes_knl_tpu.engine.columns import join_columns_multi

    rng = np.random.default_rng(53)
    ik1 = rng.integers(0, 40, 600, dtype=np.int32)
    ik2 = rng.integers(-20, 20, 600, dtype=np.int64)  # signed column
    sel = rng.integers(0, 600, 1500)
    ok1 = ik1[sel].copy()
    ok2 = ik2[sel].copy()
    # displace a third of the probes in ONE column only: same ok1,
    # different ok2 -> must not join
    third = rng.random(1500) < 0.33
    ok2[third] += 1000
    # tuple-encode for the oracle
    ik = (ik1.astype(np.int64) * 100000 + ik2).astype(np.uint64)
    ok = (ok1.astype(np.int64) * 100000 + ok2).astype(np.uint64)
    inner_cols = {"iv": np.arange(600, dtype=np.int64) + 1}
    outer_cols = {"ov": np.arange(1500, dtype=np.int64) + 1}
    for how in ("inner", "left", "semi", "anti"):
        out, _ = join_columns_multi(
            (ik1, ik2), inner_cols, (ok1, ok2), outer_cols, how=how
        )
        _check_mode(out, ik, ok, inner_cols, outer_cols, how)


def test_join_columns_multi_rejects_mismatched_key_dtypes():
    import pytest

    from hash_join_codes_knl_tpu.engine.columns import join_columns_multi

    ik1 = np.array([1, 2], dtype=np.int64)
    ok1 = np.array([1, 2], dtype=np.uint64)
    with pytest.raises(TypeError, match="dtype mismatch"):
        join_columns_multi((ik1,), {"iv": ik1}, (ok1,), {"ov": ok1})
    with pytest.raises(ValueError, match="count mismatch"):
        join_columns_multi((ik1, ik1), {"iv": ik1},
                           (ik1,), {"ov": ik1})
