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


def test_join_columns_u64_reserved_column_name_rejected():
    """'__k64' is the injected verification column: a user column of the
    same name would silently replace the exactness filter's keys."""
    import pytest

    ik = np.array([1, 2, 3], dtype=np.uint64)
    ok = np.array([2, 3, 4], dtype=np.uint64)
    with pytest.raises(ValueError, match="__k64"):
        join_columns_u64(ik, {"__k64": np.arange(3)}, ok, {"w": np.arange(3)})
    with pytest.raises(ValueError, match="__k64"):
        join_columns_u64(ik, {"v": np.arange(3)}, ok, {"__k64": np.arange(3)})
