"""Multi-column join layer vs a pandas-free host oracle."""

import numpy as np

from hash_join_codes_knl_tpu.engine.columns import join_columns


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
