"""Partition operator invariants: conservation, layout, dense-table packing.

These are the property tests the reference only had as commented-out asserts
(partition monotonicity and checksums, phj.cpp:1034-1041, 1214-1230)."""

import numpy as np
import jax.numpy as jnp

from hash_join_codes_knl_tpu.ops.partition import (
    build_dense_table_jnp,
    compute_pids,
    partition_padded_jnp,
    tile_pids,
)
from hash_join_codes_knl_tpu.utils.hashing import np_range_hash
from hash_join_codes_knl_tpu.engine.config import DEFAULT_FACTOR


def _data(n, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(1, 2**32, n, dtype=np.uint32)
    vals = rng.integers(0, 2**32, n, dtype=np.uint32)
    return keys, vals


def test_compute_pids_matches_range_hash():
    keys, _ = _data(4096, 0)
    got = np.asarray(compute_pids(jnp.asarray(keys), DEFAULT_FACTOR, 7))
    want = np_range_hash(keys, DEFAULT_FACTOR, 128)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_partition_padded_layout():
    n, P, Q = 10_000, 32, 256
    keys, vals = _data(n, 1)
    pids = compute_pids(jnp.asarray(keys), DEFAULT_FACTOR, 5)
    pk, pv, offsets, counts = partition_padded_jnp(
        jnp.asarray(keys), jnp.asarray(vals), pids, P, Q
    )
    pk, pv = np.asarray(pk), np.asarray(pv)
    offsets, counts = np.asarray(offsets), np.asarray(counts)
    pids_np = np.asarray(pids)
    # conservation: multiset of (key, val) preserved
    assert counts.sum() == n
    got = sorted(zip(pk[pk != 0].tolist(), pv[pk != 0].tolist()))
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want
    # regions: correct contents, quantum alignment, padding
    for p in range(P):
        lo, hi = offsets[p], offsets[p + 1]
        assert (hi - lo) % Q == 0
        seg = pk[lo : lo + counts[p]]
        assert (np.asarray(compute_pids(jnp.asarray(seg), DEFAULT_FACTOR, 5)) == p).all()
        assert (pk[lo + counts[p] : hi] == 0).all()
        assert counts[p] == (pids_np == p).sum()
    # stability: keys of partition p appear in original order
    p0 = keys[pids_np == 3]
    np.testing.assert_array_equal(pk[offsets[3] : offsets[3] + counts[3]], p0)


def test_dense_table_packing_and_overflow():
    n, P, S = 5000, 64, 256
    keys, vals = _data(n, 2)
    pids = compute_pids(jnp.asarray(keys), DEFAULT_FACTOR, 6)
    tk, tv, counts = build_dense_table_jnp(
        jnp.asarray(keys), jnp.asarray(vals), pids, P, S
    )
    tk, tv, counts = np.asarray(tk), np.asarray(tv), np.asarray(counts)
    pids_np = np.asarray(pids)
    for p in range(P):
        c = min(counts[p], S)
        np.testing.assert_array_equal(tk[p, :c], keys[pids_np == p][:c])
        np.testing.assert_array_equal(tv[p, :c], vals[pids_np == p][:c])
        assert (tk[p, c:] == 0).all()
    # overflow: tiny table drops but reports true count
    tk2, _, counts2 = build_dense_table_jnp(
        jnp.asarray(keys), jnp.asarray(vals), pids, P, 4
    )
    assert np.asarray(counts2).sum() == n
    assert (np.asarray(tk2) != 0).sum() == np.minimum(np.asarray(counts2), 4).sum()


def test_tile_pids_unique_ownership():
    n, P, Q = 8192, 16, 128
    keys, vals = _data(n, 3)
    pids = compute_pids(jnp.asarray(keys), DEFAULT_FACTOR, 4)
    pk, _, offsets, counts = partition_padded_jnp(
        jnp.asarray(keys), jnp.asarray(vals), pids, P, Q
    )
    n_tiles = len(pk) // Q
    tp = np.asarray(tile_pids(offsets, n_tiles, Q))
    offsets = np.asarray(offsets)
    for t in range(n_tiles):
        start = t * Q
        if start < offsets[-1]:
            p = tp[t]
            assert offsets[p] <= start and start + Q <= offsets[p + 1]


def test_sort_variants_match_reference_impls():
    from hash_join_codes_knl_tpu.ops.partition import (
        build_dense_table_sort_jnp,
        partition_padded_sort_jnp,
    )

    n, P, Q, S = 20_000, 64, 128, 512
    keys, vals = _data(n, 9)
    pids = np.asarray(compute_pids(jnp.asarray(keys), DEFAULT_FACTOR, 6)).copy()
    # inject invalid pids (drop semantics must agree)
    pids[::97] = 64
    pids = jnp.asarray(pids)
    a = partition_padded_jnp(jnp.asarray(keys), jnp.asarray(vals), pids, P, Q)
    b = partition_padded_sort_jnp(jnp.asarray(keys), jnp.asarray(vals), pids, P, Q)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = build_dense_table_jnp(jnp.asarray(keys), jnp.asarray(vals), pids, P, S)
    d = build_dense_table_sort_jnp(jnp.asarray(keys), jnp.asarray(vals), pids, P, S)
    for x, y in zip(c, d):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
