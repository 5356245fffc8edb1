"""Hash parity: device mulhi32/range_hash vs the uint64 host oracle."""

import numpy as np
import jax.numpy as jnp

from hash_join_codes_knl_tpu.utils.hashing import (
    hashed_key,
    mulhi32,
    np_hash_ratio,
    np_range_hash,
    radix_bits,
    range_hash,
)


def _rand_u32(n, seed):
    return np.random.default_rng(seed).integers(0, 2**32, size=n, dtype=np.uint32)


def test_mulhi32_matches_uint64():
    a = _rand_u32(5000, 0)
    b = _rand_u32(5000, 1)
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> np.uint64(32)).astype(
        np.uint32
    )
    got = np.asarray(mulhi32(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_mulhi32_edges():
    edge = np.array([0, 1, 0xFFFF, 0x10000, 0xFFFFFFFF, 0x80000000], dtype=np.uint32)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> np.uint64(32)).astype(
        np.uint32
    )
    got = np.asarray(mulhi32(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_range_hash_matches_host():
    keys = _rand_u32(10000, 2)
    for factor in (0x9E3779B1, 12345_6789 * 2 + 1):
        for nbins in (7, 100, 4096, 17_000_003):
            want = np_range_hash(keys, factor, nbins)
            got = np.asarray(range_hash(jnp.asarray(keys), factor, nbins))
            np.testing.assert_array_equal(got, want)
            assert got.max() < nbins


def test_radix_bits_consistent_with_range_hash():
    # For power-of-two fanout, top-bit extraction == range hash reduction.
    keys = _rand_u32(10000, 3)
    factor = 0x9E3779B1
    hk = hashed_key(jnp.asarray(keys), factor)
    np.testing.assert_array_equal(
        np.asarray(radix_bits(hk, 32, 6)), np_range_hash(keys, factor, 64)
    )
    # Two-pass 6+6 bits == one-pass 4096-way hash.
    two = (np.asarray(radix_bits(hk, 32, 6)).astype(np.uint32) << 6) | np.asarray(
        radix_bits(hk, 26, 6)
    )
    np.testing.assert_array_equal(two, np_range_hash(keys, factor, 4096))


def test_hash_ratio_halves():
    keys = _rand_u32(10000, 4)
    pid = np_hash_ratio(keys, 0x9E3779B1, 64, ratio=0.5)
    assert pid.max() < 64
    # ratio=0 -> everything in the DDR half (tier bin < cut=100 always).
    pid0 = np_hash_ratio(keys, 0x9E3779B1, 64, ratio=0.0)
    assert pid0.max() < 32
    # ratio=1 -> everything in the HBM half.
    pid1 = np_hash_ratio(keys, 0x9E3779B1, 64, ratio=1.0)
    assert pid1.min() >= 32
