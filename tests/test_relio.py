"""Native relation IO (relio.cpp) vs the numpy path."""

import numpy as np
import pytest

from hash_join_codes_knl_tpu import native
from hash_join_codes_knl_tpu.relation import (
    Relation,
    load_relation,
    save_relation,
)

needs_native = pytest.mark.skipif(
    not native.relio_available(), reason="no g++ / native relio"
)


def _rel(n, seed=0):
    rng = np.random.default_rng(seed)
    return Relation(
        rng.integers(1, 2**32, n, dtype=np.uint32),
        rng.integers(0, 2**32, n, dtype=np.uint32),
    )


@needs_native
def test_native_roundtrip_matches_numpy_files(tmp_path):
    rel = _rel(100_000)
    save_relation(rel, "inner", str(tmp_path), prefer_native=True)
    back_np = load_relation("inner", 100_000, str(tmp_path),
                            prefer_native=False)
    back_nat = load_relation("inner", 100_000, str(tmp_path),
                             prefer_native=True)
    np.testing.assert_array_equal(back_np.keys, rel.keys)
    np.testing.assert_array_equal(back_nat.keys, rel.keys)
    np.testing.assert_array_equal(back_nat.vals, rel.vals)


@needs_native
def test_numpy_written_native_read(tmp_path):
    rel = _rel(4096, seed=3)
    save_relation(rel, "outer", str(tmp_path), prefer_native=False)
    back = load_relation("outer", 4096, str(tmp_path), prefer_native=True)
    np.testing.assert_array_equal(back.keys, rel.keys)
    np.testing.assert_array_equal(back.vals, rel.vals)


@needs_native
def test_native_checksum_matches_numpy():
    rel = _rel(1_000_000, seed=7)
    assert native.checksum_u32(rel.keys) == int(
        np.sum(rel.keys.astype(np.uint64), dtype=np.uint64)
    )


@needs_native
def test_truncated_file_detected(tmp_path):
    rel = _rel(1000, seed=9)
    save_relation(rel, "inner", str(tmp_path))
    with pytest.raises((ValueError, FileNotFoundError)):
        load_relation("inner", 2000, str(tmp_path))
