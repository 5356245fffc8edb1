"""ops/chunk_layout.py: the explicit flat->(C, L) block-DMA relayout.

Semantically a pure reshape (+ optional key scramble); the kernel
exists because XLA lowers the 1-D -> 2-D retiling as a serial while
loop at ~68 GB/s (r5 trace, artifacts/trace_r5_fused) while the block
DMAs run at stream bandwidth.  Exactness is everything: a wrong block
mapping silently permutes probe rows ACROSS chunks, which the chunked
sort would then hide (each chunk still comes out sorted) -- so the
oracle comparison is elementwise, not a multiset digest.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hash_join_codes_knl_tpu.ops.chunk_layout import (
    _pick_block,
    flat_to_rows,
    flat_to_rows_jnp,
)


@pytest.mark.parametrize("C,L,factor", [
    (64, 3072 * 8, 1),
    (64, 3072 * 5, 0x9E3779B1),   # L with only small 1024-divisors
    (16, 2048 * 3, 3),
    (8, 1024, 0xDEADBEEF | 1),
])
def test_flat_to_rows_matches_reshape(C, L, factor):
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.integers(0, 2**32, C * L, dtype=np.uint32))
    got = flat_to_rows(x, C, factor, interpret=True)
    want = flat_to_rows_jnp(x, C, factor)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flat_to_rows_fallback_no_aligned_block():
    """A row length with no 1024-multiple divisor must fall back to
    the XLA reshape (correct everywhere, just slower on TPU)."""
    C, L = 8, 1024 + 128  # 1152 = 2^7 * 3^2: no 1024-multiple divisor
    assert _pick_block(L) == 0
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.integers(0, 2**32, C * L, dtype=np.uint32))
    got = flat_to_rows(x, C, 7, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(flat_to_rows_jnp(x, C, 7))
    )


def test_pick_block_is_tiling_aligned_divisor():
    for L in (4_002_816, 4_005_888, 1 << 20, 3 * 1024, 1024):
        B = _pick_block(L)
        assert B and L % B == 0 and B % 1024 == 0 and B <= (1 << 16)


def test_merge_sort_probe_kernel_path_equivalence(monkeypatch):
    """The production sort path with the kernel enabled (interpret on
    CPU) must produce bit-identical sorted columns to the XLA-reshape
    path -- the integration contract behind the r5 headline change."""
    import functools

    import hash_join_codes_knl_tpu.engine.phj as phj
    import hash_join_codes_knl_tpu.ops.chunk_layout as cl

    rng = np.random.default_rng(23)
    C, L = 16, 1024 * 3
    n = C * L - 500  # exercises the pad tail
    hk = jnp.asarray(rng.integers(1, 2**32, n, dtype=np.uint32))
    v = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    want = phj._merge_sort_probe(hk, v, C * L, C)
    monkeypatch.setattr(phj, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        cl, "flat_to_rows",
        functools.partial(cl.flat_to_rows, interpret=True),
    )
    got = phj._merge_sort_probe(hk, v, C * L, C)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
