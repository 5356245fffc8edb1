"""Chunk-layout change as explicit block DMAs.

The merge engine's chunked probe sort needs the flat (cap,) probe
columns as (C, cap/C) row-major 2-D arrays.  `x.reshape(C, -1)` is
semantically free but PHYSICALLY a retiling on TPU (1-D T(1024) ->
2-D T(8,128)), and XLA lowers it as a serial 64-iteration while loop
of dynamic-slice + dynamic-update-slice running at ~68 GB/s -- 63 ms
of the fused 16Mx256M headline for what is stream-bandwidth work
(~6 ms).  Measured in the r5 profiler trace
(artifacts/trace_r5_fused: while.2/while.3 31.5 ms each, one per
probe column).

This kernel does the same move as a Pallas grid of independent block
copies: chunk c's row IS the flat slice [c*L, (c+1)*L), so each
(1, B) output block maps to one contiguous flat input block -- pure
DMA, trivially parallel, no serial carry.  The key scramble
(hk = key * factor, engine convention) rides along as a fused
multiply, saving the separate elementwise pass too.

Reference behavior: this is pure layout plumbing for K7's partition
scatter analog (the batched chunk sort); no reference counterpart --
KNL's flat arrays have no tiled layouts to convert between.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_ROWS_PER_BLOCK = 8  # Mosaic floor: output blocks must tile (8, 128)


def _pick_block(L: int, budget_elems: int = 1 << 16) -> int:
    """Largest divisor of L that is a multiple of the flat u32 HBM
    tile (Mosaic: rank-1 operands carry T(1024) tiling and block
    shapes must divide it evenly) at or under the per-ref block budget
    (u32 elems; 64K elems = 256 KB; the kernel holds 2*_ROWS_PER_BLOCK
    refs of this size).  Returns 0 if L has no 1024-multiple divisor
    in budget -- the caller falls back to the XLA reshape."""
    for b in range(budget_elems - budget_elems % 1024, 0, -1024):
        if L % b == 0:
            return b
    return 0


def _copy_kernel(*refs, factor: int):
    x_refs, o_ref = refs[:-1], refs[-1]
    for k, x_ref in enumerate(x_refs):
        v = x_ref[...]
        if factor != 1:
            v = v * jnp.uint32(factor)
        o_ref[k, :] = v


@functools.partial(jax.jit, static_argnames=("chunks", "factor",
                                             "interpret"))
def flat_to_rows(x: jnp.ndarray, chunks: int, factor: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """(cap,) u32 -> (chunks, cap // chunks), optionally scrambling
    every element by `factor` (u32 wraparound multiply) on the way.
    cap must divide evenly by chunks, and chunks by 8 (the Mosaic
    (8, 128) output-tile floor: a (1, B) output block is a partial-
    tile write Mosaic rejects, so each grid step fills 8 whole chunk
    rows from 8 block-aligned flat slices -- the same array passed as
    8 input refs, one per row, because the rows are L apart in flat
    order and a single contiguous input block cannot cover them)."""
    cap = x.shape[0]
    assert cap % chunks == 0, (cap, chunks)
    assert chunks % _ROWS_PER_BLOCK == 0, chunks
    L = cap // chunks
    B = _pick_block(L)
    if B == 0:
        # no lane-aligned block divides this row length: the XLA
        # reshape (slow but correct) is the fallback
        return flat_to_rows_jnp(x, chunks, factor)
    m = L // B
    R = _ROWS_PER_BLOCK

    def in_spec(k):
        return pl.BlockSpec((B,), lambda c, b, k=k: (c * R + k) * m + b)

    return pl.pallas_call(
        functools.partial(_copy_kernel, factor=factor),
        grid=(chunks // R, m),
        in_specs=[in_spec(k) for k in range(R)],
        out_specs=pl.BlockSpec((R, B), lambda c, b: (c, b)),
        out_shape=jax.ShapeDtypeStruct((chunks, L), jnp.uint32),
        interpret=interpret,
    )(*([x] * R))


def flat_to_rows_jnp(x: jnp.ndarray, chunks: int,
                     factor: int = 1) -> jnp.ndarray:
    """jnp oracle: the plain reshape (plus scramble)."""
    if factor != 1:
        x = x * jnp.uint32(factor)
    return x.reshape(chunks, -1)
