"""Gather-select merge probe: wide-window sorted-sorted join (probe v3).

The dense merge probe (ops/merge_probe_pallas.py) sweeps every probe
against EVERY window slot -- compare work scales linearly with the
window, which is fine at the headline's 384-slot windows but dominates
at the wide windows of NPJ (tile span + parking displacement), skewed
re-planned windows, and chunk-sorted probe layouts.  This kernel makes
window size nearly free:

1. **select**: the window's 128-slot chunk boundaries (first element of
   each chunk = lane 0 of each VMEM row) are compared against each probe
   once -- `cs` = last chunk whose first element < probe, `ce` = last
   chunk whose first element <= probe.  One (128 x W) compare instead of
   a (128 x 128W) sweep.
2. **gather**: chunks cs and ce are fetched per probe with
   `take_along_axis` lane gathers over the transposed window (the same
   Mosaic dynamic-gather pattern as ops/radix_partition_pallas.py), and
   compared densely (128 slots each).
3. **run arithmetic**: in a sorted window, every chunk strictly between
   cs and ce is ENTIRELY equal to the probe key (it starts with the key
   and the next chunk also starts with it), so the exact M:N match count
   is  count(eq in cs) + 128*max(0, ce-cs-1) + (ce>cs)*count(eq in ce)
   -- no middle-chunk gathers, exact for ANY duplicate-run length.
4. **max val**: both relations are sorted with the VALUE as a secondary
   sort key (lax.sort num_keys=2 in engine/phj.py), so an equal-key
   run's maximum value sits at the run's END -- inside gathered chunk ce
   (or cs when the run ends there) -- and one masked max is exact.

Null convention as everywhere: key 0 slots are padding; a pad probe
matches nothing (forced), and pad window slots never equal a live probe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = -(2**31)


def _make_kernel(w_chunks: int, n_tiles: int):
    def kernel(wrow_hbm, probe_ref, bhk_hbm, bval_hbm,
               mval_ref, mcnt_ref, kbuf, vbuf, wbuf, sems, wsems):
        # window-row staging + double-buffered window DMAs: identical
        # choreography to the dense kernel (see merge_probe_pallas.py)
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        c = i // 128
        last_chunk = (n_tiles - 1) // 128

        @pl.when(jax.lax.rem(i, 128) == 0)
        def _():
            c1 = jnp.minimum(c + 1, last_chunk)
            d0 = pltpu.make_async_copy(
                wrow_hbm.at[c], wbuf.at[jax.lax.rem(c, 2)], wsems.at[0]
            )
            d1 = pltpu.make_async_copy(
                wrow_hbm.at[c1], wbuf.at[jax.lax.rem(c + 1, 2)], wsems.at[1]
            )
            d0.start()
            d1.start()
            d0.wait()
            d1.wait()

        def start(slot_idx, row):
            pltpu.make_async_copy(
                bhk_hbm.at[pl.ds(row, w_chunks), :],
                kbuf.at[slot_idx],
                sems.at[slot_idx, 0],
            ).start()
            pltpu.make_async_copy(
                bval_hbm.at[pl.ds(row, w_chunks), :],
                vbuf.at[slot_idx],
                sems.at[slot_idx, 1],
            ).start()

        row = wbuf[jax.lax.rem(c, 2), jax.lax.rem(i, 128)]

        @pl.when(i == 0)
        def _():
            start(0, row)

        @pl.when(i + 1 < n_tiles)
        def _():
            row_next = wbuf[
                jax.lax.rem((i + 1) // 128, 2), jax.lax.rem(i + 1, 128)
            ]
            start(1 - slot, row_next)

        pltpu.make_async_copy(
            bhk_hbm.at[pl.ds(row, w_chunks), :], kbuf.at[slot],
            sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            bval_hbm.at[pl.ds(row, w_chunks), :], vbuf.at[slot],
            sems.at[slot, 1],
        ).wait()

        bias = jnp.int32(_BIAS)
        # window transposed: slot s of chunk w lives at [s, w].  The lane
        # (chunk) axis is padded to 128: Mosaic's dynamic gather wants
        # index and operand shapes to match, and chunk indices are always
        # < w_chunks so the pad lanes are never read.
        wkT = jnp.transpose(kbuf[slot], (1, 0))  # (128, W)
        wvT = jnp.transpose(
            pltpu.bitcast(vbuf[slot], jnp.int32) ^ bias, (1, 0)
        )
        if w_chunks < 128:
            zpad = jnp.zeros((128, 128 - w_chunks), jnp.int32)
            wkT = jnp.concatenate(
                [wkT, pltpu.bitcast(zpad, jnp.uint32)], axis=1
            )
            wvT = jnp.concatenate([wvT, zpad], axis=1)
        # chunk boundaries = slot-0 row of the transposed window, biased
        # to signed so boundary compares and key compares share a domain
        bndT = pltpu.bitcast(wkT, jnp.int32) ^ bias  # (128, 128)
        bnd_col = bndT[0:1, :w_chunks]  # (1, W): first slot of each chunk
        r_rows = probe_ref.shape[1]

        def row_result(ok_u32):
            ok = pltpu.bitcast(ok_u32, jnp.int32) ^ bias  # (1, 128)
            # select: boundary-vs-probe compare matrices (W x 128)
            okb = jnp.broadcast_to(ok, (w_chunks, 128))
            bb = jnp.broadcast_to(
                jnp.transpose(bnd_col, (1, 0)), (w_chunks, 128)
            )
            cs = jnp.sum((bb < okb).astype(jnp.int32), axis=0,
                         keepdims=True) - 1  # (1,128)
            ce = jnp.sum((bb <= okb).astype(jnp.int32), axis=0,
                         keepdims=True) - 1
            # clamp BEFORE the run arithmetic: cs=-1 (run starts at the
            # window's first chunk) must alias chunk 0, not add a phantom
            # middle chunk / a double count of chunk 0
            csc = jnp.clip(cs, 0, w_chunks - 1)
            cec = jnp.clip(ce, 0, w_chunks - 1)
            middle = jnp.maximum(cec - csc - 1, 0)  # full chunks of the key
            # gather chunks cs and ce: out[s, p] = wkT[s, c[p]]
            cc_s = jnp.broadcast_to(csc, (128, 128))
            cc_e = jnp.broadcast_to(cec, (128, 128))
            gk_s = jnp.take_along_axis(bndT, cc_s, axis=1)  # (128s,128p)
            gk_e = jnp.take_along_axis(bndT, cc_e, axis=1)
            gv_e = jnp.take_along_axis(wvT, cc_e, axis=1)
            eq_s = gk_s == ok
            eq_e = gk_e == ok
            cnt = (
                jnp.sum(eq_s.astype(jnp.int32), axis=0, keepdims=True)
                + 128 * middle
                + jnp.where(
                    cec > csc,
                    jnp.sum(eq_e.astype(jnp.int32), axis=0, keepdims=True),
                    0,
                )
            )
            # value-ascending runs: the max val of the run is its last
            # element, which lives in chunk ce (== cs when the run ends
            # there); when ce>cs but the key is absent (cnt_e==0 can't
            # happen if cnt>0 -- ce starts with the key by definition)
            mx = jnp.max(jnp.where(eq_e, gv_e, bias), axis=0,
                         keepdims=True)
            live = ok_u32 != 0
            cnt = jnp.where(live, cnt, 0)
            mv = jnp.where(
                (cnt > 0) & live, pltpu.bitcast(mx ^ bias, jnp.uint32),
                jnp.uint32(0),
            )
            return mv, cnt

        const_tile = jnp.logical_and(
            probe_ref[0, 0, 0] == probe_ref[0, r_rows - 1, 127],
            probe_ref[0, 0, 0] != 0,
        )

        @pl.when(const_tile)
        def _():
            mv, cnt = row_result(probe_ref[0, 0:1, :])
            for r in range(r_rows):
                mval_ref[0, r : r + 1, :] = mv
                mcnt_ref[0, r : r + 1, :] = cnt

        @pl.when(jnp.logical_not(const_tile))
        def _():
            for r in range(r_rows):
                mv, cnt = row_result(probe_ref[0, r : r + 1, :])
                mval_ref[0, r : r + 1, :] = mv
                mcnt_ref[0, r : r + 1, :] = cnt

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile", "window", "interpret"))
def merge_probe_gather(
    probe_hk: jnp.ndarray,  # (N_pad,) sorted (key asc, val-secondary)
    build_hk2d: jnp.ndarray,  # (rows, 128) sorted likewise, flattened order
    build_val2d: jnp.ndarray,  # (rows, 128)
    window_row: jnp.ndarray,  # (n_tiles,) int32 first 128-row of the window
    tile: int,
    window: int,  # slots, multiple of 128; at most 128 chunks (16384)
    interpret: bool = False,
):
    """Same contract as merge_probe_pallas, with two requirements on the
    callers: (a) window <= 16384 slots (chunk index fits one lane gather),
    (b) both sides sorted with the value as the secondary key (for exact
    max-val on duplicate runs).  Exact match counts for any M:N."""
    assert window % 128 == 0 and window // 128 <= 128, window
    cap = probe_hk.shape[0]
    n_tiles = cap // tile
    r_rows = tile // 128
    w_chunks = window // 128
    probe3d = probe_hk.reshape(n_tiles, r_rows, 128)
    n_chunks = -(-n_tiles // 128)
    wrow2 = jnp.concatenate(
        [window_row.astype(jnp.int32),
         jnp.zeros(n_chunks * 128 - n_tiles, jnp.int32)]
    ).reshape(n_chunks, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, r_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, r_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mv, mc = pl.pallas_call(
        _make_kernel(w_chunks, n_tiles),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(wrow2, probe3d, build_hk2d, build_val2d)
    return mv.reshape(cap), mc.reshape(cap)
