"""Merge-mode probe: sorted-sorted window join (PHJ probe, v2).

Partitioning on TPU is a sort (ops/partition.py), so after it BOTH relations
are fully ordered by the scrambled key.  That makes the dense per-partition
table redundant: a probe tile's matches all lie in one contiguous build-side
window located by prefix sums (searchsorted of tile boundary values), and
the probe becomes a windowed dense equality sweep.  Compared to the padded-
partition probe this removes the table-build scatter, the padded-layout
scatter and its gap bookkeeping -- the two relations go straight from the
sort to the kernel.

Kernel: probe tiles stream through the normal Pallas pipeline; build windows
are fetched with MANUAL double-buffered DMAs (window starts are arbitrary
128-aligned rows, which BlockSpec index maps cannot express) from HBM-
resident build arrays.  The per-tile window rows live in HBM and are
staged into SMEM 128 tiles at a time (a scalar-prefetch operand would cap
n_tiles at SMEM size).
Window coverage is verified OUTSIDE the kernel from the same prefix sums
(window overflow count returned to the caller; with W >= 3 sublane-chunks
and Poisson-thin windows the probability is ~0).

Null-key convention: pads on either side carry key 0 -> hk 0, sort to the
front, and are masked by hk != 0 in the compare.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = -(2**31)


def make_window_probe_kernel(w_chunks: int, n_tiles: int, row_result_factory,
                             has_sovf: bool = False):
    """Shared scaffolding for the windowed merge-probe kernels: SMEM
    staging of the per-tile window rows, double-buffered window DMAs, and
    the constant-tile fast-path dispatch.  `row_result_factory(kwin, vwin,
    probe_ref)` receives the tile's resident window buffers ((w_chunks,
    128) each) plus the probe block ref (for per-tile hoisted work) and
    returns fn(probe_row (1,128), r) -> (match_vals, match_cnts) or
    (match_vals, match_cnts, select_overflow); the dense and gather
    probes differ only there.  has_sovf adds a third kernel output
    accumulating the rowbase select's span-overflow lane counts --
    CONDITIONAL because the extra per-tile store is pure cost for the
    selects that cannot overflow (measured ~0.3 us/tile: a 5% zipf
    regression at the re-planned 250K-tile geometry, r4)."""

    def kernel(wrow_hbm, probe_ref, bhk_hbm, bval_hbm,
               mval_ref, mcnt_ref, *rest):
        if has_sovf:
            sovf_ref = rest[0]
            kbuf, vbuf, wbuf, sems, wsems = rest[1:]
        else:
            sovf_ref = None
            kbuf, vbuf, wbuf, sems, wsems = rest
        # window rows live in HBM as (n_chunks, 128) -- scalar-prefetch
        # would put the whole (n_tiles,) array in SMEM, which overflows at
        # large tile counts.  Every 128 tiles the kernel DMAs the current
        # and next chunk into SMEM double buffers, so wrow[i] and
        # wrow[i+1] are always scalar-readable.
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        c = i // 128
        last_chunk = (n_tiles - 1) // 128

        @pl.when(i == 0)
        def _():
            # only the FIRST boundary needs the current chunk: at every
            # later boundary 128k, chunk k is already resident in
            # wbuf[k%2] (prefetched as the 'next' chunk at boundary
            # 128(k-1)) -- re-copying it added a synchronous DMA wait on
            # the critical path once per 128 tiles
            d0 = pltpu.make_async_copy(
                wrow_hbm.at[0], wbuf.at[0], wsems.at[0]
            )
            d0.start()
            d0.wait()

        @pl.when(jax.lax.rem(i, 128) == 0)
        def _():
            c1 = jnp.minimum(c + 1, last_chunk)
            d1 = pltpu.make_async_copy(
                wrow_hbm.at[c1], wbuf.at[jax.lax.rem(c + 1, 2)], wsems.at[1]
            )
            d1.start()
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

        row_result = row_result_factory(kbuf[slot], vbuf[slot], probe_ref)
        r_rows = probe_ref.shape[1]

        def run_row(ok, r):
            out = row_result(ok, r)
            return out if len(out) == 3 else (*out, None)

        # heavy-hitter fast path: a tile whose probes are all one key
        # (sorted Zipf runs produce thousands of such tiles) needs only
        # one row's sweep, broadcast to every row
        const_tile = jnp.logical_and(
            probe_ref[0, 0, 0] == probe_ref[0, r_rows - 1, 127],
            probe_ref[0, 0, 0] != 0,
        )

        @pl.when(const_tile)
        def _():
            mv, cnt, ovf = run_row(probe_ref[0, 0:1, :], 0)
            for r in range(r_rows):
                mval_ref[0, r : r + 1, :] = mv
                mcnt_ref[0, r : r + 1, :] = cnt
            if sovf_ref is not None:
                # all rows identical: row 0's lane flags stand for each
                sovf_ref[0, 0:1, :] = (
                    jnp.zeros((1, 128), jnp.int32) if ovf is None
                    else ovf * r_rows
                )

        @pl.when(jnp.logical_not(const_tile))
        def _():
            ovf_acc = jnp.zeros((1, 128), jnp.int32)
            for r in range(r_rows):
                mv, cnt, ovf = run_row(probe_ref[0, r : r + 1, :], r)
                mval_ref[0, r : r + 1, :] = mv
                mcnt_ref[0, r : r + 1, :] = cnt
                if ovf is not None:
                    ovf_acc = ovf_acc + ovf
            if sovf_ref is not None:
                sovf_ref[0, 0:1, :] = ovf_acc

    return kernel


def window_probe_call(kernel, probe_hk, build_hk2d, build_val2d,
                      window_row, tile: int, window: int, interpret: bool,
                      has_sovf: bool = False):
    """Shared pallas_call wrapper for the windowed merge-probe kernels
    (grid/specs/scratch are identical across them).  Returns (match_vals,
    match_cnts, select_overflow_total): the third value counts probe
    LANES whose rowbase boundary slice could not cover their span --
    a constant 0 unless has_sovf (the rowbase select), whose kernel
    emits the extra per-tile overflow output.

    probe_hk may be flat (cap,) or the chunk-row 2-D form (C, cap/C)
    straight off the batched chunk sort; outputs MIRROR its shape (the
    row-major flattening is the canonical padded layout either way).
    Keeping the 2-D form end-to-end lets XLA collapse the sort-output /
    kernel-input / kernel-output reshapes -- each a ~5 ms physical
    retiling per 256M column on v5e (r5 trace, PERF_NOTES)."""
    cap = probe_hk.size
    n_tiles = cap // tile
    r_rows = tile // 128
    # a non-multiple window would silently FLOOR here while the caller's
    # overflow check budgeted the full value -- dropped matches with
    # overflow == 0 (the gather kernel asserts the same contract)
    assert window % 128 == 0, window
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
        ] + ([pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if has_sovf else []),
        scratch_shapes=[
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.int32)]
             if has_sovf else []),
        interpret=interpret,
    )(wrow2, probe3d, build_hk2d, build_val2d)
    mv, mc = out[0], out[1]
    sovf = jnp.sum(out[2]) if has_sovf else jnp.zeros((), jnp.int32)
    return mv.reshape(probe_hk.shape), mc.reshape(probe_hk.shape), sovf


def window_probe_call_indexed(kernel, probe_hk, build_hk2d, build_val2d,
                              wrow_compact, tile_idx, mv_in, mc_in,
                              tile: int, window: int, interpret: bool):
    """Second-class probe pass over a COMPACT tile subset (r5 two-class
    window geometry for skew): grid step j probes tile tile_idx[j] at
    `window` (typically the wide class's width), writing its (mv, mc)
    blocks IN PLACE onto the first pass's outputs (input_output_aliases
    -- TPU has no scatter, but a prefetch-indexed output BlockSpec is
    exactly a block scatter).  tile_idx is a scalar-prefetch operand, so
    the subset size is static (max_wide) while membership is dynamic;
    PAD entries must repeat a real entry (re-probing a tile at a
    wider window anchored at a covering wrow is idempotent: extra
    window slots hold keys past the tile's max and add no matches).

    wrow_compact[j] is tile_idx[j]'s window anchor CLAMPED for this
    window's width.  Returns (mv, mc) with the subset's blocks
    replaced; shapes mirror probe_hk (flat or chunk-row 2-D), like
    window_probe_call."""
    cap = probe_hk.size
    n_tiles = cap // tile
    r_rows = tile // 128
    assert window % 128 == 0, window
    max_wide = tile_idx.shape[0]
    probe3d = probe_hk.reshape(n_tiles, r_rows, 128)
    n_chunks = -(-max_wide // 128)
    wrow2 = jnp.concatenate(
        [wrow_compact.astype(jnp.int32),
         jnp.zeros(n_chunks * 128 - max_wide, jnp.int32)]
    ).reshape(n_chunks, 128)

    def wrapped(tidx_ref, wrow_hbm, probe_ref, bhk_hbm, bval_hbm,
                mv_in_ref, mc_in_ref, mval_ref, mcnt_ref, *scratch):
        # the aliased inputs arrive as refs but the kernel fully
        # overwrites its output blocks; unvisited blocks keep the
        # first pass's values through the aliasing
        del tidx_ref, mv_in_ref, mc_in_ref
        kernel(wrow_hbm, probe_ref, bhk_hbm, bval_hbm, mval_ref,
               mcnt_ref, *scratch)

    def by_tidx(j, tidx):
        return (tidx[j], 0, 0)

    blk = lambda: pl.BlockSpec((1, r_rows, 128), by_tidx,
                               memory_space=pltpu.VMEM)
    w_chunks = window // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_wide,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            blk(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk(),
            blk(),
        ],
        out_specs=[blk(), blk()],
        scratch_shapes=[
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.VMEM((2, w_chunks, 128), jnp.uint32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    mv3 = mv_in.reshape(n_tiles, r_rows, 128)
    mc3 = mc_in.reshape(n_tiles, r_rows, 128)
    mv, mc = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.int32),
        ],
        # args after the prefetch operand: wrow2=1, probe3d=2, bhk=3,
        # bval=4, mv_in=5, mc_in=6 -> outputs 0, 1
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(tile_idx.astype(jnp.int32), wrow2, probe3d, build_hk2d,
      build_val2d, mv3, mc3)
    return mv.reshape(probe_hk.shape), mc.reshape(probe_hk.shape)


def _dense_row_result_factory(w_chunks: int):
    # NOTE on a rejected optimization: both the tile and the window are
    # sorted, so per-(row, chunk) range-overlap skipping looks attractive
    # (typically 1 of w_chunks chunks can match).  Measured on v5e it LOSES:
    # the scalar-core branches (lax.cond / pl.when per chunk) and the
    # accumulator carries/VMEM round-trips cost more than the skipped
    # (128,128) compares.  The branchless dense sweep below is faster;
    # window size (not skipping) is the lever that controls compare work --
    # and past ~5 chunks the gather-select kernel takes over entirely
    # (ops/merge_probe_gather.py).
    def factory(kwin, vwin, probe_ref):
        del probe_ref  # the dense sweep has no per-tile hoisted select
        bias = jnp.int32(_BIAS)
        # window: (w_chunks, 128) -> slots on sublanes via transpose
        wkT = jnp.transpose(kwin, (1, 0))  # (128, w_chunks)
        wvT = jnp.transpose(pltpu.bitcast(vwin, jnp.int32) ^ bias, (1, 0))

        def row_result(ok, r):
            del r
            # hk=0 pads: a real probe never equals a build pad (0) and a
            # pad probe (0) only equals build pads, so the inner compare
            # needs no mask -- spurious pad-pad matches are zeroed once
            # per row at the end instead of masking every (128,128) block
            mx = jnp.full((1, 128), bias, jnp.int32)
            cnt = jnp.zeros((1, 128), jnp.int32)
            for c in range(w_chunks):
                wk_c = wkT[:, c : c + 1]
                eq = wk_c == ok  # (128, 128)
                mx = jnp.maximum(
                    mx,
                    jnp.max(jnp.where(eq, wvT[:, c : c + 1], bias),
                            axis=0, keepdims=True),
                )
                cnt = cnt + jnp.sum(eq.astype(jnp.int32), axis=0,
                                    keepdims=True)
            live = ok != 0
            cnt = jnp.where(live, cnt, 0)
            mv = jnp.where(
                (cnt > 0) & live, pltpu.bitcast(mx ^ bias, jnp.uint32),
                jnp.uint32(0),
            )
            return mv, cnt

        return row_result

    return factory


@functools.partial(jax.jit,
                   static_argnames=("tile", "window", "interpret"))
def merge_probe_pallas(
    probe_hk: jnp.ndarray,  # (N_pad,) fully sorted, pads (hk=0) in front
    build_hk2d: jnp.ndarray,  # (rows, 128) fully sorted (flattened order)
    build_val2d: jnp.ndarray,  # (rows, 128)
    window_row: jnp.ndarray,  # (n_tiles,) int32: first 128-row of the window
    tile: int,
    window: int,  # window size in slots, multiple of 128
    interpret: bool = False,
):
    n_tiles = probe_hk.size // tile
    kernel = make_window_probe_kernel(
        window // 128, n_tiles, _dense_row_result_factory(window // 128)
    )
    mv, mc, _ = window_probe_call(kernel, probe_hk, build_hk2d,
                                  build_val2d, window_row, tile, window,
                                  interpret, has_sovf=False)
    return mv, mc


def merge_probe_jnp(probe_hk, build_hk2d, build_val2d, window_row, tile,
                    window):
    """jnp oracle of the merge probe (scan over tiles, dynamic windows).
    Accepts flat or chunk-row 2-D probe_hk; outputs mirror its shape."""
    shape = probe_hk.shape
    probe_flat = probe_hk.reshape(-1)
    cap = probe_flat.shape[0]
    n_tiles = cap // tile
    bflat_k = build_hk2d.reshape(-1)
    bflat_v = build_val2d.reshape(-1)

    def one(_, t):
        ok = jax.lax.dynamic_slice(probe_flat, (t * tile,), (tile,))
        start = window_row[t] * 128
        wk = jax.lax.dynamic_slice(bflat_k, (start,), (window,))
        wv = jax.lax.dynamic_slice(bflat_v, (start,), (window,))
        eq = (ok[:, None] == wk[None, :]) & (ok != 0)[:, None] & (
            wk != 0
        )[None, :]
        mval = jnp.max(jnp.where(eq, wv[None, :], jnp.uint32(0)), axis=1)
        mcnt = jnp.sum(eq, axis=1).astype(jnp.int32)
        return _, (mval, mcnt)

    _, (mv, mc) = jax.lax.scan(one, 0, jnp.arange(n_tiles))
    return mv.reshape(shape), mc.reshape(shape)
