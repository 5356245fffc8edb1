"""Gather-select merge probe: wide-window sorted-sorted join (probe v3).

The dense merge probe (ops/merge_probe_pallas.py) sweeps every probe
against EVERY window slot -- compare work scales linearly with the
window, which is fine at narrow windows but dominates at the wide
windows of chunk-sorted probe layouts, skewed re-planned windows, and
NPJ-sized spans.  This kernel makes window size nearly free:

1. **select**: the window's 128-slot chunk boundaries (first element of
   each chunk = lane 0 of each VMEM row) are compared against each probe
   once -- `cs` = last chunk whose first element < probe, `ce` = last
   chunk whose first element <= probe.  One (W x 128) compare instead of
   a (128W x 128) sweep.
2. **gather**: chunks cs and ce are fetched per probe with
   `take_along_axis` lane gathers over the transposed window (the same
   Mosaic dynamic-gather pattern as ops/radix_partition_pallas.py; the
   lane axis is padded to 128 because Mosaic wants index and operand
   shapes equal), and compared densely (128 slots each).
3. **run arithmetic**: in a sorted window, every chunk strictly between
   cs and ce is ENTIRELY equal to the probe key (it starts with the key
   and the next chunk also starts with it), so the exact M:N match count
   is  count(eq in cs) + 128*max(0, ce-cs-1) + (ce>cs)*count(eq in ce)
   -- no middle-chunk gathers, exact for ANY duplicate-run length.
4. **max val**: the BUILD side is sorted with the VALUE as a secondary
   sort key (lax.sort num_keys=2 in engine/phj.py), so an equal-key
   run's maximum value sits at the run's END -- inside gathered chunk ce
   (or cs when the run ends there) -- and one masked max is exact.
   Probe-side order within a tile is irrelevant to correctness (each
   probe is matched independently against the window).

REQUIRES key-sorted windows: the NPJ parked table interleaves empty
slots and must keep the dense kernel (engine/npj.py).  Null convention
as everywhere: key 0 slots are padding; a pad probe matches nothing.

The DMA choreography / tile dispatch is the shared scaffolding in
ops/merge_probe_pallas.py -- only the per-row matcher differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .merge_probe_pallas import (
    _BIAS,
    make_window_probe_kernel,
    window_probe_call,
    window_probe_call_indexed,
)


def _gather_row_result_factory(w_chunks: int, row_skip: bool = False,
                               select: str = "flat", k_sel: int = 16):
    def factory(kwin, vwin, probe_ref):
        bias = jnp.int32(_BIAS)
        # window transposed: slot s of chunk w lives at [s, w].  The lane
        # (chunk) axis is padded to 128: Mosaic's dynamic gather wants
        # index and operand shapes to match, and chunk indices are always
        # < w_chunks so the pad lanes are never read.
        wkT = jnp.transpose(kwin, (1, 0))  # (128, W)
        wvT = jnp.transpose(pltpu.bitcast(vwin, jnp.int32) ^ bias, (1, 0))
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

        if select == "rowbase":
            # per-tile hoisted row bases (NEXT.md #2: the flat select's
            # two (W, 128) compare-reduces are ~1/3 of the row's vreg
            # ops; hier's width-independent per-row count LOST 1.4x to
            # its serial refinement chain).  rowbase removes the per-row
            # coarse work instead: probes within a tile are sorted, so a
            # row's boundary range starts at (count of boundaries below
            # the row's minimum live key) - 1, computed ONCE per tile
            # for all rows with one lane-min + one (r_rows, 128)
            # compare.  Each row then selects over only K consecutive
            # boundaries sliced from its base -- a (K, 128) lane gather
            # + two (K, 128) compare-reduces, width-independent and with
            # a SHORTER per-row dependency chain than hier (the base is
            # ready before the row loop starts).
            #
            # Exactness: boundaries below the slice are < every live
            # probe in the row by construction; clamped duplicate reads
            # past boundary W-1 only ever push cs/ce to W-1, which the
            # clamp makes exact.  A row whose span exceeds the K-slice
            # is COUNTED (third kernel output) and the caller falls back
            # to the flat select -- overflow is a value, never silent.
            imax = jnp.int32(2**31 - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            bnd_row = jnp.where(lane < w_chunks, bndT[0:1, :], imax)
            blk = pltpu.bitcast(probe_ref[0], jnp.int32) ^ bias
            r_rows = blk.shape[0]
            # min over LIVE lanes: pads (hk 0 -> biased INT_MIN) sort to
            # the chunk front, so a pad/real boundary row must base on
            # its first REAL key, not the pad
            rmin = jnp.min(
                jnp.where(probe_ref[0] != 0, blk, imax),
                axis=1, keepdims=True,
            )  # (r_rows, 1)
            base = jnp.sum(
                (jnp.broadcast_to(bnd_row, (r_rows, 128)) < rmin).astype(
                    jnp.int32
                ),
                axis=1, keepdims=True,
            )
            s0 = jnp.clip(base - 1, 0, max(w_chunks - 1, 0))  # (r_rows, 1)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (k_sel, 128), 0)
            bnd_k = jnp.broadcast_to(bnd_row, (k_sel, 128))

        if select == "hier":
            # two-level select (per tile, hoisted out of the row loop):
            # pad lanes get +INT32_MAX so they never count as < or <=
            # any probe; L1 holds every 8th boundary on sublanes
            imax = jnp.int32(2**31 - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            bnd_row = jnp.where(lane < w_chunks, bndT[0:1, :], imax)
            # (16, 128): L1[j] = boundary[8j] broadcast over lanes.  A
            # (1,128)->(16,8) reshape would move lanes into sublanes --
            # Mosaic rejects that relayout ("unsupported shape cast" on
            # hardware, r3) -- so pick every 8th lane with one per-tile
            # lane gather instead (row j gathers lane 8j for all lanes)
            idx16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) * 8
            l1 = jnp.take_along_axis(
                jnp.broadcast_to(bnd_row, (16, 128)), idx16, axis=1
            )
            bnd8 = jnp.broadcast_to(bnd_row, (8, 128))
            sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            w1 = -(-w_chunks // 8)
            l1_valid = (
                jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) < w1
            )

            def count_bounds(ok):
                """(n_lt, n_le) counts of boundaries </<= probe: coarse
                count over the 16 L1 rows picks the transition 8-block,
                one lane gather refines it to boundary granularity --
                exact for every case incl. a probe below the window
                (block 0 then counts zero).  `<` needs no pad masks
                (imax pads never compare below any probe); `<=` masks
                the probe == 0xFFFFFFFF edge where pads would count."""
                okb = jnp.broadcast_to(ok, (16, 128))
                ok8 = jnp.broadcast_to(ok, (8, 128))

                def level(cmp_l1):
                    g = jnp.sum(cmp_l1.astype(jnp.int32), axis=0,
                                keepdims=True)
                    base = jnp.maximum(g - 1, 0)
                    idx = base * 8 + sub8  # (8, 128), always < 128
                    r8 = jnp.take_along_axis(bnd8, idx, axis=1)
                    return base, r8, idx

                base_lt, r8_lt, _ = level(l1 < okb)
                base_le, r8_le, idx_le = level((l1 <= okb) & l1_valid)
                n_lt = base_lt * 8 + jnp.sum(
                    (r8_lt < ok8).astype(jnp.int32), axis=0,
                    keepdims=True,
                )
                n_le = base_le * 8 + jnp.sum(
                    ((r8_le <= ok8) & (idx_le < w_chunks)).astype(
                        jnp.int32
                    ),
                    axis=0, keepdims=True,
                )
                return n_lt, n_le

        def row_result(ok_u32, r):
            ok = pltpu.bitcast(ok_u32, jnp.int32) ^ bias  # (1, 128)
            ovf = None
            if select == "rowbase":
                s0r = s0[r : r + 1, 0:1]  # (1, 1) this row's base chunk
                idx = jnp.minimum(s0r + iota_k, w_chunks - 1)  # (K, 128)
                bsl = jnp.take_along_axis(bnd_k, idx, axis=1)
                le = bsl <= ok
                n_lt = jnp.sum((bsl < ok).astype(jnp.int32), axis=0,
                               keepdims=True)
                n_le = jnp.sum(le.astype(jnp.int32), axis=0, keepdims=True)
                cs = s0r + n_lt - 1
                ce = s0r + n_le - 1
                # span overflow: the slice's LAST boundary still compares
                # <= the probe while real boundaries remain beyond it --
                # cs/ce would under-count.  Live probes only (a pad probe
                # at INT_MIN matching a pad boundary is not a span).
                ovf = (
                    le[k_sel - 1 : k_sel, :]
                    & (s0r + (k_sel - 1) < w_chunks - 1)
                    & (ok != jnp.int32(_BIAS))
                ).astype(jnp.int32)
            elif select == "hier":
                n_lt, n_le = count_bounds(ok)
                cs = n_lt - 1
                ce = n_le - 1
            else:
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

            def both_chunks():
                middle = jnp.maximum(cec - csc - 1, 0)  # full run chunks
                # gather chunks cs and ce: out[s, p] = wkT[s, c[p]].  The
                # cs block completes (gather -> eq -> sum) before the ce
                # block starts: shorter live ranges schedule better under
                # Mosaic
                cc_s = jnp.broadcast_to(csc, (128, 128))
                gk_s = jnp.take_along_axis(bndT, cc_s, axis=1)  # (s, p)
                eq_s = gk_s == ok
                cnt_s = jnp.sum(eq_s.astype(jnp.int32), axis=0,
                                keepdims=True)
                cc_e = jnp.broadcast_to(cec, (128, 128))
                gk_e = jnp.take_along_axis(bndT, cc_e, axis=1)
                gv_e = jnp.take_along_axis(wvT, cc_e, axis=1)
                eq_e = gk_e == ok
                cnt = (
                    cnt_s
                    + 128 * middle
                    + jnp.where(
                        cec > csc,
                        jnp.sum(eq_e.astype(jnp.int32), axis=0,
                                keepdims=True),
                        0,
                    )
                )
                # value-ascending runs: the max val of the run is its
                # last element, which lives in chunk ce (== cs when the
                # run ends there; ce always holds the key when the run
                # reaches it)
                mx = jnp.max(jnp.where(eq_e, gv_e, bias), axis=0,
                             keepdims=True)
                return mx, cnt

            def one_chunk():
                # every run in this row starts AND ends in its cs chunk
                # (no chunk boundary carries the probe's key): one gather
                # pair answers both the count and the max val -- skips
                # the whole ce block (~1/3 of the row's vreg ops).
                # MEASURED LOSS as a default (row_skip=False): the
                # per-row lax.cond runs the probe at 0.83 s vs 0.37 s
                # branchless (16Mx256M, C=64, v5e) even though ~37% of
                # uniform rows qualify -- scalar-core branch + schedule
                # disruption dwarfs the skipped vector work, the same
                # pattern as the per-(row,chunk) predication experiment
                # (ops/merge_probe_pallas.py).  Kept as an ablation knob
                # (HJK_GATHER_ROW_SKIP=1).
                cc = jnp.broadcast_to(csc, (128, 128))
                gk = jnp.take_along_axis(bndT, cc, axis=1)
                gv = jnp.take_along_axis(wvT, cc, axis=1)
                eq = gk == ok
                cnt = jnp.sum(eq.astype(jnp.int32), axis=0, keepdims=True)
                mx = jnp.max(jnp.where(eq, gv, bias), axis=0,
                             keepdims=True)
                return mx, cnt

            if row_skip:
                mx, cnt = jax.lax.cond(
                    jnp.all(cec == csc), one_chunk, both_chunks
                )
            else:
                mx, cnt = both_chunks()
            live = ok_u32 != 0
            cnt = jnp.where(live, cnt, 0)
            mv = jnp.where(
                (cnt > 0) & live, pltpu.bitcast(mx ^ bias, jnp.uint32),
                jnp.uint32(0),
            )
            if ovf is not None:
                return mv, cnt, ovf
            return mv, cnt

        return row_result

    return factory


@functools.partial(jax.jit,
                   static_argnames=("tile", "window", "interpret",
                                    "row_skip", "select", "k_sel"))
def merge_probe_gather(
    probe_hk: jnp.ndarray,  # (N_pad,) sorted by key within each tile's chunk
    build_hk2d: jnp.ndarray,  # (rows, 128) sorted (key asc, val-secondary)
    build_val2d: jnp.ndarray,  # (rows, 128)
    window_row: jnp.ndarray,  # (n_tiles,) int32 first 128-row of the window
    tile: int,
    window: int,  # slots, multiple of 128; at most 128 chunks (16384)
    interpret: bool = False,
    row_skip: bool = False,
    select: str = "flat",
    k_sel: int = 16,
):
    """Same contract as merge_probe_pallas, with two requirements on the
    callers: (a) window <= 16384 slots (chunk index fits one lane gather),
    (b) the BUILD side sorted with the value as the secondary key (for
    exact max-val on duplicate runs; engine/phj.py sorts the probe side
    with num_keys=1 -- probe order affects only window locality, not
    correctness).  Exact match counts for any M:N.

    Returns (match_vals, match_cnts, select_overflow): the third value
    counts probe LANES whose span exceeded the rowbase boundary slice
    (always 0 for "flat"/"hier"; a const tile counts each of its
    broadcast rows' lanes, consistent with per-row accumulation); any
    nonzero means match results are incomplete and the caller must
    re-run with select="flat" (the engine's join() does this
    automatically).

    row_skip defaults False -- the measured production configuration
    (the per-row lax.cond ablation loses 2.2x, see the one_chunk
    comment); True only for HJK_GATHER_ROW_SKIP ablation runs.

    select: "flat" = one (W, 128) compare-reduce pair per row; "hier" =
    two-level boundary count (16-row coarse pass + one 8-wide lane
    gather refinement; measured 1.4x SLOWER than flat on hardware, kept
    as ablation); "rowbase" = per-tile hoisted row bases + per-row
    K-boundary sliced select (k_sel consecutive boundaries), the
    width-independent candidate with no per-row coarse pass."""
    assert window % 128 == 0 and window // 128 <= 128, window
    assert k_sel >= 2, k_sel
    n_tiles = probe_hk.size // tile
    has_sovf = select == "rowbase"
    kernel = make_window_probe_kernel(
        window // 128, n_tiles,
        _gather_row_result_factory(window // 128, row_skip, select,
                                   min(k_sel, window // 128)),
        has_sovf=has_sovf,
    )
    return window_probe_call(kernel, probe_hk, build_hk2d, build_val2d,
                             window_row, tile, window, interpret,
                             has_sovf=has_sovf)


@functools.partial(jax.jit,
                   static_argnames=("tile", "window", "interpret"))
def merge_probe_gather_indexed(
    probe_hk: jnp.ndarray,
    build_hk2d: jnp.ndarray,
    build_val2d: jnp.ndarray,
    wrow_compact: jnp.ndarray,  # (max_wide,) anchors clamped for `window`
    tile_idx: jnp.ndarray,  # (max_wide,) tile ids; pads repeat a real id
    mv_in: jnp.ndarray,
    mc_in: jnp.ndarray,
    tile: int,
    window: int,
    interpret: bool = False,
):
    """The gather-select probe over a COMPACT tile subset (the r5
    two-class skew geometry's WIDE pass): probes only tiles tile_idx at
    `window`, overwriting their blocks of (mv_in, mc_in) in place
    (window_probe_call_indexed).  flat select only -- the wide class is
    small by construction and the opportunistic selects' overflow
    channel is not worth plumbing through the aliased pass."""
    assert window % 128 == 0 and window // 128 <= 128, window
    max_wide = tile_idx.shape[0]
    kernel = make_window_probe_kernel(
        window // 128, max_wide,
        _gather_row_result_factory(window // 128, False, "flat", 16),
        has_sovf=False,
    )
    return window_probe_call_indexed(
        kernel, probe_hk, build_hk2d, build_val2d, wrow_compact,
        tile_idx, mv_in, mc_in, tile, window, interpret,
    )
