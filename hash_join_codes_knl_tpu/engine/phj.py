"""PHJ: radix-partitioned hash join, single chip.

The TPU re-architecture of the reference's intended PHJ pipeline
(phj.cpp:1646-1949, with the commented-out build/probe phase at
phj.cpp:1869-1924 restored): partition both relations by the top hash bits,
pack each build partition into a dense VMEM-resident row, then probe each
quantum-aligned probe tile against its single partition row with dense
compares.  No atomics, no barriers: phases are jit-compiled dataflow and all
offsets come from prefix sums.

Output contract (`JoinResult`): aligned to the padded probe layout, where
slot i carries (probe key, probe val, matched build val, match count).  For
unique build keys (the benchmark workloads: inner_tuples == inner_distinct,
write.cpp:1689) match count is 0/1 and the aligned form is the full join
result; `materialize` compacts it to contiguous rows (close_gaps analog,
npj.cpp:475-514).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.partition import (
    PROBE_TILE_GROUP,
    build_dense_table_jnp,
    build_dense_table_sort_jnp,
    partition_padded_jnp,
    partition_padded_sort_jnp,
    tile_pids,
)
from ..ops.probe import probe_tiles_jnp
from ..ops.probe_pallas import probe_tiles_pallas
from ..utils.hashing import hashed_key, mod_inverse_u32
from .config import JoinPlan, plan_join


from ..utils.host import on_tpu as _on_tpu  # shared platform probe


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class JoinResult:
    """Aligned join output.  The four padded columns share one shape:
    flat (cap,) or, from the chunk-sorted merge path, chunk-row 2-D
    (C, cap/C) -- whose row-major flattening IS the (cap,) padded
    layout (slot order identical).  The 2-D form exists because each
    final (C, L) -> flat reshape is a ~5 ms physical retiling per 256M
    column on v5e (r5 trace); emitting the sort's native form lets XLA
    collapse every internal reshape pair.  Host consumers flatten for
    free with np.asarray(col).reshape(-1); device consumers that need
    1-D call .flat() (one cheap-direction copy per column)."""

    probe_keys: jnp.ndarray  # (cap,) or (C, cap/C) padded probe layout
    probe_vals: jnp.ndarray  # same shape
    match_vals: jnp.ndarray  # same shape; build val (max over matches)
    match_cnts: jnp.ndarray  # same shape; number of build matches
    build_counts: jnp.ndarray  # (P,) build partition occupancy

    def tree_flatten(self):
        return (
            (self.probe_keys, self.probe_vals, self.match_vals,
             self.match_cnts, self.build_counts),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def flat(self) -> "JoinResult":
        """This result with 1-D (cap,) padded columns.  A no-op for flat
        results; for chunk-row 2-D results it is the cheap-direction
        retiling (sorted rows -> flat lowers to an efficient copy,
        unlike the reverse -- PERF_NOTES r5).  Distributed steps call
        this before returning through shard_map out_specs, which shard
        leaf dim 0 and so expect the flat layout."""
        if self.probe_keys.ndim == 1:
            return self
        r = lambda x: x.reshape(-1)
        return JoinResult(
            r(self.probe_keys), r(self.probe_vals), r(self.match_vals),
            r(self.match_cnts), self.build_counts,
        )

    @property
    def join_tuples(self) -> jnp.ndarray:
        # u32 wraparound sum; exact below 2^32 output rows (per-shard counts
        # are combined hierarchically at larger scale)
        return jnp.sum(self.match_cnts.astype(jnp.uint32))


def phj_join(
    inner_keys: jnp.ndarray,
    inner_vals: jnp.ndarray,
    outer_keys: jnp.ndarray,
    outer_vals: jnp.ndarray,
    plan: JoinPlan,
) -> JoinResult:
    """Dispatch on the plan's probe mode: 'merge*' runs the sorted-window
    probe (no table, no padded layout); everything else the padded-partition
    path."""
    if plan.probe_impl.startswith("merge"):
        return phj_join_merge(inner_keys, inner_vals, outer_keys,
                              outer_vals, plan)
    return _phj_join_padded(inner_keys, inner_vals, outer_keys, outer_vals,
                            plan)


def _merge_params(plan: JoinPlan, ni: int, no: int):
    """Static geometry of the merge pipeline: (tile, window, rows_total,
    cap).  Window sized from the expected build tuples per probe-tile hk
    range (plan.window overrides).

    With probe_chunks, a tile's hk span is tile/chunk_len of the key
    space (each chunk is only locally sorted), so the window scales by
    ~the chunk count; cap becomes a multiple of chunks*tile so chunk
    boundaries never split a tile."""
    tile = plan.tile
    chunks = max(1, plan.probe_chunks)
    quantum = tile * chunks
    cap = -(-no // quantum) * quantum
    if chunks % 8 == 0 and (cap // chunks) % 1024:
        # round the per-chunk row length up to a 1024 multiple (pad is
        # <= 7 tiles/chunk, ~0.2% worst case): the flat->rows block-DMA
        # kernel (ops/chunk_layout.py) needs 1024-divisible rows, and
        # without this only 1024-multiple tiles (2048/3072) get its
        # ~10x relayout saving -- re-planned tiles like the zipf 896
        # would silently fall back to XLA's serial-loop retiling.
        # tile-3072/2048 caps are already aligned, so the headline
        # program's shapes are untouched.
        quantum *= 8
        cap = -(-no // quantum) * quantum
    if plan.window_wide:
        # two-class geometry: window (narrow) must be explicit -- the
        # auto estimator sizes for uniform densities, which is exactly
        # what a two-class plan is overriding -- and the wide pass is
        # always the gather kernel (indexed variant), so its width must
        # sit inside the gather band and compile budget
        if not plan.window or plan.window_wide <= plan.window:
            raise ValueError(
                "window_wide requires an explicit narrow window smaller "
                f"than it (got window={plan.window}, "
                f"window_wide={plan.window_wide})"
            )
        _check_explicit_window(
            dataclasses.replace(plan, probe_impl="merge_gather"),
            tile, plan.window_wide,
        )
    if plan.window:
        window = plan.window
        # an EXPLICIT window past the resolved kernel's scoped-vmem
        # compile budget would crash the compiler minutes into a remote
        # compile -- refuse loudly, per kernel, BEFORE any trace
        _check_explicit_window(plan, tile, window)
    else:
        # coverage: the window must hold the tile's build-side span --
        # mean lam plus two fluctuation terms: Poisson thinning of the
        # build density (8*sqrt(lam)) and, at large lam (chunked probes),
        # the order-statistic variance of the tile's OWN hk span
        # (sd ~ lam/sqrt(tile); measured: the sqrt term alone overflows
        # ~2/125K tiles at lam=8K) -- plus the 128-slot wrow round-down.
        # Overflow is detected (never silent) and re-planned regardless.
        # +520: the window anchors are row-granular and duplicate-safe
        # (lower anchor rounds down up to 2 rows, upper rounds up 1 row;
        # _merge_windows)
        lam = tile * ni / max(cap // chunks, 1)
        window = int(
            max(384, lam + 8 * (lam ** 0.5) + 8 * lam / (tile ** 0.5) + 520)
        )
        # stay within the proven kernel geometry; if the true spans
        # need more, the counted overflow re-plans the geometry (tile
        # shrink / chunk shrink, replan_from_span).  AUTO windows clamp
        # one step below the compile ceiling: 118 chunks (15104) at
        # tile 3072 is the geometry reproduced in 6+ sessions, while a
        # 121-chunk kernel compile was seen to crash the remote compile
        # helper in r3 (the scoped-vmem budget 24 rows x 121 chunks
        # sits exactly at the measured boundary).  The ceiling is
        # rows x chunks, so it is TILE-dependent -- and it applies at
        # chunks == 1 too (a huge-build/small-probe auto window would
        # otherwise hand the dense kernel an uncompilable width).
        window = min(window, replan_window_cap(tile))
    window = -(-window // 128) * 128
    rows_total = max(-(-ni // 128), window // 128)
    return tile, window, rows_total, cap


def _pad_pair(hk, vals, pad_to):
    """Zero-pad both columns to pad_to (the null-key pad convention)."""
    hk_p = jnp.concatenate([hk, jnp.zeros(pad_to - hk.shape[0], jnp.uint32)])
    v_p = jnp.concatenate(
        [vals, jnp.zeros(pad_to - vals.shape[0], jnp.uint32)]
    )
    return hk_p, v_p


def _merge_sort_side(hk, vals, pad_to, num_keys: int = 1):
    """Hash-order both columns; null-key pads sort to the front and are
    masked everywhere downstream.

    num_keys=2 additionally orders equal-key runs by VALUE -- required on
    the BUILD side by the gather probe (ops/merge_probe_gather.py), whose
    exact max-val relies on a run's maximum sitting at its end.  The
    probe side never needs it.
    """
    return jax.lax.sort(_pad_pair(hk, vals, pad_to), num_keys=num_keys)


def _merge_sort_probe(hk, vals, pad_to, chunks: int):
    """Probe-side ordering: chunks <= 1 is the global 1-D sort; otherwise
    one batched 2-D sort over (chunks, pad_to/chunks) rows -- measurably
    cheaper than the 1-D path (PERF_NOTES.md), each chunk independently
    hash-ordered.  Downstream needs nothing else: windows are per tile,
    and _merge_params already widened them to the chunk-local span.

    The flat->(C, L) move is semantically a reshape but PHYSICALLY a
    retiling (1-D T(1024) -> 2-D T(8,128)); XLA lowers it as a serial
    while loop at ~68 GB/s -- 2 x ~32 ms of the fused headline (r5
    trace, artifacts/trace_r5_fused).  On TPU the explicit block-DMA
    kernel (ops/chunk_layout.py) does the identical move at stream
    bandwidth; the reverse direction (sorted rows -> flat) already
    lowers to an efficient copy and stays XLA's.

    Returns the sort's NATIVE chunk-row 2-D form (chunks, pad_to/chunks)
    when chunked (flat when chunks <= 1): windows, the probe kernels,
    and JoinResult all carry it through, so the final jit emits no
    rows -> flat retilings at all (~5 ms per 256M column each, 4
    columns on the headline -- r5 trace / NEXT.md #2)."""
    if chunks <= 1:
        return _merge_sort_side(hk, vals, pad_to)
    hk_p, v_p = _pad_pair(hk, vals, pad_to)
    if _on_tpu() and chunks % 8 == 0:
        from ..ops.chunk_layout import flat_to_rows

        hk_r, v_r = flat_to_rows(hk_p, chunks), flat_to_rows(v_p, chunks)
    else:
        hk_r, v_r = hk_p.reshape(chunks, -1), v_p.reshape(chunks, -1)
    return jax.lax.sort((hk_r, v_r), dimension=1, num_keys=1)


def _merge_windows(bhk, ohk_s, tile: int, window: int, rows_total: int,
                   window_wide: int = 0, wide_cap: int = 0):
    """Per-tile window rows from prefix sums (searchsorted of tile bounds).

    Returns (wrow, stats) with stats = [overflow_tile_count, max_span]:
    the count of tiles whose span exceeds `window` (must be 0 for a valid
    probe) and the largest REQUIRED span -- the re-planner sizes the next
    window directly from it instead of blind doubling.

    window_wide > 0 (the r5 two-class skew geometry) adds a third return
    value (tile_idx, wrow_wide, wide_cap_overflow): the first wide_cap
    tiles whose span exceeds the narrow `window` (their blocks re-probe
    in the compact wide pass; pad entries repeat real tiles --
    idempotent, see merge_probe_gather_indexed), their anchors
    re-clamped for the wide width, and the COUNT of wide tiles beyond
    wide_cap (a plan-opt violation: the caller downgrades to
    single-class at window_wide).  stats[0] then counts only spans
    exceeding the WIDE window (the true re-plan signal).

    Anchor math note the wide pass relies on: a LOWER anchor with a
    wider window is always exact -- rows before the left-search-minus-1
    anchor hold keys strictly below the tile's minimum (sorted build),
    so extra low slots can never match, and extra high slots hold keys
    past the tile's max.

    ohk_s may be flat (cap,) or chunk-row 2-D (C, cap/C) -- cap is a
    multiple of chunks*tile (_merge_params), so tiles never straddle
    chunk rows and the per-row strided bounds flatten to exactly the
    flat form's."""
    if ohk_s.ndim == 2:
        lo = ohk_s[:, ::tile].reshape(-1)
        hi = ohk_s[:, tile - 1 :: tile].reshape(-1)
    else:
        lo = ohk_s[::tile]
        hi = ohk_s[tile - 1 :: tile]
    # windows only need 128-slot (row) precision, so the searches run
    # against the ROW-FIRST elements (bhk[::128], 128x smaller) instead
    # of the full build side; anchors round DOWN one row and spans UP one
    # row, so coverage stays conservative within the window margin.
    # method="scan_unrolled" is ~4x the default binary-search lowering on
    # TPU (measured 12 ms vs 47 ms for 125K queries into 16M keys on v5e)
    coarse = bhk.reshape(rows_total, 128)[:, 0]
    n = lo.shape[0]
    # ONE fused scan for all three searches (the scan walks the whole
    # coarse table regardless of query count, so batching the queries
    # halves the stage's cost -- measured on v5e, see PERF_NOTES).  The
    # right-search for hi uses the integer identity right(x) ==
    # left(x + 1); x + 1 wraps only at the key-domain top, where the
    # true right-count is the whole table (every element <= MAX).
    queries = jnp.concatenate(
        [lo, hi + jnp.uint32(1), jnp.full(1, 1, jnp.uint32)]
    )
    found = jnp.searchsorted(
        coarse, queries, side="left", method="scan_unrolled"
    ).astype(jnp.int32)
    # LEFT search - 1 for the anchor: with duplicate build keys, earlier
    # occurrences of the boundary value can sit in rows whose first
    # element is below it; the lower-bound row is always >= left-1
    wrow = found[:n] - 1
    hi_row = jnp.where(
        hi == jnp.uint32(0xFFFFFFFF), rows_total, found[n : 2 * n]
    )
    # skip build-side pads (hk=0 sorts to the front, masked in the compare):
    # a probe tile straddling the pad/real boundary must anchor its window
    # at the last row that can hold a real build tuple's run start
    first_real = found[2 * n] - 1
    wrow_raw = jnp.maximum(wrow, first_real)
    wrow = jnp.clip(wrow_raw, 0, rows_total - window // 128)
    span = (hi_row - wrow) * 128
    if not window_wide:
        overflow = jnp.sum((span > window).astype(jnp.int32))
        return wrow, jnp.stack([overflow, jnp.max(span, initial=0)])
    wrow_w = jnp.clip(wrow_raw, 0, rows_total - window_wide // 128)
    span_w = (hi_row - wrow_w) * 128
    wide = span > window
    n_wide = jnp.sum(wide.astype(jnp.int32))
    overflow = jnp.sum((wide & (span_w > window_wide)).astype(jnp.int32))
    max_span = jnp.max(jnp.where(wide, span_w, span), initial=0)
    wide_ovf = jnp.maximum(n_wide - wide_cap, 0)
    # wide tiles compacted to the front, ascending within each class
    # (stable via the index as secondary sort key); pads repeat narrow
    # tiles, whose re-probe at the wide geometry is idempotent
    _, order = jax.lax.sort(
        (jnp.where(wide, jnp.uint32(0), jnp.uint32(1)),
         jnp.arange(n, dtype=jnp.uint32)),
        num_keys=2,
    )
    tidx = order[:wide_cap].astype(jnp.int32)
    return (wrow, jnp.stack([overflow, max_span]),
            (tidx, wrow_w[tidx], wide_ovf))


# Measured crossover (v5e, tile 3072, 83K tiles): dense 640=0.34s
# 1280=0.57s; gather 1280=0.29s but PATHOLOGICAL at 640 (1.09s --
# Mosaic's tiny-lane-dim transpose path).  Gather from 10 chunks up.
GATHER_MIN_CHUNKS = 10
# scoped-vmem compile budget in ROW-CHUNKS: the unrolled (row x chunk)
# loop's footprint scales with both; 24 rows x 121 chunks (tile 3072)
# is the measured boundary (engine/npj.py models its window ceiling
# from the same budget)
GATHER_ROWCHUNK_BUDGET = 24 * 121
# VMEM ceiling: the unrolled row loop keeps per-row kernel temporaries
# live on Mosaic's scoped-vmem stack; at tile 3072 (24 rows) a
# 126-chunk window FAILED to compile (21.4M > 16M scoped vmem) while
# the production 121-chunk window fits.  Auto windows clamp here and
# the overflow/re-plan path shrinks probe_chunks instead.
GATHER_MAX_CHUNKS = 121
# DENSE-kernel scoped-vmem budget, in rowchunks.  The dense sweep's
# per-(row x chunk) footprint is ~2x the gather kernel's AND the remote
# compiler's accounting drifted between rounds (r3 compiled 181 chunks
# x 16 rows; the identical kernel later OOM'd at 34.4M vs the 16M
# limit).  r4 bracket on v5e at tile 2048 (16 rows): 144 chunks OK, 160
# chunks 23.6M FAIL -- 2048 rowchunks sits a 256-rowchunk step under
# the boundary.  This is THE source for both consumers (NpjPlan's
# window ceiling imports it); re-bracket via hw_revalidate.sh step 1
# after compiler/service updates and update it HERE only.
DENSE_ROWCHUNK_BUDGET = 2048


def _check_explicit_window(plan: JoinPlan, tile: int, window: int) -> None:
    """Validate an EXPLICIT merge window against the compile budget of
    the kernel it will actually resolve to (_merge_impl's rule): the
    gather kernel between GATHER_MIN_CHUNKS and GATHER_MAX_CHUNKS, the
    dense sweep outside that band.  Each kernel has its own measured
    scoped-vmem rowchunk budget; checking the wrong one (the pre-r5 bug:
    dense windows checked against the looser GATHER budget) lets a
    --config window crash the remote compile minutes in.  Also warns
    when a wide window legally falls through to the dense sweep -- a
    regime the auto planner never picks (compare work scales with
    width; pathological at gather-scale widths)."""
    rows = max(1, tile // 128)
    w_chunks = -(-window // 128)
    forced = plan.probe_impl
    if forced == "merge_jnp":
        return  # oracle path: nothing compiles on-device
    to_gather = (
        forced == "merge_gather"
        or (forced == "merge"
            and GATHER_MIN_CHUNKS <= w_chunks <= GATHER_MAX_CHUNKS)
    )
    if to_gather:
        cap = min(GATHER_MAX_CHUNKS, GATHER_ROWCHUNK_BUDGET // rows) * 128
        if window > cap:
            raise ValueError(
                f"window={window} exceeds the gather kernel's compilable "
                f"ceiling {cap} at tile {tile} (scoped-vmem rows x chunks "
                f"budget {GATHER_ROWCHUNK_BUDGET} rowchunks / lane cap "
                f"{GATHER_MAX_CHUNKS} chunks): shrink the tile or window"
            )
        return
    cap = (DENSE_ROWCHUNK_BUDGET // rows) * 128
    if window > cap:
        raise ValueError(
            f"window={window} resolves to the DENSE sweep and exceeds its "
            f"compilable ceiling {cap} at tile {tile} (scoped-vmem budget "
            f"{DENSE_ROWCHUNK_BUDGET} rowchunks, r4 bracket): shrink the "
            "tile or the window, or keep the window within the gather "
            f"band (<= {GATHER_MAX_CHUNKS * 128})"
        )
    if forced == "merge" and w_chunks > GATHER_MAX_CHUNKS:
        import warnings

        warnings.warn(
            f"explicit window={window} ({w_chunks} chunks) is past the "
            f"gather kernel's {GATHER_MAX_CHUNKS}-chunk lane cap and "
            "falls through to the DENSE sweep -- compare work scales "
            "with width there (pathological at these widths); prefer a "
            "window within the gather band or a smaller tile",
            stacklevel=3,
        )


def _merge_impl(plan: JoinPlan, window: int) -> str:
    """Resolve 'merge' to a concrete probe engine: the dense sweep for
    narrow windows, the gather-select kernel once window compare work
    would dominate (w_chunks >= GATHER_MIN_CHUNKS and the chunk index
    fits one lane gather); jnp oracle off-TPU."""
    impl = plan.probe_impl
    if impl == "merge":
        if not _on_tpu():
            return "merge_jnp"
        if GATHER_MIN_CHUNKS * 128 <= window <= GATHER_MAX_CHUNKS * 128:
            return "merge_gather"
        return "merge_pallas"
    return impl


# ablation knob for the gather kernel's per-row one-chunk fast path
# (merge_probe_gather row_skip).  Measured OFF: the per-row lax.cond
# costs 2.2x (probe 0.83 s vs 0.37 s branchless at 16Mx256M/C=64) --
# scalar-core branching loses at ROW granularity too, not just
# per-(row, chunk) (PERF_NOTES "per-compile dice" + dense-kernel note)
_GATHER_ROW_SKIP = os.environ.get("HJK_GATHER_ROW_SKIP", "0") != "0"
# boundary-select engine override for A/B runs: "flat" (W,128) reduce,
# "hier" two-level count (measured 1.4x LOSS, kept as ablation),
# "rowbase" per-tile hoisted bases + K-slice, or "" = defer to
# plan.gather_select (the production path)
_GATHER_SELECT = os.environ.get("HJK_GATHER_SELECT", "")
# "auto" policy: use rowbase when its K-slice is comfortably narrower
# than the window (the saving is the flat (W,128) reduce pair; at
# 3K >= W the slice select costs as much as flat and flat's shorter
# dependency chain wins -- same VPU-pipelining lesson as hier/branching).
# Default OFF until the hardware A/B verdict (PERF_NOTES measurement
# protocol: production staged pipeline, fresh processes) -- flip here.
_AUTO_ROWBASE = os.environ.get("HJK_AUTO_ROWBASE", "0") != "0"


def _rowbase_k(window: int, tile: int) -> int:
    """Boundary-slice length (chunks) for the rowbase select: ~2x the
    expected per-row span (window covers a TILE's span; a 128-probe row
    covers 128/tile of it) plus a fluctuation margin, rounded to a
    sublane multiple.  Spans beyond K are counted by the kernel and
    re-planned to flat -- K only has to make that rare, not impossible."""
    w = window // 128
    exp = -(-w * 128 // max(tile, 128))
    return max(8, min(w, -(-(2 * exp + 6) // 8) * 8))


def _gather_select(plan: JoinPlan, window: int) -> str:
    # an EXPLICIT plan value beats the env override: the downgrade
    # re-planner (downgrade_plan_opts) works by setting the plan to
    # "flat", and it must win even under HJK_GATHER_SELECT A/B forcing
    # -- otherwise every driver's retry loop re-runs the identical
    # failing kernel.  The env var steers only "auto" plans (the A/B
    # harness measures the staged pipeline, which never retries).
    if plan.gather_select != "auto":
        return plan.gather_select
    sel = _GATHER_SELECT
    if sel and sel != "auto":
        return sel
    if not _AUTO_ROWBASE:
        return "flat"
    k = _rowbase_k(window, plan.tile)
    return "rowbase" if 3 * k <= window // 128 else "flat"


def _merge_probe(bhk, bval, ohk_s, ov_s, wrow, overflow, plan: JoinPlan,
                 tile: int, window: int, rows_total: int,
                 wide=None) -> JoinResult:
    from ..ops.merge_probe_pallas import merge_probe_jnp, merge_probe_pallas

    bhk2 = bhk.reshape(rows_total, 128)
    bval2 = bval.reshape(rows_total, 128)
    impl = _merge_impl(plan, window)
    sovf = jnp.zeros((), jnp.int32)
    if impl == "merge_gather":
        from ..ops.merge_probe_gather import merge_probe_gather

        sel = _gather_select(plan, window)
        mv, mc, sovf = merge_probe_gather(
            ohk_s, bhk2, bval2, wrow, tile, window,
            row_skip=_GATHER_ROW_SKIP, select=sel,
            k_sel=_rowbase_k(window, tile),
        )
    elif impl == "merge_pallas":
        mv, mc = merge_probe_pallas(ohk_s, bhk2, bval2, wrow, tile, window)
    elif wide is not None:
        # jnp oracle of the two-class geometry: ONE pass at the wide
        # width is exact for every tile (lower-anchor/wider-window
        # idempotence, _merge_windows docstring; dynamic_slice clamps
        # the tail anchors), so the oracle needs no second pass
        mv, mc = merge_probe_jnp(ohk_s, bhk2, bval2, wrow, tile,
                                 plan.window_wide)
    else:
        mv, mc = merge_probe_jnp(ohk_s, bhk2, bval2, wrow, tile, window)
    if wide is not None and impl != "merge_jnp":
        from ..ops.merge_probe_gather import merge_probe_gather_indexed

        tidx, wrow_c, wide_ovf = wide
        mv, mc = merge_probe_gather_indexed(
            ohk_s, bhk2, bval2, wrow_c, tidx, mv, mc, tile,
            plan.window_wide,
        )
        sovf = sovf + wide_ovf.astype(jnp.int32)
    elif wide is not None:
        sovf = sovf + wide[2].astype(jnp.int32)
    inv = jnp.uint32(mod_inverse_u32(plan.factor))
    # build_counts in merge mode: [overflow_tile_count, max_required_span,
    # plan-optimization violation count].  The third entry is the shared
    # downgrade channel: probe lanes the rowbase K-slice could not cover,
    # PLUS adjacent duplicate build keys under unique_build (either
    # means the optimized plan's results cannot be trusted); nonzero ->
    # the caller re-plans with downgrade_plan_opts (geometry unchanged).
    # Only the GATHER kernel's max-val relies on the value-secondary
    # run order, so a unique_build violation matters (and is counted)
    # only there -- the dense sweep and the jnp oracle take the max
    # over every equal slot, order-independently exact with num_keys=1.
    viol = sovf.astype(jnp.int32)
    if plan.unique_build and impl == "merge_gather":
        viol = viol + jnp.sum(
            ((bhk[1:] == bhk[:-1]) & (bhk[1:] != 0)).astype(jnp.int32)
        )
    stats = jnp.concatenate([overflow, viol[None]])
    return JoinResult(ohk_s * inv, ov_s, mv, mc, stats)


@functools.partial(jax.jit, static_argnames=("plan",))
def phj_join_merge(
    inner_keys: jnp.ndarray,
    inner_vals: jnp.ndarray,
    outer_keys: jnp.ndarray,
    outer_vals: jnp.ndarray,
    plan: JoinPlan,
) -> JoinResult:
    """PHJ, merge mode: partition == sort, probe == sorted-window sweep.

    Both relations are fully ordered by the scrambled key after the
    partitioning sort, so each probe tile's matches lie in one contiguous
    build window located by prefix sums -- no dense table, no padded
    scatter (see ops/merge_probe_pallas.py).  build_counts in the result
    carries TWO values: [count of window-overflow tiles (must be 0), max
    required window span]; callers re-plan from the measured span when
    the count is nonzero.
    """
    ni = inner_keys.shape[0]
    no = outer_keys.shape[0]
    tile, window, rows_total, cap = _merge_params(plan, ni, no)
    # build side carries the value as a secondary sort key (cheap at
    # build size; required by the gather probe's exact max-val on
    # duplicate runs -- skipped under unique_build, where no runs exist
    # and the declaration is runtime-validated into build_counts[2])
    bhk, bval = _merge_sort_side(
        hashed_key(inner_keys, plan.factor), inner_vals, rows_total * 128,
        num_keys=1 if plan.unique_build else 2,
    )
    ohk_s, ov_s = _merge_sort_probe(
        hashed_key(outer_keys, plan.factor), outer_vals, cap,
        max(1, plan.probe_chunks),
    )
    if plan.window_wide:
        wcap = plan.wide_cap or max(8, cap // tile // 16)
        wrow, overflow, wide = _merge_windows(
            bhk, ohk_s, tile, window, rows_total,
            window_wide=plan.window_wide, wide_cap=wcap,
        )
    else:
        wrow, overflow = _merge_windows(bhk, ohk_s, tile, window,
                                        rows_total)
        wide = None
    return _merge_probe(bhk, bval, ohk_s, ov_s, wrow, overflow, plan,
                        tile, window, rows_total, wide=wide)


@functools.lru_cache(maxsize=32)
def _staged_fns(plan: JoinPlan, tile: int, window: int, rows_total: int):
    """Stage jits cached per (plan, geometry) so repeated staged runs
    don't recompile (fresh jit objects would)."""
    f = plan.factor
    chunks = max(1, plan.probe_chunks)

    def _sort(k, v, p, build=False):
        # the build side is value-secondary ordered (unless the plan
        # declares unique keys) and never chunked; the probe side
        # follows the plan's chunking
        if build:
            return _merge_sort_side(
                hashed_key(k, f), v, p,
                1 if plan.unique_build else 2,
            )
        return _merge_sort_probe(hashed_key(k, f), v, p, chunks)

    sort_side = jax.jit(_sort, static_argnums=(2, 3))
    if plan.window_wide:
        # the staged pipeline threads the two-class artifacts from the
        # windows stage into the probe stage as explicit values
        def _win2(b, o, n_tiles):
            wcap = plan.wide_cap or max(8, n_tiles // 16)
            return _merge_windows(b, o, tile, window, rows_total,
                                  window_wide=plan.window_wide,
                                  wide_cap=wcap)

        windows = jax.jit(_win2, static_argnums=(2,))
        probe = jax.jit(
            lambda bhk, bval, ohk, ov, wrow, overflow, wide:
            _merge_probe(bhk, bval, ohk, ov, wrow, overflow, plan,
                         tile, window, rows_total, wide=wide)
        )
    else:
        windows = jax.jit(
            lambda b, o: _merge_windows(b, o, tile, window, rows_total)
        )
        probe = jax.jit(
            lambda *a: _merge_probe(*a, plan, tile, window, rows_total)
        )
    return sort_side, windows, probe


def phj_join_merge_staged(inner_keys, inner_vals, outer_keys, outer_vals,
                          plan: JoinPlan, timer) -> JoinResult:
    """The merge pipeline as four separately-jitted, separately-timed
    stages (partition_build / partition_probe / windows / probe) -- the
    TIMELOG analog (phj.cpp:1712-1927): phase boundaries land in
    timer.timeline, per-phase seconds in timer.phases.  Slightly slower
    than the fused `phj_join_merge` (stage boundaries materialize to HBM,
    which the fused jit would do anyway for the sort outputs)."""
    ni, no = len(inner_keys), len(outer_keys)
    tile, window, rows_total, cap = _merge_params(plan, ni, no)
    sort_side, windows, probe = _staged_fns(plan, tile, window, rows_total)
    bhk, bval = timer.run("partition_build", sort_side, inner_keys,
                          inner_vals, rows_total * 128, True)
    ohk_s, ov_s = timer.run("partition_probe", sort_side, outer_keys,
                            outer_vals, cap)
    if plan.window_wide:
        wrow, overflow, wide = timer.run("windows", windows, bhk, ohk_s,
                                         cap // tile)
        return timer.run("probe", probe, bhk, bval, ohk_s, ov_s, wrow,
                         overflow, wide)
    wrow, overflow = timer.run("windows", windows, bhk, ohk_s)
    return timer.run("probe", probe, bhk, bval, ohk_s, ov_s, wrow, overflow)


@functools.partial(jax.jit, static_argnames=("plan",))
def _phj_join_padded(
    inner_keys: jnp.ndarray,
    inner_vals: jnp.ndarray,
    outer_keys: jnp.ndarray,
    outer_vals: jnp.ndarray,
    plan: JoinPlan,
) -> JoinResult:
    P = plan.num_partitions
    if plan.partition_impl == "radix":
        return _phj_join_padded_radix(inner_keys, inner_vals, outer_keys,
                                      outer_vals, plan)
    # PAD_KEY (0) is the reserved null key: tuples carrying it are padding
    # from upstream stages (exchange buckets, padded layouts) and are dropped
    # on both sides by routing them to the out-of-range partition.
    # build side: partition + dense pack (K1/K3 analog)
    build_table = (
        build_dense_table_sort_jnp
        if plan.partition_impl == "sort"
        else build_dense_table_jnp
    )
    partition = (
        partition_padded_sort_jnp
        if plan.partition_impl == "sort"
        else partition_padded_jnp
    )
    # The engine runs on SCRAMBLED keys: hk = key * factor is a bijection on
    # u32 (odd factor), equality-preserving and pid-extractable by shift, so
    # sorts carry one fewer payload column and keys are recovered at the end
    # with one multiply by the modular inverse.  hk == 0 iff key == 0, so the
    # null-key convention carries over unchanged.
    ihk = hashed_key(inner_keys, plan.factor)
    ohk = hashed_key(outer_keys, plan.factor)
    from ..ops.partition import pids_from_hk

    ipid = pids_from_hk(ihk, plan.p_bits, plan.skip_bits, null_pid=P)
    tk, tv, bcounts = build_table(ihk, inner_vals, ipid, P, plan.slots)
    # probe side: partition into the padded layout (K6/K7/K9 analog)
    opid = pids_from_hk(ohk, plan.p_bits, plan.skip_bits, null_pid=P)
    pk, pv, offsets, _ = partition(ohk, outer_vals, opid, P, plan.tile)
    n_tiles = pk.shape[0] // plan.tile
    tpid = tile_pids(offsets, n_tiles, plan.tile)
    # probe (K2/K4 analog): Pallas kernel on TPU, jnp oracle elsewhere
    probe_impl = plan.probe_impl
    if probe_impl == "auto":
        probe_impl = "pallas" if _on_tpu() else "jnp"
    if probe_impl == "pallas":
        mv, mc = probe_tiles_pallas(pk, tk, tv, tpid, plan.tile)
    else:
        mv, mc = probe_tiles_jnp(
            pk, tk, tv, bcounts, tpid, plan.tile, group=PROBE_TILE_GROUP
        )
    # unscramble probe keys for the output contract (one elementwise pass)
    inv = jnp.uint32(mod_inverse_u32(plan.factor))
    return JoinResult(pk * inv, pv, mv, mc, bcounts)


def _phj_join_padded_radix(inner_keys, inner_vals, outer_keys, outer_vals,
                           plan: JoinPlan):
    """Padded PHJ with the Pallas MULTI-PASS radix partitioner: the
    faithful translation of the reference's local pass loop
    (phj.cpp:1791-1863), consuming `plan.pass_bits` pass by pass.

    Both relations go through multipass_partition (histogram + VMEM-
    staged scatter per pass); the build regions ARE the dense table
    (zero-interleaved, every probe masks null keys), the probe regions
    feed the standard tile probe with a 128-slot tile (region capacity
    is always a 128 multiple).  Kept for parity and bounded-fanout
    regimes; PERF_NOTES.md records why partition-as-sort beats it for
    full-depth single-chip partitioning.

    build_counts carries P+1 entries: per-partition counts plus the
    summed pass overflow flag as the LAST entry (overflows are values).
    """
    from ..ops.radix_partition_pallas import multipass_partition

    P = plan.num_partitions
    assert sum(plan.pass_bits) == plan.p_bits, (
        "radix mode consumes pass_bits; their sum must equal p_bits"
    )
    interp = not _on_tpu()
    ihk = hashed_key(inner_keys, plan.factor)
    ohk = hashed_key(outer_keys, plan.factor)
    tk, tv, bcounts, bovf = multipass_partition(
        ihk, inner_vals, plan.pass_bits, plan.skip_bits, interpret=interp
    )
    slots = tk.shape[0] // P
    pk, pv, ocounts, oovf = multipass_partition(
        ohk, outer_vals, plan.pass_bits, plan.skip_bits, interpret=interp
    )
    ocap = pk.shape[0] // P
    n_tiles = pk.shape[0] // 128
    offsets = jnp.arange(P + 1, dtype=jnp.int32) * ocap
    tpid = tile_pids(offsets, n_tiles, 128)
    probe_impl = plan.probe_impl
    if probe_impl == "auto":
        probe_impl = "pallas" if _on_tpu() else "jnp"
    if probe_impl == "pallas":
        mv, mc = probe_tiles_pallas(pk, tk.reshape(P, slots),
                                    tv.reshape(P, slots), tpid, 128)
    else:
        group = 8 if n_tiles % 8 == 0 else 1
        mv, mc = probe_tiles_jnp(
            pk, tk.reshape(P, slots), tv.reshape(P, slots),
            jnp.full(P, slots, jnp.int32), tpid, 128, group=group,
        )
    inv = jnp.uint32(mod_inverse_u32(plan.factor))
    counts_plus = jnp.concatenate(
        [bcounts.astype(jnp.int32), (bovf + oovf)[None].astype(jnp.int32)]
    )
    return JoinResult(pk * inv, pv, mv, mc, counts_plus)


def downgrade_plan_opts(plan: JoinPlan) -> JoinPlan:
    """Re-plan response to a counted plan-optimization violation
    (build_counts[2] in merge mode): drop EVERY opportunistic flag --
    rowbase select (span exceeded its K-slice), unique_build (duplicate
    build keys found), and the two-class window split (more wide tiles
    than wide_cap: the single-class window_wide geometry is the
    unconditionally-exact form).  Geometry is untouched (the two-class
    collapse keeps the same tile/chunks and widens only the window), so
    spill fingerprints and chunk layouts stay valid.  Shared by every
    merge-mode retry loop."""
    kw = {}
    if plan.window_wide:
        kw = dict(window=plan.window_wide, window_wide=0, wide_cap=0)
    return dataclasses.replace(plan, gather_select="flat",
                               unique_build=False, **kw)


def window_from_span(span: int) -> int:
    """Padded window (slots, 128-aligned) for a MEASURED max span:
    25% slack plus a 384-slot floor pad absorbs chunk-to-chunk span
    jitter without a further retry.  Shared by every re-planner
    (`replan_from_span`, the streaming join's window-only retry) so the
    margin policy lives in exactly one place.  NOT clamped -- callers
    compare against their own geometry cap and decide (shrink tile,
    shrink chunks, or raise)."""
    return -(-int(max(span, 128) * 1.25 + 384) // 128) * 128


def replan_window_cap(tile: int = 3072) -> int:
    """Largest auto/re-planned window (slots) any driver may compile at
    this tile.  The scoped-vmem compile budget is rows x chunks
    (GATHER_ROWCHUNK_BUDGET = 24 x 121, measured at tile 3072); the
    gather kernel's lane cap bounds chunks at GATHER_MAX_CHUNKS
    regardless of tile.  Both caps take a 3-chunk safety step below the
    boundary (121 chunks sat exactly at the measured crash line) --
    one chunk past either cap crashes the remote compile helper or
    silently drops to the pathological dense sweep."""
    rows = max(1, tile // 128)
    chunks = min(GATHER_MAX_CHUNKS, GATHER_ROWCHUNK_BUDGET // rows)
    return max(3, chunks - 3) * 128


def replan_from_span(plan: JoinPlan, span: int) -> JoinPlan:
    """Next plan after a merge-probe window overflow, sized from the
    MEASURED max required span (build_counts[1]) instead of blind
    doubling (NEXT.md #5).

    Spans scale ~linearly with the PRODUCT tile * probe_chunks (a tile
    covers tile/chunk_len of each chunk's key range), while the sort
    cost depends only on the chunk count -- so when even a padded span
    busts the gather cap, the re-planner shrinks the TILE first, keeping
    probe_chunks at its sort-optimal value (C=21 vs C=64 costs ~+0.25 s
    of batched-sort time at 256M rows).  Tiles below 512 would pay
    per-grid-step overheads instead, so past that the chunk count
    shrinks as before.  The re-derived window must land STRICTLY under
    the cap (one chunk past it silently drops to the dense sweep,
    pathological at these widths).  Shared by the single-chip `join` and
    the distributed `cpra_join` re-planners."""
    if plan.window_wide:
        # a WINDOW overflow under two-class means even the wide width
        # missed a span: collapse to single-class first (the narrow
        # split was sized from stale span data), then re-derive
        plan = dataclasses.replace(plan, window=plan.window_wide,
                                   window_wide=0, wide_cap=0)
    GATHER_CAP = replan_window_cap(plan.tile)
    span = max(int(span), 128)
    C = max(1, plan.probe_chunks)
    want = window_from_span(span)
    if want > GATHER_CAP:
        # spans scale with tile * C at ANY C (at C == 1 a tile still
        # covers tile/cap of the key range), so the tile shrink applies
        # to unchunked plans too -- an uncapped C == 1 window would
        # compile past the scoped-vmem ceiling
        product = plan.tile * C
        # largest tile*C whose padded span stays strictly under the cap
        prod_fit = int(product * (GATHER_CAP - 511) / (1.25 * span))
        tile_new = max(128, prod_fit // C // 128 * 128)
        if tile_new >= 512:
            span_est = span * tile_new * C / product
            want = min(replan_window_cap(tile_new),
                       window_from_span(span_est))
            return dataclasses.replace(plan, tile=tile_new, window=want)
        newC = max(1, int(C * (GATHER_CAP - 511) / (1.25 * span)))
        want = min(GATHER_CAP, window_from_span(span * newC / C))
        return dataclasses.replace(plan, probe_chunks=newC, window=want)
    return dataclasses.replace(plan, window=want)


def join(
    inner_keys, inner_vals, outer_keys, outer_vals,
    plan: JoinPlan | None = None, window_retries: int = 3,
) -> tuple[JoinResult, JoinPlan]:
    """Join with automatic window re-planning.

    The auto window is sized for hash-uniform probe densities; skewed
    probe distributions (Zipf outer) can have tiles whose build-side
    span exceeds it.  Overflow is counted by the engine (never silent),
    and this wrapper re-plans from the MEASURED max span
    (replan_from_span: window from the span with margin, shrinking the
    tile when even that busts the gather cap) until clean.  Plan-opt
    violations (rowbase select slice miss / unique_build duplicates,
    build_counts[2]) downgrade to the unconditionally-exact flags with
    geometry unchanged (downgrade_plan_opts).
    """
    if plan is None:
        plan = plan_join(len(inner_keys), len(outer_keys))
    args = (
        jnp.asarray(inner_keys),
        jnp.asarray(inner_vals),
        jnp.asarray(outer_keys),
        jnp.asarray(outer_vals),
    )
    res = phj_join(*args, plan)
    if plan.probe_impl.startswith("merge"):
        for _ in range(window_retries):
            bc = res.build_counts
            sel_ovf = int(bc[2]) if bc.shape[0] > 2 else 0
            win_ovf = int(bc[0])
            if win_ovf == 0 and sel_ovf == 0:
                break
            span = int(bc[1])
            res = None  # free the failed attempt's buffers before retrying
            if sel_ovf:
                # a counted plan-optimization violation (rowbase K-slice
                # miss or unique_build duplicates): results cannot be
                # trusted; downgrade to the unconditionally-exact flags
                # (the explicit downgraded plan beats any env override,
                # see _gather_select)
                plan = downgrade_plan_opts(plan)
            if win_ovf:
                plan = replan_from_span(plan, span)
            res = phj_join(*args, plan)
        else:
            bc = res.build_counts
            if int(bc[0]) != 0 or (bc.shape[0] > 2 and int(bc[2]) != 0):
                raise RuntimeError(
                    "probe window overflow persists after re-planning"
                )
    else:
        # padded/radix overflow cannot be window-re-planned and must not
        # pass silently through this convenience wrapper: dropped tuples
        # are corruption, not a result (callers wanting the raw overflow
        # VALUE use phj_join directly)
        bc = np.asarray(res.build_counts)
        over = (int(bc[-1]) != 0 if plan.partition_impl == "radix"
                else bool((bc > plan.slots).any()))
        if over:
            raise RuntimeError(
                "local join overflow on the padded path (table slots or "
                "radix pass capacity exceeded): raise plan.slots or the "
                "pass fanout -- window re-planning cannot fix this"
            )
    return res, plan


def materialize(res: JoinResult) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact matched rows to (keys, vals, tabs) host arrays.

    Requires match counts <= 1 (unique build keys); for duplicate-key
    builds use materialize_expanded.  Host-side compaction: the aligned
    device result is the deliverable, this is the close_gaps-equivalent
    final packing.
    """
    mc = np.asarray(res.match_cnts)
    if mc.max(initial=0) > 1:
        raise ValueError(
            "multi-match rows present; use materialize_expanded"
        )
    m = mc == 1
    return (
        np.asarray(res.probe_keys)[m],
        np.asarray(res.probe_vals)[m],
        np.asarray(res.match_vals)[m],
    )


def materialize_expanded(res: JoinResult, inner_keys, inner_vals,
                         block_rows: int = 0):
    """Full M:N materialization: every (probe row, matching build row)
    pair, for builds with duplicate keys.

    The aligned result carries per-probe match COUNTS (exact even for
    M:N); the cross-product rows are produced by the expansion op
    (ops/expand.py) over the matched probe rows vs the build relation.
    Returns (keys, vals, tabs) host arrays of exactly sum(match_cnts)
    rows.

    block_rows > 0 streams the expansion through fixed-size device
    blocks instead of one total-sized buffer: matched probe rows are
    grouped so each block's output fits `block_rows` (auto-raised to the
    largest single-row multiplicity), every block reuses ONE compiled
    expansion (fixed shapes), and outputs concatenate host-side -- the
    out-of-core form for expansions larger than device memory.
    """
    from ..ops.expand import expand_join

    mc = np.asarray(res.match_cnts).reshape(-1)
    total = int(mc.astype(np.int64).sum())
    if total == 0:
        e = np.zeros(0, np.uint32)
        return e, e.copy(), e.copy()
    m = mc > 0
    pk_np = np.asarray(res.probe_keys).reshape(-1)[m]
    pv_np = np.asarray(res.probe_vals).reshape(-1)[m]
    ik = jnp.asarray(inner_keys)
    iv = jnp.asarray(inner_vals)
    if not block_rows or total <= block_rows:
        cap = -(-total // 128) * 128
        got, out_k, out_v, out_t = expand_join(
            ik, iv, jnp.asarray(pk_np), jnp.asarray(pv_np), cap
        )
        assert int(got) == total, (int(got), total)
        return (
            np.asarray(out_k)[:total],
            np.asarray(out_v)[:total],
            np.asarray(out_t)[:total],
        )
    counts = mc[m].astype(np.int64)
    block_rows = max(block_rows, int(counts.max()))
    cap = -(-block_rows // 128) * 128
    # greedy block split (shared with the streamed device-side M:N
    # aggregate): consecutive matched rows until the block's output
    # would exceed block_rows
    from ..ops.expand import greedy_blocks

    outs_k, outs_v, outs_t = [], [], []
    for start, stop, blk_total in greedy_blocks(counts, block_rows):
        n_rows = stop - start
        # pad the probe block to the block row capacity: one compiled
        # expansion serves every block
        pk_b = np.zeros(cap, np.uint32)
        pv_b = np.zeros(cap, np.uint32)
        pk_b[:n_rows] = pk_np[start:stop]
        pv_b[:n_rows] = pv_np[start:stop]
        got, out_k, out_v, out_t = expand_join(
            ik, iv, jnp.asarray(pk_b), jnp.asarray(pv_b), cap
        )
        assert int(got) == blk_total, (int(got), blk_total)
        outs_k.append(np.asarray(out_k)[:blk_total])
        outs_v.append(np.asarray(out_v)[:blk_total])
        outs_t.append(np.asarray(out_t)[:blk_total])
    return (
        np.concatenate(outs_k),
        np.concatenate(outs_v),
        np.concatenate(outs_t),
    )
