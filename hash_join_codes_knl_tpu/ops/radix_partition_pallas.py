"""Pallas radix-partition pass: on-chip histogram + scatter pipeline.

The TPU re-architecture of the reference's radix partition pass
(histogram phj.cpp:693-772 + scatter with write-combining buffers
phj.cpp:1029-1231 + interleave offsets phj.cpp:1263-1291), built from the
primitives this hardware actually has:

- **local grouping**: tiles are key-grouped by a batched row sort (XLA
  `lax.sort` over a (n_tiles, tile) view).  TPU has no vector scatter or
  compaction primitive, so any in-register grouping costs O(log^2 tile)
  per element -- the same asymptotics XLA's sort already achieves.
- **histogram (K6)**: per-(tile, partition) counts via vmapped
  searchsorted over the grouped tiles -- the reference's 16-replica
  counter trick becomes "counts are free once tiles are grouped".
- **interleave (K9)**: exact destination offsets from one exclusive scan
  over the (n_tiles, F) histogram along the tile axis, rows rounded to
  the 128-lane quantum.
- **scatter (K7)**: the Pallas kernel below.  Each grid step gathers its
  tile's runs into 128-lane-aligned staging rows in VMEM (gather-based --
  per staging row the 128 source elements are consecutive, so two
  row-gathers plus one lane rotation realize the general shuffle), pads
  run tails with the null key, and DMAs each run block to its exact HBM
  row offset.  Dynamic-offset DMAs are the TPU's scatter engine; the VMEM
  staging buffer is the analog of the reference's software
  write-combining buffers (BUFFER_SIZE, phj.cpp:45).

Output layout: F partition-contiguous regions of `cap` slots each,
null-key (0) padded between run tails and beyond each partition's fill --
the zero-masking convention every downstream consumer already applies.

Overflow (region fill or per-tile run bound exceeded) is detected and
returned as a value, never silent; callers retry with a larger cap.

Measured (v5e, 256M tuples, 64-way): 493 ms/pass, zero overflow --
~2.7x faster per pass than the full-depth global sort (1.31 s), but the
merge-mode engine needs ~2^17-way clustering, and three 6-bit passes
(~1.5 s) lose to one global sort; the per-pass floor is the batched tile
sort, which XLA already runs at vector-ALU speed.  So the headline
keeps partition-as-sort, and this op serves bounded-fanout partitioning
(CPRA's fixed 4096-way pass, exchange bucketing, spill partitioning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(T_rows: int, F: int, mrr: int):
    """Grid step: stage one grouped tile's runs and DMA them to HBM.

    Control tables (starts/cnt (n_tiles, F) element offsets and run
    lengths within the sorted tile; dst (n_tiles, F) destination row or
    -1 = empty run / -2 = overflow) live in HBM -- at scale they exceed
    SMEM, so each grid step DMAs its own row into SMEM scratch.
    """

    def kernel(starts_hbm, cnt_hbm, dst_hbm, hk_ref, val_ref, zk_ref,
               zv_ref, out_hk, out_val, ovf_ref, s_sm, c_sm, d_sm,
               tkbuf, tvbuf, khbuf, vbuf, sems, ctl_sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ovf_ref[0] = 0

        cs = pltpu.make_async_copy(starts_hbm.at[i], s_sm, ctl_sems.at[0])
        cc = pltpu.make_async_copy(cnt_hbm.at[i], c_sm, ctl_sems.at[1])
        cd = pltpu.make_async_copy(dst_hbm.at[i], d_sm, ctl_sems.at[2])
        cs.start()
        cc.start()
        cd.start()

        # copy the tile into a zero-padded scratch so per-run dynamic row
        # slices of mrr+1 rows never run off the end
        tkbuf[0:T_rows] = hk_ref[0]
        tvbuf[0:T_rows] = val_ref[0]
        tkbuf[T_rows:] = jnp.zeros((mrr + 1, 128), jnp.uint32)
        tvbuf[T_rows:] = jnp.zeros((mrr + 1, 128), jnp.uint32)
        cs.wait()
        cc.wait()
        cd.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (mrr, 128), 1)
        roff = jax.lax.broadcasted_iota(jnp.int32, (mrr, 128), 0) * 128

        # per run: staging row r pulls the 128 CONSECUTIVE source elements
        # starting at starts[j] + 128*r.  A dynamic row slice anchored at
        # the run's first row plus one lane rotation (split across the row
        # boundary) realize the shuffle -- sublane dynamic gathers span at
        # most one vreg on TPU, so the row selection must be a ref slice,
        # not a gather.
        for j in range(F):
            s = s_sm[j]
            c = c_sm[j]
            b0 = s >> 7
            c0 = s & 127
            ks = tkbuf[pl.ds(b0, mrr + 1), :]
            vs = tvbuf[pl.ds(b0, mrr + 1), :]
            idx = (c0 + lane) & 127
            wrap = lane >= (128 - c0)
            valid = (roff + lane) < c
            g_k = jnp.where(
                wrap,
                jnp.take_along_axis(ks[1 : mrr + 1], idx, axis=1),
                jnp.take_along_axis(ks[0:mrr], idx, axis=1),
            )
            g_v = jnp.where(
                wrap,
                jnp.take_along_axis(vs[1 : mrr + 1], idx, axis=1),
                jnp.take_along_axis(vs[0:mrr], idx, axis=1),
            )
            khbuf[j * mrr : (j + 1) * mrr] = jnp.where(
                valid, g_k, jnp.uint32(0)
            )
            vbuf[j * mrr : (j + 1) * mrr] = jnp.where(
                valid, g_v, jnp.uint32(0)
            )

        for j in range(F):
            dst = d_sm[j]

            @pl.when(dst >= 0)
            def _(j=j):
                row0 = j * mrr
                ck = pltpu.make_async_copy(
                    khbuf.at[pl.ds(row0, mrr)],
                    out_hk.at[pl.ds(dst, mrr)],
                    sems.at[0],
                )
                cv = pltpu.make_async_copy(
                    vbuf.at[pl.ds(row0, mrr)],
                    out_val.at[pl.ds(dst, mrr)],
                    sems.at[1],
                )
                ck.start()
                cv.start()
                ck.wait()
                cv.wait()

            @pl.when(dst == -2)
            def _():
                ovf_ref[0] = 1

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bits", "skip_bits", "cap", "tile", "interpret")
)
def radix_partition_pallas(
    hk: jnp.ndarray,  # (n,) scrambled keys; 0 = null/pad (dropped)
    vals: jnp.ndarray,  # (n,)
    bits: int,  # fanout F = 2^bits
    skip_bits: int = 0,  # hash bits already consumed upstream
    cap: int = 0,  # per-partition capacity in tuples (0 = auto), mult of 128
    tile: int = 32768,  # grid tile (elements)
    interpret: bool = False,
):
    """One radix-partition pass by hash bits [31-skip, 31-skip-bits].

    Returns (out_hk, out_val, counts, overflow): out_* are (F * cap,)
    partition-contiguous zero-padded regions, counts (F,) exact
    per-partition tuple counts, overflow != 0 means cap or the per-tile
    run bound was exceeded (output partial; retry with larger cap).
    """
    F = 1 << bits
    n = hk.shape[0]
    if n == 0:
        # an empty input means an empty grid: the kernel never runs, and
        # the overflow output (no aliased init) would come back as
        # uninitialized memory -- a caller's cap-retry loop could spin
        # on phantom overflow.  Static-shape early exit instead.
        capz = -(-max(cap, 128) // 128) * 128
        z = jnp.zeros(F * capz, jnp.uint32)
        return z, z, jnp.zeros(F, jnp.int32), jnp.zeros((), jnp.int32)
    tile = min(tile, max(128 * F, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    n_tiles = n_pad // tile
    T_rows = tile // 128
    # staging: whole rows per run; mean run = tile/F elements
    mrr = min(T_rows, int((4 * (tile / F)) // 128) + 2)
    if cap == 0:
        mean = n / F
        # mean + Poisson tail + per-tile 128-row round-up pads
        cap = int(mean + 8 * (mean ** 0.5)) + 128 * n_tiles
    cap = -(-cap // 128) * 128 + mrr * 128  # slack so zero-tails stay inside
    cap_rows = cap // 128

    hk_p = jnp.concatenate([hk, jnp.zeros(n_pad - n, jnp.uint32)])
    v_p = jnp.concatenate([vals, jnp.zeros(n_pad - n, jnp.uint32)])
    # rotate so this pass's bits are the top bits: rotation is a bijection,
    # so rot == 0 iff hk == 0 and null keys group first, never colliding
    # with real tuples
    if skip_bits:
        sk = jnp.uint32(skip_bits)
        rot = (hk_p << sk) | (hk_p >> (jnp.uint32(32) - sk))
    else:
        rot = hk_p
    # local grouping: batched row sort (see module docstring)
    rot2, v2 = jax.lax.sort(
        (rot.reshape(n_tiles, tile), v_p.reshape(n_tiles, tile)), num_keys=1
    )
    # histogram (K6): run boundaries per (tile, partition); bound 0 is 1 so
    # null keys (rot == 0) fall before every partition
    bounds = jnp.arange(F, dtype=jnp.uint32) << jnp.uint32(32 - bits)
    bounds = jnp.maximum(bounds, jnp.uint32(1))
    starts = jax.vmap(lambda row: jnp.searchsorted(row, bounds))(rot2)
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((n_tiles, 1), tile, starts.dtype)], axis=1
    )
    cnt = (ends - starts).astype(jnp.int32)  # (n_tiles, F)
    counts = jnp.sum(cnt, axis=0)
    run_rows = -(-cnt // 128)
    # interleave (K9): exact destination rows per (tile, partition)
    fill_rows = jnp.cumsum(run_rows, axis=0) - run_rows  # exclusive, per F
    dst_rows = fill_rows + jnp.arange(F, dtype=jnp.int32)[None, :] * cap_rows
    bad = (fill_rows + mrr > cap_rows) | (run_rows > mrr)
    dst = jnp.where(cnt == 0, -1, jnp.where(bad, -2, dst_rows))
    dst = dst.astype(jnp.int32)  # (n_tiles, F)

    # control tables DMA to SMEM by row: the minor dim must be 128-aligned
    Fp = -(-F // 128) * 128

    def padF(x):
        return jnp.pad(x, ((0, 0), (0, Fp - F)), constant_values=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            # control tables stay in HBM (they exceed SMEM at scale);
            # the kernel DMAs one row per grid step into SMEM scratch
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, T_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((Fp,), jnp.int32),
            pltpu.SMEM((Fp,), jnp.int32),
            pltpu.SMEM((Fp,), jnp.int32),
            pltpu.VMEM((T_rows + mrr + 1, 128), jnp.uint32),
            pltpu.VMEM((T_rows + mrr + 1, 128), jnp.uint32),
            pltpu.VMEM((F * mrr, 128), jnp.uint32),
            pltpu.VMEM((F * mrr, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_hk, out_val, ovf = pl.pallas_call(
        _scatter_kernel(T_rows, F, mrr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F * cap_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((F * cap_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        padF(starts.astype(jnp.int32)),
        padF(cnt),
        padF(dst),
        rot2.reshape(n_tiles, T_rows, 128),
        v2.reshape(n_tiles, T_rows, 128),
        jnp.zeros((F * cap_rows, 128), jnp.uint32),
        jnp.zeros((F * cap_rows, 128), jnp.uint32),
    )
    # un-rotate the keys back to hk (rotation is a bijection fixing 0,
    # so null pads stay null with no special case)
    flat_k = out_hk.reshape(-1)
    if skip_bits:
        sk = jnp.uint32(skip_bits)
        flat_k = (flat_k >> sk) | (flat_k << (jnp.uint32(32) - sk))
    return flat_k, out_val.reshape(-1), counts, ovf[0]


def multipass_partition(
    hk: jnp.ndarray,
    vals: jnp.ndarray,
    pass_bits: tuple,
    skip_bits: int = 0,
    tile: int = 32768,
    interpret: bool = False,
):
    """Compose radix passes into a full partitioning (the reference's
    local multi-pass loop, phj.cpp:1791-1863: pass k+1 runs once per
    pass-k sub-partition).

    Returns (out_hk, out_vals, counts, overflow): out_* are
    2^sum(pass_bits) partition-contiguous regions of equal capacity
    (out.shape[0] / P), zero-interleaved (run tails pad with the null
    key, as all padded layouts here do); counts are exact per final
    partition; overflow != 0 means some pass exceeded a region capacity
    or run bound (retry with a larger tile/cap).

    The per-region calls of later passes are unrolled into the trace,
    exactly as the reference unrolls its sub-partition loop across
    thread time; the unroll is capped to keep compile time sane --
    measured on v5e the single-pass bounded-fanout regime is the only
    one that beats the fused sort anyway (module docstring).
    """
    calls = 1
    for b in pass_bits[:-1]:
        calls *= 1 << b
    if calls > 64:
        raise ValueError(
            f"multipass unroll of {calls} region calls exceeds the "
            "compile-time cap (64); use fewer/larger leading passes"
        )
    k, v, counts, ovf = radix_partition_pallas(
        hk, vals, pass_bits[0], skip_bits=skip_bits, tile=tile,
        interpret=interpret,
    )
    skip = skip_bits + pass_bits[0]
    for b in pass_bits[1:]:
        F_prev = counts.shape[0]
        cap_prev = k.shape[0] // F_prev
        ks, vs, cs, os_ = [], [], [], []
        for r in range(F_prev):
            rk = jax.lax.dynamic_slice(k, (r * cap_prev,), (cap_prev,))
            rv = jax.lax.dynamic_slice(v, (r * cap_prev,), (cap_prev,))
            k2, v2, c2, o2 = radix_partition_pallas(
                rk, rv, b, skip_bits=skip, tile=tile, interpret=interpret
            )
            ks.append(k2)
            vs.append(v2)
            cs.append(c2)
            os_.append(o2)
        k = jnp.concatenate(ks)
        v = jnp.concatenate(vs)
        counts = jnp.concatenate(cs)
        ovf = ovf + sum(os_)
        skip += b
    return k, v, counts, ovf


def radix_partition_oracle(hk, vals, bits, skip_bits=0):
    """numpy oracle of the layout contract: per-partition multisets of
    (hk, val) pairs, null keys dropped."""
    hk = np.asarray(hk)
    vals = np.asarray(vals)
    F = 1 << bits
    live = hk != 0
    if skip_bits:
        rot = (hk << np.uint32(skip_bits)) | (hk >> np.uint32(32 - skip_bits))
    else:
        rot = hk
    pid = (rot >> np.uint32(32 - bits)).astype(np.int64)
    out = []
    for p in range(F):
        m = live & (pid == p)
        out.append((hk[m], vals[m]))
    return out
