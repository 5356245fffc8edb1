"""Pallas probe kernel: K2/K4 redesigned for the VPU.

One grid step = one probe tile (quantum-aligned, so it touches exactly one
build partition).  The partition's packed table row is selected by a
scalar-prefetched tile->partition map feeding the BlockSpec index_map --
Pallas' pipelining prefetches the next tile's row while the current tile
computes, and consecutive tiles of the same partition re-use the resident
block (tile_pid is non-decreasing in the padded layout).

Where the reference probe gathers 16 bucket chains at a time and refills
finished lanes (npj.cpp:249-318), the TPU kernel compares the whole tile
against the whole partition row as a dense (slots x 128) equality sweep per
probe sub-row: probes live on lanes, table slots on sublanes (the table is
stored pre-transposed as (P, S, 1)), so both broadcasts are native and no
vector relayout is ever needed -- Mosaic cannot lower lane<->sublane
reshapes, which rules out the naive (tile, slots) orientation.

Match payload extraction is an exact order-preserving biased-i32 max
(Mosaic has no unsigned reductions); duplicate matches surface through
match_cnt and take the expansion path (ops/expand.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = -(2**31)


def _probe_kernel(tile_pid_ref, probe_ref, tkeys_ref, tvals_ref,
                  mval_ref, mcnt_ref):
    # probe_ref: (1, R, 128); tkeys/tvals_ref: (1, C, 128) where C = S/128;
    # outs: (1, R, 128).  HBM arrays keep 128-multiple trailing dims (thin
    # trailing dims get 128x-padded tiled layouts in HBM); the
    # slots-on-sublanes orientation is produced by an in-kernel transpose.
    r_rows = probe_ref.shape[1]
    chunks = tkeys_ref.shape[1]
    bias = jnp.int32(_BIAS)
    tkT = jnp.transpose(tkeys_ref[0], (1, 0))  # (128, C): slots on sublanes
    tvT = jnp.transpose(
        pltpu.bitcast(tvals_ref[0], jnp.int32) ^ bias, (1, 0)
    )
    for r in range(r_rows):
        ok = probe_ref[0, r : r + 1, :]  # (1, 128) -- probes on lanes
        live = ok != 0
        mx = jnp.full((1, 128), bias, jnp.int32)
        cnt = jnp.zeros((1, 128), jnp.int32)
        for c in range(chunks):
            eq = (tkT[:, c : c + 1] == ok) & live  # (128, 128)
            mx = jnp.maximum(
                mx,
                jnp.max(jnp.where(eq, tvT[:, c : c + 1], bias), axis=0,
                        keepdims=True),
            )
            cnt = cnt + jnp.sum(eq.astype(jnp.int32), axis=0, keepdims=True)
        mval_ref[0, r : r + 1, :] = jnp.where(
            cnt > 0, pltpu.bitcast(mx ^ bias, jnp.uint32), jnp.uint32(0)
        )
        mcnt_ref[0, r : r + 1, :] = cnt


# Tiles per pallas_call: bounds the scalar-prefetch tile->pid map (SMEM is
# ~1 MB; 32K tiles = 128 KB).  Larger probe sides run the same kernel over
# equal chunks via lax.map.
MAX_TILES_PER_CALL = 32768


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def probe_tiles_pallas(
    probe_keys: jnp.ndarray,  # (cap,) padded partition layout
    table_keys: jnp.ndarray,  # (P, S)
    table_vals: jnp.ndarray,  # (P, S)
    tile_pid: jnp.ndarray,  # (n_tiles,) int32, non-decreasing
    tile: int,
    interpret: bool = False,
):
    cap = probe_keys.shape[0]
    n_tiles = cap // tile
    P, slots = table_keys.shape
    assert tile % 128 == 0 and slots % 128 == 0, (tile, slots)
    r_rows = tile // 128
    chunks = slots // 128
    probe3d = probe_keys.reshape(n_tiles, r_rows, 128)
    tk3 = table_keys.reshape(P, chunks, 128)
    tv3 = table_vals.reshape(P, chunks, 128)

    if n_tiles > MAX_TILES_PER_CALL:
        ct = MAX_TILES_PER_CALL
        n_chunks = -(-n_tiles // ct)
        pad_tiles = n_chunks * ct - n_tiles
        if pad_tiles:
            probe3d = jnp.concatenate(
                [probe3d, jnp.zeros((pad_tiles, r_rows, 128), jnp.uint32)]
            )
            tile_pid = jnp.concatenate(
                [tile_pid, jnp.zeros(pad_tiles, jnp.int32)]
            )
        pc = probe3d.reshape(n_chunks, ct, r_rows, 128)
        tpc = tile_pid.reshape(n_chunks, ct)

        def one(args):
            p, tp = args
            return _probe_call(p, tk3, tv3, tp, r_rows, chunks, interpret)

        mv, mc = jax.lax.map(one, (pc, tpc))
        mv = mv.reshape(n_chunks * ct, r_rows, 128)[:n_tiles]
        mc = mc.reshape(n_chunks * ct, r_rows, 128)[:n_tiles]
        return mv.reshape(cap), mc.reshape(cap)

    mv, mc = _probe_call(probe3d, tk3, tv3, tile_pid, r_rows, chunks,
                         interpret)
    return mv.reshape(cap), mc.reshape(cap)


def _probe_call(probe3d, tk3, tv3, tile_pid, r_rows, chunks, interpret):
    n_tiles = probe3d.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, r_rows, 128), lambda i, tp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, 128), lambda i, tp: (tp[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, 128), lambda i, tp: (tp[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r_rows, 128), lambda i, tp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, 128), lambda i, tp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    mv, mc = pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, r_rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(tile_pid, probe3d, tk3, tv3)
    return mv, mc
