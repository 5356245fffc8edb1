"""Pallas probe kernel: K2/K4 redesigned for the VPU.

One grid step = one probe tile (quantum-aligned, so it touches exactly one
build partition).  The partition's packed table row is selected by a
scalar-prefetched tile->partition map feeding the BlockSpec index_map --
Pallas' pipelining prefetches the next tile's row while the current tile
computes, and consecutive tiles of the same partition skip the re-fetch
(tile_pid is non-decreasing in the padded layout).

Where the reference probe gathers 16 bucket chains at a time and refills
finished lanes (npj.cpp:249-318), the TPU kernel compares the whole tile
against the whole partition row as a dense (tile x slots) equality sweep:
no chains, no lane refill, no atomics.  Match payload extraction is an exact
u32 select+max (build keys are unique per the workload contract; duplicate
matches surface through match_cnt and take the expansion path).

Layouts: probe tiles are (R, 128) blocks (R = tile/128 sublane rows); the
kernel transposes each tile once into probe-on-sublanes x slots-on-lanes
space where the equality sweep and the lane reductions are native VPU shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(tile_pid_ref, probe_ref, tkeys_ref, tvals_ref,
                  mval_ref, mcnt_ref):
    # probe_ref: (1, R, 128); tkeys/tvals_ref: (1, 1, S); outs: (1, R, 128)
    r_rows = probe_ref.shape[1]
    slots = tkeys_ref.shape[2]
    tile = r_rows * 128
    ok = probe_ref[0].reshape(tile, 1)
    tk = tkeys_ref[0, 0, :].reshape(1, slots)
    tv = tvals_ref[0, 0, :].reshape(1, slots)
    eq = (ok == tk) & (ok != 0)  # (tile, S)
    # Mosaic has no unsigned reductions: bias u32 -> order-preserving i32
    # (flip the top bit), reduce as i32, unbias.
    bias = jnp.int32(-(2**31))
    tv_i = pltpu.bitcast(tv, jnp.int32) ^ bias
    mx = jnp.max(jnp.where(eq, tv_i, bias), axis=1, keepdims=True)
    mcnt = jnp.sum(eq.astype(jnp.int32), axis=1, keepdims=True)
    mval = jnp.where(mcnt > 0, pltpu.bitcast(mx ^ bias, jnp.uint32),
                     jnp.uint32(0))
    mval_ref[0] = mval.reshape(r_rows, 128)
    mcnt_ref[0] = mcnt.reshape(r_rows, 128)


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
    probe3d = probe_keys.reshape(n_tiles, r_rows, 128)
    tk3 = table_keys.reshape(P, 1, slots)
    tv3 = table_vals.reshape(P, 1, slots)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, r_rows, 128), lambda i, tp: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slots), lambda i, tp: (tp[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slots), lambda i, tp: (tp[i], 0, 0),
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
    return mv.reshape(cap), mc.reshape(cap)
