"""Distributed Grace join: BOTH relations larger than the MESH's HBM.

The single-chip Grace driver (engine/grace.py) already removes both
in-HBM size limits on one chip; this module scales it across a device
mesh -- the composition BASELINE config 5 (1B x 4B rows) asks for:
the reference's fixed 4096-way decomposition + cross-thread memcpy
re-aggregation (cpra2.cpp:1757-1906) re-expressed with the thread axis
replaced by BOTH the chunk-stream axis (out-of-core) and the mesh axis
(scale-out).  Two phases, both SPMD over the mesh:

1. **Distributed partition pass.**  Each superchunk of (n_dev x
   chunk_rows) host rows shards over the mesh; every device runs ONE
   bounded-fanout Pallas radix pass (ops/radix_partition_pallas.py) at
   fanout F = 2^f_bits.  Because the pass emits partition-contiguous
   regions ordered by the top hash bits, and the owner device of
   partition p is its top log2(n_dev) bits, a single tiled
   `all_to_all` over the flattened regions IS the owner exchange --
   device d receives exactly partitions [d*F/n, (d+1)*F/n) from every
   peer, no re-pack needed (the memcpy re-aggregation of
   cpra2.cpp:1896-1904 as one collective, riding ICI).  The received
   fragments then append to partition files (engine/spill.py raw-u32
   format), keyed by owner device so the layout is what a pod's
   host-local spill would hold.

SCOPE: single-controller (one process) meshes -- every device in one
process, as on this box's 8-virtual-device test mesh or a single-host
TPU slice.  The ON-DEVICE design (shard_map radix pass, tiled
all_to_all exchange, partition-parallel joins) is pod-shaped, but the
HOST side of this driver is not multi-process yet: it materializes
globally-sharded pass outputs with np.asarray (raises on non-fully-
addressable arrays under jax.distributed), writes one shared sidecar
with global counts, and journals phase-2 progress in one file.  A pod
port needs per-host fragment extraction (addressable_shards), psum'd
count/checksum reduction into per-host sidecars, and per-host journals
-- mechanical, but meaningless to write without multi-host hardware to
run it (an explicit guard in grace_join_dist raises with this note).

2. **Partition-parallel joins.**  Round r joins partition d*F/n + r on
   device d: per-partition columns load from the owner's files, pad to
   ONE shared (build, probe) cap, and a single compiled shard_map'd
   merge join serves all F/n rounds (per-partition shapes would
   recompile per round).  Window overflow surfaces as a psum'd count +
   pmax'd measured span, re-planned via engine.phj.replan_from_span
   exactly like the single-chip drivers.

Phase-1 spills use the SAME sidecar fingerprint and file layout as
engine/grace.py -- the partition files' content (as a multiset) depends
only on the input rows and the (factor, f_bits) routing, not on the
chunk size or the mesh shape -- so a single-chip Grace spill resumes a
distributed run and vice versa, and a corrupt reused file recomputes
that side's pass once rather than joining garbage.

Reference behavior being reproduced: phj.cpp:1791-1808 (multi-pass
partitioning makes working sets independent of relation size),
cpra2.cpp:1883-1971 (partition-parallel build/probe over re-aggregated
fragments).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.config import JoinPlan, plan_join
from ..engine.grace import (
    GraceResult,
    PartitionMeta,
    _append_fragments,
    _budget_caps_local,
    _host_partition_fragments,
    _init_partition_files,
    _journal_append,
    _make_loader,
    _on_tpu,
    _phase1,
    _phase2_journal,
    _side_fingerprint,
    _u64sum,
    _write_side_sidecar,
)
from ..engine.phj import JoinResult, phj_join, replan_from_span
from ..ops.radix_partition_pallas import radix_partition_pallas
from ..utils.hashing import hashed_key, mod_inverse_u32, np_hashed_key
from .cpra import (
    _engine_overflow,
    _engine_select_overflow,
    _engine_span,
    _owner_bits,
)
from .distributed import require_live_mesh


@functools.lru_cache(maxsize=64)
def _make_partition_step(mesh: Mesh, axis: str, factor: int, f_bits: int,
                         cap: int, interp: bool):
    """One superchunk's distributed partition pass: per-device radix
    pass + the owner all_to_all.  Returns fn(keys, vals) -> (hk regions,
    val regions, counts, overflow), all but overflow sharded over
    `axis`; received layout per device is (n_src, F/n_dev, capr).
    lru-cached: a fresh jit(shard_map(closure)) per call would key the
    jit cache on a new function identity and recompile the identical
    program for the probe side that the build side just compiled
    (minutes each on a remote-compile backend)."""
    n_dev = mesh.shape[axis]

    def step(keys, vals):
        hk = hashed_key(keys, factor)
        bk, bv, cnts, ovf = radix_partition_pallas(
            hk, vals, f_bits, cap=cap, interpret=interp
        )
        # regions are partition-contiguous by the top f_bits; owner(p) =
        # top log2(n_dev) bits of p, so the tiled split IS the owner pack
        a2a = functools.partial(
            jax.lax.all_to_all, axis_name=axis, split_axis=0,
            concat_axis=0, tiled=True,
        )
        rk, rv, rc = a2a(bk), a2a(bv), a2a(cnts)
        ovf = jax.lax.psum((ovf != 0).astype(jnp.int32), axis)
        return rk, rv, rc, ovf

    spec = P(axis)
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec, spec, P()), check_vma=False,
        )
    )


def _partition_side_dist(
    keys, vals, factor: int, f_bits: int, chunk_rows: int, d: str,
    side: str, mesh: Mesh, axis: str, fp: dict | None = None,
    cap_retries: int = 3,
):
    """Stream one relation through the MESH's distributed radix pass;
    append each owner device's received fragments to the per-partition
    files `{side}_{p}_{hk,val}.bin`.  Same sidecar contract as
    engine.grace._partition_side (the two spill formats are
    interchangeable); `fp` is the caller's precomputed fingerprint.
    chunk_rows is rows PER DEVICE per superchunk."""
    n_dev = mesh.shape[axis]
    F = 1 << f_bits
    Fl = F // n_dev
    n = len(keys)
    counts = np.zeros(F, np.int64)
    hk_csums = [0] * F
    val_csums = [0] * F
    interp = not _on_tpu()
    sh = NamedSharding(mesh, P(axis))
    if fp is None:
        fp = _side_fingerprint(keys, vals, factor, f_bits)
    _init_partition_files(d, side, F)
    super_rows = n_dev * chunk_rows
    pos = 0
    while pos < n:
        ck = np.zeros(super_rows, np.uint32)
        cv = np.zeros(super_rows, np.uint32)
        take = min(super_rows, n - pos)
        ck[:take] = np.asarray(keys[pos : pos + take])
        cv[:take] = np.asarray(vals[pos : pos + take])
        pos += take
        # null-key pads in the tail superchunk are dropped by the pass
        dk = jax.device_put(jnp.asarray(ck), sh)
        dv = jax.device_put(jnp.asarray(cv), sh)
        cap = 0  # pass's own estimate first
        for attempt in range(cap_retries + 1):
            step = _make_partition_step(
                mesh, axis, factor, f_bits, cap, interp
            )
            rk, rv, rc, ovf = step(dk, dv)
            if int(ovf) == 0:
                break
            # overflow is a value: retry this superchunk, doubled cap
            cap = 2 * (rk.shape[0] // (n_dev * F))
        else:
            # a persistent overflow is the pass's per-tile RUN bound
            # (skew: one hot key dominating a shard), which capacity
            # growth can never fix.  Partition this superchunk exactly
            # on the host instead: the owner exchange here only routes
            # fragments to files, and file CONTENT is a multiset -- the
            # host split appends the identical multiset, so spills stay
            # interchangeable and checksums/counts are unaffected.
            frags, _ = _host_partition_fragments(
                np_hashed_key(ck, factor), cv, f_bits)
            _append_fragments(d, side, frags, counts, hk_csums, val_csums)
            continue
        capr = rk.shape[0] // (n_dev * F)
        # (dst, src, local partition, region)
        rk = np.asarray(rk).reshape(n_dev, n_dev, Fl, capr)
        rv = np.asarray(rv).reshape(n_dev, n_dev, Fl, capr)
        rc = np.asarray(rc).reshape(n_dev, n_dev, Fl)
        frags = []  # index == partition id: p = dst * Fl + j
        for dst in range(n_dev):
            for j in range(Fl):
                live = rk[dst, :, j] != 0
                assert int(live.sum()) == int(rc[dst, :, j].sum())
                frags.append((rk[dst, :, j][live], rv[dst, :, j][live]))
        _append_fragments(d, side, frags, counts, hk_csums, val_csums)
    _write_side_sidecar(d, side, fp, counts, hk_csums, val_csums)
    return counts, hk_csums, val_csums


@functools.lru_cache(maxsize=64)
def _make_join_step(mesh: Mesh, axis: str, local_plan: JoinPlan):
    """Phase-2 round: every device joins its round's partition pair.
    diag = [psum'd engine overflow count, pmax'd measured span, psum'd
    rowbase select-overflow count] (the select count is the part of
    entry 0 whose fix is gather_select="flat", not a wider window).
    lru-cached for the same recompile reason as _make_partition_step."""

    def step(bk, bv, pk, pv):
        res = phj_join(bk, bv, pk, pv, local_plan)
        diag = jnp.stack([
            jax.lax.psum(
                _engine_overflow(res, local_plan).astype(jnp.int32), axis
            ),
            jax.lax.pmax(
                _engine_span(res, local_plan).astype(jnp.int32), axis
            ),
            jax.lax.psum(
                _engine_select_overflow(res, local_plan).astype(jnp.int32),
                axis,
            ),
        ])
        return res, diag

    spec = P(axis)
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=(spec,) * 4,
            out_specs=(JoinResult(spec, spec, spec, spec, spec), P()),
            check_vma=False,
        )
    )


def grace_join_dist(
    inner_keys,
    inner_vals,
    outer_keys,
    outer_vals,
    mesh: Mesh,
    f_bits: int = 6,
    chunk_rows: int = 16_000_000,
    spill_dir: str | None = None,
    plan: JoinPlan | None = None,
    partition_budget_rows: int = 220_000_000,
    on_partition=None,
    window_retries: int = 3,
    axis: str = "x",
    liveness_timeout_s: float | None = 30.0,
) -> GraceResult:
    """Join two host-resident relations over a device mesh; neither
    relation needs to fit the mesh's combined HBM.  All four inputs are
    numpy arrays or np.memmap; chunk_rows is rows per device per
    phase-1 superchunk.

    on_partition(meta, res_slices, raw_probe_keys) is called per
    partition with that partition's aligned join-output columns
    (probe keys already unscrambled); without it only counts are
    accumulated.  Requires f_bits >= log2(n_devices) (every device owns
    at least one partition)."""
    if spill_dir is None:
        raise ValueError("grace_join_dist needs spill_dir")
    if chunk_rows <= 0:
        raise ValueError("chunk_rows must be positive")
    if jax.process_count() > 1:
        # the host side (np.asarray of sharded pass outputs, the shared
        # sidecar/journal files) is single-controller; see the module
        # docstring's SCOPE note for the pod-port checklist
        raise NotImplementedError(
            "grace_join_dist is single-controller: run with one process "
            "(single-host slice or virtual CPU mesh); a multi-process "
            "port needs per-host fragment extraction + per-host "
            "sidecars/journals (module docstring, SCOPE)"
        )
    os.makedirs(spill_dir, exist_ok=True)
    n_dev = mesh.shape[axis]
    dev_bits = _owner_bits(n_dev)
    if f_bits < dev_bits:
        raise ValueError(
            f"f_bits={f_bits} < log2(n_devices)={dev_bits}: every device "
            "must own at least one partition"
        )
    F = 1 << f_bits
    Fl = F // n_dev
    if plan is None:
        plan = plan_join(
            max(1, len(inner_keys) >> f_bits),
            max(1, len(outer_keys) >> f_bits),
        )
    # stage boundary: fail fast instead of hanging in the exchange
    require_live_mesh(mesh, liveness_timeout_s, axis,
                      stage="grace_dist_partition")
    sides = {"build": (inner_keys, inner_vals),
             "probe": (outer_keys, outer_vals)}
    side_state, reused, side_fps, compute_side = _phase1(
        sides, spill_dir, plan.factor, f_bits,
        lambda k, v, side, fp: _partition_side_dist(
            k, v, plan.factor, f_bits, chunk_rows, spill_dir, side,
            mesh, axis, fp),
    )
    b_counts = side_state["build"][0]
    p_counts = side_state["probe"][0]
    nb_cap, np_cap, local = _budget_caps_local(
        b_counts, p_counts, partition_budget_rows, f_bits, plan)
    inv = np.uint64(mod_inverse_u32(plan.factor))
    load_side = _make_loader(spill_dir, side_state, reused, compute_side)

    metas = [PartitionMeta(p, int(b_counts[p]), int(p_counts[p]), 0)
             for p in range(F)]
    total = 0
    sh = NamedSharding(mesh, P(axis))
    require_live_mesh(mesh, liveness_timeout_s, axis,
                      stage="grace_dist_join")

    def round_parts(r):
        return [d * Fl + r for d in range(n_dev)]

    def build_args(r):
        cols = [[], [], [], []]
        for p in round_parts(r):
            # a pair empty on either side contributes only null pads
            nb = int(b_counts[p]) if int(p_counts[p]) else 0
            npr = int(p_counts[p]) if int(b_counts[p]) else 0
            bkc, bvc = load_side("build", p, nb, nb_cap)
            pkc, pvc = load_side("probe", p, npr, np_cap)
            for c, a in zip(cols, (bkc, bvc, pkc, pvc)):
                c.append(a)
        return tuple(
            jax.device_put(jnp.asarray(np.concatenate(c)), sh)
            for c in cols
        )

    # phase-2 resume (journal shared with the single-chip driver): a
    # round is skipped when EVERY worked pair in it is already recorded
    # for these inputs/routing; partially-journaled rounds re-join whole
    # (the batched step computes all n_dev pairs at once anyway)
    done = _phase2_journal(spill_dir, side_fps, on_partition)
    resumed = 0

    def worked(p):
        return int(b_counts[p]) and int(p_counts[p])

    live_rounds = []
    for r in range(Fl):
        parts = [p for p in round_parts(r) if worked(p)]
        if not parts:
            continue
        if all(p in done for p in parts):
            for p in parts:
                metas[p].join_tuples = done[p]
                total += done[p]
                resumed += 1
        else:
            live_rounds.append(r)
    pending = None
    for idx, r in enumerate(live_rounds):
        parts = round_parts(r)
        args = pending if pending is not None else build_args(r)
        res = None
        for attempt in range(window_retries + 1):
            res, diag = _make_join_step(mesh, axis, local)(*args)
            # double buffering: the next round's disk reads + H2D go
            # out while this round's join is still in flight on the
            # mesh (the diag read below is what forces completion)
            if attempt == 0:
                pending = (build_args(live_rounds[idx + 1])
                           if idx + 1 < len(live_rounds) else None)
            if not local.probe_impl.startswith("merge") or int(
                diag[0]
            ) == 0:
                break
            span = int(diag[1])
            sel_ovf = int(diag[2])
            win_ovf = int(diag[0]) - sel_ovf
            res = None
            if sel_ovf:
                # counted plan-optimization violation: downgrade (exact
                # for any input); no geometry change needed
                from ..engine.phj import downgrade_plan_opts

                local = downgrade_plan_opts(local)
            if win_ovf:
                local = replan_from_span(local, span)
        if res is None or (
            local.probe_impl.startswith("merge") and int(diag[0]) != 0
        ):
            raise RuntimeError(
                f"round {r}: window overflow persists across re-plans"
            )
        mc = np.asarray(res.match_cnts)
        cap_out = len(mc) // n_dev
        for d, p in enumerate(parts):
            sl = slice(d * cap_out, (d + 1) * cap_out)
            jt = int(np.sum(mc[sl].astype(np.int64)))
            metas[p].join_tuples = jt
            total += jt
            if worked(p):
                _journal_append(spill_dir, p, jt)
            if on_partition and metas[p].build_rows and metas[p].probe_rows:
                pk = np.asarray(res.probe_keys)[sl]
                raw_pk = (
                    pk.astype(np.uint64) * inv % (1 << 32)
                ).astype(np.uint32)
                # build_counts carries the single-chip 3-entry merge
                # diag contract [window-overflow tiles, max span,
                # plan-opt violations] (NOT the raw mesh-concatenated
                # per-device build_counts).  diag[0] sums BOTH overflow
                # channels (_engine_overflow), so the window-only count
                # is recovered by subtracting the violation entry --
                # a consumer re-planning from entry 0 must not treat a
                # select-only violation as a window problem
                d = np.asarray(diag)
                res_slice = JoinResult(
                    pk, np.asarray(res.probe_vals)[sl],
                    np.asarray(res.match_vals)[sl], mc[sl],
                    np.asarray([d[0] - d[2], d[1], d[2]], np.int32),
                )
                on_partition(metas[p], res_slice, raw_pk)
    return GraceResult(total, metas, f_bits, reused_sides=dict(reused),
                       resumed_partitions=resumed)
