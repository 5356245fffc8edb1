"""Grace join: BOTH relations larger than chip HBM, on one chip.

The streaming driver (engine/stream.py) removes the probe-side size
limit but still requires the build side to fit HBM (it is sorted once
and stays resident).  This module removes that limit too -- the TPU
re-architecture of the reference's reason-to-exist: multi-pass
partitioning makes working sets independent of relation size
(phj.cpp:1791-1808; CPRA's fixed 4096-way decomposition,
cpra2.cpp:1883-1971).  Two phases:

1. **Partition (out-of-core radix pass)**: each relation streams through
   the chip in host-sized chunks; one bounded-fanout Pallas radix pass
   (ops/radix_partition_pallas.py -- its measured winning regime) splits
   every chunk by the top `f_bits` of the scrambled key, and the
   compacted per-partition fragments append to host-side partition
   files (engine/spill.py raw-u32 format).  This is exactly the
   reference's partition phase with the thread axis replaced by the
   chunk-stream axis and the memcpy re-aggregation replaced by
   host-file append.

2. **Per-partition join**: each partition pair now fits HBM by
   construction (ni/F, no/F up to skew); the standard merge engine
   joins them (keys are already scrambled, so the local plan uses
   factor=1 -- hashed_key is then the identity and the null-key
   convention carries over, hk == 0 iff key == 0).

Overflows remain values: a chunk whose pass overflows its region
capacity retries with a doubled cap; a partition that would not fit the
per-partition budget raises with the f_bits to use instead (recursive
splitting is one more pass of the same machinery).

Scale note (this dev box): the host<->device tunnel runs at ~0.04 GB/s,
so full-scale runs are transfer-bound end to end -- the phase split and
per-chip compute are what a production host link (PCIe/ICI) would see.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.radix_partition_pallas import radix_partition_pallas
from ..utils.hashing import hashed_key, mod_inverse_u32
from .config import JoinPlan, plan_join
from .phj import phj_join
from .spill import _read_u32, _write_u32


@dataclasses.dataclass
class PartitionMeta:
    index: int
    build_rows: int
    probe_rows: int
    join_tuples: int


@dataclasses.dataclass
class GraceResult:
    join_tuples: int
    partitions: list  # PartitionMeta per partition
    f_bits: int


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def _append_u32(path: str, arr: np.ndarray) -> None:
    with open(path, "ab") as f:
        np.ascontiguousarray(arr, dtype="<u4").tofile(f)


def _partition_side(
    keys, vals, factor: int, f_bits: int, chunk_rows: int, d: str,
    side: str, cap_retries: int = 3,
) -> np.ndarray:
    """Stream one relation through the chip's radix pass; append the
    compacted fragments to per-partition files `{side}_{p}_{hk,val}.bin`.
    Returns per-partition row counts.  The pass emits zero-interleaved
    regions (run tails pad with the null key); compaction is a host-side
    nonzero mask, the analog of the reference's exact fragment counts."""
    F = 1 << f_bits
    n = len(keys)
    counts = np.zeros(F, np.int64)
    interp = not _on_tpu()
    for p in range(F):
        for col in ("hk", "val"):
            open(os.path.join(d, f"{side}_{p}_{col}.bin"), "wb").close()
    pos = 0
    while pos < n:
        ck = np.asarray(keys[pos : pos + chunk_rows])
        cv = np.asarray(vals[pos : pos + chunk_rows])
        pos += len(ck)
        hk = hashed_key(jnp.asarray(ck), factor)
        cap = 0  # pass's own estimate first
        for attempt in range(cap_retries + 1):
            bk, bv, cnts, ovf = radix_partition_pallas(
                hk, jnp.asarray(cv), f_bits, cap=cap, interpret=interp
            )
            if int(ovf) == 0:
                break
            # overflow is a value: retry this chunk with a doubled cap
            cap = 2 * (bk.shape[0] // F)
        else:
            raise RuntimeError(
                f"radix pass overflow persists for a {len(ck)}-row chunk "
                f"at fanout {F}; raise chunk_rows granularity or f_bits"
            )
        bk = np.asarray(bk).reshape(F, -1)
        bv = np.asarray(bv).reshape(F, -1)
        cnts = np.asarray(cnts)
        for p in range(F):
            live = bk[p] != 0
            assert int(live.sum()) == int(cnts[p])
            _append_u32(os.path.join(d, f"{side}_{p}_hk.bin"), bk[p][live])
            _append_u32(os.path.join(d, f"{side}_{p}_val.bin"), bv[p][live])
            counts[p] += int(cnts[p])
    return counts


def grace_join(
    inner_keys,
    inner_vals,
    outer_keys,
    outer_vals,
    f_bits: int = 6,
    chunk_rows: int = 32_000_000,
    spill_dir: str | None = None,
    plan: JoinPlan | None = None,
    partition_budget_rows: int = 220_000_000,
    on_partition=None,
    window_retries: int = 3,
) -> GraceResult:
    """Join two host-resident relations, neither of which needs to fit
    HBM.  All four inputs are numpy arrays or np.memmap.

    on_partition(meta, res, raw_probe_keys) is called per partition with
    the partition's aligned JoinResult (probe keys already unscrambled)
    -- the hook for materializing consumers; without it only counts are
    accumulated.  spill_dir holds the partition files (a temp dir is
    required -- pass one explicitly so reruns can reuse the space).
    """
    if spill_dir is None:
        raise ValueError("grace_join needs spill_dir for partition files")
    os.makedirs(spill_dir, exist_ok=True)
    if plan is None:
        # per-partition planning happens per pair below; this fixes the
        # scramble factor the partition pass routes on
        plan = plan_join(
            max(1, len(inner_keys) >> f_bits),
            max(1, len(outer_keys) >> f_bits),
        )
    F = 1 << f_bits
    b_counts = _partition_side(inner_keys, inner_vals, plan.factor, f_bits,
                               chunk_rows, spill_dir, "build")
    p_counts = _partition_side(outer_keys, outer_vals, plan.factor, f_bits,
                               chunk_rows, spill_dir, "probe")
    if int(b_counts.max(initial=0)) > partition_budget_rows or int(
        p_counts.max(initial=0)
    ) > partition_budget_rows:
        raise RuntimeError(
            f"a partition exceeds the per-partition budget "
            f"({int(max(b_counts.max(), p_counts.max()))} rows > "
            f"{partition_budget_rows}): re-run with f_bits={f_bits + 2} "
            "(one more level of the same pass handles any skew)"
        )
    inv = np.uint64(mod_inverse_u32(plan.factor))
    total = 0
    metas = []
    # every partition pads to ONE static (build, probe) shape so a
    # single compiled join serves all F partitions -- per-partition
    # shapes would recompile F times (minutes each on a remote-compile
    # backend).  Pads carry the null key and are inert in the engine.
    nb_cap = -(-max(int(b_counts.max(initial=0)), 128) // 128) * 128
    np_cap = -(-max(int(p_counts.max(initial=0)), 128) // 128) * 128
    # keys are already scrambled: factor=1 makes hashed_key the
    # identity, so the local engine sees the same hash order the
    # partition pass routed on
    local = dataclasses.replace(
        plan_join(nb_cap, np_cap), factor=1,
        skip_bits=plan.skip_bits + f_bits,
    )
    for p in range(F):
        nb, npr = int(b_counts[p]), int(p_counts[p])
        meta = PartitionMeta(p, nb, npr, 0)
        if nb == 0 or npr == 0:
            metas.append(meta)
            continue

        def padded(path, n, cap):
            a = _read_u32(path, n)
            return np.concatenate([a, np.zeros(cap - n, np.uint32)])

        bk = padded(os.path.join(spill_dir, f"build_{p}_hk.bin"), nb, nb_cap)
        bv = padded(os.path.join(spill_dir, f"build_{p}_val.bin"), nb,
                    nb_cap)
        pk = padded(os.path.join(spill_dir, f"probe_{p}_hk.bin"), npr,
                    np_cap)
        pv = padded(os.path.join(spill_dir, f"probe_{p}_val.bin"), npr,
                    np_cap)
        res = None
        for _ in range(window_retries + 1):
            res = phj_join(jnp.asarray(bk), jnp.asarray(bv),
                           jnp.asarray(pk), jnp.asarray(pv), local)
            if not local.probe_impl.startswith("merge") or int(
                res.build_counts[0]
            ) == 0:
                break
            from .phj import replan_from_span

            span = int(res.build_counts[1])
            res = None
            local = replan_from_span(local, span)
        if res is None or (
            local.probe_impl.startswith("merge")
            and int(res.build_counts[0]) != 0
        ):
            raise RuntimeError(f"partition {p}: window overflow persists")
        jt = int(res.join_tuples)
        meta.join_tuples = jt
        total += jt
        if on_partition:
            raw_pk = (
                np.asarray(res.probe_keys).astype(np.uint64) * inv
                % (1 << 32)
            ).astype(np.uint32)
            on_partition(meta, res, raw_pk)
        metas.append(meta)
    return GraceResult(total, metas, f_bits)
