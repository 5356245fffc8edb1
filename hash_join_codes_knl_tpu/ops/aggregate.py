"""Hash aggregate: group-by-key reduction over relations / join output.

The BASELINE operator set requires a hash aggregate on join output
(BASELINE.json north star).  TPU-first design: no hash table at all --
sort-group-reduce, with NO scatter and NO gather anywhere (PERF_NOTES.md
measures XLA scatter-add at 2.27 s and gather at ~115M elem/s for 256M
rows on v5e -- both unusable at join-output scale):

1. one fused sort groups equal keys -- sorted on `keys - 1`, a u32
   bijection that preserves nonzero-key order and wraps the null key 0
   to the TOP, so nulls land last with no separate flag column (a full
   1 GB sort column saved at 256M rows),
2. an inclusive cumsum turns per-run sums into differences of the
   cumsum at run boundaries; each run-START row locally computes the
   "prefix before me" (csum[i] - v[i]) -- no boundary lookups needed.
   Valid rows form a PREFIX after the sort, so a run start's
   prefix-count is simply its row index (no second cumsum),
3. a second stable sort compacts the run-start rows to the front (the
   standard sort-based compaction, as ops/filter.py), and
4. group totals fall out as neighbor differences of the compacted
   prefix column: sum_j = prefix_{j+1} - prefix_j (the last group
   closes against the grand total).

Aggregates are exact u32 wraparound sums / counts (the engine's value
domain), packed to the front like every compacted output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .partition import PAD_KEY


def hash_aggregate(keys: jnp.ndarray, vals: jnp.ndarray):
    """Group by key; returns (n_groups, group_keys, sums, counts), with the
    groups packed to the front and tails padded with PAD_KEY/0.

    Rows with key == PAD_KEY (null/padding) are ignored, which lets the
    aligned join output feed this directly without materialization.
    """
    n = keys.shape[0]
    if n == 0:
        # static-shape early exit: the run-boundary concatenate below
        # builds a (1,) flag against a (0,) mask (trace-time error), and
        # csum[n-1] would index out of bounds
        z = jnp.zeros(0, jnp.uint32)
        return jnp.uint32(0), z, z, jnp.zeros(0, jnp.int32)
    # sort on keys-1 (order-preserving u32 bijection for nonzero keys;
    # the null key 0 wraps to 0xFFFFFFFF and sorts LAST)
    km1_s, v_s = jax.lax.sort((keys - jnp.uint32(1), vals), num_keys=1)
    k_s = km1_s + jnp.uint32(1)
    valid = k_s != PAD_KEY
    newrun = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    newrun &= valid
    v_live = jnp.where(valid, v_s, jnp.uint32(0))
    csum = jnp.cumsum(v_live, dtype=jnp.uint32)  # u32 wraparound is exact
    # each run-start row carries the cumsum BEFORE its run -- computed
    # locally (csum[i] - v[i]); its prefix COUNT is its row index (the
    # valid rows are a contiguous prefix after the sort)
    pre_sum = csum - v_live
    pre_cnt = jnp.arange(n, dtype=jnp.uint32)
    # compact run starts to the front, preserving key order (stable sort
    # on the start flag); their prefix columns ride along
    flag = jnp.where(newrun, jnp.uint32(0), jnp.uint32(1))
    _, gk, ps, pc = jax.lax.sort((flag, k_s, pre_sum, pre_cnt),
                                 num_keys=1, is_stable=True)
    n_groups = jnp.sum(newrun.astype(jnp.uint32))
    # group j's total = prefix of group j+1 minus its own prefix; the
    # last group closes against the grand totals
    tot_s = csum[n - 1]
    tot_c = jnp.sum(valid.astype(jnp.uint32))
    nxt_s = jnp.concatenate([ps[1:], ps[-1:]])
    nxt_c = jnp.concatenate([pc[1:], pc[-1:]])
    j = jnp.arange(n, dtype=jnp.uint32)
    sums = jnp.where(j + 1 < n_groups, nxt_s - ps, tot_s - ps)
    counts = jnp.where(j + 1 < n_groups, nxt_c - pc, tot_c - pc)
    live = j < n_groups
    gkeys = jnp.where(live, gk, jnp.uint32(PAD_KEY))
    sums = jnp.where(live, sums, jnp.uint32(0))
    counts = jnp.where(live, counts, jnp.uint32(0)).astype(jnp.int32)
    return n_groups, gkeys, sums, counts


def aggregate_join_result(res):
    """Hash aggregate over a JoinResult (BASELINE config 5: hash aggregate
    on join output): group matched rows by probe key, summing the matched
    build values.  Unmatched/padded slots are nulled out and ignored.

    In the distributed CPRA pipeline this runs per chip with NO cross-chip
    reduction: the owner exchange routes equal keys to one chip, so local
    group keys are globally disjoint (parallel/cpra.py).

    Requires match counts <= 1 (the aligned output); M:N rows go through
    ops/expand.py first and aggregate the expanded columns.  Like
    materialize(), this REFUSES duplicate-key builds instead of silently
    under-counting them (host-side check; res leaves must be concrete).
    """
    import numpy as np

    if (np.asarray(res.match_cnts) > 1).any():
        raise ValueError(
            "multi-match rows present; expand via ops/expand.py "
            "(materialize_expanded) and aggregate the expanded columns"
        )
    matched = res.match_cnts == 1
    keys = jnp.where(matched, res.probe_keys, jnp.uint32(PAD_KEY))
    return hash_aggregate(keys, res.match_vals)
