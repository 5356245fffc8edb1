"""Hash aggregate: group-by-key reduction over relations / join output.

The BASELINE operator set requires a hash aggregate on join output
(BASELINE.json north star).  TPU-first design: no hash table at all --
sort-group-reduce.  One fused lax.sort groups equal keys, run boundaries
come from neighbor compares, and the reduction is a segment sum over run
ids.  Aggregates are exact u32 wraparound sums / counts (the engine's value
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
    # sort null keys last: flag is the primary sort key
    null = (keys == PAD_KEY).astype(jnp.uint32)
    _, k_s, v_s = jax.lax.sort((null, keys, vals), num_keys=2, is_stable=True)
    j = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    newrun &= k_s != PAD_KEY
    run_id = jnp.cumsum(newrun.astype(jnp.int32)) - 1  # nulls sort last, dropped via seg
    valid = k_s != PAD_KEY
    seg = jnp.where(valid, run_id, n)
    sums = jnp.zeros(n, jnp.uint32).at[seg].add(v_s, mode="drop")
    counts = jnp.zeros(n, jnp.int32).at[seg].add(
        valid.astype(jnp.int32), mode="drop"
    )
    gkeys = jnp.full(n, PAD_KEY, jnp.uint32).at[seg].set(k_s, mode="drop")
    n_groups = jnp.sum(newrun.astype(jnp.uint32))
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
