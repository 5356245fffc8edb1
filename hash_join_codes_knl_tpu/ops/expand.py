"""M:N join expansion: the general-multiplicity output path.

The fast aligned probe keeps one matched payload per probe tuple; when build
keys are not unique (match_cnt > 1 -- never on the BASELINE workloads, where
inner keys are distinct, write.cpp:1689), the full cross-product rows are
produced here: a sorted-merge expansion with a static output capacity, the
jit-compatible counterpart of the host oracle (engine/oracle.py).

Output rows are (probe_key, probe_val, build_val), padded with null rows
beyond the true count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .partition import PAD_KEY


def greedy_blocks(counts, block_rows: int):
    """Split matched probe rows into consecutive blocks whose summed
    multiplicities fit `block_rows` each (host-side planning for the
    streamed expansion).  counts: int64 numpy array of per-row match
    multiplicities.  Yields (start, stop, block_total); a single row
    whose multiplicity exceeds block_rows gets its own block (callers
    auto-raise block_rows to counts.max() first, as materialize_expanded
    and aggregate_join_result_expanded do)."""
    import numpy as np

    ends = np.cumsum(counts)
    start, consumed = 0, 0
    while start < len(counts):
        stop = int(np.searchsorted(ends, consumed + block_rows,
                                   side="right"))
        stop = max(stop, start + 1)
        blk_total = int(ends[stop - 1] - consumed)
        yield start, stop, blk_total
        start, consumed = stop, int(ends[stop - 1])


@functools.partial(jax.jit, static_argnames=("capacity",))
def expand_join(
    build_keys: jnp.ndarray,
    build_vals: jnp.ndarray,
    probe_keys: jnp.ndarray,
    probe_vals: jnp.ndarray,
    capacity: int,
):
    """Full M:N join with static output capacity.

    Returns (count, out_keys, out_vals, out_tabs); rows beyond `count` are
    null-padded.  If count > capacity the result is truncated (callers size
    capacity from expected_join_tuples with headroom, or re-plan on the
    reported count).
    """
    # PAD_KEY == 0 sorts FIRST under a plain key sort, keeping `sk`
    # globally ascending (a null-last sort would break searchsorted's
    # precondition and silently drop rows for padded build sides).
    # Pad rows are never matched: probe pads are zeroed via `cnt` below
    # and probe keys are nonzero by the engine's null-key convention.
    sk, sv = jax.lax.sort((build_keys, build_vals), num_keys=1, is_stable=True)
    lo = jnp.searchsorted(sk, probe_keys, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(sk, probe_keys, side="right").astype(jnp.int32)
    cnt = jnp.where(probe_keys != PAD_KEY, hi - lo, 0)
    ends = jnp.cumsum(cnt, dtype=jnp.int32)
    total = ends[-1] if cnt.shape[0] else jnp.int32(0)
    # output slot s belongs to probe tuple i = first index with ends[i] > s
    s = jnp.arange(capacity, dtype=jnp.int32)
    idx = jnp.searchsorted(ends, s, side="right").astype(jnp.int32)
    idx = jnp.clip(idx, 0, max(cnt.shape[0] - 1, 0))
    starts = ends - cnt
    valid = s < total
    bpos = lo[idx] + (s - starts[idx])
    bpos = jnp.clip(bpos, 0, max(sk.shape[0] - 1, 0))
    out_k = jnp.where(valid, probe_keys[idx], PAD_KEY)
    out_v = jnp.where(valid, probe_vals[idx], 0)
    out_t = jnp.where(valid, sv[bpos], 0)
    return total, out_k, out_v, out_t
