"""NPJ: no-partition (simple) hash join against one global HBM table.

TPU re-architecture of the reference NPJ (npj.cpp:769-927): one shared
open-addressing table built over the whole build side, probed directly.

Build (K1 analog, npj.cpp:190-212): the reference inserts with CAS + linear
probing.  TPUs have no atomics, but a linear-probe table's *cluster
structure* is insertion-order independent, so the canonical layout is
computed directly: sort tuples by home bucket, then resolve collisions with
the vectorized parking rule slot_i = max(h_i, slot_{i-1}+1), which collapses
to slot_i = i + cummax(h_i - i) -- one sort, one cummax, one scatter.  The
table is allocated with a non-wrapping overflow margin instead of modular
wraparound (same join semantics: every key is findable from its home bucket
scanning forward to the first empty).

Probe (K2 analog, npj.cpp:216-364): per probe key, walk slots from the home
bucket until the first empty, accumulating matches.  The reference's 16-lane
gather + lane-refill becomes a while_loop over whole-relation gather steps
(active-masked); iterations = longest active chain.  This is the
gather-bound algorithm by definition -- on TPU as on KNL flat mode, NPJ
loses to PHJ on bandwidth; it exists for parity and as the degenerate
no-partition baseline.

Output contract: aligned to the PROBE input order (match_val/match_cnt per
probe tuple), the closest analog of the reference's probe-order output.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.partition import PAD_KEY
from ..utils.hashing import range_hash
from .config import DEFAULT_FACTOR


@dataclasses.dataclass(frozen=True)
class NpjPlan:
    buckets: int  # table size (home-bucket range)
    margin: int = 4096  # non-wrapping overflow slots past the end
    factor: int = DEFAULT_FACTOR
    max_chain: int = 1 << 20  # safety bound on probe chain walk
    # _UNIQUE mode (npj.cpp:954-956,288-290): build keys are known
    # distinct, so a probe lane retires at its first match instead of
    # walking to the end of the cluster
    unique: bool = False


def plan_npj(inner_n: int, load: float = 0.5) -> NpjPlan:
    """Reference sizing: hash_buckets = inner/load (npj.cpp:944-947 uses
    load 0.9; default 0.5 here -- the TPU probe walk pays per chain step,
    and HBM space is cheaper than chain length)."""
    buckets = 1
    while buckets * load < inner_n:
        buckets *= 2
    return NpjPlan(buckets=buckets)


@functools.partial(jax.jit, static_argnames=("plan",))
def npj_build(inner_keys, inner_vals, plan: NpjPlan):
    """Returns (table_keys, table_vals, overflow_count)."""
    n = inner_keys.shape[0]
    size = plan.buckets + plan.margin
    h = range_hash(inner_keys, plan.factor, plan.buckets).astype(jnp.int32)
    # null keys park at the far end and are dropped
    h = jnp.where(inner_keys != PAD_KEY, h, size)
    h_s, k_s, v_s = jax.lax.sort((h, inner_keys, inner_vals), num_keys=1,
                                 is_stable=True)
    j = jnp.arange(n, dtype=jnp.int32)
    slot = j + jax.lax.cummax(h_s - j)  # parking rule
    slot = jnp.where((h_s < size) & (slot < size), slot, size)  # drop
    tk = jnp.full(size, PAD_KEY, jnp.uint32).at[slot].set(k_s, mode="drop")
    tv = jnp.zeros(size, jnp.uint32).at[slot].set(v_s, mode="drop")
    overflow = jnp.sum((slot >= size).astype(jnp.int32)) - jnp.sum(
        (h_s >= size).astype(jnp.int32)
    )
    return tk, tv, overflow


@functools.partial(jax.jit, static_argnames=("plan",))
def npj_probe(table_keys, table_vals, probe_keys, plan: NpjPlan):
    """Walk chains until first empty slot; returns (match_vals, match_cnts)."""
    n = probe_keys.shape[0]
    size = table_keys.shape[0]
    h0 = range_hash(probe_keys, plan.factor, plan.buckets).astype(jnp.int32)
    live = probe_keys != PAD_KEY

    def cond(state):
        off, active, _, _ = state
        return jnp.any(active) & (off < plan.max_chain)

    def body(state):
        off, active, mval, mcnt = state
        slot = jnp.minimum(h0 + off, size - 1)
        tk = jnp.where(active, table_keys[slot], PAD_KEY)
        tv = table_vals[slot]
        eq = active & (tk == probe_keys)
        mval = jnp.where(eq, jnp.maximum(mval, tv), mval)
        mcnt = mcnt + eq.astype(jnp.int32)
        active = active & (tk != PAD_KEY) & (h0 + off + 1 < size)
        if plan.unique:
            active = active & jnp.logical_not(eq)  # first match retires
        return off + 1, active, mval, mcnt

    _, _, mval, mcnt = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            live,
            jnp.zeros(n, jnp.uint32),
            jnp.zeros(n, jnp.int32),
        ),
    )
    return mval, mcnt


def npj_join(inner_keys, inner_vals, outer_keys, outer_vals,
             plan: NpjPlan | None = None):
    """Full NPJ; returns (match_vals, match_cnts aligned to outer, plan)."""
    if plan is None:
        plan = plan_npj(len(inner_keys))
    ik, iv = jnp.asarray(inner_keys), jnp.asarray(inner_vals)
    ok = jnp.asarray(outer_keys)
    tk, tv, overflow = npj_build(ik, iv, plan)
    if int(overflow) > 0:
        raise RuntimeError(
            f"{int(overflow)} build tuples overflowed the table margin; "
            "increase NpjPlan.margin or lower the load factor"
        )
    mv, mc = npj_probe(tk, tv, ok, plan)
    return mv, mc, plan
