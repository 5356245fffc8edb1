"""Multi-column relations over the (u32 key, u32 payload) engine core.

The reference's data model is exactly one u32 value per tuple (hj.h);
this layer generalizes to arbitrarily many named columns WITHOUT
touching the kernels: the join runs with each side's ROW INDEX as its
payload (u32 iota -- the engine's payload domain), and the matched
index pairs materialize any number of columns host-side with numpy
fancy indexing (host gathers are cheap; device gathers are the one
thing this hardware cannot do, PERF_NOTES.md).

Column dtypes are unconstrained (any numpy dtype, any width): the join
KEY is u32 as in the reference, or u64 via join_columns_u64 (folded to
the u32 engine domain, exact-verified host-side).

1:1 (unique-build) joins read the matched build index straight from the
aligned result; duplicate-key builds go through the expansion path with
the index payload, so full M:N output needs no extra machinery either.
"""

from __future__ import annotations

import numpy as np

from .phj import join, materialize_expanded

# Wider keys (beyond the reference's u32 contract, hj.h:24-29): a u64
# key folds to the engine's u32 domain with a Fibonacci-style mix; the
# engine joins the FOLDED keys with row-index payloads, and the exact
# u64 equality check runs host-side on the candidate pairs (a fold
# collision only ever ADDS candidates -- equal u64 keys always fold
# equal -- so filtering is exact).  Expected extra candidates at fold
# load n/2^32 are ~n_pairs * n/2^32: negligible below billions of rows.
_FOLD_C1 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / phi, odd
_FOLD_C2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime 2, odd


def fold_key64(k64: np.ndarray) -> np.ndarray:
    """u64 -> nonzero u32 fold.  Odd-constant multiplies are bijections
    of u64, so the high-32 extraction mixes every input bit; 0 is
    remapped off the engine's reserved null key (the remap can only add
    candidate pairs, never lose one: the map stays a pure function)."""
    k64 = np.ascontiguousarray(k64, np.uint64)
    h = (k64 * _FOLD_C1) ^ ((k64 * _FOLD_C2) >> np.uint64(29))
    h32 = (h >> np.uint64(32)).astype(np.uint32)
    return np.where(h32 == 0, np.uint32(0x9E3779B9), h32)


def join_columns(
    inner_keys: np.ndarray,
    inner_cols: dict,
    outer_keys: np.ndarray,
    outer_cols: dict,
    plan=None,
):
    """Multi-column equi-join; returns (out_cols, plan).

    out_cols maps every name in outer_cols / inner_cols to a materialized
    result column (outer columns first on name clashes, prefixed with
    'outer_'/'inner_' only when both sides share a name).  One row per
    (probe row, matching build row) pair -- exact M:N.
    """
    ni = len(inner_keys)
    no = len(outer_keys)
    i_idx = np.arange(ni, dtype=np.uint32)
    o_idx = np.arange(no, dtype=np.uint32)
    res, plan = join(inner_keys, i_idx, outer_keys, o_idx, plan)
    mc = np.asarray(res.match_cnts).reshape(-1)
    if mc.max(initial=0) <= 1:
        m = mc == 1
        out_o = np.asarray(res.probe_vals).reshape(-1)[m]  # outer row idx
        out_i = np.asarray(res.match_vals).reshape(-1)[m]  # inner row idx
    else:
        # expansion with INDEX payloads: out rows are (key, outer idx,
        # inner idx) for every matching pair
        _, out_o, out_i = materialize_expanded(res, inner_keys, i_idx)
    out_cols = {}
    both = set(inner_cols) & set(outer_cols)
    for name, col in outer_cols.items():
        key = f"outer_{name}" if name in both else name
        out_cols[key] = np.asarray(col)[out_o]
    for name, col in inner_cols.items():
        key = f"inner_{name}" if name in both else name
        out_cols[key] = np.asarray(col)[out_i]
    return out_cols, plan


def join_columns_u64(
    inner_keys: np.ndarray,
    inner_cols: dict,
    outer_keys: np.ndarray,
    outer_cols: dict,
    plan=None,
):
    """Multi-column equi-join on u64 KEYS; same contract as
    join_columns.  The device core still runs entirely in its u32
    domain (folded keys + row-index payloads -- no wide-word kernels);
    candidate pairs from fold collisions are removed by one host-side
    u64 equality pass, so the output is the exact u64 join."""
    if "__k64" in inner_cols or "__k64" in outer_cols:
        # the dict-literal merge below is later-wins: a user column named
        # __k64 would replace the injected verification keys and corrupt
        # the exactness filter
        raise ValueError("'__k64' is reserved by join_columns_u64")
    ik64 = np.ascontiguousarray(inner_keys, np.uint64)
    ok64 = np.ascontiguousarray(outer_keys, np.uint64)
    out_cols, plan = join_columns(
        fold_key64(ik64), {"__k64": ik64, **inner_cols},
        fold_key64(ok64), {"__k64": ok64, **outer_cols},
        plan,
    )
    # candidate filter: both sides carried their u64 key as a column
    # (clash-prefixed because both sides define it)
    keep = out_cols.pop("inner___k64") == out_cols.pop("outer___k64")
    return {n: c[keep] for n, c in out_cols.items()}, plan
