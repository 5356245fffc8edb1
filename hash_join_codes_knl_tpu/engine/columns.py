"""Multi-column relations over the (u32 key, u32 payload) engine core.

The reference's data model is exactly one u32 value per tuple (hj.h);
this layer generalizes to arbitrarily many named columns WITHOUT
touching the kernels: the join runs with each side's ROW INDEX as its
payload (u32 iota -- the engine's payload domain), and the matched
index pairs materialize any number of columns host-side with numpy
fancy indexing (host gathers are cheap; device gathers are the one
thing this hardware cannot do, PERF_NOTES.md).

Column dtypes are unconstrained (any numpy dtype, any width): only the
join KEY must be u32, as in the reference.

1:1 (unique-build) joins read the matched build index straight from the
aligned result; duplicate-key builds go through the expansion path with
the index payload, so full M:N output needs no extra machinery either.
"""

from __future__ import annotations

import numpy as np

from .phj import join, materialize_expanded


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
