"""Per-tile window-span distribution for a workload/geometry (r5).

The two-class window geometry (JoinPlan.window + window_wide) needs the
span DISTRIBUTION to pick the narrow width: the engine's windows stage
measures only the max.  This script runs just the sorts + the windows
prefix sums (no probe kernel) and prints span quantiles + the wide-class
population at candidate narrow widths -- cheap enough to run on the
chip for the real 16Mx256M zipf workload.

Usage:
  python scripts/span_stats.py [--zipf 1.0] [--tile 896] [--chunks 64]
                               [--inner 16000000] [--outer 256000000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zipf", type=float, default=1.0)
    ap.add_argument("--tile", type=int, default=896)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--inner", type=int, default=16_000_000)
    ap.add_argument("--outer", type=int, default=256_000_000)
    ap.add_argument("--window", type=int, default=0,
                    help="narrow-window candidates also get this value")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.engine.phj import (
        _merge_params,
        _merge_sort_probe,
        _merge_sort_side,
    )
    from hash_join_codes_knl_tpu.relgen.generate import generate
    from hash_join_codes_knl_tpu.utils.hashing import hashed_key

    mode = "zipf" if args.zipf > 0 else (
        "ref" if args.outer <= args.inner else "uniform")
    inner, outer, _ = generate(seed=42, inner_tuples=args.inner,
                               outer_tuples=args.outer, mode=mode,
                               zipf=args.zipf)
    plan = dataclasses.replace(
        plan_join(args.inner, args.outer, tile=args.tile,
                  probe_chunks=args.chunks),
        window=args.window or 0,
    )
    tile, window, rows_total, cap = _merge_params(plan, args.inner,
                                                  args.outer)
    bhk, _ = _merge_sort_side(
        hashed_key(jnp.asarray(inner.keys), plan.factor),
        jnp.asarray(inner.vals), rows_total * 128, num_keys=1,
    )
    ohk, _ = _merge_sort_probe(
        hashed_key(jnp.asarray(outer.keys), plan.factor),
        jnp.asarray(outer.vals), cap, max(1, plan.probe_chunks),
    )
    # the windows math, spans kept (the engine reduces them; we want
    # the distribution)
    lo = ohk[::tile]
    hi = ohk[tile - 1 :: tile]
    coarse = bhk.reshape(rows_total, 128)[:, 0]
    n = lo.shape[0]
    q = jnp.concatenate([lo, hi + jnp.uint32(1), jnp.full(1, 1, jnp.uint32)])
    found = jnp.searchsorted(coarse, q, side="left",
                             method="scan_unrolled").astype(jnp.int32)
    wrow = found[:n] - 1
    hi_row = jnp.where(hi == jnp.uint32(0xFFFFFFFF), rows_total,
                       found[n : 2 * n])
    wrow = jnp.maximum(wrow, found[2 * n] - 1)
    wrow = jnp.clip(wrow, 0, rows_total - 1)
    span = np.asarray((hi_row - wrow) * 128)

    n_tiles = len(span)
    print(f"geometry: tile={tile} chunks={plan.probe_chunks} "
          f"auto_window={window} n_tiles={n_tiles}")
    qs = [50, 75, 90, 95, 99, 99.5, 99.9, 100]
    vals = np.percentile(span, qs).astype(int)
    print("span quantiles:",
          " ".join(f"p{q}={v}" for q, v in zip(qs, vals)))
    for w_n in sorted({int(-(-v // 128) * 128) for v in vals[:-1]}):
        n_wide = int((span > w_n).sum())
        print(f"  narrow={w_n:>6}: wide tiles {n_wide} "
              f"({n_wide / n_tiles:.2%})")


if __name__ == "__main__":
    main()
