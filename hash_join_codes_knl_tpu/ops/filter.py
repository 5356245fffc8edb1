"""Filter operator: predicate -> compacted relation.

The reference expresses selectivity only at generation time (selc,
write.cpp:1685-1689); the engine exposes it as a first-class operator so
query pipelines can filter relations and join outputs on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from .compact import compact_rows


def filter_relation(keys: jnp.ndarray, vals: jnp.ndarray, predicate):
    """predicate(keys, vals) -> bool mask; returns (count, keys, vals) with
    surviving rows packed to the front (order preserved)."""
    flags = predicate(keys, vals)
    return compact_rows(flags.astype(jnp.uint32), keys, vals)
