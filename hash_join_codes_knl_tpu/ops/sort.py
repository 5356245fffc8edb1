"""Standalone radix sort / sort-by-key operator.

The reference's multi-pass radix machinery is partitioning-only (phj/cpra
never fully sort); BASELINE.json asks for radix sort/partition as a
standalone op.  On TPU, full key sort is XLA's fused variadic sort (payload
columns ride along); the partition-only form is ops/partition.py.  The
Pallas radix pipeline will slot in here as `impl="pallas"` when it lands
(ops/partition_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_relation(keys: jnp.ndarray, *payloads: jnp.ndarray):
    """Sort rows ascending by key; payload columns permuted along."""
    return jax.lax.sort((keys, *payloads), num_keys=1, is_stable=True)
