"""Shared host-side helpers: platform detection + the u64 checksum.

One definition each.  engine/phj, engine/npj, engine/grace,
engine/stream, engine/spill, and relation.py previously carried private
copies of these two functions; the copies had already drifted (only
relation.py used the native checksum kernel).
"""

from __future__ import annotations

import numpy as np


def on_tpu() -> bool:
    """True when the default jax backend is a real accelerator (the
    engine picks Pallas lowerings on hardware, jnp oracles on CPU)."""
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


# below this, thread spawn + ctypes overhead beats numpy's single pass
_NATIVE_MIN = 1 << 20


def u64sum(arr) -> int:
    """u64 wraparound sum of words (write.cpp:1635-1645 checksum
    semantics).  Large u32 arrays go through the native relio kernel
    when it is available (multi-threaded, ~memory-bandwidth)."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint32 and arr.size >= _NATIVE_MIN:
        from .. import native

        if native.relio_available():
            return native.checksum_u32(arr)
    return int(np.sum(arr.astype(np.uint64), dtype=np.uint64))
