"""Native host components (C++ via ctypes).

The generator's rejection sampler and Fisher-Yates shuffle are sequential by
contract (one RNG stream, write.cpp:1579-1585), so the only way to produce
multi-hundred-million-row relations quickly is native code.  ``libhjkgen.so``
is built on demand from gen.cpp with the system g++; everything degrades
gracefully to the pure-Python oracle when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhjkgen.so")
_SRC = os.path.join(_DIR, "gen.cpp")
_RELIO_SO = os.path.join(_DIR, "libhjkrelio.so")
_RELIO_SRC = os.path.join(_DIR, "relio.cpp")
_lock = threading.Lock()
_lib = None
_tried = False
_relio = None
_relio_tried = False


def _build(src=_SRC, so=_SO, extra=()) -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", *extra, "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.hjk_generate.restype = ctypes.c_int
        lib.hjk_generate.argtypes = [
            ctypes.c_uint32,  # seed
            ctypes.c_uint64,  # inner_tuples
            ctypes.c_uint64,  # outer_tuples
            ctypes.c_double,  # selc
            ctypes.c_double,  # zipf
            ctypes.c_int,     # mode
            ctypes.c_uint32,  # f_inner
            ctypes.c_uint32,  # f_outer
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib


def _load_relio():
    global _relio, _relio_tried
    with _lock:
        if _relio is not None or _relio_tried:
            return _relio
        _relio_tried = True
        if not os.path.exists(_RELIO_SO) or os.path.getmtime(
            _RELIO_SO
        ) < os.path.getmtime(_RELIO_SRC):
            if not _build(_RELIO_SRC, _RELIO_SO, extra=("-pthread",)):
                return None
        try:
            lib = ctypes.CDLL(_RELIO_SO)
        except OSError:
            return None
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.hjk_read_u32.restype = ctypes.c_int
        lib.hjk_read_u32.argtypes = [ctypes.c_char_p, u32p, ctypes.c_uint64,
                                     ctypes.c_int]
        lib.hjk_write_u32.restype = ctypes.c_int
        lib.hjk_write_u32.argtypes = [ctypes.c_char_p, u32p,
                                      ctypes.c_uint64, ctypes.c_int]
        lib.hjk_checksum_u32.restype = ctypes.c_uint64
        lib.hjk_checksum_u32.argtypes = [u32p, ctypes.c_uint64, ctypes.c_int]
        _relio = lib
        return _relio


def available() -> bool:
    return _load() is not None


def relio_available() -> bool:
    return _load_relio() is not None


def _io_threads() -> int:
    return min(16, os.cpu_count() or 1)


def read_u32(path: str, n: int) -> np.ndarray:
    """Parallel raw-u32 file read (relio.cpp); raises on failure."""
    lib = _load_relio()
    if lib is None:
        raise RuntimeError("native relio library unavailable")
    out = np.empty(n, dtype=np.uint32)
    rc = lib.hjk_read_u32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n, _io_threads(),
    )
    if rc != 0:
        raise IOError(f"hjk_read_u32({path!r}) failed with code {rc}")
    return out


def write_u32(path: str, arr: np.ndarray) -> None:
    """Parallel raw-u32 file write (relio.cpp); raises on failure."""
    lib = _load_relio()
    if lib is None:
        raise RuntimeError("native relio library unavailable")
    arr = np.ascontiguousarray(arr, dtype=np.uint32)
    rc = lib.hjk_write_u32(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        arr.size, _io_threads(),
    )
    if rc != 0:
        raise IOError(f"hjk_write_u32({path!r}) failed with code {rc}")


def checksum_u32(arr: np.ndarray) -> int:
    """u64 wraparound sum of u32 words (write.cpp:1635-1645 semantics)."""
    lib = _load_relio()
    if lib is None:
        raise RuntimeError("native relio library unavailable")
    arr = np.ascontiguousarray(arr, dtype=np.uint32)
    return int(
        lib.hjk_checksum_u32(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), arr.size,
            _io_threads(),
        )
    )


_MODES = {"ref": 0, "uniform": 1, "zipf": 2}


def generate_native(
    seed: int,
    inner_tuples: int,
    outer_tuples: int,
    selc: float,
    zipf: float,
    mode: str,
    f_inner: int,
    f_outer: int,
):
    """Returns (inner_keys, inner_vals, outer_keys, outer_vals, meta) or
    raises RuntimeError if the native library is unavailable/failed."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native generator library unavailable")
    ik = np.empty(inner_tuples, dtype=np.uint32)
    iv = np.empty(inner_tuples, dtype=np.uint32)
    ok = np.empty(outer_tuples, dtype=np.uint32)
    ov = np.empty(outer_tuples, dtype=np.uint32)
    meta = np.zeros(3, dtype=np.uint64)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))

    rc = lib.hjk_generate(
        seed & 0xFFFFFFFF,
        inner_tuples,
        outer_tuples,
        selc,
        zipf,
        _MODES[mode],
        f_inner & 0xFFFFFFFF,
        f_outer & 0xFFFFFFFF,
        p32(ik),
        p32(iv),
        p32(ok),
        p32(ov),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"hjk_generate failed with code {rc}")
    return ik, iv, ok, ov, {
        "inner_checksum": int(meta[0]),
        "outer_checksum": int(meta[1]),
        "join_distinct": int(meta[2]),
    }
