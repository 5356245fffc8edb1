"""Bit-exact MT19937 (32- and 64-bit) matching the reference RNG streams.

The reference KNL suite seeds one generator per thread and draws all keys,
repeat indices and shuffle positions from it (reference: npj.cpp:133-175 for
the 32-bit variant, phj.cpp:65-150 / write.cpp:68-139 for the 64-bit one).
Parity note: the reference's 32-bit *seeding* recurrence omits the standard
``+ i`` term (``n[i+1] = 0x6c078965 * (n[i] ^ (n[i] >> 30))``,
npj.cpp:140-142), so standard MT19937 test vectors do NOT apply; the 64-bit
seeding is the textbook one.  Both are transcribed here exactly and verified
against scalar oracles in tests/test_mt19937.py.

These run on the host (numpy): relation generation is a host-side, inherently
sequential contract (single RNG stream feeds rejection sampling and a
Fisher-Yates shuffle, write.cpp:1579-1585).  The device-side engine never
needs this generator.
"""

from __future__ import annotations

import numpy as np

# All arithmetic here is modular by design, so overflow warnings are
# noise -- but suppression must stay LOCAL (np.errstate around the
# scalar seeding loops): a module-level np.seterr would silently
# disable overflow diagnostics for the whole embedding process.

_U32 = np.uint32
_U64 = np.uint64

# --- 32-bit variant (npj.cpp:133-175) ---------------------------------------

_N32 = 624
_M32 = 397
_UPPER32 = _U32(0x80000000)
_LOWER32 = _U32(0x7FFFFFFF)
_MATRIX32 = _U32(0x9908B0DF)


class MT19937:
    """32-bit Mersenne Twister with the reference's non-standard seeding."""

    def __init__(self, seed: int):
        n = np.empty(_N32, dtype=_U32)
        n[0] = _U32(seed & 0xFFFFFFFF)
        # npj.cpp:140-142 -- note: no "+ i" term.
        with np.errstate(over="ignore"):
            for i in range(_N32 - 1):
                n[i + 1] = _U32(0x6C078965) * (n[i] ^ (n[i] >> _U32(30)))
        self._state = n
        self._buf = np.empty(0, dtype=_U32)
        self._pos = 0

    def _twist(self) -> np.ndarray:
        n = self._state
        new = np.empty(_N32, dtype=_U32)

        def mag(y: np.ndarray) -> np.ndarray:
            return (y >> _U32(1)) ^ ((y & _U32(1)) * _MATRIX32)

        # chunk 1: i in [0, 227) reads old state only
        y = (n[0:227] & _UPPER32) + (n[1:228] & _LOWER32)
        new[0:227] = n[_M32 : _M32 + 227] ^ mag(y)
        # chunk 2: i in [227, 454) reads new[0:227]
        y = (n[227:454] & _UPPER32) + (n[228:455] & _LOWER32)
        new[227:454] = new[0:227] ^ mag(y)
        # chunk 3: i in [454, 623) reads new[227:396]
        y = (n[454:623] & _UPPER32) + (n[455:624] & _LOWER32)
        new[454:623] = new[227:396] ^ mag(y)
        # i = 623 wraps: n[624] = new n[0] (npj.cpp:152)
        y = (n[623] & _UPPER32) + (new[0] & _LOWER32)
        new[623] = new[396] ^ mag(y)

        self._state = new
        y = new.copy()
        y ^= y >> _U32(11)
        y ^= (y << _U32(7)) & _U32(0x9D2C5680)
        y ^= (y << _U32(15)) & _U32(0xEFC60000)
        y ^= y >> _U32(18)
        return y

    def next(self) -> int:
        return int(self.take(1)[0])

    def take(self, count: int) -> np.ndarray:
        """Next `count` tempered outputs as uint32."""
        out = np.empty(count, dtype=_U32)
        filled = 0
        while filled < count:
            if self._pos == len(self._buf):
                self._buf = self._twist()
                self._pos = 0
            m = min(count - filled, len(self._buf) - self._pos)
            out[filled : filled + m] = self._buf[self._pos : self._pos + m]
            self._pos += m
            filled += m
        return out


# --- 64-bit variant (write.cpp:68-139, phj.cpp:65-150) -----------------------

_N64 = 312
_M64 = 156
_UPPER64 = _U64(0xFFFFFFFF80000000)
_LOWER64 = _U64(0x7FFFFFFF)
_MATRIX64 = _U64(0xB5026F5AA96619E9)


class MT19937_64:
    """64-bit Mersenne Twister, textbook seeding (write.cpp:75-84)."""

    def __init__(self, seed: int):
        n = np.empty(_N64, dtype=_U64)
        n[0] = _U64(seed & 0xFFFFFFFFFFFFFFFF)
        with np.errstate(over="ignore"):
            for i in range(_N64 - 1):
                n[i + 1] = _U64(6364136223846793005) * (
                    n[i] ^ (n[i] >> _U64(62))
                ) + _U64(i + 1)
        self._state = n
        self._buf = np.empty(0, dtype=_U64)
        self._pos = 0

    def _twist(self) -> np.ndarray:
        n = self._state
        new = np.empty(_N64, dtype=_U64)

        def mag(x: np.ndarray) -> np.ndarray:
            return (x >> _U64(1)) ^ ((x & _U64(1)) * _MATRIX64)

        # chunk 1: i in [0, 156) reads old state only (write.cpp:112-118)
        x = (n[0:156] & _UPPER64) | (n[1:157] & _LOWER64)
        new[0:156] = n[_M64 : _M64 + 156] ^ mag(x)
        # chunk 2: i in [156, 311) reads new[0:155]
        x = (n[156:311] & _UPPER64) | (n[157:312] & _LOWER64)
        new[156:311] = new[0:155] ^ mag(x)
        # i = 311 wraps: n[312] = new n[0] (write.cpp:119)
        x = (n[311] & _UPPER64) | (new[0] & _LOWER64)
        new[311] = new[155] ^ mag(x)

        self._state = new
        x = new.copy()
        x ^= (x >> _U64(29)) & _U64(0x5555555555555555)
        x ^= (x << _U64(17)) & _U64(0x71D67FFFEDA60000)
        x ^= (x << _U64(37)) & _U64(0xFFF7EEE000000000)
        x ^= x >> _U64(43)
        return x

    def next(self) -> int:
        return int(self.take(1)[0])

    def take(self, count: int) -> np.ndarray:
        out = np.empty(count, dtype=_U64)
        filled = 0
        while filled < count:
            if self._pos == len(self._buf):
                self._buf = self._twist()
                self._pos = 0
            m = min(count - filled, len(self._buf) - self._pos)
            out[filled : filled + m] = self._buf[self._pos : self._pos + m]
            self._pos += m
            filled += m
        return out
