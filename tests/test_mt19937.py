"""MT19937 parity: vectorized block generators vs direct scalar transcriptions.

The scalar oracles below are line-for-line ports of the reference C
(npj.cpp:133-175 and write.cpp:68-139); the library implementations must match
them exactly, including the reference's non-standard 32-bit seeding (no "+ i").
"""

import numpy as np

from hash_join_codes_knl_tpu.utils.mt19937 import MT19937, MT19937_64

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


class ScalarMT32:
    def __init__(self, seed):
        n = [0] * 625
        n[0] = seed & M32
        for i in range(623):
            n[i + 1] = (0x6C078965 * (n[i] ^ (n[i] >> 30))) & M32
        self.n = n
        self.index = 624

    def next(self):
        n = self.n
        if self.index == 624:
            i = 0
            while True:
                y = (n[i] & 0x80000000) + (n[i + 1] & 0x7FFFFFFF)
                n[i] = (n[i + 397] ^ (y >> 1)) & M32
                if y & 1:
                    n[i] ^= 0x9908B0DF
                i += 1
                if i == 227:
                    break
            n[624] = n[0]
            while True:
                y = (n[i] & 0x80000000) + (n[i + 1] & 0x7FFFFFFF)
                n[i] = (n[i - 227] ^ (y >> 1)) & M32
                if y & 1:
                    n[i] ^= 0x9908B0DF
                i += 1
                if i == 624:
                    break
            self.index = 0
        y = n[self.index]
        self.index += 1
        y ^= y >> 11
        y = (y ^ ((y << 7) & 0x9D2C5680)) & M32
        y = (y ^ ((y << 15) & 0xEFC60000)) & M32
        y ^= y >> 18
        return y & M32


class ScalarMT64:
    def __init__(self, seed):
        n = [0] * 313
        n[0] = seed & M64
        for i in range(311):
            n[i + 1] = (6364136223846793005 * (n[i] ^ (n[i] >> 62)) + i + 1) & M64
        self.n = n
        self.index = 312

    def next(self):
        n = self.n
        if self.index == 312:
            i = 0
            while True:
                x = (n[i] & 0xFFFFFFFF80000000) | (n[i + 1] & 0x7FFFFFFF)
                n[i] = (n[i + 156] ^ (x >> 1)) & M64
                if x & 1:
                    n[i] ^= 0xB5026F5AA96619E9
                i += 1
                if i == 156:
                    break
            n[312] = n[0]
            while True:
                x = (n[i] & 0xFFFFFFFF80000000) | (n[i + 1] & 0x7FFFFFFF)
                n[i] = (n[i - 156] ^ (x >> 1)) & M64
                if x & 1:
                    n[i] ^= 0xB5026F5AA96619E9
                i += 1
                if i == 312:
                    break
            self.index = 0
        x = n[self.index]
        self.index += 1
        x ^= (x >> 29) & 0x5555555555555555
        x = (x ^ ((x << 17) & 0x71D67FFFEDA60000)) & M64
        x = (x ^ ((x << 37) & 0xFFF7EEE000000000)) & M64
        x ^= x >> 43
        return x


def test_mt32_matches_scalar_oracle():
    for seed in (0, 1, 5489, 0xDEADBEEF, 12345):
        fast = MT19937(seed)
        slow = ScalarMT32(seed)
        got = fast.take(2000)
        want = np.array([slow.next() for _ in range(2000)], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


def test_mt64_matches_scalar_oracle():
    for seed in (0, 1, 5489, 0xDEADBEEF):
        fast = MT19937_64(seed)
        slow = ScalarMT64(seed)
        got = fast.take(1000)
        want = np.array([slow.next() for _ in range(1000)], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_mt64_standard_vector():
    # 64-bit seeding is the textbook recurrence, so the canonical
    # mt19937-64.c test value applies: seed 5489 -> first output.
    assert MT19937_64(5489).next() == 14514284786278117030


def test_take_is_stream_stable():
    a = MT19937(42)
    b = MT19937(42)
    chunks = np.concatenate([a.take(n) for n in (1, 7, 623, 624, 1301)])
    np.testing.assert_array_equal(chunks, b.take(len(chunks)))
