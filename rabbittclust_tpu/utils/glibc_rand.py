"""Exact emulation of glibc ``srand()``/``rand()`` (TYPE_3 additive generator).

The reference KSSD sketch pipeline derives its dimension-shuffle table from two
Fisher-Yates passes seeded with glibc ``srand(23)`` and ``srand(348842630)``
(reference: src/SketchInfo.cpp:60-102).  Bit-identical sketches therefore
require a bit-exact reproduction of glibc's PRNG, independent of the host
libc.  This module provides a pure-Python/NumPy implementation; the native
C++ library (native/rtc_native.cpp) provides the fast path used for the
16.7M-element shuffle table.

Algorithm (glibc stdlib/random_r.c, TYPE_3: degree 31, separation 3):
    r[0]  = seed (0 is mapped to 1)
    r[i]  = (16807 * r[i-1]) % 2147483647           for i in [1, 31)
    r[i]  = r[i-31]                                  for i in [31, 34)
    r[i]  = (r[i-3] + r[i-31]) mod 2**32             for i >= 34
    output[k] = r[34 + 10*31 + k] >> 1   (first 310 values are discarded)
"""

from __future__ import annotations

import numpy as np

_DEGREE = 31
_SEP = 3
_DISCARD = 10 * _DEGREE  # glibc discards 10*rand_deg outputs after seeding


class GlibcRand:
    """Stateful glibc rand() emulator producing identical output to glibc."""

    def __init__(self, seed: int):
        seed = seed & 0xFFFFFFFF
        if seed == 0:
            seed = 1
        r = np.zeros(344, dtype=np.uint64)
        # glibc stores the seed as signed int32 and seeds the LCG with
        # Schrage's method using C truncating division (negative seeds allowed).
        word = seed - (1 << 32) if seed >= (1 << 31) else seed
        r[0] = np.uint64(word & 0xFFFFFFFF)
        for i in range(1, _DEGREE):
            # hi = word / 127773 with C semantics (truncation toward zero)
            q = abs(word) // 127773
            if word < 0:
                q = -q
            lo = word - q * 127773
            word = 16807 * lo - 2836 * q
            if word < 0:
                word += 2147483647
            r[i] = np.uint64(word & 0xFFFFFFFF)
        for i in range(_DEGREE, _DEGREE + _SEP):
            r[i] = r[i - _DEGREE]
        # additive feedback, uint32 wraparound
        rl = r.tolist()
        for i in range(_DEGREE + _SEP, 344):
            rl[i] = (rl[i - _SEP] + rl[i - _DEGREE]) & 0xFFFFFFFF
        self._hist = rl  # ring history; only last 31 values needed
        self._emitted = 0

    def rand(self) -> int:
        """Next glibc rand() output in [0, 2**31)."""
        h = self._hist
        nxt = (h[-_SEP] + h[-_DEGREE]) & 0xFFFFFFFF
        h.append(nxt)
        if len(h) > 4096:
            del h[: len(h) - _DEGREE]
        return nxt >> 1

    def rand_array(self, n: int) -> np.ndarray:
        """Vector of the next ``n`` rand() outputs (uint32)."""
        h = self._hist
        out = np.empty(n, dtype=np.uint32)
        for k in range(n):
            nxt = (h[-_SEP] + h[-_DEGREE]) & 0xFFFFFFFF
            h.append(nxt)
            out[k] = nxt >> 1
        del h[: len(h) - _DEGREE]
        return out


def glibc_rand_stream(seed: int, n: int) -> np.ndarray:
    """First ``n`` outputs of glibc rand() after srand(seed), as uint32."""
    g = GlibcRand(seed)
    return g.rand_array(n)


def fisher_yates_glibc(arr: np.ndarray, seed: int) -> np.ndarray:
    """In-place Fisher-Yates shuffle exactly as reference ``shuffle()``.

    Reference (src/SketchInfo.cpp:60-78):
        srand(seed);
        for (i = length-1; i > 0; i--) { j = rand() % (i+1); swap(arr[i], arr[j]); }
    """
    n = len(arr)
    rng = GlibcRand(seed)
    rnd = rng.rand_array(n - 1)  # outputs for i = n-1 .. 1
    a = arr
    for k in range(n - 1):
        i = n - 1 - k
        j = int(rnd[k]) % (i + 1)
        a[i], a[j] = a[j], a[i]
    return a


def generate_shuffle_dim_py(half_subk: int) -> np.ndarray:
    """Pure-Python shuffle-table generation (slow; native path preferred).

    Reference (src/SketchInfo.cpp:80-102): identity array shuffled with
    seed 23, then shuffled again with seed 348842630.
    """
    dim_size = 1 << (4 * half_subk)
    arr = np.arange(dim_size, dtype=np.int32)
    fisher_yates_glibc(arr, 23)
    fisher_yates_glibc(arr, 348842630)
    return arr
