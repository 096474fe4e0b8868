"""glibc rand() emulation must be bit-exact (shuffle table depends on it)."""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from rabbittclust_tpu.utils.glibc_rand import (
    GlibcRand,
    fisher_yates_glibc,
    glibc_rand_stream,
)
from rabbittclust_tpu.utils import native as native_mod

# Known-good first outputs of glibc rand() (validated against glibc 2.36 via
# a compiled probe; see test_matches_real_glibc for the live check).
GLIBC_23 = [1562469902, 1039845534, 2025653534, 739593874, 994290584]
GLIBC_348842630 = [213393882, 678633718, 71512822, 693253680, 345619655]


def test_python_emulation_seed23():
    assert glibc_rand_stream(23, 5).tolist() == GLIBC_23


def test_python_emulation_seed_large():
    assert glibc_rand_stream(348842630, 5).tolist() == GLIBC_348842630


def test_native_matches_python():
    lib = native_mod.load_native()
    if lib is None:
        pytest.skip("native library unavailable")
    out = np.zeros(1000, dtype=np.uint32)
    lib.rtc_glibc_rand_stream(
        ctypes.c_uint32(12345), ctypes.c_int64(1000),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    assert np.array_equal(out, glibc_rand_stream(12345, 1000))


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
def test_matches_real_glibc(tmp_path):
    src = tmp_path / "probe.c"
    src.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "int main(int c, char**v){srand((unsigned)atol(v[1]));"
        "for(int i=0;i<200;i++)printf(\"%d\\n\", rand());return 0;}\n")
    exe = tmp_path / "probe"
    subprocess.run(["gcc", "-O2", "-o", str(exe), str(src)], check=True)
    for seed in (1, 23, 348842630, 4294967295):
        got = subprocess.run([str(exe), str(seed)], capture_output=True,
                             text=True, check=True).stdout.split()
        want = glibc_rand_stream(seed, 200)
        assert [int(x) for x in got] == want.tolist(), f"seed {seed}"


def test_fisher_yates_small():
    # shuffle([0..9], seed 23): j sequence derived from glibc rand
    arr = np.arange(10, dtype=np.int32)
    fisher_yates_glibc(arr, 23)
    rnd = glibc_rand_stream(23, 9)
    ref = list(range(10))
    for k in range(9):
        i = 9 - k
        j = int(rnd[k]) % (i + 1)
        ref[i], ref[j] = ref[j], ref[i]
    assert arr.tolist() == ref


def test_native_fisher_yates_matches_python():
    lib = native_mod.load_native()
    if lib is None:
        pytest.skip("native library unavailable")
    n = 4096
    a = np.arange(n, dtype=np.int32)
    lib.rtc_fisher_yates(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_uint32(23))
    b = np.arange(n, dtype=np.int32)
    fisher_yates_glibc(b, 23)
    assert np.array_equal(a, b)
