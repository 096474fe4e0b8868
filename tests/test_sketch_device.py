"""Device KSSD sketcher: bit-identical to the native/NumPy sketchers.

Covers 32/64-bit hash widths, non-ACGT bases, lowercase, chunk-boundary
carry-over, multi-record genomes, and the SketchSet-level drop-in."""

import random

import numpy as np
import pytest

from rabbittclust_tpu.sketch.kssd import (
    KssdParams,
    get_shuffle_table,
    kssd_kmer_hashes_numpy,
)
from rabbittclust_tpu.ops.sketch_device import (
    device_kmer_hashes,
    sketch_files_kssd_device,
    sketch_kssd_device,
)


def _rand_seq(rng, n, n_frac=0.05):
    return bytes(
        rng.choice(b"ACGTacgt") if rng.random() > n_frac
        else rng.choice(b"NnRYX-")
        for _ in range(n))


@pytest.mark.parametrize("k,dr", [(21, 3), (23, 3), (16, 2)])
def test_device_hashes_equal_numpy(k, dr):
    rng = random.Random(42)
    p = KssdParams.from_kmer_size(k, dr)
    table = get_shuffle_table(p.half_subk)
    for n in (10, k, 3000, 10001):
        seq = _rand_seq(rng, n)
        a = np.unique(kssd_kmer_hashes_numpy(seq, p, table))
        b = np.unique(device_kmer_hashes(seq, p, chunk=1024))
        assert np.array_equal(a, b), (k, dr, n)


def test_chunk_boundaries_are_carryover_exact():
    """Every chunk size must give the same hash set (windows spanning the
    chunk boundary come from the k-1 base overlap)."""
    rng = random.Random(7)
    p = KssdParams.from_kmer_size(21, 3)
    seq = _rand_seq(rng, 5000, n_frac=0.02)
    ref = np.unique(device_kmer_hashes(seq, p, chunk=1 << 20))
    for chunk in (64, 256, 999, 4999, 5000):
        got = np.unique(device_kmer_hashes(seq, p, chunk=chunk))
        assert np.array_equal(ref, got), chunk


def test_device_sketch_equals_native_sketcher(synthetic_genomes, tmp_path):
    """SketchSet-level: device sketch of real FASTA files == the production
    (native C++) sketcher, hashes and metadata, 32- and 64-bit."""
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd

    for k, dr in ((19, 2), (23, 3)):
        ss_h, p = sketch_files_kssd(synthetic_genomes.files[:6],
                                    min_len=1000, kmer_size=k, drlevel=dr)
        ss_d, p_d = sketch_files_kssd_device(synthetic_genomes.files[:6],
                                             min_len=1000, kmer_size=k,
                                             drlevel=dr, chunk=8192)
        assert p == p_d
        assert len(ss_h) == len(ss_d)
        for gh, gd in zip(ss_h.hashes, ss_d.hashes):
            assert gh.dtype == gd.dtype
            assert np.array_equal(gh, gd)
        assert ss_h.names == ss_d.names
        assert ss_h.total_lens == ss_d.total_lens


def test_multi_record_genomes_dedup_across_records():
    p = KssdParams.from_kmer_size(21, 3)
    rng = random.Random(3)
    r1 = _rand_seq(rng, 2000, n_frac=0.0)
    r2 = r1[:1500] + _rand_seq(rng, 500, n_frac=0.0)  # heavy overlap
    (h,) = sketch_kssd_device([[r1, r2]], p, chunk=512)
    table = get_shuffle_table(p.half_subk)
    expect = np.unique(np.concatenate([
        kssd_kmer_hashes_numpy(r1, p, table),
        kssd_kmer_hashes_numpy(r2, p, table)]))
    assert np.array_equal(h, expect.astype(h.dtype))
    assert h.dtype == np.uint32  # k=21,dr=3: half_k-dr = 8 -> 32-bit
