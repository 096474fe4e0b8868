"""KSSD sketching: parameter derivation, masks, native/numpy agreement."""

import numpy as np
import pytest

from rabbittclust_tpu.sketch.kssd import (
    KssdParams,
    get_shuffle_table,
    kssd_kmer_hashes_numpy,
    sketch_files_kssd,
    sketch_sequences_kssd,
)
from rabbittclust_tpu.io.fasta import read_fasta


def test_param_derivation():
    # reference SketchInfo.cpp:1019-1030
    p = KssdParams.from_kmer_size(21, 3)
    assert p.half_k == 11 and p.kmer_size == 22
    assert p.half_subk == 6
    assert p.use64 is False         # 11 - 3 == 8, not > 8
    assert p.hash_bits == 32        # exactly fills uint32
    assert p.dim_end == 1 << 12     # 16^(6-3)
    assert p.id == (11 << 8) + (6 << 4) + 3
    p = KssdParams.from_kmer_size(23, 3)
    assert p.use64 is True          # 12 - 3 > 8

    p = KssdParams.from_kmer_size(19, 3)
    assert p.half_k == 10 and p.kmer_size == 20
    assert p.use64 is False         # 10 - 3 == 7 <= 8
    p = KssdParams.from_kmer_size(19, 5)
    assert p.half_subk == 7         # drlevel + 2 when 6-drlevel < 2


def test_masks_match_reference_layout():
    p = KssdParams.from_kmer_size(20, 3)  # half_k=10, half_subk=6
    assert p.tupmask == (1 << 40) - 1
    hol = p.half_k - p.half_subk  # 4
    domask_expected = ((p.tupmask >> (4 * hol)) << (2 * hol)) & p.tupmask
    assert p.domask == domask_expected
    undomask = (p.tupmask ^ p.domask) & p.tupmask
    assert (p.undomask0 | p.undomask1) == undomask
    assert (p.undomask0 & p.undomask1) == 0


def test_manual_tiny_kmer_pipeline():
    """Hand-check the bit pipeline on one k-mer against an independent
    step-by-step rolling computation."""
    p = KssdParams.from_kmer_size(8, 0)   # half_k=4, half_subk=6? no:
    # 6 - 0 >= 2 -> half_subk = 6 > half_k; use a config with half_k>half_subk
    p = KssdParams.from_kmer_size(16, 0)  # half_k=8, half_subk=6, keep all dims
    table = get_shuffle_table(p.half_subk)
    seq = b"ACGTACGTACGTACGTACGT"
    hashes = kssd_kmer_hashes_numpy(seq, p, table)
    # independent rolling emulation
    base_map = {65: 0, 67: 1, 71: 2, 84: 3}
    k = p.kmer_size
    tup = rvs = 0
    got = []
    for idx, ch in enumerate(seq):
        b = base_map[ch]
        tup = ((tup << 2) | b) & p.tupmask
        rvs = (rvs >> 2) + ((b ^ 3) << (4 * p.half_k - 2))
        if idx >= k - 1:
            uni = min(tup, rvs)
            dim_id = (uni & p.domask) >> (2 * (p.half_k - p.half_subk))
            pf = int(table[dim_id])
            if pf < p.dim_end:
                shift1 = 2 * k - 4 * (p.half_k - p.half_subk)
                dr = (((uni & p.undomask0) | ((uni & p.undomask1) << shift1))
                      >> (4 * p.drlevel)) | pf
                got.append(dr)
    assert sorted(set(got)) == sorted(set(hashes.tolist()))


def test_invalid_bases_reset_window():
    p = KssdParams.from_kmer_size(16, 0)
    table = get_shuffle_table(p.half_subk)
    clean = b"ACGTACGTACGTACGTACGTACGT"
    broken = clean[:8] + b"N" + clean[8:]
    h_clean = kssd_kmer_hashes_numpy(clean, p, table)
    h_broken = kssd_kmer_hashes_numpy(broken, p, table)
    # every k-mer spanning the N is dropped
    assert set(h_broken.tolist()) <= set(h_clean.tolist())


def test_native_numpy_agreement(synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    table = get_shuffle_table(p.half_subk)
    for idx in (0, 7, 19):
        recs = list(read_fasta(synthetic_genomes.files[idx]))
        parts = [kssd_kmer_hashes_numpy(s, p, table) for _, _, s in recs]
        expect = np.unique(np.concatenate(parts))
        assert np.array_equal(ss.hashes[idx].astype(np.uint64), expect)


def test_use64_roundtrip(synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files[:4], min_len=1000,
                              kmer_size=23, drlevel=3)
    assert p.use64 and ss.use64
    assert all(h.dtype == np.uint64 for h in ss.hashes)
    assert all(np.all(np.diff(h.astype(np.int64)) > 0) for h in ss.hashes)


def test_sketch_by_sequence(synthetic_genomes):
    ss, p = sketch_sequences_kssd(synthetic_genomes.single_fasta,
                                  min_len=1000, kmer_size=19, drlevel=2)
    assert len(ss) == len(synthetic_genomes.files)
    assert not ss.sketch_by_file
    # matches by-file sketches genome-by-genome (same content)
    ss_f, _ = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                                kmer_size=19, drlevel=2)
    for a, b in zip(ss.hashes, ss_f.hashes):
        assert np.array_equal(a, b)


def test_min_len_filter(synthetic_genomes):
    ss, _ = sketch_files_kssd(synthetic_genomes.files, min_len=10**9,
                              kmer_size=19, drlevel=2)
    assert len(ss) == 0


def test_gz_genome_equals_plain(tmp_path):
    """A gzip-compressed genome sketches identically to its plain twin, in
    both the native ingest and the Python fallback (reference: kseq over
    gzFile handles .gz transparently, SketchInfo.cpp kseq paths)."""
    import gzip
    import random
    from tests.helpers import rand_seq, write_fasta
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.sketch.minhash import (
        MinHashParams, sketch_files_minhash)

    rng = random.Random(17)
    seq = rand_seq(rng, 30000)
    plain = tmp_path / "g.fna"
    write_fasta(str(plain), "g", "c", seq)
    gz = tmp_path / "g.fna.gz"
    with open(plain, "rb") as f, gzip.open(gz, "wb") as z:
        z.write(f.read())

    ss_a, _ = sketch_files_kssd([str(plain)], 10000, 21, 3)
    ss_b, _ = sketch_files_kssd([str(gz)], 10000, 21, 3)
    assert np.array_equal(ss_a.hashes[0], ss_b.hashes[0])
    assert ss_a.total_lens == ss_b.total_lens

    mp = MinHashParams(kmer_size=21, sketch_size=300)
    mh_a = sketch_files_minhash([str(plain)], 10000, mp)
    mh_b = sketch_files_minhash([str(gz)], 10000, mp)
    assert np.array_equal(mh_a.hashes[0], mh_b.hashes[0])


def test_gz_prescan_isize(tmp_path):
    """calSize's gz ISIZE trick: by-file prescan reads the uncompressed
    size from the gzip trailer (reference SketchInfo.cpp:456-464)."""
    import gzip
    import random
    from tests.helpers import rand_seq, write_fasta
    from rabbittclust_tpu.io.prescan import cal_size

    rng = random.Random(18)
    write_fasta(str(tmp_path / "a.fna"), "a", "c", rand_seq(rng, 25000))
    payload = b">b c\n" + rand_seq(rng, 30000).encode() + b"\n"
    with gzip.open(tmp_path / "b.fna.gz", "wb") as z:
        z.write(payload)
    lst = tmp_path / "l.txt"
    lst.write_text(f"{tmp_path}/a.fna\n{tmp_path}/b.fna.gz\n")
    max_size, min_size, avg = cal_size(True, str(lst), 1, 10000)
    # gz entry contributes its UNCOMPRESSED byte size via the ISIZE field
    assert max_size == len(payload)
