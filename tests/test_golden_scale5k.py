"""5k-genome golden vs the compiled reference binary (marked slow).

The 400-genome goldens (test_golden_scale.py) cannot catch block-boundary
bugs: the candidate_pair_counts row-block split shipped once and only bit
at >5k genomes (CLAUDE.md).  This corpus crosses every blocking boundary
in play — the reference's subSize=8 reduce cadence (MST.cpp:388-400), our
native engine's batching, and the device engines' rb tiles — and asserts
byte-identical `.cluster` + `edge.mst` at -t 1, plus partition equality
for the panel-streamed device labelprop engine.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_golden_reference import (
    ORACLE_DIR,
    _run_folder,
    oracle,
    run_ours,
    run_ref,
    same_bytes,
)

N_CLUSTERS = 200
PER_CLUSTER = 25          # 5000 genomes
GENOME_LEN = 11000        # >= the 10k min-length filter
DRLEVEL = 2               # 1/256 reduction -> ~40 hashes per genome

_B = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def corpus5k(tmp_path_factory):
    """5000 synthetic genomes in ONE multi-fasta per cluster is too easy to
    mess up id-wise — one file per genome, list in input order, generated
    with vectorized numpy (a Python char loop would take minutes)."""
    tmp = tmp_path_factory.mktemp("scale5k")
    rng = np.random.default_rng(20260820)
    files = []
    for c in range(N_CLUSTERS):
        base = rng.integers(0, 4, size=GENOME_LEN, dtype=np.uint8)
        for m in range(PER_CLUSTER):
            g = base.copy()
            mut = rng.random(GENOME_LEN) < 0.02
            g[mut] = rng.integers(0, 4, size=int(mut.sum()), dtype=np.uint8)
            seq = _B[g].tobytes()
            fp = tmp / f"g{c:03d}_{m:02d}.fna"
            with open(fp, "wb") as f:
                f.write(b">genome_%03d_%02d cluster%03d\n" % (c, m, c))
                for k in range(0, GENOME_LEN, 80):
                    f.write(seq[k:k + 80] + b"\n")
            files.append(str(fp))
    list_file = tmp / "list.txt"
    list_file.write_text("\n".join(files) + "\n")
    return str(list_file)


@pytest.mark.slow
def test_mst_5k_byte_identical(oracle, corpus5k, tmp_path):
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["--fast", "-l", "-i", corpus5k, "-o",
                            "r.cluster", "-d", "0.05", "--drlevel",
                            str(DRLEVEL)], str(ref_d))
    run_ours("clust_mst", ["--fast", "-l", "-i", corpus5k, "-o",
                           "o.cluster", "-d", "0.05", "--drlevel",
                           str(DRLEVEL), "-t", "1"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))
    rf, of = _run_folder(str(ref_d)), _run_folder(str(our_d))
    for f in ("edge.mst", "kssd.hash.sketch", "kssd.info.sketch"):
        assert same_bytes(os.path.join(rf, f), os.path.join(of, f)), f


@pytest.mark.slow
def test_greedy_5k_byte_identical(oracle, corpus5k, tmp_path):
    """The greedy engine's inverted-index + batching path at scale
    (greedy.cpp:566-899; our native rtc_greedy engine)."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["--fast", "-l", "-i", corpus5k, "-o",
                               "r.cluster", "-d", "0.05", "--drlevel",
                               str(DRLEVEL)], str(ref_d))
    run_ours("clust_greedy", ["--fast", "-l", "-i", corpus5k, "-o",
                              "o.cluster", "-d", "0.05", "--drlevel",
                              str(DRLEVEL), "-t", "1"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


@pytest.mark.slow
def test_labelprop_5k_partition_matches_host(corpus5k):
    """Panel-streamed device labelprop at 5k genomes (multi-panel forced:
    panel_tiles=4 with rb=1024 -> 15 panels) == host MST-cut partition.
    Signature width 2048 keeps the CPU-backend matmuls affordable while
    the filter stays selective for ~40-hash sketches."""
    from rabbittclust_tpu.cluster.mst import (
        clusters_from_forest, compute_mst, cut_forest)
    from rabbittclust_tpu.io.fasta import read_file_list
    from rabbittclust_tpu.ops.labelprop import threshold_clusters_device_lp
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd

    ss, kp = sketch_files_kssd(read_file_list(corpus5k), 10000, 16,
                               DRLEVEL, 2)
    res = compute_mst(ss.hashes, 0.05, kp.kmer_size)
    expect = clusters_from_forest(cut_forest(res.mst, 0.05), len(ss))
    got = threshold_clusters_device_lp(ss.hashes, 0.05, kp.kmer_size,
                                       bits=2048, row_block=1024,
                                       panel_tiles=4)
    canon = sorted(tuple(sorted(c)) for c in got)
    canon_h = sorted(tuple(sorted(c)) for c in expect)
    assert canon == canon_h


@pytest.mark.slow
def test_e2e_bench_script_smoke(oracle):
    """scripts/e2e_bench.py end-to-end on a tiny corpus: both pipelines
    run, partitions equal, JSON well-formed (guards the committed bench
    script against rot)."""
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "e2e_bench.py"),
         "--n-genomes", "600", "--genome-len", "12000"],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr[-1500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["partitions_equal"] and out["clusters"] > 0


@pytest.mark.slow
def test_mst_5k_device_fast_path_byte_identical(oracle, corpus5k, tmp_path,
                                                monkeypatch):
    """Round-5 VERDICT item 2: plain `clust-mst --device -e -t 1` (the
    DEFAULT MST-free clusters path — no env gate) is byte-identical to the
    reference at 5k genomes.  With -k 21 the corpus certifies (no hash
    crosses clusters), so the order comes from the intra-cluster cadence
    replay on top of the device partition, not the full engine."""
    from rabbittclust_tpu.cli.clust_mst import main as mst_main
    ref_d = tmp_path / "ref"
    ref_d.mkdir()
    args = ["--fast", "-l", "-i", corpus5k, "-d", "0.05", "--drlevel",
            str(DRLEVEL), "-k", "21"]
    run_ref(oracle, "mst", [*args, "-o", "r.cluster"], str(ref_d))
    monkeypatch.setenv("RTC_CLUSTER_BITS", "2048")
    monkeypatch.setenv("RTC_CLUSTER_RB", "512")
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "o.cluster")
    mst_main([*args, "-e", "--device", "-t", "1", "-o", out])
    assert same_bytes(str(ref_d / "r.cluster"), out)
