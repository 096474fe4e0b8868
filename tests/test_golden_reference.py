"""Golden parity tests against the ACTUAL reference binaries.

The reference is compiled from /root/reference with our functional stub for
the absent RabbitSketch submodule (tests/reference_oracle/).  These tests
assert BYTE-IDENTICAL outputs between the reference and rabbittclust_tpu:
cluster files, persisted sketches, MST edges, trees, linkage matrices, and
cross-tool consumption of each other's run folders.

Reference is run with -t 1: its genome IDs come from OpenMP completion
order, which is only deterministic single-threaded (acknowledged in the
reference's version_history/history.md).
"""

import os
import subprocess
import sys
import time

import pytest

ORACLE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "ref_build")
BUILD_SCRIPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "reference_oracle", "build_oracle.sh")


@pytest.fixture(scope="session")
def oracle():
    tools = {
        "mst": os.path.join(ORACLE_DIR, "clust-mst"),
        "greedy": os.path.join(ORACLE_DIR, "clust-greedy"),
        "dbscan": os.path.join(ORACLE_DIR, "clust-dbscan"),
        # RabbitFX-stub flavors: unlock the KSSD by-sequence path
        "mst-fx": os.path.join(ORACLE_DIR, "clust-mst-fx"),
        "greedy-fx": os.path.join(ORACLE_DIR, "clust-greedy-fx"),
        # driver for the latent MinHashDBSCAN engine (dbscan.cpp:987)
        "mh-dbscan": os.path.join(ORACLE_DIR, "minhash-dbscan-oracle"),
        # leiden graph-construction stage (igraph stubbed; .graph only)
        "leiden-graph": os.path.join(ORACLE_DIR, "leiden-graph-oracle"),
    }
    if not all(os.path.exists(p) for p in tools.values()):
        if not os.path.exists("/root/reference/src/main.cpp"):
            pytest.skip("reference sources unavailable")
        r = subprocess.run(["bash", BUILD_SCRIPT], capture_output=True,
                           text=True)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return tools


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    from tests.helpers import make_clustered_genomes
    tmp = tmp_path_factory.mktemp("golden")
    return make_clustered_genomes(tmp, n_clusters=3, per_cluster=4,
                                  length=25000, mutation=0.008, seed=42)


def run_ref(oracle, tool, args, cwd):
    r = subprocess.run([oracle[tool], *args, "-t", "1"], cwd=cwd,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-1500:]


def run_ours(module, args, cwd, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable, "-m",
                        f"rabbittclust_tpu.cli.{module}", *args], cwd=cwd,
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-1500:]


def _run_folder(d):
    runs = [x for x in os.listdir(d) if x.startswith("20")]
    assert len(runs) == 1, runs
    return os.path.join(d, runs[0])


def same_bytes(a, b):
    with open(a, "rb") as fa, open(b, "rb") as fb:
        return fa.read() == fb.read()


@pytest.fixture(scope="module")
def fresh_runs(oracle, genomes, tmp_path_factory):
    """One reference run + one of ours at d=0.05 in separate folders."""
    base = tmp_path_factory.mktemp("runs")
    ref_d = base / "ref"
    our_d = base / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["--fast", "-l", "-i", genomes.list_file,
                            "-o", "r.cluster", "-d", "0.05"], str(ref_d))
    time.sleep(1.1)  # distinct run-folder timestamps
    run_ours("clust_mst", ["--fast", "-l", "-i", genomes.list_file,
                           "-o", "o.cluster", "-d", "0.05"], str(our_d))
    return {"ref": str(ref_d), "our": str(our_d)}


def test_mst_cluster_byte_identical(fresh_runs):
    assert same_bytes(os.path.join(fresh_runs["ref"], "r.cluster"),
                      os.path.join(fresh_runs["our"], "o.cluster"))


def test_persisted_artifacts_byte_identical(fresh_runs):
    rf = _run_folder(fresh_runs["ref"])
    of = _run_folder(fresh_runs["our"])
    for f in ("kssd.hash.sketch", "kssd.info.sketch", "edge.mst"):
        assert same_bytes(os.path.join(rf, f), os.path.join(of, f)), f
    # index/dict files are semantically identical but entry order differs
    # (reference: hash-map iteration order; ours: sorted) — sizes must match
    for f in ("kssd.sketch.index", "kssd.sketch.dict"):
        assert os.path.getsize(os.path.join(rf, f)) == \
            os.path.getsize(os.path.join(of, f)), f


def test_premsted_trees_linkage_identical(oracle, fresh_runs):
    rf = _run_folder(fresh_runs["ref"])
    of = _run_folder(fresh_runs["our"])
    run_ref(oracle, "mst", ["--fast", "--premsted", rf, "-o", "rp.cluster",
                            "-d", "0.03", "--newick-tree", "--phylip-tree",
                            "--nexus-tree", "--linkage-matrix"],
            fresh_runs["ref"])
    run_ours("clust_mst", ["--fast", "--premsted", of, "-o", "op.cluster",
                           "-d", "0.03", "--newick-tree", "--phylip-tree",
                           "--nexus-tree", "--linkage-matrix"],
             fresh_runs["our"])
    for rext, oext in [("rp.cluster", "op.cluster"),
                       ("rp.cluster.newick.tree", "op.cluster.newick.tree"),
                       ("rp.cluster.phylip.tree", "op.cluster.phylip.tree"),
                       ("rp.cluster.nexus.tree", "op.cluster.nexus.tree"),
                       ("rp.cluster.linkage.txt", "op.cluster.linkage.txt")]:
        assert same_bytes(os.path.join(fresh_runs["ref"], rext),
                          os.path.join(fresh_runs["our"], oext)), rext


def test_greedy_cluster_byte_identical(oracle, genomes, tmp_path):
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["--fast", "-l", "-i", genomes.list_file,
                               "-o", "r.cluster", "-d", "0.05"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["--fast", "-l", "-i", genomes.list_file,
                              "-o", "o.cluster", "-d", "0.05"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


def test_cross_interop_presketched(oracle, fresh_runs, tmp_path):
    """Our CLI consumes the reference's run folder and vice versa, at a new
    threshold — identical re-clustering output."""
    rf = _run_folder(fresh_runs["ref"])
    of = _run_folder(fresh_runs["our"])
    run_ours("clust_mst", ["--fast", "--presketched", rf,
                           "-o", str(tmp_path / "ours_from_ref.cluster"),
                           "-d", "0.03", "-e"], str(tmp_path))
    run_ref(oracle, "mst", ["--fast", "--presketched", of,
                            "-o", str(tmp_path / "ref_from_ours.cluster"),
                            "-d", "0.03", "-e"], str(tmp_path))
    assert same_bytes(str(tmp_path / "ours_from_ref.cluster"),
                      str(tmp_path / "ref_from_ours.cluster"))


def test_minhash_mst_byte_identical(oracle, genomes, tmp_path):
    """MinHash (default, no --fast) MST flow: byte-identical output.
    Both sides use the same Mash sketching semantics (the oracle's stub
    MinHash == our builder), so this validates the reference's real
    MST/tuning/printing C++ against our engine."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["-l", "-i", genomes.list_file, "-o", "r.cluster",
                            "-d", "0.05", "-k", "21", "-s", "300"],
            str(ref_d))
    time.sleep(1.1)
    run_ours("clust_mst", ["-l", "-i", genomes.list_file, "-o", "o.cluster",
                           "-d", "0.05", "-k", "21", "-s", "300"],
             str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))
    rf = _run_folder(str(ref_d))
    of = _run_folder(str(our_d))
    for f in ("hash.sketch", "info.sketch", "edge.mst"):
        assert same_bytes(os.path.join(rf, f), os.path.join(of, f)), f


def test_by_sequence_mode_byte_identical(oracle, genomes, tmp_path):
    """By-sequence mode (-i single FASTA, no -l), MinHash flavor.
    (The reference's KSSD by-sequence path requires the absent RabbitFX
    submodule — sketchSequencesWithKssd is only compiled under RABBIT_FX —
    so the oracle can only exercise the MinHash by-sequence flow.)"""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["-i", genomes.single_fasta, "-o", "r.cluster",
                            "-d", "0.05", "-m", "1000", "-k", "21",
                            "-s", "300"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_mst", ["-i", genomes.single_fasta, "-o", "o.cluster",
                           "-d", "0.05", "-m", "1000", "-k", "21",
                           "-s", "300"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


def test_kssd_by_sequence_byte_identical(oracle, genomes, tmp_path):
    """KSSD (--fast) by-sequence mode against the RabbitFX-stub oracle
    (sketchSequencesWithKssd, SketchInfo.cpp:563-640, is only compiled under
    RABBIT_FX; the stub in tests/reference_oracle/rabbitfx reconstructs the
    chunk-reader API so the real consumer/sketching code runs).  Cluster
    files, edge.mst, and kssd.info.sketch are byte-identical for both the
    MST and greedy flavors.  kssd.hash.sketch differs by design: the
    reference stores by-sequence hash arrays in hash-set iteration order
    (SketchInfo.cpp:404-409, no sort), ours sorted — same sets."""
    for tool, module, out in (("mst-fx", "clust_mst", "m"),
                              ("greedy-fx", "clust_greedy", "g")):
        ref_d = tmp_path / f"ref{out}"
        our_d = tmp_path / f"our{out}"
        ref_d.mkdir()
        our_d.mkdir()
        run_ref(oracle, tool, ["--fast", "-i", genomes.single_fasta,
                               "-o", "r.cluster", "-d", "0.05",
                               "-m", "1000"], str(ref_d))
        time.sleep(1.1)
        run_ours(module, ["--fast", "-i", genomes.single_fasta,
                          "-o", "o.cluster", "-d", "0.05", "-m", "1000"],
                 str(our_d))
        assert same_bytes(str(ref_d / "r.cluster"),
                          str(our_d / "o.cluster")), tool
        rf = _run_folder(str(ref_d))
        of = _run_folder(str(our_d))
        assert same_bytes(os.path.join(rf, "kssd.info.sketch"),
                          os.path.join(of, "kssd.info.sketch")), tool
        if tool == "mst-fx":
            assert same_bytes(os.path.join(rf, "edge.mst"),
                              os.path.join(of, "edge.mst"))


def test_minhash_greedy_byte_identical(oracle, genomes, tmp_path):
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["-l", "-i", genomes.list_file,
                               "-o", "r.cluster", "-d", "0.05", "-k", "21",
                               "-s", "300"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["-l", "-i", genomes.list_file,
                              "-o", "o.cluster", "-d", "0.05", "-k", "21",
                              "-s", "300"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


def test_greedy_device_byte_identical_vs_reference(oracle, genomes,
                                                   tmp_path, monkeypatch):
    """clust-greedy --device (single-sweep device candidate engines) is
    byte-identical to the ACTUAL reference binary — both the KSSD --fast
    serial engine and the MinHash parity engine (param-size asymmetry,
    first-touch ties).  Direct reference golden, not transitively via the
    host engine."""
    from rabbittclust_tpu.cli.clust_greedy import main as greedy_main
    ref_k = tmp_path / "ref_k"
    ref_m = tmp_path / "ref_m"
    ref_k.mkdir()
    ref_m.mkdir()
    run_ref(oracle, "greedy", ["--fast", "-l", "-i", genomes.list_file,
                               "-o", "rk.cluster", "-d", "0.05"],
            str(ref_k))
    run_ref(oracle, "greedy", ["-l", "-i", genomes.list_file,
                               "-o", "rm.cluster", "-d", "0.05", "-k", "21",
                               "-s", "300"], str(ref_m))
    monkeypatch.chdir(tmp_path)
    ok = str(tmp_path / "ok.cluster")
    om = str(tmp_path / "om.cluster")
    greedy_main(["--fast", "-l", "-i", genomes.list_file, "-d", "0.05",
                 "--device", "--no-save", "-o", ok])
    greedy_main(["-l", "-i", genomes.list_file, "-d", "0.05", "-k", "21",
                 "-s", "300", "--device", "--no-save", "-o", om])
    assert same_bytes(str(ref_k / "rk.cluster"), ok)
    assert same_bytes(str(ref_m / "rm.cluster"), om)


@pytest.fixture(scope="module")
def jitter_genomes(tmp_path_factory):
    """Varied per-genome lengths -> varied containment caps and a
    non-trivial length-desc presketched sort."""
    from tests.helpers import make_clustered_genomes
    tmp = tmp_path_factory.mktemp("golden_jitter")
    return make_clustered_genomes(tmp, n_clusters=3, per_cluster=4,
                                  length=25000, mutation=0.008,
                                  length_jitter=6000, seed=99)


def test_minhash_greedy_containment_byte_identical(oracle, jitter_genomes,
                                                   tmp_path):
    """-c containment (the greedy DEFAULT when -s is absent): per-genome
    caps from raw FILE BYTES (SketchInfo.cpp:890-921), slow-path bounds
    with asymmetric rep-param/query-actual sizes (greedy.cpp:1100-1240)."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["-l", "-i", jitter_genomes.list_file,
                               "-o", "r.cluster", "-d", "0.05", "-k", "21",
                               "-c", "200"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["-l", "-i", jitter_genomes.list_file,
                              "-o", "o.cluster", "-d", "0.05", "-k", "21",
                              "-c", "200"], str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


def test_minhash_greedy_containment_gz_byte_identical(oracle, jitter_genomes,
                                                      tmp_path):
    """.gz inputs: the containment cap reads the gzip trailer ISIZE as a
    SIGNED int32, not the decompressed length (SketchInfo.cpp:895-903)."""
    import gzip
    import shutil
    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    gz_files = []
    for f in jitter_genomes.files:
        dst = gz_dir / (os.path.basename(f) + ".gz")
        with open(f, "rb") as fi, gzip.open(str(dst), "wb") as fo:
            shutil.copyfileobj(fi, fo)
        gz_files.append(str(dst))
    lst = tmp_path / "gz.list"
    lst.write_text("\n".join(gz_files) + "\n")
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["-l", "-i", str(lst), "-o", "r.cluster",
                               "-d", "0.05", "-k", "21", "-c", "200"],
            str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["-l", "-i", str(lst), "-o", "o.cluster",
                              "-d", "0.05", "-k", "21", "-c", "200"],
             str(our_d))
    assert same_bytes(str(ref_d / "r.cluster"), str(our_d / "o.cluster"))


@pytest.mark.parametrize("extra", [["-s", "300"], ["-c", "200"]],
                         ids=["standard", "containment"])
def test_minhash_greedy_presketched_byte_identical(oracle, jitter_genomes,
                                                   tmp_path, extra):
    """--presketched greedy: loader length-sorts desc with id tiebreak
    (sub_command.cpp:2658-2660) before clustering; containment loads
    degrade getSketchSize() to the contain_compress constant
    (Sketch_IO.cpp:333-339) — both must match byte-for-byte."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["-l", "-i", jitter_genomes.list_file,
                               "-o", "r0.cluster", "-d", "0.05", "-k", "21",
                               *extra], str(ref_d))
    rf = _run_folder(str(ref_d))
    run_ref(oracle, "greedy", ["--presketched", rf, "-o", "r1.cluster",
                               "-d", "0.05"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["-l", "-i", jitter_genomes.list_file,
                              "-o", "o0.cluster", "-d", "0.05", "-k", "21",
                              *extra], str(our_d))
    of = _run_folder(str(our_d))
    run_ours("clust_greedy", ["--presketched", of, "-o", "o1.cluster",
                              "-d", "0.05"], str(our_d))
    assert same_bytes(str(ref_d / "r0.cluster"), str(our_d / "o0.cluster"))
    assert same_bytes(str(ref_d / "r1.cluster"), str(our_d / "o1.cluster"))


def test_append_byte_identical(oracle, genomes, tmp_path):
    """--append with --presketched (classic path: pre-MST merge +
    new-vs-all candidate generation)."""
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    app_list.write_text("\n".join(genomes.files[8:]) + "\n")
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["--fast", "-l", "-i", str(init_list),
                            "-o", "r0.cluster", "-d", "0.05"], str(ref_d))
    rf = _run_folder(str(ref_d))
    run_ref(oracle, "mst", ["--fast", "--presketched", rf,
                            "--append", str(app_list), "-l",
                            "-o", "r1.cluster", "-d", "0.05"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_mst", ["--fast", "-l", "-i", str(init_list),
                           "-o", "o0.cluster", "-d", "0.05"], str(our_d))
    of = _run_folder(str(our_d))
    run_ours("clust_mst", ["--fast", "--presketched", of,
                           "--append", str(app_list), "-l",
                           "-o", "o1.cluster", "-d", "0.05"], str(our_d))
    assert same_bytes(str(ref_d / "r1.cluster"), str(our_d / "o1.cluster"))


def test_dense_noise_byte_identical(oracle, genomes, tmp_path):
    """--dense: density/ANI histograms and the .removeNoise output."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["--fast", "-l", "-i", genomes.list_file,
                            "-o", "r.cluster", "-d", "0.05", "--dense"],
            str(ref_d))
    time.sleep(1.1)
    run_ours("clust_mst", ["--fast", "-l", "-i", genomes.list_file,
                           "-o", "o.cluster", "-d", "0.05", "--dense"],
             str(our_d))
    rf = _run_folder(str(ref_d))
    of = _run_folder(str(our_d))
    for f in ("mst.dense", "mst.ani"):
        assert same_bytes(os.path.join(rf, f), os.path.join(of, f)), f
    assert same_bytes(str(ref_d / "r.cluster.removeNoise"),
                      str(our_d / "o.cluster.removeNoise"))


def test_dedup_reps_threshold_analysis_byte_identical(oracle, genomes,
                                                      tmp_path):
    """--dedup-dist/--reps-per-cluster outputs and the --auto-threshold
    --stability analysis report."""
    init_list = tmp_path / "init.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    args = ["--fast", "-l", "-i", str(init_list), "-d", "0.05",
            "--dedup-dist", "0.02", "--reps-per-cluster", "2",
            "--auto-threshold", "--stability"]
    run_ref(oracle, "mst", [*args, "-o", "r.cluster"], str(ref_d))
    time.sleep(1.1)
    run_ours("clust_mst", [*args, "-o", "o.cluster"], str(our_d))
    for rext, oext in [("r.cluster", "o.cluster"),
                       ("r.cluster.dedup", "o.cluster.dedup"),
                       ("r.cluster.reps", "o.cluster.reps"),
                       ("r.cluster.threshold_analysis.txt",
                        "o.cluster.threshold_analysis.txt")]:
        assert same_bytes(str(ref_d / rext), str(our_d / oext)), rext


def test_repdb_cross_interop(oracle, genomes, tmp_path):
    """Greedy RepDB (REPDB002) and MST RepDB (KSMSTST01) binary interop:
    each tool queries a database built by the other with identical TSVs."""
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    app_list.write_text("\n".join(genomes.files[8:]) + "\n")
    d = str(tmp_path)
    # greedy RepDB
    run_ref(oracle, "greedy", ["--fast", "--db", "ref.db", "--build",
                               "-i", str(init_list), "-l", "-d", "0.05",
                               "-o", "rb.cluster"], d)
    run_ours("clust_greedy", ["--fast", "--db", "our.db", "--build",
                              "-i", str(init_list), "-l", "-d", "0.05",
                              "-o", "ob.cluster"], d)
    assert same_bytes(os.path.join(d, "rb.cluster"),
                      os.path.join(d, "ob.cluster"))
    run_ours("clust_greedy", ["--fast", "--db", "ref.db", "--query",
                              "-i", str(app_list), "-l",
                              "-o", "q1.tsv", "--top-k", "3"], d)
    run_ref(oracle, "greedy", ["--fast", "--db", "our.db", "--query",
                               "-i", str(app_list), "-l",
                               "-o", "q2.tsv", "--top-k", "3"], d)
    assert same_bytes(os.path.join(d, "q1.tsv"), os.path.join(d, "q2.tsv"))
    # MST RepDB
    run_ref(oracle, "mst", ["--fast", "--db", "refmst.db", "--build",
                            "-i", str(init_list), "-l", "-d", "0.05",
                            "-o", "rbm.cluster"], d)
    run_ours("clust_mst", ["--fast", "--db", "ourmst.db", "--build",
                           "-i", str(init_list), "-l", "-d", "0.05",
                           "-o", "obm.cluster"], d)
    run_ours("clust_mst", ["--fast", "--db", "refmst.db", "--query",
                           "-i", str(app_list), "-l",
                           "-o", "m1.tsv", "--top-k", "3"], d)
    run_ref(oracle, "mst", ["--fast", "--db", "ourmst.db", "--query",
                            "-i", str(app_list), "-l",
                            "-o", "m2.tsv", "--top-k", "3"], d)
    assert same_bytes(os.path.join(d, "m1.tsv"), os.path.join(d, "m2.tsv"))


def test_state_append_byte_identical(oracle, genomes, tmp_path):
    """--save-rep state-based append for both greedy (cluster_state.bin) and
    MST (mst_cluster_state.bin), including the reference's quirks (N/A
    names for state members, incremental clusters excluding their rep)."""
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    app_list.write_text("\n".join(genomes.files[8:]) + "\n")
    for tool, module in (("greedy", "clust_greedy"), ("mst", "clust_mst")):
        ref_d = tmp_path / f"ref_{tool}"
        our_d = tmp_path / f"our_{tool}"
        ref_d.mkdir()
        our_d.mkdir()
        run_ref(oracle, tool, ["--fast", "-l", "-i", str(init_list),
                               "-o", "r0.cluster", "-d", "0.05",
                               "--save-rep"], str(ref_d))
        rf = _run_folder(str(ref_d))
        run_ref(oracle, tool, ["--fast", "--presketched", rf,
                               "--append", str(app_list), "-l",
                               "-o", "r1.cluster", "-d", "0.05"],
                str(ref_d))
        time.sleep(1.1)
        run_ours(module, ["--fast", "-l", "-i", str(init_list),
                          "-o", "o0.cluster", "-d", "0.05", "--save-rep"],
                 str(our_d))
        of = _run_folder(str(our_d))
        run_ours(module, ["--fast", "--presketched", of,
                          "--append", str(app_list), "-l",
                          "-o", "o1.cluster", "-d", "0.05"], str(our_d))
        assert same_bytes(str(ref_d / "r1.cluster"),
                          str(our_d / "o1.cluster")), tool


def test_dbscan_byte_identical(oracle, genomes, tmp_path):
    """clust-dbscan: plain, noise-producing minPts, and --knn mode."""
    for suffix, extra in (("a", ["--minpts", "3"]),
                          ("b", ["--minpts", "5"]),
                          ("c", ["--minpts", "3", "--knn", "5"]),
                          ("d", ["--minpts", "3", "--max-posting", "4"])):
        ref_d = tmp_path / f"ref{suffix}"
        our_d = tmp_path / f"our{suffix}"
        ref_d.mkdir()
        our_d.mkdir()
        run_ref(oracle, "dbscan", ["--fast", "-l", "-i", genomes.list_file,
                                   "-o", "r.cluster", "--eps", "0.05",
                                   *extra], str(ref_d))
        time.sleep(1.1)
        run_ours("clust_dbscan", ["--fast", "-l", "-i", genomes.list_file,
                                  "-o", "o.cluster", "--eps", "0.05",
                                  *extra], str(our_d))
        assert same_bytes(str(ref_d / "r.cluster"),
                          str(our_d / "o.cluster")), suffix


def test_minhash_dbscan_byte_identical(oracle, genomes, tmp_path):
    """The reference's LATENT MinHashDBSCAN engine (dbscan.cpp:987-1097 —
    unreachable from its CLI, main.cpp:481-484) vs our clust-dbscan
    --minhash: plain, noise-producing minPts, tight eps, and containment
    mode, all byte-identical."""
    for tag, oargs, pargs in (
            ("a", ["0.05", "3", "21", "1000"],
             ["--eps", "0.05", "--minpts", "3"]),
            ("b", ["0.05", "6", "21", "1000"],
             ["--eps", "0.05", "--minpts", "6"]),
            ("c", ["0.01", "2", "21", "1000"],
             ["--eps", "0.01", "--minpts", "2"]),
            ("d", ["0.05", "3", "21", "1000", "contain", "1000"],
             ["--eps", "0.05", "--minpts", "3", "-c", "1000"])):
        ref_out = tmp_path / f"r{tag}.cluster"
        our_out = tmp_path / f"o{tag}.cluster"
        r = subprocess.run([oracle["mh-dbscan"], genomes.list_file,
                            str(ref_out), *oargs], capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr[-1500:]
        run_ours("clust_dbscan", ["--minhash", "-l", "-i",
                                  genomes.list_file, "-o", str(our_out),
                                  "-e", *pargs], str(tmp_path))
        assert same_bytes(str(ref_out), str(our_out)), tag
    # by-sequence: concatenated multi-record FASTA, input-order IDs
    cat = tmp_path / "all.fna"
    with open(cat, "w") as f:
        for fn in genomes.files:
            with open(fn) as src:
                f.write(src.read())
    ref_out = tmp_path / "rs.cluster"
    our_out = tmp_path / "os.cluster"
    r = subprocess.run([oracle["mh-dbscan"], str(cat), str(ref_out),
                        "0.05", "3", "21", "1000", "byseq"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-1500:]
    run_ours("clust_dbscan", ["--minhash", "-i", str(cat), "-o",
                              str(our_out), "-e", "--eps", "0.05",
                              "--minpts", "3"], str(tmp_path))
    assert same_bytes(str(ref_out), str(our_out))


def test_builddb_byte_identical(oracle, genomes, tmp_path):
    """--buildDB: reusable sketch+index DB folder from a genome list AND
    from a previous .cluster file (paths extracted), byte-identical
    sketches; the built DB folder re-clusters via --presketched
    identically on both sides (sub_command.cpp:2224-2300)."""
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "mst", ["--fast", "-l", "-i", genomes.list_file,
                            "--buildDB", "refdb"], str(ref_d))
    run_ours("clust_mst", ["--fast", "-l", "-i", genomes.list_file,
                           "--buildDB", "ourdb"], str(our_d))
    for f in ("kssd.hash.sketch", "kssd.info.sketch"):
        assert same_bytes(str(ref_d / "refdb" / f),
                          str(our_d / "ourdb" / f)), f
    for f in ("kssd.sketch.index", "kssd.sketch.dict"):
        assert os.path.getsize(str(ref_d / "refdb" / f)) == \
            os.path.getsize(str(our_d / "ourdb" / f)), f
    # cross-consume: our CLI re-clusters from the reference's DB and
    # vice versa, identical outputs
    run_ours("clust_mst", ["--fast", "--presketched", str(ref_d / "refdb"),
                           "-o", "x1.cluster", "-d", "0.05", "-e"],
             str(tmp_path))
    run_ref(oracle, "mst", ["--fast", "--presketched", str(our_d / "ourdb"),
                            "-o", "x2.cluster", "-d", "0.05", "-e"],
            str(tmp_path))
    assert same_bytes(str(tmp_path / "x1.cluster"),
                      str(tmp_path / "x2.cluster"))
    # cluster-file input: paths extracted into builddb.list.  The
    # reference's detector only recognizes HEADERLESS cluster files (first
    # non-blank line must start with "the cluster",
    # sub_command.cpp:2224-2238 — the "# Clustering threshold" banner makes
    # it crash); greedy output has no banner.  We accept both forms.
    run_ref(oracle, "greedy", ["--fast", "-l", "-i", genomes.list_file,
                               "-o", "g.cluster", "-d", "0.05", "-e"],
            str(tmp_path))
    run_ref(oracle, "mst", ["--fast", "-i", str(tmp_path / "g.cluster"),
                            "--buildDB", "refdb2", "-l"], str(ref_d))
    run_ours("clust_mst", ["--fast", "-i", str(tmp_path / "g.cluster"),
                           "--buildDB", "ourdb2", "-l"], str(our_d))
    assert same_bytes(str(ref_d / "refdb2" / "builddb.list"),
                      str(our_d / "ourdb2" / "builddb.list"))
    assert same_bytes(str(ref_d / "refdb2" / "kssd.hash.sketch"),
                      str(our_d / "ourdb2" / "kssd.hash.sketch"))
    # headered cluster file: ours extracts paths (reference quirk: crashes)
    run_ours("clust_mst", ["--fast", "-i", str(tmp_path / "x1.cluster"),
                           "--buildDB", "ourdb3", "-l"], str(our_d))
    assert os.path.exists(str(our_d / "ourdb3" / "kssd.hash.sketch"))


def test_repdb_assign_stats_append_byte_identical(oracle, genomes, tmp_path):
    """RepDB --assign TSVs, --stats reports, and --append growth
    (greedy REPDB002 flavor) are byte-identical cross-tool."""
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    app_list.write_text("\n".join(genomes.files[8:]) + "\n")
    d = str(tmp_path)
    run_ref(oracle, "greedy", ["--fast", "--db", "r.db", "--build",
                               "-i", str(init_list), "-l", "-d", "0.05",
                               "-o", "rb.cluster"], d)
    run_ours("clust_greedy", ["--fast", "--db", "o.db", "--build",
                              "-i", str(init_list), "-l", "-d", "0.05",
                              "-o", "ob.cluster"], d)
    # --assign cross-tool: our CLI on the reference's DB and vice versa
    run_ours("clust_greedy", ["--fast", "--db", "r.db", "--assign",
                              "-i", str(app_list), "-l",
                              "-o", "a1.tsv"], d)
    run_ref(oracle, "greedy", ["--fast", "--db", "o.db", "--assign",
                               "-i", str(app_list), "-l",
                               "-o", "a2.tsv"], d)
    assert same_bytes(os.path.join(d, "a1.tsv"), os.path.join(d, "a2.tsv"))
    # --stats report (stdout) cross-tool
    r1 = subprocess.run([oracle["greedy"], "--fast", "--db", "o.db",
                         "--stats", "-t", "1"], cwd=d, capture_output=True,
                        text=True)
    assert r1.returncode == 0, r1.stderr[-500:]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r2 = subprocess.run([sys.executable, "-m",
                         "rabbittclust_tpu.cli.clust_greedy", "--fast",
                         "--db", "r.db", "--stats"], cwd=d,
                        capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr[-500:]
    assert r1.stdout == r2.stdout
    # --append on the DB, then identical --query results cross-tool
    run_ref(oracle, "greedy", ["--fast", "--db", "r.db", "--append",
                               str(app_list), "-l", "-o", "ra.cluster"], d)
    run_ours("clust_greedy", ["--fast", "--db", "o.db", "--append",
                              str(app_list), "-l", "-o", "oa.cluster"], d)
    run_ours("clust_greedy", ["--fast", "--db", "r.db", "--query",
                              "-i", str(init_list), "-l",
                              "-o", "q1.tsv", "--top-k", "2"], d)
    run_ref(oracle, "greedy", ["--fast", "--db", "o.db", "--query",
                               "-i", str(init_list), "-l",
                               "-o", "q2.tsv", "--top-k", "2"], d)
    assert same_bytes(os.path.join(d, "q1.tsv"), os.path.join(d, "q2.tsv"))


def test_minhash_state_and_repdb_interop(oracle, genomes, tmp_path):
    """MinHash (no --fast) persistence interop: full cluster state
    (MINHASH magic) --save-rep + --append cross-tool, MHREPDB1 databases
    readable by both sides with identical --stats and --query outputs."""
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(genomes.files[:8]) + "\n")
    app_list.write_text("\n".join(genomes.files[8:]) + "\n")
    d = str(tmp_path)
    mh = ["-k", "21", "-s", "300"]
    # full-state append: reference builds the state, OUR CLI appends to it
    ref_d = tmp_path / "ref"
    our_d = tmp_path / "our"
    ref_d.mkdir()
    our_d.mkdir()
    run_ref(oracle, "greedy", ["-l", "-i", str(init_list), "-o",
                               "r0.cluster", "-d", "0.05", *mh,
                               "--save-rep"], str(ref_d))
    rf = _run_folder(str(ref_d))
    time.sleep(1.1)
    run_ours("clust_greedy", ["-l", "-i", str(init_list), "-o", "o0.cluster",
                              "-d", "0.05", *mh, "--save-rep"], str(our_d))
    of = _run_folder(str(our_d))
    # cross-append: each tool appends using the OTHER tool's state folder
    run_ours("clust_greedy", ["--presketched", rf, "--append",
                              str(app_list), "-l", "-o", "x1.cluster",
                              "-d", "0.05", *mh], d)
    run_ref(oracle, "greedy", ["--presketched", of, "--append",
                               str(app_list), "-l", "-o", "x2.cluster",
                               "-d", "0.05", *mh], d)
    assert same_bytes(os.path.join(d, "x1.cluster"),
                      os.path.join(d, "x2.cluster"))
    # MHREPDB1: build on each side, cross --stats and --query
    run_ref(oracle, "greedy", ["--db", "r.db", "--build", "-i",
                               str(init_list), "-l", "-d", "0.05", *mh,
                               "-o", "rb.cluster"], d)
    run_ours("clust_greedy", ["--db", "o.db", "--build", "-i",
                              str(init_list), "-l", "-d", "0.05", *mh,
                              "-o", "ob.cluster"], d)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    s1 = subprocess.run([oracle["greedy"], "--db", "o.db", "--stats",
                         "-t", "1"], cwd=d, capture_output=True, text=True)
    s2 = subprocess.run([sys.executable, "-m",
                         "rabbittclust_tpu.cli.clust_greedy", "--db", "r.db",
                         "--stats"], cwd=d, capture_output=True, text=True,
                        env=env)
    assert s1.returncode == 0 and s2.returncode == 0
    assert s1.stdout == s2.stdout
    run_ours("clust_greedy", ["--db", "r.db", "--query", "-i",
                              str(app_list), "-l", "-o", "q1.tsv",
                              "--top-k", "3"], d)
    run_ref(oracle, "greedy", ["--db", "o.db", "--query", "-i",
                               str(app_list), "-l", "-o", "q2.tsv",
                               "--top-k", "3"], d)
    assert same_bytes(os.path.join(d, "q1.tsv"), os.path.join(d, "q2.tsv"))


def _parse_graph(path):
    """(header_line, sorted [(from, to, weight)]) of a saved .graph file.
    Edge ORDER is canonicalized: the reference emits edges in hash-map
    iteration order (a robin-hood artifact, std::unordered_map in the
    oracle build), ours in native pair-engine order — both orders are
    non-semantic, like the kssd.sketch.dict posting order (PARITY.md)."""
    with open(path) as f:
        header = f.readline()
        edges = []
        for line in f:
            a, b, w = line.split()
            edges.append((int(a), int(b), float(w)))
    return header, sorted(edges)


def test_leiden_graph_byte_identical(oracle, tmp_path):
    """The Leiden similarity-graph construction stage (leiden.cpp:168-293)
    + save_graph_to_file format (leiden.cpp:474-492) vs the compiled
    reference code (igraph stubbed — graph build and .graph save run the
    reference's own loops).  Standard and k-NN modes.  The corpus uses
    150kb genomes (~35-hash sketches at drlevel 3 — the reference's graph
    stage is 32-bit-only, so drlevel must stay >= 3 at k=21) with per-
    member mutation rates and length jitter so distances at the k-NN cut
    are distinct — at a TIED cut the reference's pick is a hash-map
    iteration artifact (priority_queue + strict <, leiden.cpp:216-223)
    that nothing can replicate, while ours is canonical (neighbor id
    ascending)."""
    import numpy as np
    rng = np.random.default_rng(11)
    B = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    # per_cluster=16 -> in-cluster degree 15 > knn=12, so the k-NN cap
    # BINDS (both CLIs bump knn<10 to 50, so the oracle gets >=10)
    for c in range(3):
        L = 150000
        base = rng.integers(0, 4, size=L, dtype=np.uint8)
        for m in range(16):
            gg = base.copy()
            mut = rng.random(L) < (0.008 + 0.0015 * m)
            gg[mut] = rng.integers(0, 4, size=int(mut.sum()),
                                   dtype=np.uint8)
            gl = L - int(rng.integers(0, 50000))
            seq = B[gg[:gl]].tobytes()
            fp = tmp_path / f"lg{c}_{m:02d}.fna"
            with open(fp, "wb") as f:
                f.write(b">lg%d_%02d cluster%d\n" % (c, m, c))
                for k in range(0, gl, 80):
                    f.write(seq[k:k + 80] + b"\n")
            files.append(str(fp))
    list_file = tmp_path / "list.txt"
    list_file.write_text("\n".join(files) + "\n")
    for knn in (0, 12):
        ref_graph = tmp_path / f"ref_{knn}.graph"
        r = subprocess.run([oracle["leiden-graph"], str(list_file),
                            str(ref_graph), "0.05", "21", "3", str(knn)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-1500:]
        our_d = tmp_path / f"our_{knn}"
        our_d.mkdir()
        run_ours("clust_leiden",
                 ["--fast", "-l", "-i", str(list_file), "-o", "o.cluster",
                  "-d", "0.05", "-k", "21",
                  "--knn", str(knn) if knn else "0"], str(our_d))
        our_graph = os.path.join(_run_folder(str(our_d)), "leiden.graph")
        ref_h, ref_e = _parse_graph(str(ref_graph))
        our_h, our_e = _parse_graph(our_graph)
        assert ref_h == our_h, f"knn={knn}: header differs"
        if knn == 0:
            # standard mode: exact edge identity + weights
            assert [(a, b) for a, b, _ in ref_e] == \
                [(a, b) for a, b, _ in our_e], "edge set differs"
            for (ra, rb, rw), (oa, ob, ow) in zip(ref_e, our_e):
                assert abs(rw - ow) < 1e-12, (ra, rb, rw, ow)
        else:
            # k-NN mode: EXACT per-node kept-weight multisets and exact
            # identity for edges strictly inside the cut; edge IDENTITY at
            # a tied cut is unreplicable by construction (the reference's
            # pick there is a priority_queue + hash-map-order artifact,
            # leiden.cpp:216-223; ours is canonical neighbor-id order)
            from collections import defaultdict
            rm, om = defaultdict(list), defaultdict(list)
            for a, b, w in ref_e:
                rm[a].append((w, b))
            for a, b, w in our_e:
                om[a].append((w, b))
            assert set(rm) == set(om), "per-node coverage differs"
            for a in rm:
                rw = sorted(w for w, _ in rm[a])
                ow = sorted(w for w, _ in om[a])
                assert len(rw) == len(ow), a
                assert all(abs(x - y) < 1e-12
                           for x, y in zip(rw, ow)), a
                cut_r, cut_o = rw[0], ow[0]
                strict_r = {b for w, b in rm[a] if w > cut_r + 1e-12}
                strict_o = {b for w, b in om[a] if w > cut_o + 1e-12}
                assert strict_r == strict_o, a


def test_leiden_pregraph_consumes_reference_graph(oracle, tmp_path):
    """Cross-tool interop: our clust-leiden --pregraph loads a .graph file
    SAVED BY THE REFERENCE's own save_graph_to_file and clusters from it
    (the reference's fast resolution-sweep workflow,
    sub_command.cpp:3200-3226)."""
    import numpy as np
    rng = np.random.default_rng(23)
    B = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for c in range(3):
        L = 120000
        base = rng.integers(0, 4, size=L, dtype=np.uint8)
        for m in range(6):
            gg = base.copy()
            mut = rng.random(L) < 0.01
            gg[mut] = rng.integers(0, 4, size=int(mut.sum()),
                                   dtype=np.uint8)
            seq = B[gg].tobytes()
            fp = tmp_path / f"pg{c}_{m}.fna"
            with open(fp, "wb") as f:
                f.write(b">pg%d_%d x\n" % (c, m))
                for k in range(0, L, 80):
                    f.write(seq[k:k + 80] + b"\n")
            files.append(str(fp))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(files) + "\n")
    ref_graph = tmp_path / "ref.graph"
    r = subprocess.run([oracle["leiden-graph"], str(lst), str(ref_graph),
                        "0.05", "21", "3", "0"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-1500:]
    out = tmp_path / "pg.cluster"
    run_ours("clust_leiden", ["--pregraph", str(ref_graph), "-o",
                              str(out), "-d", "0.05"], str(tmp_path))
    text = out.read_text()
    # 3 planted communities over 18 nodes, ids 0..17 each exactly once
    assert text.count("the cluster") == 3, text[:400]
    import re
    ids = sorted(int(m.group(1)) for m in re.finditer(
        r"^\t\s*\d+\t\s*(\d+)$", text, re.M))
    assert ids == list(range(18)), ids
