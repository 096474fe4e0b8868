"""End-to-end: simulate -> cluster via CLI -> evaluate (NMI/purity)."""

import subprocess
import sys

import pytest

from rabbittclust_tpu.evaltools.evaluate import (
    label_matrix,
    nmi_score,
    parse_cluster_file,
    purity_report,
    read_ground_truth,
    representative_list,
    weighted_f1,
)
from rabbittclust_tpu.evaltools.simulate import (
    create_containment,
    simulate_long_sequences,
)


def test_simulate_cluster_evaluate(tmp_path):
    out = str(tmp_path / "sim")
    files = simulate_long_sequences(out, num_seeds=4, per_cluster=4,
                                    length=20000, mutation=0.01, seed=3)
    assert len(files) == 16
    # cluster via the real CLI
    cluster_file = str(tmp_path / "sim.cluster")
    r = subprocess.run(
        [sys.executable, "-m", "rabbittclust_tpu.cli.clust_mst", "--fast",
         "-l", "-i", f"{out}/simulated.list", "-o", cluster_file,
         "-d", "0.05", "-m", "1000", "-e"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    clusters = parse_cluster_file(cluster_file, by_file=True)
    assert len(clusters) == 4
    truth = read_ground_truth(f"{out}/simulated.groundTruth")
    pred, gt = label_matrix(clusters, truth)
    assert len(pred) == 16
    assert nmi_score(pred, gt) == 1.0
    assert weighted_f1(pred, gt) == 1.0
    rep = purity_report(clusters, truth)
    assert rep["purity"] == 1.0 and rep["coverage"] == 1.0
    reps = representative_list(clusters)
    assert len(reps) == 4


def test_containment_mode_recovers_fragments(tmp_path):
    """AAF containment (-c) clusters fragments with their seed genome."""
    out = str(tmp_path / "frag")
    # fragments >= 40% of the seed stay inside the reference's size-ratio
    # prefilter (radio = int(2e^{dk}-1) = 4 at d=0.05, k=19)
    # genomes must be large enough that the auto-tuner's containment
    # max-distance bound (1/(minSize/4096)-based) admits d=0.05
    files = create_containment(out, num_seeds=3, per_cluster=4,
                               length=150000, min_frac=0.4, seed=5)
    cluster_file = str(tmp_path / "frag.cluster")
    r = subprocess.run(
        [sys.executable, "-m", "rabbittclust_tpu.cli.clust_mst", "--fast",
         "-l", "-i", f"{out}/containment.list", "-o", cluster_file,
         "-d", "0.05", "-m", "1000", "-c", "1000", "-e"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    clusters = parse_cluster_file(cluster_file, by_file=True)
    truth = read_ground_truth(f"{out}/containment.groundTruth")
    rep = purity_report(clusters, truth)
    assert rep["purity"] == 1.0
    assert len(clusters) == 3


def test_newick_analyzer_roundtrip(tmp_path):
    """evaltools.newick parses our --newick-tree output; path distances are
    ultrametric-consistent (2x merge height), subtree extraction and
    threshold clustering recover the planted structure."""
    import subprocess
    import sys
    import os
    from tests.helpers import make_clustered_genomes
    from rabbittclust_tpu.evaltools.newick import (
        basic_stats, cluster_by_threshold, extract_subtree, leaf_distance,
        leaves, parse_newick)

    # hierarchical genomes: 3 subfamilies x 3 genomes, all derived from ONE
    # seed (tight within subfamily, looser across), so the newick tree
    # (reference emits the dendrogram of one forest component) spans all 9
    import random
    from tests.helpers import mutate, rand_seq, write_fasta
    rng = random.Random(21)
    seed_seq = rand_seq(rng, 30000)
    files = []
    for ci in range(3):
        base = mutate(rng, seed_seq, 0.02)
        for m in range(3):
            fp = tmp_path / f"g{ci}_{m}.fna"
            write_fasta(str(fp), f"genome_{ci}_{m}", f"fam{ci}",
                        mutate(rng, base, 0.001))
            files.append(str(fp))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(files) + "\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "rabbittclust_tpu.cli.clust_mst", "--fast",
         "-l", "-i", str(lst), "-o", "t.cluster", "-d", "0.05",
         "-m", "1000", "--newick-tree", "-e"],
        capture_output=True, text=True, env=env, cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-500:]
    root = parse_newick((tmp_path / "t.cluster.newick.tree").read_text())
    terms = leaves(root)
    assert len(terms) == 9
    st = basic_stats(root)
    assert st["leaves"] == 9 and st["internal_nodes"] >= 1
    # same-subfamily leaves are closer than cross-subfamily ones
    by = {}
    for t in terms:
        by.setdefault(os.path.basename(t.name)[1], []).append(t)
    import itertools
    same = max(leaf_distance(a, b) for fam in by.values()
               for a, b in itertools.combinations(fam, 2))
    cross = min(leaf_distance(a, b)
                for fa, fb in itertools.combinations(by.values(), 2)
                for a in fa for b in fb)
    assert same < cross
    # greedy threshold clustering at a cut between the two scales
    mid = (same + cross) / 2
    clusters = cluster_by_threshold(root, mid)
    assert sorted(len(c) for c in clusters) == [3, 3, 3]
    # induced subtree on one subfamily keeps its 3 leaves
    sub = extract_subtree(root, [t.name for t in by["2"]])
    assert len(leaves(sub)) == 3
