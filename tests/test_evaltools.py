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
