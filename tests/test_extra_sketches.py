"""WMinHash / HyperLogLog / OrderMinHash sketch types."""

import random

import numpy as np
import pytest

from rabbittclust_tpu.sketch.extra import (
    HllSketch,
    hll_cardinality,
    hll_distance,
    hll_sketch,
    omh_distance,
    omh_sketch,
    wminhash_distance,
    wminhash_sketch,
)
from tests.helpers import mutate, rand_seq


@pytest.fixture()
def seq_pairs():
    rng = random.Random(11)
    a = rand_seq(rng, 20000).encode()
    near = mutate(rng, a.decode(), 0.01).encode()
    far = rand_seq(rng, 20000).encode()
    return a, near, far


def test_wminhash(seq_pairs):
    a, near, far = seq_pairs
    sa = wminhash_sketch(a)
    sn = wminhash_sketch(near)
    sf = wminhash_sketch(far)
    assert wminhash_distance(sa, sa) == 0.0
    assert wminhash_distance(sa, sn) < wminhash_distance(sa, sf)
    assert wminhash_distance(sa, sf) > 0.9


def test_hll_cardinality(seq_pairs):
    a, _, _ = seq_pairs
    s = hll_sketch(a, k=21)
    est = hll_cardinality(s)
    # ~20k distinct canonical 21-mers; HLL(1024 regs) has ~3% error
    assert 0.85 * 19980 < est < 1.15 * 19980


def test_hll_distance(seq_pairs):
    a, near, far = seq_pairs
    sa, sn, sf = (hll_sketch(x) for x in (a, near, far))
    assert hll_distance(sa, sa) == 0.0
    d_near = hll_distance(sa, sn)
    d_far = hll_distance(sa, sf)
    assert d_near < 0.05 < d_far


def test_omh(seq_pairs):
    a, near, far = seq_pairs
    sa = omh_sketch(a)
    sn = omh_sketch(near)
    sf = omh_sketch(far)
    assert omh_distance(sa, sa) == 0.0
    assert omh_distance(sa, sn) < omh_distance(sa, sf)
    assert omh_distance(sa, sf) == 1.0


def test_omh_order_sensitivity():
    """OMH distinguishes permuted sequences with identical k-mer content."""
    rng = random.Random(5)
    blocks = [rand_seq(rng, 2000) for _ in range(10)]
    s1 = "".join(blocks).encode()
    s2 = "".join(reversed(blocks)).encode()
    d_same = omh_distance(omh_sketch(s1), omh_sketch(s1))
    d_perm = omh_distance(omh_sketch(s1), omh_sketch(s2))
    assert d_same == 0.0
    assert d_perm > 0.0


# ---------------------------------------------------------------------------
# CLI exposure (--sketch-func, dense modifyMST path) + pairwise engines
# ---------------------------------------------------------------------------

def _planted(tmp_path):
    from tests.helpers import make_clustered_genomes
    return make_clustered_genomes(tmp_path, n_clusters=3, per_cluster=3,
                                  length=12000, mutation=0.005, seed=9)


@pytest.mark.parametrize("func", ["WMH", "HLL", "OMH"])
def test_cli_sketch_func_recovers_planted_clusters(func, tmp_path):
    """clust-mst --sketch-func WMH/HLL/OMH clusters the planted genomes
    (the reference's latent RabbitSketch capability, reachable there only
    through modifyMST with sketchFunc hard-wired to MinHash)."""
    import os
    import subprocess
    import sys
    g = _planted(tmp_path)
    out = tmp_path / f"{func}.cluster"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    # WMH distance is 1 - weighted-Jaccard (not Mash-scaled); OMH tuples
    # are long so matches decay faster than Mash — wider thresholds
    thr = {"WMH": "0.5", "HLL": "0.05", "OMH": "0.2"}[func]
    r = subprocess.run(
        [sys.executable, "-m", "rabbittclust_tpu.cli.clust_mst",
         "--sketch-func", func, "-l", "-i", g.list_file, "-o", str(out),
         "-d", thr, "-m", "1000"],
        capture_output=True, text=True, env=env, cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-800:]
    text = out.read_text()
    # 3 clusters of 3, grouped by planted label
    from tests.helpers import parse_cluster_file
    clusters = parse_cluster_file(str(out))
    assert sorted(sorted(c) for c in clusters) == [
        [0, 1, 2], [3, 4, 5], [6, 7, 8]], text


def test_cli_sketch_func_greedy_rejected(tmp_path):
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "rabbittclust_tpu.cli.clust_greedy",
         "--sketch-func", "WMH", "-i", "x.fna", "-o", "o.cluster"],
        capture_output=True, text=True, env=env, cwd=tmp_path)
    assert r.returncode == 1
    assert "can only support MinHash and KSSD" in r.stderr


def test_pair_distance_engines_match_scalar(seq_pairs):
    """Batched pairwise engines == the scalar per-pair distances."""
    from rabbittclust_tpu.ops.extra_pairs import (
        hll_pair_distances, omh_pair_distances, wmh_pair_distances)
    from rabbittclust_tpu.sketch.extra import (
        wminhash_sketch_multi)
    a, near, far = seq_pairs
    seqs = [a, near, far]
    wm = [wminhash_sketch_multi([s]) for s in seqs]
    dm = wmh_pair_distances(wm, device=False)
    dm_dev = wmh_pair_distances(wm, device=True)
    for i in range(3):
        for j in range(3):
            assert dm[i, j] == pytest.approx(
                wminhash_distance(wm[i], wm[j]), abs=0)
    assert np.array_equal(dm, dm_dev)

    om = [omh_sketch(s) for s in seqs]
    dmo = omh_pair_distances(om, 21, device=False)
    dmo_dev = omh_pair_distances(om, 21, device=True)
    for i in range(3):
        for j in range(3):
            assert dmo[i, j] == pytest.approx(omh_distance(om[i], om[j]),
                                              abs=0)
    assert np.array_equal(dmo, dmo_dev)

    hl = [hll_sketch(s) for s in seqs]
    dmh = hll_pair_distances(hl, 21)
    for i in range(3):
        for j in range(3):
            if i != j:
                assert dmh[i, j] == pytest.approx(
                    hll_distance(hl[i], hl[j], 21), abs=0)


def test_multi_sequence_sketches_respect_boundaries():
    """k-mers never span sequence boundaries in multi-sequence genomes."""
    from rabbittclust_tpu.sketch.extra import _multi_hashes
    rng = random.Random(3)
    s1 = rand_seq(rng, 5000).encode()
    s2 = rand_seq(rng, 5000).encode()
    h_split = _multi_hashes([s1, s2], 21)
    h_joined = _multi_hashes([s1 + s2], 21)
    # joined has exactly k-1 = 20 extra (spanning) k-mers
    assert len(h_joined) == len(h_split) + 20
