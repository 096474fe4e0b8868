"""MST engine: exact candidate counts, Kruskal, forest/BFS, recovery."""

import numpy as np
import pytest

from rabbittclust_tpu.cluster.mst import (
    candidate_pair_counts,
    clusters_from_forest,
    compute_mst,
    cut_forest,
    kruskal,
    sort_edges,
)
from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
from tests.helpers import clusters_to_labels, same_partition


def brute_force_counts(hashes):
    n = len(hashes)
    out = {}
    for i in range(n):
        si = set(hashes[i].tolist())
        for j in range(i + 1, n):
            c = len(si & set(hashes[j].tolist()))
            if c:
                out[(i, j)] = c
    return out


def test_candidate_counts_exact():
    rng = np.random.default_rng(0)
    hashes = [np.unique(rng.integers(0, 500, size=rng.integers(10, 60))
                        .astype(np.uint64)) for _ in range(12)]
    got = {}
    for i, j, c in candidate_pair_counts(hashes):
        for a, b, cc in zip(i, j, c):
            got[(int(a), int(b))] = int(cc)
    assert got == brute_force_counts(hashes)


def test_candidate_counts_start_index():
    rng = np.random.default_rng(1)
    hashes = [np.unique(rng.integers(0, 300, size=40).astype(np.uint64))
              for _ in range(10)]
    got = {}
    for i, j, c in candidate_pair_counts(hashes, start_index=7):
        for a, b, cc in zip(i, j, c):
            got[(int(a), int(b))] = int(cc)
    expect = {k: v for k, v in brute_force_counts(hashes).items() if k[1] >= 7}
    assert got == expect


def test_kruskal_simple():
    # triangle 0-1 (0.1), 1-2 (0.2), 0-2 (0.3) -> MST keeps two lightest
    e = (np.array([0, 1, 0]), np.array([1, 2, 2]),
         np.array([0.1, 0.2, 0.3]))
    i, j, d = kruskal(e, 3)
    assert sorted(d.tolist()) == [0.1, 0.2]


def test_mst_partition_invariance():
    """MST from differently-ordered edge input yields identical clusters."""
    rng = np.random.default_rng(3)
    n = 30
    ii, jj = np.triu_indices(n, k=1)
    dd = rng.random(len(ii))
    e1 = kruskal((ii, jj, dd), n)
    perm = rng.permutation(len(ii))
    e2 = kruskal((ii[perm], jj[perm], dd[perm]), n)
    thr = 0.2
    c1 = clusters_from_forest(cut_forest(e1, thr), n)
    c2 = clusters_from_forest(cut_forest(e2, thr), n)
    assert same_partition(clusters_to_labels(c1, n), clusters_to_labels(c2, n))


def test_cluster_recovery(synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    res = compute_mst(ss.hashes, threshold=0.05, kmer_size=p.kmer_size)
    clusters = clusters_from_forest(cut_forest(res.mst, 0.05), len(ss))
    labels = clusters_to_labels(clusters, len(ss))
    assert same_partition(labels, synthetic_genomes.labels)


def test_dense_ani(synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    res = compute_mst(ss.hashes, threshold=0.05, kmer_size=p.kmer_size,
                      with_dense=True)
    assert res.dense is not None and res.ani is not None
    assert res.ani.sum() > 0
    # dense is cumulative: rows non-decreasing along axis 0
    assert (np.diff(res.dense, axis=0) >= 0).all()


def test_append_start_index_equivalence(synthetic_genomes):
    """MST(all) and MST(old MST + new-vs-all edges) give identical clusters
    (append-mode semantics, reference sub_command.cpp:1450-1457)."""
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    n = len(ss)
    k = n - 6
    res_old = compute_mst(ss.hashes[:k], threshold=0.05, kmer_size=p.kmer_size)
    res_app = compute_mst(ss.hashes, threshold=0.05, kmer_size=p.kmer_size,
                          start_index=k, pre_edges=res_old.mst)
    res_full = compute_mst(ss.hashes, threshold=0.05, kmer_size=p.kmer_size)
    ca = clusters_from_forest(cut_forest(res_app.mst, 0.05), n)
    cf = clusters_from_forest(cut_forest(res_full.mst, 0.05), n)
    assert same_partition(clusters_to_labels(ca, n), clusters_to_labels(cf, n))


def test_forest_clusters_native_matches_python():
    """rtc_forest_clusters must reproduce the Python BFS exactly: member
    order (adjacency in forest-edge order, BFS from lowest unvisited id)
    and cluster order, including singletons and multi-edge components."""
    import numpy as np
    from rabbittclust_tpu.cluster.mst import clusters_from_forest
    from rabbittclust_tpu.utils import native as native_mod

    assert native_mod.load_native() is not None
    rng = np.random.default_rng(17)
    n = 500
    # random forest: attach each node > 0 to a random earlier node with
    # probability 0.7 (rest are roots), edges in random order
    fi, fj = [], []
    for v in range(1, n):
        if rng.random() < 0.7:
            fi.append(v)
            fj.append(int(rng.integers(0, v)))
    perm = rng.permutation(len(fi))
    fi = np.asarray(fi, dtype=np.int64)[perm]
    fj = np.asarray(fj, dtype=np.int64)[perm]
    d = rng.random(len(fi))
    got = clusters_from_forest((fi, fj, d), n)
    orig = native_mod.load_native
    native_mod.load_native = lambda: None
    try:
        expect = clusters_from_forest((fi, fj, d), n)
    finally:
        native_mod.load_native = orig
    assert got == expect
