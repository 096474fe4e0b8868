"""Output formats: .cluster layout, trees, linkage, auto-threshold report."""

import math
import re

import numpy as np
import pytest

from rabbittclust_tpu.cluster.mst import compute_mst, cut_forest, clusters_from_forest
from rabbittclust_tpu.post.trees import linkage_matrix, newick_string
from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
from rabbittclust_tpu.state.cluster_io import format_cluster_result


@pytest.fixture()
def clustered(synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    res = compute_mst(ss.hashes, 0.05, p.kmer_size)
    clusters = clusters_from_forest(cut_forest(res.mst, 0.05), len(ss))
    return ss, res, clusters


def test_cluster_file_format(clustered):
    ss, res, clusters = clustered
    text = format_cluster_result(clusters, ss, threshold=0.05)
    lines = text.splitlines()
    assert lines[0] == "# Clustering threshold: 0.050000"
    assert lines[1] == f"# Total clusters: {len(clusters)}"
    assert lines[2] == "#"
    assert lines[3] == "the cluster 0 is: "
    # by-file row: \t%5d\t%6d\t%12dnt\t%20s\t%20s\t%s
    row = lines[4]
    m = re.match(r"\t {0,4}\d+\t {0,5}\d+\t {0,11}\d+nt\t.*\t.*\t.*", row)
    assert m, row
    # field widths match C printf %5d/%6d/%12d
    fields = row.split("\t")
    assert len(fields[1]) == 5 and len(fields[2]) == 6
    assert len(fields[3]) == 14  # 12 digits+padding + "nt"


def test_no_header_when_threshold_negative(clustered):
    ss, _res, clusters = clustered
    text = format_cluster_result(clusters, ss)
    assert text.startswith("the cluster 0 is: ")


def test_newick_tree(clustered):
    ss, res, clusters = clustered
    tree = newick_string(ss, res.mst)
    assert tree.endswith(";")
    # Reference semantics (MST.cpp:1232): the tree is rooted at node 0's
    # component, so with a disconnected candidate graph only that component's
    # leaves appear.
    comp0 = next(c for c in clusters if 0 in c)
    for gid in comp0:
        assert ss.file_names[gid] in tree
    # balanced parens
    assert tree.count("(") == tree.count(")")
    # branch lengths present with 6 decimals
    assert re.search(r":\d+\.\d{6}", tree)


def test_linkage_matrix(clustered):
    ss, res, clusters = clustered
    n = len(ss)
    rows = linkage_matrix(n, res.mst)
    # spanning forest with c components -> n - c merge rows
    assert len(rows) == n - len(clusters)
    # sizes grow and final sizes match cluster sizes
    total = sorted(r[3] for r in rows)[-1] if rows else 0
    assert total == max(len(c) for c in clusters)
    # distances non-decreasing (Kruskal order)
    d = [r[2] for r in rows]
    assert d == sorted(d)


def test_auto_threshold_report(tmp_path, clustered):
    from rabbittclust_tpu.post.auto_threshold import (
        analyze_edge_length_distribution,
        find_threshold_candidates,
        select_optimal_threshold,
        print_threshold_analysis,
    )
    ss, res, clusters = clustered
    stats = analyze_edge_length_distribution(res.mst)
    assert stats.min_dist > 0 and stats.max_dist >= stats.min_dist
    cands = find_threshold_candidates(res.mst, 5, 0.05, True, len(ss))
    assert cands
    opt = select_optimal_threshold(cands, res.mst)
    # candidates all come from intra-cluster edges (clusters share no
    # hashes, so the candidate graph is disconnected); the pick must be a
    # reasonable (>0.001) value inside the observed edge range
    assert 0.001 <= opt.threshold <= stats.max_dist
    out = str(tmp_path / "r")
    print_threshold_analysis(res.mst, stats, cands, opt,
                             out + ".threshold_analysis.txt")
    content = open(out + ".threshold_analysis.txt").read()
    assert "## Optimal Threshold (Recommended)" in content
    assert "Stability_Split" in content or "Level" in content


def test_stability_at_threshold(clustered):
    from rabbittclust_tpu.post.auto_threshold import compute_threshold_stability
    ss, res, clusters = clustered
    st = compute_threshold_stability(res.mst, 0.05, len(ss))
    assert 0.0 <= st.overall <= 1.0


def test_dedup_and_reps(tmp_path, clustered):
    from rabbittclust_tpu.post.postprocess import (
        build_dedup_candidates_per_cluster,
        select_k_reps_per_cluster_tree,
    )
    ss, res, clusters = clustered
    forest = cut_forest(res.mst, 0.05)
    lens = [ss.display_length(i) for i in range(len(ss))]
    # dedup at +inf collapses each cluster to one medoid
    cands, node_to_rep = build_dedup_candidates_per_cluster(
        clusters, forest, lens, float("inf"))
    assert all(len(c) == 1 for c in cands)
    # dedup disabled: identity
    cands0, n2r0 = build_dedup_candidates_per_cluster(
        clusters, forest, lens, -1.0)
    assert [sorted(c) for c in cands0] == [sorted(c) for c in clusters]
    assert n2r0 == list(range(len(ss)))
    # k-reps: k=2 from full candidate sets
    reps = select_k_reps_per_cluster_tree(clusters, cands0, forest, len(ss),
                                          n2r0, 2)
    for cl, r in zip(clusters, reps):
        assert len(r) == min(2, len(cl))
        assert set(r) <= set(cl)
