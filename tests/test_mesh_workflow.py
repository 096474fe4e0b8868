"""--device auto-selects the mesh ring engine when >1 device is visible
(VERDICT r2 item 2: production entry points for the distributed engines)."""

import os

import numpy as np
import pytest

from rabbittclust_tpu.cluster.mst import (
    clusters_from_forest,
    compute_mst,
    cut_forest,
)
from rabbittclust_tpu.workflows import OutputOptions, _compute_mst_engine


@pytest.fixture
def sketchset(synthetic_genomes):
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    return sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                             kmer_size=19, drlevel=2)


def test_device_mst_engine_uses_mesh(sketchset, monkeypatch):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple virtual devices")
    ss, p = sketchset
    canon = lambda cs: sorted(sorted(c) for c in cs)  # noqa: E731
    rh = compute_mst(ss.hashes, 0.05, p.kmer_size)
    ch = clusters_from_forest(cut_forest(rh.mst, 0.05), len(ss))

    called = {}
    import rabbittclust_tpu.parallel.dist_engine as de
    orig = de.distributed_mst

    def spy(*a, **kw):
        called["full"] = kw.get("full_mst")
        return orig(*a, **kw)

    monkeypatch.setattr(de, "distributed_mst", spy)
    # plain -e run: bitmap ring (threshold-bounded MST is all that's cut)
    opts = OutputOptions(use_device=True, no_save=True)
    res = _compute_mst_engine(ss, 0.05, p.kmer_size, False, opts)
    assert called["full"] is False
    assert canon(clusters_from_forest(cut_forest(res.mst, 0.05),
                                      len(ss))) == canon(ch)
    # persisting run: full exact ring -> MST edge set equals the host MST
    opts = OutputOptions(use_device=True, no_save=False)
    res = _compute_mst_engine(ss, 0.05, p.kmer_size, False, opts)
    assert called["full"] is True
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*rh.mst[:2]))
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res.mst[:2]))
    assert ed == eh


def test_device_mst_engine_single_chip_fallbacks(sketchset, monkeypatch):
    """--dense / append / RTC_MESH=0 keep the single-chip compact engine."""
    ss, p = sketchset
    monkeypatch.setenv("RTC_MESH", "0")
    opts = OutputOptions(use_device=True, no_save=True)
    res = _compute_mst_engine(ss, 0.05, p.kmer_size, False, opts)
    rh = compute_mst(ss.hashes, 0.05, p.kmer_size)
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*rh.mst[:2]))
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res.mst[:2]))
    assert ed == eh
    monkeypatch.delenv("RTC_MESH")
    # --dense needs per-pair histograms: mesh engine is skipped
    opts = OutputOptions(use_device=True, no_save=True, dense=True)
    res = _compute_mst_engine(ss, 0.05, p.kmer_size, False, opts)
    assert res.dense is not None
    assert np.array_equal(
        res.dense, compute_mst(ss.hashes, 0.05, p.kmer_size,
                               with_dense=True).dense)


def test_mst_free_clusters_fast_path(sketchset, monkeypatch, tmp_path):
    """RTC_MST_CLUSTERS_FAST=1 + --device -e: the MST build is skipped and
    the gated-verify/label-propagation engine writes the identical
    PARTITION (member order may legally differ from the MST cut)."""
    from rabbittclust_tpu.workflows import (OutputOptions,
                                            compute_kssd_clusters)
    ss, p = sketchset
    rh = compute_mst(ss.hashes, 0.05, p.kmer_size)
    host = clusters_from_forest(cut_forest(rh.mst, 0.05), len(ss))
    monkeypatch.setenv("RTC_MST_CLUSTERS_FAST", "1")
    out = str(tmp_path / "fast.cluster")
    opts = OutputOptions(use_device=True, no_save=True)
    clusters, _ = compute_kssd_clusters(ss, p, 0.05, 2, out, False, opts,
                                        None, "mst")
    assert sorted(map(sorted, clusters)) == sorted(map(sorted, host))
    text = open(out).read()
    assert text.startswith("# Clustering threshold: 0.050000")
    # every genome appears exactly once in the written file
    import re
    ids = [int(m) for m in re.findall(r"\n\t\s*\d+\t\s*(\d+)\t", text)]
    assert sorted(ids) == list(range(len(ss)))


def test_distributed_labelprop_matches_host():
    """Mesh resident-mask labelprop (the bench headline engine,
    distributed): partition equals the single-host MST-cut partition on
    the 8-device CPU mesh, including verify-fail clear-lists routed to the
    correct (device, step) slab."""
    import numpy as np
    from rabbittclust_tpu.cluster.mst import (
        clusters_from_forest, compute_mst, cut_forest)
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_threshold_clusters_lp, make_mesh)

    rng = np.random.default_rng(21)
    bases = [np.unique(rng.integers(0, 2 ** 29, size=150).astype(np.uint32))
             for _ in range(11)]
    hashes = []
    for i in range(420):
        b = bases[i % 11]
        keep = b[rng.random(len(b)) < 0.8]
        extra = np.unique(rng.integers(
            0, 2 ** 29, size=170 - len(keep)).astype(np.uint32))
        hashes.append(np.unique(np.concatenate([keep, extra])))
    mesh = make_mesh()
    got = distributed_threshold_clusters_lp(hashes, 0.05, 21, mesh=mesh,
                                            bits=2048)
    res = compute_mst(hashes, 0.05, 21)
    expect = clusters_from_forest(cut_forest(res.mst, 0.05), len(hashes))
    assert sorted(map(tuple, map(sorted, got))) == \
        sorted(map(tuple, map(sorted, expect)))


def test_distributed_labelprop_false_positive_clears():
    """Tiny signature space floods the mesh filter with false positives:
    the per-device clear-list routing must retire them (several rounds)."""
    import numpy as np
    from rabbittclust_tpu.cluster.mst import (
        clusters_from_forest, compute_mst, cut_forest)
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_threshold_clusters_lp, make_mesh)

    rng = np.random.default_rng(9)
    bases = [np.unique(rng.integers(0, 2 ** 29, size=60).astype(np.uint32))
             for _ in range(8)]
    hashes = []
    for i in range(160):
        b = bases[i % 8]
        keep = b[rng.random(len(b)) < 0.8]
        extra = np.unique(rng.integers(
            0, 2 ** 29, size=70 - len(keep)).astype(np.uint32))
        hashes.append(np.unique(np.concatenate([keep, extra])))
    got = distributed_threshold_clusters_lp(hashes, 0.05, 21,
                                            mesh=make_mesh(), bits=128)
    res = compute_mst(hashes, 0.05, 21)
    expect = clusters_from_forest(cut_forest(res.mst, 0.05), len(hashes))
    assert sorted(map(tuple, map(sorted, got))) == \
        sorted(map(tuple, map(sorted, expect)))
