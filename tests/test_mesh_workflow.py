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
