"""Compacted-pull dense device MST engine (ops/engine.py pull="compact")
== full-counts mode == host engine, including 64-bit hashes, append mode
and dense/ANI histograms."""

import numpy as np

from rabbittclust_tpu.cluster.mst import (
    clusters_from_forest,
    compute_mst,
    cut_forest,
)
from rabbittclust_tpu.ops.engine import compute_mst_device


def make_sketches(n=220, s=150, n_clusters=10, seed=13, dtype=np.uint32):
    rng = np.random.default_rng(seed)
    hi = 2 ** 31 if dtype == np.uint32 else 2 ** 60
    bases = [np.unique(rng.integers(0, hi, size=s).astype(dtype))
             for _ in range(n_clusters)]
    out = []
    for i in range(n):
        b = bases[i % n_clusters]
        keep = b[rng.random(len(b)) < 0.75]
        extra = np.unique(rng.integers(0, hi, size=s - len(keep)).astype(
            dtype))
        out.append(np.unique(np.concatenate([keep, extra])))
    return out


def edge_set(mst):
    return sorted((min(a, b), max(a, b), round(d, 12))
                  for a, b, d in zip(*mst))


def test_compact_equals_full_and_host_32():
    hashes = make_sketches()
    rc = compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="compact",
                            with_dense=True)
    rf = compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="full",
                            row_tile=64, col_tile=32, with_dense=True)
    rh = compute_mst(hashes, 0.05, 21, with_dense=True)
    n = len(hashes)
    ch = clusters_from_forest(cut_forest(rh.mst, 0.05), n)
    assert clusters_from_forest(cut_forest(rc.mst, 0.05), n) == ch
    assert edge_set(rc.mst) == edge_set(rh.mst)
    assert edge_set(rf.mst) == edge_set(rh.mst)
    assert np.array_equal(rc.dense, rh.dense)
    assert np.array_equal(rc.ani, rh.ani)


def test_compact_equals_host_64():
    hashes = make_sketches(n=150, dtype=np.uint64)
    rc = compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="compact")
    rh = compute_mst(hashes, 0.05, 21)
    assert edge_set(rc.mst) == edge_set(rh.mst)


def test_compact_append_mode_matches_host():
    hashes = make_sketches(n=180)
    pre_n = 120
    pre = compute_mst(hashes[:pre_n], 0.05, 21)
    rh = compute_mst(hashes, 0.05, 21, start_index=pre_n, pre_edges=pre.mst)
    rc = compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="compact",
                            start_index=pre_n, pre_edges=pre.mst)
    assert edge_set(rc.mst) == edge_set(rh.mst)


def test_compact_containment():
    rng = np.random.default_rng(5)
    base = np.unique(rng.integers(0, 2 ** 31, size=500).astype(np.uint32))
    hashes = []
    for i in range(100):
        take = int(rng.integers(80, 500))
        sub = rng.choice(base, size=take, replace=False)
        noise = np.unique(rng.integers(0, 2 ** 31, size=take // 5).astype(
            np.uint32))
        hashes.append(np.unique(np.concatenate([sub, noise])))
    rc = compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="compact",
                            is_containment=True)
    rh = compute_mst(hashes, 0.05, 21, is_containment=True)
    assert edge_set(rc.mst) == edge_set(rh.mst)


def test_compact_pulled_bytes_well_below_full(monkeypatch):
    from rabbittclust_tpu.ops import bitmap as bm
    hashes = make_sketches(n=1024, s=100, n_clusters=32)
    bm.reset_pull_stats()
    compute_mst_device(hashes, 0.05, 21, backend="jnp", pull="compact")
    compact_bytes = bm.PULL_STATS["bytes"]
    n_pad = 1024
    # full mode pulls ~n_pad^2/2 uint16 counts (triangular column trim);
    # compact pulls packed masks (n_pad^2/16) + 4 bytes per survivor
    # (ladder-quantized) — >2x less even at this small N, ~10x at bench N
    full_bytes = n_pad * n_pad // 2 * 2
    assert compact_bytes < full_bytes / 2, (compact_bytes, full_bytes)
