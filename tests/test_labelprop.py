"""Device label-propagation clustering engine (ops/labelprop.py) ==
host single-linkage partition, across shapes, dtypes and pathologies."""

import numpy as np
import pytest

from rabbittclust_tpu.cluster.mst import (
    clusters_from_forest,
    compute_mst,
    cut_forest,
)
from rabbittclust_tpu.ops.labelprop import (
    _encode_clear,
    threshold_clusters_device_lp,
)


def host_partition(hashes, threshold, kmer_size, is_containment=False):
    res = compute_mst(hashes, threshold, kmer_size,
                      is_containment=is_containment)
    return clusters_from_forest(cut_forest(res.mst, threshold), len(hashes))


def canon(clusters):
    return sorted(tuple(sorted(c)) for c in clusters)


def make_sketches(n=300, s=120, n_clusters=12, seed=7, dtype=np.uint32,
                  keep=0.8):
    rng = np.random.default_rng(seed)
    hi = 2 ** 31
    bases = [np.unique(rng.integers(0, hi, size=s).astype(dtype))
             for _ in range(n_clusters)]
    hashes = []
    for i in range(n):
        b = bases[i % n_clusters]
        kept = b[rng.random(len(b)) < keep]
        extra = np.unique(
            rng.integers(0, hi, size=s - len(kept)).astype(dtype))
        hashes.append(np.unique(np.concatenate([kept, extra])))
    return hashes


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_lp_matches_host_partition(dtype):
    hashes = make_sketches(n=300, dtype=dtype)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=128)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_lp_matches_host_containment():
    rng = np.random.default_rng(3)
    # variable sketch sizes exercise the AAF path + size-ratio filter
    hashes = []
    base = np.unique(rng.integers(0, 2 ** 31, size=400).astype(np.uint32))
    for i in range(96):
        take = rng.integers(60, 400)
        sub = rng.choice(base, size=take, replace=False)
        noise = np.unique(rng.integers(0, 2 ** 31, size=take // 4).astype(
            np.uint32))
        hashes.append(np.unique(np.concatenate([sub, noise])))
    got = threshold_clusters_device_lp(hashes, 0.05, 21,
                                       is_containment=True, bits=2048,
                                       row_block=64)
    assert canon(got) == canon(
        host_partition(hashes, 0.05, 21, is_containment=True))


def test_lp_all_singletons_and_one_cluster():
    rng = np.random.default_rng(11)
    lone = [np.unique(rng.integers(0, 2 ** 31, size=100).astype(np.uint32))
            for _ in range(40)]
    got = threshold_clusters_device_lp(lone, 0.01, 21, bits=1024,
                                       row_block=64)
    assert canon(got) == canon(host_partition(lone, 0.01, 21))
    same = [lone[0].copy() for _ in range(17)]
    got = threshold_clusters_device_lp(same, 0.05, 21, bits=1024,
                                       row_block=64)
    assert canon(got) == [tuple(range(17))]


def test_lp_tiny_inputs():
    assert threshold_clusters_device_lp([], 0.05, 21) == []
    one = [np.array([1, 2, 3], dtype=np.uint32)]
    assert canon(threshold_clusters_device_lp(one, 0.05, 21, bits=1024,
                                              row_block=64)) == [(0,)]


def test_lp_fallback_path_is_exact():
    # max_rounds=1 forces the host fallback after a single device round
    hashes = make_sketches(n=200, seed=5)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=128, max_rounds=1)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_lp_many_false_positives():
    # tiny signature space (bits=128 << s^2) floods the filter with false
    # positives: many verify-fail rounds + clear-list regrowth
    hashes = make_sketches(n=160, s=60, n_clusters=8, seed=9)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=128,
                                       row_block=64)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


@pytest.mark.parametrize("panel_tiles", [1, 2, 4])
def test_lp_panel_streamed_matches_host(panel_tiles):
    """Panel streaming (the HBM-scale mode): tiny panels force many
    build/round cycles with union-find labels carried across panels —
    the partition must equal the all-resident single-panel one."""
    from rabbittclust_tpu.ops.labelprop import LP_STATS
    hashes = make_sketches(n=300, n_clusters=9, seed=13)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=64,
                                       panel_tiles=panel_tiles)
    # 300 genomes pad to 320 rows = 5 row blocks = 15 triangular tiles
    assert LP_STATS["panels"] == -(-15 // panel_tiles)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_lp_panel_streamed_false_positives():
    # panels + verify-fail clear-lists together: clear indices must rebase
    # onto the panel-local pack index
    hashes = make_sketches(n=160, s=60, n_clusters=8, seed=9)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=128,
                                       row_block=64, panel_tiles=2)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_lp_panel_streamed_fallback():
    # max_rounds=1 exhausts within EACH panel -> per-panel host fallback
    hashes = make_sketches(n=200, seed=5)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=64, max_rounds=1,
                                       panel_tiles=2)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_encode_clear_roundtrip():
    rb = 64
    fi = np.array([70, 130, 129, 5], dtype=np.int64)
    fj = np.array([65, 0, 128, 3], dtype=np.int64)
    t, r, b, sub = _encode_clear(fi, fj, rb)
    assert len(t) == 1024  # ladder floor
    # tile of (i, j): rblk*(rblk+1)/2 + cblk in the triangular row-major
    # order of the build sweep
    assert t[:4].tolist() == [1 * 2 // 2 + 1, 2 * 3 // 2 + 0,
                              2 * 3 // 2 + 2, 0]
    assert r[:4].tolist() == [70 % 64, 130 % 64, 129 % 64, 5]
    assert b[:4].tolist() == [(65 % 64) // 8, 0, 0, 0]
    assert sub[:4].tolist() == [1 << (65 % 64 % 8), 1 << 0, 1 << 0, 1 << 3]
    # padding entries are no-ops
    assert sub[4:].max() == 0


def test_lp_compact_pull_col_overflow_is_exact(monkeypatch):
    """Round-5 compact pull: with RTC_LP_COL_CAP tiny, col proposals
    overflow every round and get deferred to later rounds — the partition
    must still be exact (proposals are hints; the verify gate + resident
    masks carry correctness)."""
    monkeypatch.setenv("RTC_LP_COL_CAP", "4")
    hashes = make_sketches(n=300, n_clusters=9, seed=13)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=64, panel_tiles=2)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))


def test_lp_compact_pull_no_prefetch_matches(monkeypatch):
    """RTC_LP_PREFETCH=0 (no build(p+1) overlap) must give the identical
    partition as the prefetching default."""
    hashes = make_sketches(n=300, n_clusters=9, seed=13)
    a = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                     row_block=64, panel_tiles=4)
    monkeypatch.setenv("RTC_LP_PREFETCH", "0")
    b = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                     row_block=64, panel_tiles=4)
    assert canon(a) == canon(b) == canon(host_partition(hashes, 0.05, 21))


def test_lp_randomized_config_sweep(monkeypatch):
    """Randomized property check over the round-5 compact/fused round
    paths: random (n, clusters, sketch size, bits, panel count, col cap,
    prefetch) configurations must all reproduce the host partition —
    covers panel-boundary x overflow x prefetch interactions no single
    fixture hits."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(150, 450))
        nc = int(rng.integers(3, 20))
        s = int(rng.choice([40, 60, 120]))
        bits = int(rng.choice([128, 512, 2048]))
        pt = int(rng.choice([1, 2, 3, 5]))
        monkeypatch.setenv("RTC_LP_COL_CAP",
                           str(int(rng.choice([4, 64, 100000]))))
        monkeypatch.setenv("RTC_LP_PREFETCH", str(int(rng.integers(0, 2))))
        hashes = make_sketches(n=n, s=s, n_clusters=nc, seed=trial + 100)
        got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=bits,
                                           row_block=64, panel_tiles=pt)
        assert canon(got) == canon(host_partition(hashes, 0.05, 21)), \
            f"trial={trial} n={n} nc={nc} s={s} bits={bits} pt={pt}"


def test_lp_label_delta_push_is_exact(monkeypatch):
    """RTC_LP_LABEL_DELTA=1: device-resident labels updated by delta
    scatter (full re-push when > dcap change) — identical partitions in
    multi-panel mode, including with forced col-cap overflow."""
    monkeypatch.setenv("RTC_LP_LABEL_DELTA", "1")
    hashes = make_sketches(n=300, n_clusters=9, seed=13)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=2048,
                                       row_block=64, panel_tiles=2)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))
    monkeypatch.setenv("RTC_LP_COL_CAP", "4")
    hashes = make_sketches(n=160, s=60, n_clusters=8, seed=9)
    got = threshold_clusters_device_lp(hashes, 0.05, 21, bits=128,
                                       row_block=64, panel_tiles=2)
    assert canon(got) == canon(host_partition(hashes, 0.05, 21))
