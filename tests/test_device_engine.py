"""Device pair engine: packing exactness, kernels, bitmap filter, multichip."""

import numpy as np
import pytest

from rabbittclust_tpu.ops.pack import pack_sketches
from rabbittclust_tpu.ops.intersect import pair_counts_row
from rabbittclust_tpu.ops.bitmap import (
    candidate_pairs_threshold,
    exact_common_counts,
    pack_bitmaps,
)


def _rand_sketches(rng, n, lo, hi, bits=28, use64=False):
    dt = np.uint64 if use64 else np.uint32
    return [np.unique(rng.integers(0, 2 ** bits,
                                   size=rng.integers(lo, hi)).astype(dt))
            for _ in range(n)]


def brute(a, b):
    return len(np.intersect1d(a, b, assume_unique=True))


def test_pack_roundtrip_32():
    rng = np.random.default_rng(0)
    hashes = _rand_sketches(rng, 20, 30, 120)
    p = pack_sketches(hashes, use64=False, pad_n_to=8)
    # every real value present exactly once, pads have top bit set
    for g, h in enumerate(hashes):
        real = p.plane0[g][(p.plane0[g] & 0x80000000) == 0]
        assert len(real) == len(h)
    assert p.sizes[: len(hashes)].tolist() == [len(h) for h in hashes]


def test_pair_counts_exact_32_and_64():
    rng = np.random.default_rng(1)
    for use64 in (False, True):
        hashes = _rand_sketches(rng, 24, 40, 150, bits=50 if use64 else 28,
                                use64=use64)
        packed = pack_sketches(hashes, use64=use64, pad_n_to=8)
        block = packed.row_block(0, 16)
        counts = np.asarray(pair_counts_row(block, packed, gj_tile=8,
                                            backend="jnp"))
        for i in range(16):
            for j in range(24):
                if i == j:
                    continue
                assert counts[i, j] == brute(hashes[i], hashes[j]), (use64, i, j)


def test_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(2)
    hashes = _rand_sketches(rng, 16, 40, 100)
    packed = pack_sketches(hashes, use64=False, pad_n_to=8)
    block = packed.row_block(0, 8)
    c1 = np.asarray(pair_counts_row(block, packed, gj_tile=8, backend="jnp"))
    c2 = np.asarray(pair_counts_row(block, packed, gj_tile=8,
                                    backend="interpret"))
    assert np.array_equal(c1, c2)


def test_device_mst_matches_host(synthetic_genomes):
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.ops.engine import compute_mst_device
    from rabbittclust_tpu.cluster.mst import (
        compute_mst, cut_forest, clusters_from_forest)
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    res_d = compute_mst_device(ss.hashes, 0.05, p.kmer_size, backend="jnp",
                               row_tile=8, col_tile=8, with_dense=True)
    res_h = compute_mst(ss.hashes, 0.05, p.kmer_size, with_dense=True)
    cd = clusters_from_forest(cut_forest(res_d.mst, 0.05), len(ss))
    ch = clusters_from_forest(cut_forest(res_h.mst, 0.05), len(ss))
    assert cd == ch
    # engines orient pairs differently (host: i<j, device: row>col);
    # compare unordered edge sets
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res_d.mst[:2]))
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*res_h.mst[:2]))
    assert ed == eh
    assert np.array_equal(res_d.dense, res_h.dense)
    assert np.array_equal(res_d.ani, res_h.ani)


def test_bitmap_filter_safe_and_exact():
    """Bitmap candidates must be a superset of all threshold pairs and the
    verified counts exact."""
    rng = np.random.default_rng(3)
    base = np.unique(rng.integers(0, 2 ** 28, size=300).astype(np.uint32))
    hashes = []
    for i in range(64):
        keep = base[rng.random(len(base)) < 0.75]
        extra = np.unique(rng.integers(0, 2 ** 28, size=120).astype(np.uint32))
        hashes.append(np.unique(np.concatenate([keep, extra])))
    threshold, k = 0.05, 21
    ii, jj, common = candidate_pairs_threshold(hashes, threshold, k,
                                               bits=2048, row_block=64)
    got = {(int(a), int(b)): int(c) for a, b, c in zip(jj, ii, common)}
    # exactness of verified counts
    for (a, b), c in got.items():
        assert c == brute(hashes[a], hashes[b])
    # safety: every pair at distance <= threshold must be present
    from rabbittclust_tpu.distance.mash import (
        mash_distance, size_ratio_limit)
    radio = size_ratio_limit(threshold, k - 1)
    for a in range(64):
        for b in range(a):
            c = brute(hashes[a], hashes[b])
            if c == 0:
                continue
            sa, sb = len(hashes[a]), len(hashes[b])
            if max(sa, sb) > radio * min(sa, sb):
                continue
            d = mash_distance(np.array([c]), np.array([sa]),
                              np.array([sb]), k)[0]
            if d <= threshold:
                assert (a, b) in got or (b, a) in got, (a, b, c, d)


def test_exact_common_counts_native_vs_numpy():
    rng = np.random.default_rng(4)
    for use64 in (False, True):
        hashes = _rand_sketches(rng, 30, 20, 200, bits=50 if use64 else 28,
                                use64=use64)
        ii = rng.integers(0, 30, size=100).astype(np.int64)
        jj = rng.integers(0, 30, size=100).astype(np.int64)
        got = exact_common_counts(hashes, ii, jj)
        for p in range(100):
            assert got[p] == brute(hashes[ii[p]], hashes[jj[p]])


def test_candidate_counts_chunk_split_regression():
    """Pairs sharing many hashes must not have counts split across chunk
    flushes (bug found at 8k genomes: distances silently inflated)."""
    from rabbittclust_tpu.cluster.mst import candidate_pair_counts
    rng = np.random.default_rng(5)
    base = np.unique(rng.integers(0, 2 ** 28, size=200).astype(np.uint32))
    hashes = [base.copy() for _ in range(20)]  # all identical: runs of 20
    seen = {}
    # tiny pair_chunk forces many flushes
    for i, j, c in candidate_pair_counts(hashes, pair_chunk=64):
        for a, b, cc in zip(i, j, c):
            key = (int(a), int(b))
            assert key not in seen, f"pair {key} emitted twice"
            seen[key] = int(cc)
    assert len(seen) == 20 * 19 // 2
    assert all(v == len(base) for v in seen.values())


def test_multichip_ring(synthetic_genomes):
    """Full ring over the 8-device CPU mesh: candidate count matches the
    host engine's thresholded edge count."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_candidate_stats, make_mesh)
    from rabbittclust_tpu.cluster.mst import candidate_pair_counts
    from rabbittclust_tpu.distance.mash import (
        mash_distance, size_ratio_limit)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    packed = pack_sketches(ss.hashes, use64=False, pad_n_to=16)
    mesh = make_mesh(8)
    total, min_d = distributed_candidate_stats(
        packed.plane0[:16], packed.sizes[:16], 0.05, p.kmer_size, mesh=mesh)
    # host reference count
    sizes = np.array([len(h) for h in ss.hashes], dtype=np.int64)
    radio = size_ratio_limit(0.05, p.kmer_size - 1)
    expect = 0
    for i, j, c in candidate_pair_counts(ss.hashes):
        s0, s1 = sizes[i], sizes[j]
        ok = (np.minimum(s0, s1) > 0) & \
            (np.maximum(s0, s1) <= radio * np.minimum(s0, s1))
        d = mash_distance(c, s0, s1, p.kmer_size)
        expect += int((ok & (d <= 0.05)).sum())
    assert total == expect
    assert 0.0 <= min_d <= 1.0


def test_distributed_mst_exact(synthetic_genomes):
    """Ring-sharded distributed MST == host MST (edge-partition theorem)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import distributed_mst, make_mesh
    from rabbittclust_tpu.cluster.mst import (
        compute_mst, cut_forest, clusters_from_forest)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    res_d = distributed_mst(ss.hashes, 0.05, p.kmer_size, mesh=make_mesh(8))
    res_h = compute_mst(ss.hashes, 0.05, p.kmer_size)
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res_d.mst[:2]))
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*res_h.mst[:2]))
    assert ed == eh
    cd = clusters_from_forest(cut_forest(res_d.mst, 0.05), 16)
    ch = clusters_from_forest(cut_forest(res_h.mst, 0.05), 16)
    assert cd == ch


def test_distributed_mst_exact_64bit(synthetic_genomes):
    """Distributed ring with 64-bit KSSD hashes (k=23 -> use64: both uint32
    planes rotate) == host MST."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_mst, make_mesh)
    from rabbittclust_tpu.cluster.mst import (
        compute_mst, cut_forest, clusters_from_forest)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=23, drlevel=3)
    assert ss.hashes[0].dtype == np.uint64  # use64 path
    res_d = distributed_mst(ss.hashes, 0.05, p.kmer_size, mesh=make_mesh(8))
    res_h = compute_mst(ss.hashes, 0.05, p.kmer_size)
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res_d.mst[:2]))
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*res_h.mst[:2]))
    assert ed == eh
    cd = clusters_from_forest(cut_forest(res_d.mst, 0.05), 16)
    ch = clusters_from_forest(cut_forest(res_h.mst, 0.05), 16)
    assert cd == ch


def test_greedy_device_matches_host_batched():
    """Device greedy (bitmap matmul candidates) == host batched greedy,
    bit-exactly, for both mash and containment modes."""
    from rabbittclust_tpu.cluster.greedy import greedy_cluster_batched
    from rabbittclust_tpu.ops.greedy_device import greedy_cluster_device
    rng = np.random.default_rng(5)
    hashes = []
    # 8 clusters of overlapping sketches + singletons, varied sizes
    for c in range(8):
        base = rng.choice(1 << 22, size=600, replace=False).astype(np.uint32)
        for g in range(6):
            keep = rng.random(len(base)) > 0.05 * g
            extra = rng.choice(1 << 22, size=30 * g, replace=False)
            hashes.append(np.unique(np.r_[base[keep],
                                          extra.astype(np.uint32)]))
    for _ in range(10):
        hashes.append(np.unique(
            rng.choice(1 << 22, size=400).astype(np.uint32)))
    for bs in (7, 64):
        for cont in (False, True):
            host = greedy_cluster_batched(hashes, 0.05, 21, batch_size=bs,
                                          is_containment=cont)
            dev = greedy_cluster_device(hashes, 0.05, 21, batch_size=bs,
                                        is_containment=cont,
                                        conflict="batched")
            assert host.representatives == dev.representatives, (bs, cont)
            assert host.clusters == dev.clusters, (bs, cont)


def test_greedy_device_serial_mode_matches_serial():
    """conflict="serial" replays the exact serial loop over device-generated
    candidates: equal to host serial greedy at ANY batch size (up to
    exact-distance ties, absent in this data)."""
    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    from rabbittclust_tpu.ops.greedy_device import greedy_cluster_device
    rng = np.random.default_rng(9)
    hashes = []
    for c in range(5):
        base = (rng.choice(1 << 22, size=500, replace=False).astype(np.uint32)
                + np.uint32(c << 23))
        for g in range(4):
            keep = rng.random(len(base)) > 0.03
            hashes.append(np.sort(base[keep]))
    serial = greedy_cluster(hashes, 0.05, 21)
    for bs in (1, 8, 4096):
        dev = greedy_cluster_device(hashes, 0.05, 21, batch_size=bs)
        assert serial.representatives == dev.representatives, bs
        assert serial.clusters == dev.clusters, bs


def test_greedy_device_serial_tie_exact():
    """Exact-similarity ties resolve to the serial host's first-touch
    (probe) order, NOT the smallest rep id — constructed tie corpus where
    the two orders differ (VERDICT r2 item 6)."""
    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    from rabbittclust_tpu.ops.greedy_device import greedy_cluster_device
    rng = np.random.default_rng(3)
    hashes = []
    # blocks of EXACT duplicate sketches: every member ties (sim=1) with
    # every rep of its block-family; plus shuffled-prefix variants whose
    # first-shared-hash positions differ, exercising the touch-order key
    for c in range(4):
        base = np.sort(rng.choice(1 << 20, size=300,
                                  replace=False).astype(np.uint32))
        for g in range(5):
            hashes.append(base.copy())
        # same tail, different heads -> identical pairwise sim vs several
        # reps with distinct first-shared positions
        for g in range(3):
            head = rng.choice(1 << 20, size=30, replace=False).astype(
                np.uint32)
            hashes.append(np.unique(np.r_[head, base[30:]]))
    for bs in (1, 4, 64, 4096):
        for cont in (False, True):
            serial = greedy_cluster(hashes, 0.05, 21, is_containment=cont,
                                    backend="python")
            dev = greedy_cluster_device(hashes, 0.05, 21, batch_size=bs,
                                        is_containment=cont)
            assert serial.representatives == dev.representatives, (bs, cont)
            assert serial.clusters == dev.clusters, (bs, cont)
    # and the native backend agrees on the same tie corpus
    nat = greedy_cluster(hashes, 0.05, 21, backend="native")
    dev = greedy_cluster_device(hashes, 0.05, 21)
    assert nat.clusters == dev.clusters


def test_sweep_rows_streams_every_row_once():
    """_sweep_rows yields (j, candidates) for EVERY j = 1..n-1 in order
    (panel markers), and the union of streamed candidates equals the
    non-streamed candidate_pair_blocks pair set."""
    from rabbittclust_tpu.ops.bitmap import candidate_pair_blocks
    from rabbittclust_tpu.ops.greedy_device import _sweep_rows
    rng = np.random.default_rng(23)
    hashes = []
    for c in range(6):
        base = rng.choice(1 << 22, size=400, replace=False).astype(np.uint32)
        for g in range(5):
            keep = rng.random(len(base)) > 0.04
            hashes.append(np.unique(base[keep]))
    n = len(hashes)
    seen_rows = []
    streamed = set()
    for j, cand in _sweep_rows(hashes, 0.05, 21, False, 8192, 1024,
                               "greedy"):
        seen_rows.append(j)
        for i in cand.tolist():
            assert i < j
            streamed.add((j, i))
    assert seen_rows == list(range(1, n))
    direct = set()
    for ii, jj in candidate_pair_blocks(hashes, 0.05, 21, bits=8192,
                                        row_block=1024, bound="greedy"):
        direct.update(zip(ii.tolist(), jj.tolist()))
    assert streamed == direct


def test_device_sketch_workflow_wiring(synthetic_genomes, tmp_path,
                                       monkeypatch):
    """RTC_DEVICE_SKETCH=1 + --device routes the sketch phase through the
    device stream sketcher; .cluster output byte-equal to the native run."""
    from rabbittclust_tpu.cli.clust_mst import main as clust_mst_main
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(synthetic_genomes.files[:8]) + "\n")
    host_out = str(tmp_path / "host.cluster")
    dev_out = str(tmp_path / "dev.cluster")
    clust_mst_main(["--fast", "-l", "-i", lst, "-d", "0.05",
                    "--no-save", "-o", host_out])
    monkeypatch.setenv("RTC_DEVICE_SKETCH", "1")
    clust_mst_main(["--fast", "-l", "-i", lst, "-d", "0.05", "--device",
                    "--no-save", "-o", dev_out])
    with open(host_out, "rb") as a, open(dev_out, "rb") as b:
        assert a.read() == b.read()


def test_minhash_greedy_device_matches_parity():
    """Device-swept MinHash greedy == the reference-parity host engine
    bit-exactly: fast path (identical param sizes, winner = max common),
    slow path (mixed param sizes -> the reference's rep-side param-size
    asymmetry), containment, and exact-duplicate tie corpora (first-touch
    order)."""
    from rabbittclust_tpu.cluster.greedy import minhash_greedy_parity
    from rabbittclust_tpu.ops.greedy_device import minhash_greedy_device
    rng = np.random.default_rng(17)
    hashes = []
    for c in range(4):
        base = np.unique(rng.integers(0, 1 << 48, size=500,
                                      dtype=np.uint64))
        for g in range(4):
            keep = base[rng.random(len(base)) > 0.05 * g]
            hashes.append(np.unique(keep))
        # exact duplicates: every later copy ties (max common / min dist)
        # against several reps -> exercises first-touch resolution
        hashes.append(base.copy())
        hashes.append(base.copy())
    for psz in ([500] * len(hashes),                      # fast path
                [400 + 37 * (i % 5) for i in range(len(hashes))]):  # slow
        for cont in (False, True):
            host = minhash_greedy_parity(hashes, psz, 0.05, 21, cont)
            dev = minhash_greedy_device(hashes, psz, 0.05, 21, cont)
            assert host.representatives == dev.representatives, \
                (psz[0], cont)
            assert host.clusters == dev.clusters, (psz[0], cont)
    # fast path with HETEROGENEOUS param sizes beyond the sampled first
    # min(100, n) genomes: the reference applies the FIXED bound from
    # psizes[0] to every pair, so the device filter must never prune with
    # the (tighter) per-pair bound of a later, larger param size.  Clusters
    # with ~35% dropout put pair commons between the two bounds.
    rng2 = np.random.default_rng(31)
    big = []
    for c in range(13):
        base = np.unique(rng2.integers(0, 1 << 48, size=280,
                                       dtype=np.uint64))
        for g in range(9):
            big.append(np.unique(base[rng2.random(len(base)) > 0.35]))
    psz3 = [300] * 100 + [900] * (len(big) - 100)
    host = minhash_greedy_parity(big, psz3, 0.05, 21, False)
    dev = minhash_greedy_device(big, psz3, 0.05, 21, False)
    assert host.representatives == dev.representatives
    assert host.clusters == dev.clusters


def test_greedy_device_batchloop_ab(monkeypatch):
    """Legacy per-batch dispatch path (RTC_GREEDY_DEVICE=batchloop) stays
    bit-equal to the default single-sweep serial path."""
    from rabbittclust_tpu.ops.greedy_device import greedy_cluster_device
    rng = np.random.default_rng(11)
    hashes = []
    for c in range(4):
        base = rng.choice(1 << 21, size=400, replace=False).astype(np.uint32)
        for g in range(4):
            keep = rng.random(len(base)) > 0.04
            hashes.append(np.unique(base[keep]))
    for cont in (False, True):
        sweep = greedy_cluster_device(hashes, 0.05, 21, is_containment=cont)
        monkeypatch.setenv("RTC_GREEDY_DEVICE", "batchloop")
        legacy = greedy_cluster_device(hashes, 0.05, 21, is_containment=cont)
        monkeypatch.delenv("RTC_GREEDY_DEVICE")
        assert sweep.representatives == legacy.representatives, cont
        assert sweep.clusters == legacy.clusters, cont


def test_distributed_similarity_graph_matches_host(synthetic_genomes):
    """Mesh-built Leiden graph == host graph (same edges, same f64
    weights), and community_clusters(mesh=...) gives the same clusters."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_similarity_graph, make_mesh)
    from rabbittclust_tpu.cluster.leiden import (
        build_similarity_graph, community_clusters)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    mesh = make_mesh(8)
    df, dt, dw = distributed_similarity_graph(ss.hashes, 0.05, p.kmer_size,
                                              mesh=mesh)
    hf, ht, hw = build_similarity_graph(ss.hashes, 0.05, p.kmer_size)
    dist_edges = sorted(zip(df.tolist(), dt.tolist(), dw.tolist()))
    host_edges = sorted(zip(hf.tolist(), ht.tolist(), hw.tolist()))
    assert dist_edges == host_edges  # exact f64 equality: same counts
    c_mesh = community_clusters(ss.hashes, 0.05, p.kmer_size, mesh=mesh)
    c_host = community_clusters(ss.hashes, 0.05, p.kmer_size)
    assert c_mesh == c_host


def test_distributed_threshold_clusters(synthetic_genomes):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_threshold_clusters, make_mesh)
    from rabbittclust_tpu.cluster.mst import (
        clusters_from_forest, compute_mst, cut_forest)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    mesh = make_mesh(8)
    res = compute_mst(ss.hashes, 0.05, p.kmer_size)
    ch = clusters_from_forest(cut_forest(res.mst, 0.05), len(ss))
    # bitmap engine (default): partition-level contract — the gated-verify
    # spanning forest is not the MST, so within-cluster BFS order may differ
    cd = distributed_threshold_clusters(ss.hashes, 0.05, p.kmer_size,
                                        mesh=mesh)
    canon = lambda cs: sorted(sorted(c) for c in cs)  # noqa: E731
    assert canon(cd) == canon(ch)
    # exact engine: full-MST path, member order byte-equal to host
    ce = distributed_threshold_clusters(ss.hashes, 0.05, p.kmer_size,
                                        mesh=mesh, engine="exact")
    assert ce == ch


def test_pull_modes_and_column_trim_equivalent(monkeypatch):
    """Two-step count+slice pulls and the legacy full-buffer pull must yield
    identical candidate blocks; the triangular column trim must never drop a
    pair (multi-block input exercises every nc ladder step)."""
    from rabbittclust_tpu.ops.bitmap import candidate_pair_blocks
    rng = np.random.default_rng(11)
    base = np.unique(rng.integers(0, 2 ** 28, size=250).astype(np.uint32))
    hashes = []
    for i in range(400):
        keep = base[rng.random(len(base)) < 0.7]
        extra = np.unique(rng.integers(0, 2 ** 28, size=90).astype(np.uint32))
        hashes.append(np.unique(np.concatenate([keep, extra])))

    def collect():
        return [(ii.tolist(), jj.tolist()) for ii, jj in
                candidate_pair_blocks(hashes, 0.05, 21, bits=2048,
                                      row_block=96)]

    monkeypatch.setenv("RTC_BATCH_TILES", "0")  # pin the per-tile path
    monkeypatch.delenv("RTC_FULL_PULL", raising=False)
    two_step = collect()
    monkeypatch.setenv("RTC_FULL_PULL", "1")
    full = collect()
    assert two_step == full
    assert sum(len(b[0]) for b in two_step) > 0


def test_batched_tiles_equal_pertile(monkeypatch):
    """The scan-batched dispatch path (RTC_BATCH_TILES, default) must yield
    exactly the per-tile path's pair set — in both pull modes (packed-mask
    and index-compaction), with a batch size that leaves padding (invalid)
    tiles, and with padded rows."""
    from rabbittclust_tpu.ops.bitmap import candidate_pair_blocks
    rng = np.random.default_rng(13)
    base = np.unique(rng.integers(0, 2 ** 28, size=250).astype(np.uint32))
    hashes = []
    for i in range(333):  # odd n: exercises row padding
        keep = base[rng.random(len(base)) < 0.7]
        extra = np.unique(rng.integers(0, 2 ** 28, size=90).astype(np.uint32))
        hashes.append(np.unique(np.concatenate([keep, extra])))

    def pairs():
        out = set()
        for ii, jj in candidate_pair_blocks(hashes, 0.05, 21, bits=2048,
                                            row_block=64):
            out.update(zip(ii.tolist(), jj.tolist()))
        return out

    monkeypatch.setenv("RTC_BATCH_TILES", "0")
    ref = pairs()
    assert len(ref) > 0
    monkeypatch.setenv("RTC_BATCH_TILES", "16")
    monkeypatch.setenv("RTC_PULL_MODE", "mask")  # packed-mask pulls
    assert pairs() == ref
    monkeypatch.setenv("RTC_PULL_MODE", "idx")  # index-compaction pulls
    assert pairs() == ref
    monkeypatch.setenv("RTC_PULL_MODE", "auto")
    monkeypatch.setenv("RTC_BATCH_TILES", "3")  # padding tiles in last batch
    assert pairs() == ref


def test_compact_mask_two_level_equals_nonzero():
    """The two-level chunked compaction must equal flat nonzero whenever
    chunks_hit <= cap_chunks — exercising the actual two-level branch
    (cap_chunks < chunk-grid size), clustered and scattered masks, and a
    non-square shape."""
    import jax.numpy as jnp
    from rabbittclust_tpu.ops.bitmap import compact_mask_two_level
    rng = np.random.default_rng(7)
    for shape, density in (((1024, 1024), 1e-4), ((512, 2048), 3e-4),
                           ((1024, 1024), 0.0)):
        mask = rng.random(shape) < density
        truth = np.flatnonzero(mask)
        cap_tile = 1 << 12
        cap_chunks = 512  # < chunk grid (shape[0]*shape[1]/512)
        assert mask.sum() <= cap_chunks  # safety precondition
        count, flat = compact_mask_two_level(jnp.asarray(mask), cap_tile,
                                             cap_chunks)
        assert int(count) == len(truth)
        got = np.asarray(flat)[:len(truth)]
        assert np.array_equal(np.sort(got), truth)


def test_decode_packed_mask_native_equals_numpy():
    """Native popcount/ctz mask decode == the NumPy unpackbits fallback,
    including padded-row trimming (i >= n) and tile offsets."""
    from rabbittclust_tpu.ops import bitmap as bm
    from rabbittclust_tpu.utils import native as native_mod
    rng = np.random.default_rng(3)
    rb = 256
    n = 250  # pad rows 250..255 must be dropped
    mask = rng.random((rb, rb)) < 0.03
    mask[n:] = False  # device zeroes padded rows via sizes==0
    packed = np.packbits(mask, axis=1, bitorder="little")
    expect = int(mask.sum())
    ii_n, jj_n = bm._decode_packed_mask(packed, rb, 1024, 512, 1024 + n,
                                        expect)
    real = native_mod.load_native
    try:
        native_mod.load_native = lambda: None  # force the NumPy fallback
        ii_f, jj_f = bm._decode_packed_mask(packed, rb, 1024, 512,
                                            1024 + n, expect)
    finally:
        native_mod.load_native = real
    assert np.array_equal(ii_n, ii_f) and np.array_equal(jj_n, jj_f)
    assert len(ii_n) == expect


def test_pull_quantum_ladder():
    from rabbittclust_tpu.ops.bitmap import _pull_quantum
    assert _pull_quantum(0, 1 << 20) == 1 << 14
    assert _pull_quantum(1 << 14, 1 << 20) == 1 << 14
    assert _pull_quantum((1 << 14) + 1, 1 << 20) == 1 << 15
    assert _pull_quantum(1 << 21, 1 << 20) == 1 << 20  # capped


def test_distributed_bitmap_mst_cut_byte_equal(synthetic_genomes):
    """distributed_mst(engine="bitmap") is exact for every cut <= threshold:
    the <=-threshold edge set equals the host MST's cut EXACTLY (same edges,
    same kruskal (d, i, j) order), for both 32- and 64-bit sketches."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_mst, make_mesh)
    from rabbittclust_tpu.cluster.mst import compute_mst, cut_forest
    mesh = make_mesh(8)
    for k, dr in ((19, 2), (23, 3)):  # 32-bit and 64-bit hash paths
        ss, p = sketch_files_kssd(synthetic_genomes.files[:16],
                                  min_len=1000, kmer_size=k, drlevel=dr)
        res_b = distributed_mst(ss.hashes, 0.05, p.kmer_size, mesh=mesh,
                                engine="bitmap", bits=4096)
        res_h = compute_mst(ss.hashes, 0.05, p.kmer_size)
        cb = cut_forest(res_b.mst, 0.05)
        chst = cut_forest(res_h.mst, 0.05)
        assert cb[0].tolist() == chst[0].tolist(), (k, dr)
        assert cb[1].tolist() == chst[1].tolist(), (k, dr)
        assert cb[2].tolist() == chst[2].tolist(), (k, dr)


def test_distributed_bitmap_cap_autoregrow(synthetic_genomes):
    """A tiny cap must auto-regrow (re-run the ring 4x larger), not raise or
    silently truncate: results equal the big-cap run."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_candidate_pairs_bitmap, make_mesh)
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    mesh = make_mesh(8)
    small = distributed_candidate_pairs_bitmap(
        ss.hashes, 0.05, p.kmer_size, mesh=mesh, bits=4096, cap=1)
    big = distributed_candidate_pairs_bitmap(
        ss.hashes, 0.05, p.kmer_size, mesh=mesh, bits=4096, cap=4096)
    canon = lambda ii, jj: sorted(zip(ii.tolist(), jj.tolist()))  # noqa: E731
    assert canon(*small) == canon(*big)
    assert len(small[0]) > 1  # the data is clustered: regrow really fired


def test_exact_ring_cap_autoregrow(synthetic_genomes):
    """The exact-count ring also regrows instead of raising."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
    from rabbittclust_tpu.parallel.dist_engine import (
        distributed_mst, make_mesh)
    from rabbittclust_tpu.cluster.mst import compute_mst
    ss, p = sketch_files_kssd(synthetic_genomes.files[:16], min_len=1000,
                              kmer_size=19, drlevel=2)
    res_d = distributed_mst(ss.hashes, 0.05, p.kmer_size,
                            mesh=make_mesh(8), cap=1)
    res_h = compute_mst(ss.hashes, 0.05, p.kmer_size)
    ed = sorted((min(a, b), max(a, b)) for a, b in zip(*res_d.mst[:2]))
    eh = sorted((min(a, b), max(a, b)) for a, b in zip(*res_h.mst[:2]))
    assert ed == eh


def test_staged_pack_matches_host_pack():
    """pack_bitmaps_packed_staged (chunked pack + device_put overlap) must
    produce the identical bit layout and collision counts as the host
    pack, across chunk boundaries and tail padding."""
    import numpy as np
    from rabbittclust_tpu.ops.bitmap import (
        pack_bitmaps_packed, pack_bitmaps_packed_staged)

    rng = np.random.default_rng(4)
    hashes = [np.unique(rng.integers(0, 2 ** 30, size=rng.integers(5, 90))
                        .astype(np.uint32)) for _ in range(301)]
    xp, coll = pack_bitmaps_packed(hashes, bits=1024, pad_n_to=64)
    xd, coll2 = pack_bitmaps_packed_staged(hashes, bits=1024, pad_n_to=64,
                                           chunk=128)
    assert np.array_equal(np.asarray(xd), xp)
    assert np.array_equal(coll2, coll)


def test_gated_verify_merge_native_matches_fallback():
    """rtc_verify_merge_* (one-pass native count+distance+union-find) must
    return the same kept edges, ok-mask, and union-find state as the
    NumPy/Python fallback, for mash and containment, u32 and u64."""
    import numpy as np
    from rabbittclust_tpu.cluster.union_find import UnionFind
    from rabbittclust_tpu.ops.bitmap import CsrSketches
    from rabbittclust_tpu.ops import cluster_fast
    from rabbittclust_tpu.utils import native as native_mod

    assert native_mod.load_native() is not None
    rng = np.random.default_rng(8)
    for dtype in (np.uint32, np.uint64):
        base = np.unique(rng.integers(0, 2 ** 30, size=500).astype(dtype))
        hashes = []
        for i in range(60):
            take = int(rng.integers(40, 400))
            sub = rng.choice(base, size=take, replace=False)
            noise = np.unique(rng.integers(
                0, 2 ** 30, size=take // 3).astype(dtype))
            hashes.append(np.unique(np.concatenate([sub, noise])))
        sizes = np.array([len(h) for h in hashes], dtype=np.int64)
        ii = rng.integers(1, 60, size=300)
        jj = rng.integers(0, ii)
        for is_cont in (False, True):
            csr = CsrSketches(hashes)
            uf_n = UnionFind(60)
            ki, kj, kd, ok = cluster_fast.gated_verify_merge(
                uf_n, csr, sizes, ii, jj, 0.05, 21, is_cont)
            # fallback: monkeypatch the native loader off
            orig = native_mod.load_native
            native_mod.load_native = lambda: None
            try:
                uf_f = UnionFind(60)
                kif, kjf, kdf, okf = cluster_fast.gated_verify_merge(
                    uf_f, csr, sizes, ii, jj, 0.05, 21, is_cont)
            finally:
                native_mod.load_native = orig
            assert ki.tolist() == kif.tolist(), (dtype, is_cont)
            assert kj.tolist() == kjf.tolist()
            assert ok.tolist() == okf.tolist()
            # distances: native libm vs NumPy SIMD log may differ 1 ulp
            assert np.allclose(kd, kdf, rtol=0, atol=1e-15)
            # partitions (not root identities) must agree
            rn, rf = uf_n.roots_array(), uf_f.roots_array()
            import itertools
            for a, b in itertools.combinations(range(60), 2):
                assert (rn[a] == rn[b]) == (rf[a] == rf[b]), (a, b)


def test_exact_order_matches_serial_engine_both_arms(monkeypatch):
    """threshold_clusters_device_exact_order == the -t 1 host engine's
    member order on BOTH arms: (a) certified corpus (disjoint per-cluster
    hash ranges -> intra replay, certified=True), (b) cross-sharing corpus
    (random extras shared across clusters -> full-engine fallback)."""
    import numpy as np
    from rabbittclust_tpu.cluster.mst import (clusters_from_forest,
                                              compute_mst, cut_forest)
    from rabbittclust_tpu.ops.cluster_fast import (
        threshold_clusters_device_exact_order)
    from rabbittclust_tpu.utils.native import have_native

    if not have_native():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)

    def corpus(cross):
        hashes = []
        for c in range(12):
            lo = 0 if cross else c * (1 << 24)
            span = 1 << 28 if cross else 1 << 24
            base = np.unique(
                (lo + rng.integers(0, span, size=60)).astype(np.uint32))
            for g in range(15):
                keep = base[rng.random(len(base)) < 0.8]
                extra = (lo + rng.integers(0, span, size=8)).astype(
                    np.uint32)
                hashes.append(np.unique(np.concatenate([keep, extra])))
        return hashes

    for cross in (False, True):
        hashes = corpus(cross)
        n = len(hashes)
        res = compute_mst(hashes, 0.05, 21, threads=1)
        expect = clusters_from_forest(cut_forest(res.mst, 0.05), n)
        got, certified = threshold_clusters_device_exact_order(
            hashes, 0.05, 21, bits=1024, row_block=128)
        assert got == expect, f"cross={cross}"
        if not cross:
            assert certified  # disjoint ranges must certify
