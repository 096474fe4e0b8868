"""Persistence formats: roundtrips + binary layout spot-checks."""

import os
import struct

import numpy as np
import pytest

from rabbittclust_tpu.cluster.mst import compute_mst, cut_forest, clusters_from_forest
from rabbittclust_tpu.sketch.kssd import sketch_files_kssd
from rabbittclust_tpu.state import sketch_io
from rabbittclust_tpu.state.greedy_state import KssdClusterState
from rabbittclust_tpu.state.mst_state import KssdMstState, MstState


@pytest.fixture()
def sketches(synthetic_genomes):
    return sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                             kmer_size=19, drlevel=2)


def test_kssd_sketch_roundtrip(tmp_path, sketches):
    ss, p = sketches
    folder = str(tmp_path / "run")
    sketch_io.save_kssd_sketches(ss, p, folder)
    ss2, p2 = sketch_io.load_kssd_sketches(folder)
    assert p2 == p
    assert len(ss2) == len(ss)
    assert ss2.sketch_by_file == ss.sketch_by_file
    for a, b in zip(ss.hashes, ss2.hashes):
        assert np.array_equal(a, b)
    assert ss2.file_names == ss.file_names
    assert ss2.names == ss.names
    assert ss2.total_lens == ss.total_lens


def test_kssd_hash_file_layout(tmp_path, sketches):
    """Header must be the raw KssdParameters struct {id,half_k,half_subk,
    drlevel,genomeNumber} (reference SketchInfo.h:50-56)."""
    ss, p = sketches
    folder = str(tmp_path / "run")
    sketch_io.save_kssd_sketches(ss, p, folder)
    with open(os.path.join(folder, "kssd.hash.sketch"), "rb") as f:
        pid, hk, hs, dl, gn = struct.unpack("<iiiii", f.read(20))
        assert (pid, hk, hs, dl) == (p.id, p.half_k, p.half_subk, p.drlevel)
        (n0,) = struct.unpack("<Q", f.read(8))
        assert n0 == len(ss.hashes[0])


def test_mst_roundtrip(tmp_path, sketches):
    ss, p = sketches
    res = compute_mst(ss.hashes, 0.05, p.kmer_size, with_dense=True)
    folder = str(tmp_path / "run")
    sketch_io.ensure_folder(folder)
    sketch_io.save_mst(res.mst, folder)
    sketch_io.save_dense(folder, res.dense)
    sketch_io.save_ani(folder, res.ani)
    mst2 = sketch_io.load_mst(folder)
    assert np.array_equal(mst2[0], res.mst[0])
    assert np.array_equal(mst2[1], res.mst[1])
    assert np.allclose(mst2[2], res.mst[2])
    assert np.array_equal(sketch_io.load_dense(folder), res.dense)
    assert np.array_equal(sketch_io.load_ani(folder), res.ani)


def test_edge_mst_is_16_byte_records(tmp_path, sketches):
    ss, p = sketches
    res = compute_mst(ss.hashes, 0.05, p.kmer_size)
    folder = str(tmp_path / "run")
    sketch_io.ensure_folder(folder)
    sketch_io.save_mst(res.mst, folder)
    size = os.path.getsize(os.path.join(folder, "edge.mst"))
    assert size == 8 + 16 * len(res.mst[0])  # size_t + (int,int,double)*


def test_index_roundtrip(tmp_path, sketches):
    ss, p = sketches
    folder = str(tmp_path / "run")
    sketch_io.save_kssd_index(ss.hashes, ss.use64, folder)
    uniq, sizes, gids = sketch_io.load_kssd_index(folder, ss.use64)
    assert sizes.sum() == sum(len(h) for h in ss.hashes)
    assert len(uniq) == len(np.unique(np.concatenate(ss.hashes)))
    # posting lists reconstruct the membership exactly
    off = 0
    from collections import defaultdict
    member = defaultdict(set)
    for h, s in zip(uniq, sizes):
        for g in gids[off:off + s]:
            member[int(h)].add(int(g))
        off += s
    for gid, h in enumerate(ss.hashes):
        for hv in h.tolist():
            assert gid in member[hv]


def test_greedy_state_roundtrip(tmp_path, sketches):
    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    ss, p = sketches
    order = ss.sort_by_size_desc()
    ss2 = ss.reorder(order)
    gres = greedy_cluster(ss2.hashes, 0.05, p.kmer_size, presorted=True)
    st = KssdClusterState.from_clustering(ss2, p, gres, 0.05)
    path = str(tmp_path / "cluster_state.bin")
    st.save(path)
    st2 = KssdClusterState.load(path)
    assert st2.threshold == st.threshold
    assert st2.representative_ids == st.representative_ids
    assert st2.clusters == st.clusters
    assert st2.inverted_index == st.inverted_index
    for a, b in zip(st.hashes, st2.hashes):
        assert np.array_equal(a, b)


def test_repdb_roundtrip_and_query(tmp_path, sketches):
    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    ss, p = sketches
    order = ss.sort_by_size_desc()
    ss2 = ss.reorder(order)
    gres = greedy_cluster(ss2.hashes, 0.05, p.kmer_size, presorted=True)
    st = KssdClusterState.from_clustering(ss2, p, gres, 0.05)
    path = str(tmp_path / "rep.db")
    st.save_repdb(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"REPDB002"
    st2 = KssdClusterState.load_repdb(path)
    # querying each genome with itself: reps match at distance 0
    for rep_idx, gid in enumerate(st.representative_ids):
        res = st2.query_topk(st.hashes[gid], 1)
        assert res and res[0]["distance"] == 0.0
        assert res[0]["rep_idx"] == rep_idx
    # assign for all genomes lands in the right cluster
    for cid, cl in enumerate(st.clusters):
        for gid in cl:
            a = st2.assign(st.hashes[gid])
            assert a["cluster_id"] == cid


def test_incremental_matches_full(tmp_path, synthetic_genomes):
    """State-based incremental clustering yields the same partition as
    clustering everything at once (for well-separated clusters)."""
    from rabbittclust_tpu.cluster.greedy import greedy_cluster
    from rabbittclust_tpu.sketch.base import SketchSet
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    k = len(ss) - 5
    order_all = list(range(len(ss)))
    base = ss.reorder(np.array(order_all[:k]))
    extra = ss.reorder(np.array(order_all[k:]))
    order = base.sort_by_size_desc()
    base_sorted = base.reorder(order)
    gres = greedy_cluster(base_sorted.hashes, 0.05, p.kmer_size,
                          presorted=True)
    st = KssdClusterState.from_clustering(base_sorted, p, gres, 0.05)
    st.incremental_cluster(extra)
    # reference quirk: clusters created during incremental updates exclude
    # their representative from the member list — reattach it for the
    # partition check
    full = []
    for idx, cl in enumerate(st.clusters):
        rep = st.representative_ids[idx]
        full.append(([rep] if rep not in cl else []) + list(cl))
    # map ids back: first k are base_sorted order, rest are extra order
    from tests.helpers import clusters_to_labels, same_partition
    idmap = [int(order[i]) for i in range(k)] + list(range(k, len(ss)))
    clusters = [[idmap[g] for g in cl] for cl in full]
    labels = clusters_to_labels(clusters, len(ss))
    assert same_partition(labels, synthetic_genomes.labels)


def test_mst_state_roundtrip_and_append(tmp_path, synthetic_genomes):
    ss, p = sketch_files_kssd(synthetic_genomes.files, min_len=1000,
                              kmer_size=19, drlevel=2)
    k = len(ss) - 5
    base = ss.reorder(np.arange(k))
    extra = ss.reorder(np.arange(k, len(ss)))
    res = compute_mst(base.hashes, 0.05, p.kmer_size)
    clusters = clusters_from_forest(cut_forest(res.mst, 0.05), k)
    st = KssdMstState.from_clustering(base, p, res.mst, clusters, 0.05)
    path = str(tmp_path / "mst_cluster_state.bin")
    st.save(path)
    st2 = MstState.load(path)
    assert st2.representative_ids == st.representative_ids
    assert st2.clusters == st.clusters
    live = st2.append_cluster(extra)
    from tests.helpers import clusters_to_labels, same_partition
    labels = clusters_to_labels(live, len(ss))
    assert same_partition(labels, synthetic_genomes.labels)


def test_minhash_sketch_roundtrip(tmp_path, synthetic_genomes):
    from rabbittclust_tpu.sketch.minhash import MinHashParams, sketch_files_minhash
    p = MinHashParams(kmer_size=21, sketch_size=200)
    ss = sketch_files_minhash(synthetic_genomes.files[:6], 1000, p)
    folder = str(tmp_path / "run")
    sketch_io.save_minhash_sketches(ss, folder, 21, False, 0, 200)
    ss2, p2 = sketch_io.load_minhash_sketches(folder)
    assert p2.kmer_size == 21 and p2.sketch_size == 200
    for a, b in zip(ss.hashes, ss2.hashes):
        assert np.array_equal(a, b)
    params = sketch_io.read_sketch_parameters(folder)
    assert params["sketch_func_id"] == 0 and params["kmer_size"] == 21


def test_classic_append_preserves_source_folder(tmp_path, synthetic_genomes):
    """Classic append (no saved state) writes combined artifacts to a NEW
    timestamped run folder; the presketched source folder is never mutated
    (reference append_clust_mst_fast, sub_command.cpp:1450-1470)."""
    import hashlib
    import os
    import subprocess
    import sys
    import time

    files = synthetic_genomes.files
    init_list = tmp_path / "init.list"
    app_list = tmp_path / "app.list"
    init_list.write_text("\n".join(files[:8]) + "\n")
    app_list.write_text("\n".join(files[8:]) + "\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    def run(module, args, cwd):
        r = subprocess.run([sys.executable, "-m",
                            f"rabbittclust_tpu.cli.{module}", *args],
                           cwd=cwd, capture_output=True, text=True,
                           env=env)
        assert r.returncode == 0, r.stderr[-800:]

    def folder_digest(d):
        out = {}
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = hashlib.sha256(fh.read()).hexdigest()
        return out

    for module in ("clust_mst", "clust_greedy"):
        work = tmp_path / module
        work.mkdir()
        run(module, ["--fast", "-l", "-i", str(init_list),
                     "-o", str(work / "a.cluster"), "-d", "0.05"], work)
        runs = [x for x in os.listdir(work) if x.startswith("20")]
        assert len(runs) == 1
        src = work / runs[0]
        before = folder_digest(src)
        time.sleep(1.1)  # distinct timestamp for the append's new folder
        run(module, ["--fast", "--presketched", str(src), "--append",
                     str(app_list), "-l", "-o", str(work / "b.cluster"),
                     "-d", "0.05"], work)
        assert folder_digest(src) == before, module
        # a new run folder with the new/combined sketches exists
        runs_after = [x for x in os.listdir(work) if x.startswith("20")]
        assert len(runs_after) == 2, module
