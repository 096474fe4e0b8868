"""Multi-chip distance engine — mesh-sharded pair tiles over ICI.

Design (SURVEY.md §2.14/§5: the reference is single-node OpenMP only; the
distributed layer is new, TPU-first):

  * genomes are sharded row-block data-parallel over a 1-D device mesh
    ("data" axis); every device holds its packed sketch shard;
  * pairwise tiles are computed ring-style: at step t each device compares
    its resident rows against the visiting column shard, then forwards the
    visiting shard to its ring neighbor with ``jax.lax.ppermute`` (ICI
    traffic only, no host gathers);
  * per-shard candidate edges are reduced locally (streaming Kruskal on the
    host per shard) and merged into the global MST by the driver — exact by
    the edge-partition MST theorem.

``ring_pair_step`` is the jittable one-step unit the dry-run compiles over
an N-device mesh; ``distributed_candidate_counts`` runs the full ring.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def make_mesh(n_devices: Optional[int] = None):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def _counts_block(a0, b0, a1=None, b1=None):
    """(GI, W, K) x (GJ, W, K) -> (GI, GJ) int32 exact counts (XLA path)."""
    import jax.numpy as jnp

    w = a0.shape[1]
    acc = jnp.zeros((a0.shape[0], b0.shape[0]), dtype=jnp.int32)
    for r in range(w):
        ar0 = a0[:, r, :][:, None, :]
        for s in range(w):
            bs0 = b0[:, s, :][None, :, :]
            eq = ar0 == bs0
            if a1 is not None:
                eq &= a1[:, r, :][:, None, :] == b1[:, s, :][None, :, :]
            acc = acc + jnp.sum(eq, axis=-1, dtype=jnp.int32)
    return acc


def build_ring_fn(threshold: float, kmer_size: int, radio: int):
    """Returns a shard_map-able function: local row shard + ring rotation ->
    (local candidate-edge count, local min distance, thresholded counts)."""
    import jax
    import jax.numpy as jnp

    def ring_fn(rows0, sizes, row_ids):
        """Executes per device under shard_map.

        rows0: (L, W, K) local packed shard;  sizes: (L,) sketch sizes;
        row_ids: (L,) global genome ids of local rows.
        """
        n_dev = jax.lax.axis_size("data")
        my = jax.lax.axis_index("data")

        def step(t, carry):
            visiting0, vis_sizes, vis_ids, n_cand, min_d = carry
            counts = _counts_block(rows0, visiting0)
            s0 = sizes[:, None].astype(jnp.float32)
            s1 = vis_sizes[None, :].astype(jnp.float32)
            mn = jnp.minimum(s0, s1)
            mx = jnp.maximum(s0, s1)
            ok = (counts > 0) & (mn > 0) & (mx <= radio * mn)
            # pair ownership: only i > j to count each pair once globally
            ok &= row_ids[:, None] > vis_ids[None, :]
            common = counts.astype(jnp.float32)
            denom = s0 + s1 - common
            j = jnp.where(denom > 0, common / jnp.maximum(denom, 1.0), 0.0)
            d = jnp.where(
                j >= 1.0, 0.0,
                jnp.where(j <= 0.0, 1.0,
                          -(1.0 / kmer_size) * jnp.log(
                              2.0 * j / (1.0 + j))))
            n_cand = n_cand + jnp.sum(ok & (d <= threshold),
                                      dtype=jnp.int32)
            min_d = jnp.minimum(min_d, jnp.min(jnp.where(ok, d, 1.0)))
            # rotate the visiting shard around the ring
            perm = [(k, (k + 1) % n_dev) for k in range(n_dev)]
            visiting0 = jax.lax.ppermute(visiting0, "data", perm)
            vis_sizes = jax.lax.ppermute(vis_sizes, "data", perm)
            vis_ids = jax.lax.ppermute(vis_ids, "data", perm)
            return visiting0, vis_sizes, vis_ids, n_cand, min_d

        init = (rows0, sizes, row_ids, jnp.int32(0), jnp.float32(1.0))
        _, _, _, n_cand, min_d = jax.lax.fori_loop(0, n_dev, step, init)
        total = jax.lax.psum(n_cand, "data")
        global_min = jax.lax.pmin(min_d, "data")
        return total, global_min

    return ring_fn


def distributed_candidate_stats(packed_plane0: np.ndarray,
                                sizes: np.ndarray,
                                threshold: float, kmer_size: int,
                                mesh=None) -> Tuple[int, float]:
    """Run the full ring over a mesh; returns (# pairs with dist <=
    threshold, min pair distance).  Demonstrates/validates the multi-chip
    sharded path; exact edge extraction reuses the same tiles."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from ..distance.mash import size_ratio_limit

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n = packed_plane0.shape[0]
    assert n % n_dev == 0, (n, n_dev)
    radio = size_ratio_limit(threshold, kmer_size - 1)
    ring_fn = build_ring_fn(threshold, kmer_size, radio)

    fn = jax.shard_map(
        ring_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    row_ids = np.arange(n, dtype=np.int32)
    total, min_d = jax.jit(fn)(
        jnp.asarray(packed_plane0), jnp.asarray(sizes.astype(np.int32)),
        jnp.asarray(row_ids))
    return int(np.asarray(total)), float(np.asarray(min_d))


def build_ring_edges_fn(threshold: float, kmer_size: int, radio: int,
                        cap: int, two_plane: bool = False):
    """shard_map-able ring that EXTRACTS candidate edges exactly.

    Each device emits, per ring step, a fused int32 block
    [count, local_i*N_total + j (cap entries), common (cap entries)] for
    pairs (global_i > global_j) passing the candidate + size-ratio filters.
    Counts are exact (bucket-packed compare), so the host computes float64
    distances from them directly and merges per-shard partial MSTs.
    ``two_plane`` handles 64-bit KSSD hashes (plane0/plane1 both rotate
    around the ring)."""
    import jax
    import jax.numpy as jnp

    def ring_fn(rows0, rows1, sizes, row_ids):
        n_dev = jax.lax.axis_size("data")

        def step(carry, _):
            visiting0, visiting1, vis_sizes, vis_ids = carry
            if two_plane:
                counts = _counts_block(rows0, visiting0, rows1, visiting1)
            else:
                counts = _counts_block(rows0, visiting0)
            s0 = sizes[:, None]
            s1 = vis_sizes[None, :]
            mn = jnp.minimum(s0, s1)
            mx = jnp.maximum(s0, s1)
            ok = (counts > 0) & (mn > 0) & (mx <= radio * mn)
            ok &= row_ids[:, None] > vis_ids[None, :]
            cnt = jnp.sum(ok, dtype=jnp.int32)
            (flat,) = jnp.nonzero(ok.reshape(-1), size=cap, fill_value=-1)
            flat = flat.astype(jnp.int32)
            li = flat // counts.shape[1]
            vj = flat % counts.shape[1]
            gid_i = jnp.where(flat >= 0, jnp.take(row_ids, li), -1)
            gid_j = jnp.where(flat >= 0, jnp.take(vis_ids, vj), -1)
            common = jnp.where(
                flat >= 0,
                jnp.take(counts.reshape(-1), jnp.maximum(flat, 0)), 0)
            perm = [(k, (k + 1) % n_dev) for k in range(n_dev)]
            visiting0 = jax.lax.ppermute(visiting0, "data", perm)
            if two_plane:
                visiting1 = jax.lax.ppermute(visiting1, "data", perm)
            vis_sizes = jax.lax.ppermute(vis_sizes, "data", perm)
            vis_ids = jax.lax.ppermute(vis_ids, "data", perm)
            fused = jnp.concatenate(
                [cnt[None], gid_i, gid_j, common.astype(jnp.int32)])
            return (visiting0, visiting1, vis_sizes, vis_ids), fused

        init = (rows0, rows1, sizes, row_ids)
        _, out = jax.lax.scan(step, init, None, length=n_dev)
        return out  # (n_dev_steps, 1 + 3*cap)

    return ring_fn


def distributed_candidate_edges(packed_plane0: np.ndarray,
                                sizes: np.ndarray, threshold: float,
                                kmer_size: int, mesh=None, cap: int = 4096,
                                radio: Optional[int] = None,
                                packed_plane1: Optional[np.ndarray] = None):
    """Exact candidate edges (i, j, common) across the mesh, every pair
    covered exactly once (pair ownership: global_i > global_j).

    ``radio`` overrides the size-ratio prefilter; default is the reference's
    int-truncated MST prefilter (size_ratio_limit with k-1).  Callers whose
    downstream filter differs (e.g. the Leiden graph's ratio >= 0.5) pass a
    safe superset bound instead.  ``packed_plane1`` enables 64-bit KSSD
    hashes (two uint32 planes per slot)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from ..distance.mash import size_ratio_limit

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n = packed_plane0.shape[0]
    assert n % n_dev == 0, (n, n_dev)
    if radio is None:
        radio = size_ratio_limit(threshold, kmer_size - 1)
    two = packed_plane1 is not None
    ring_fn = build_ring_edges_fn(threshold, kmer_size, radio, cap,
                                  two_plane=two)
    fn = jax.shard_map(ring_fn, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data"), P("data")),
                       out_specs=P("data"), check_vma=False)
    row_ids = np.arange(n, dtype=np.int32)
    plane1 = packed_plane1 if two else packed_plane0[:, :1, :1]
    out = np.asarray(jax.jit(fn)(
        jnp.asarray(packed_plane0),
        jnp.asarray(plane1),
        jnp.asarray(sizes.astype(np.int32)),
        jnp.asarray(row_ids)))
    # out: (n_dev * n_steps, 1 + 3*cap); decode every block
    ii_all, jj_all, cc_all = [], [], []
    for block in out.reshape(-1, 1 + 3 * cap):
        cnt = int(block[0])
        if cnt > cap:
            raise RuntimeError(
                f"ring edge buffer overflow ({cnt} > {cap}); raise cap")
        if cnt:
            ii_all.append(block[1:1 + cnt].astype(np.int64))
            jj_all.append(block[1 + cap:1 + cap + cnt].astype(np.int64))
            cc_all.append(block[1 + 2 * cap:1 + 2 * cap + cnt].astype(np.int64))
    if not ii_all:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    return (np.concatenate(ii_all), np.concatenate(jj_all),
            np.concatenate(cc_all))


def distributed_mst(hashes, threshold: float, kmer_size: int,
                    is_containment: bool = False, mesh=None,
                    cap: int = 4096):
    """Exact MST over a device mesh: ring-extracted candidate edges ->
    float64 distances on host -> Kruskal (edge-partition MST theorem)."""
    from ..ops.pack import pack_sketches
    from ..cluster.mst import MstResult, kruskal
    from ..distance.mash import aaf_distance, mash_distance

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    n = len(hashes)
    use64 = n > 0 and hashes[0].dtype == np.uint64
    pad = ((n + n_dev - 1) // n_dev) * n_dev
    packed = pack_sketches(hashes, use64, pad_n_to=max(pad, n_dev))
    np_pad = packed.plane0.shape[0]
    # re-pad rows to exactly pad (pack may round further; slice)
    plane0 = packed.plane0[:pad] if np_pad >= pad else packed.plane0
    plane1 = (None if packed.plane1 is None
              else packed.plane1[:plane0.shape[0]])
    sizes = packed.sizes[:plane0.shape[0]]
    ii, jj, common = distributed_candidate_edges(
        plane0, sizes, threshold, kmer_size, mesh=mesh, cap=cap,
        packed_plane1=plane1)
    keep = (ii < n) & (jj < n)
    ii, jj, common = ii[keep], jj[keep], common[keep]
    s = np.array([len(h) for h in hashes], dtype=np.int64)
    if is_containment:
        d = aaf_distance(common, s[ii], s[jj], kmer_size)
    else:
        d = mash_distance(common, s[ii], s[jj], kmer_size)
    mst = kruskal((ii, jj, d), n)
    return MstResult(mst=mst, n=n)


def _pack_rows_for_mesh(hashes, mesh):
    """Bucket-pack sketches (32- or 64-bit) with rows padded to a mesh
    multiple; returns (plane0, plane1-or-None, sizes)."""
    from ..ops.pack import pack_sketches

    n_dev = int(mesh.devices.size)
    n = len(hashes)
    use64 = n > 0 and hashes[0].dtype == np.uint64
    pad = ((n + n_dev - 1) // n_dev) * n_dev
    packed = pack_sketches(hashes, use64, pad_n_to=max(pad, n_dev))
    plane0 = packed.plane0[:pad] if packed.plane0.shape[0] >= pad \
        else packed.plane0
    plane1 = (None if packed.plane1 is None
              else packed.plane1[:plane0.shape[0]])
    return plane0, plane1, packed.sizes[:plane0.shape[0]]


def distributed_similarity_graph(hashes, threshold: float, kmer_size: int,
                                 mesh=None, cap: int = 4096):
    """Leiden similarity graph over the mesh: edge iff dist < threshold and
    size ratio >= 0.5, weight = 1 - dist (leiden.cpp:188-256 semantics).

    Identical edge set and float64 weights as
    cluster.leiden.build_similarity_graph (no kNN) — the ring prefilter is a
    strict superset (ceil size bound, no int truncation) and the exact
    filters run on the host from exact counts."""
    import math
    from ..distance.mash import mash_distance

    if mesh is None:
        mesh = make_mesh()
    n = len(hashes)
    plane0, plane1, sizes = _pack_rows_for_mesh(hashes, mesh)
    # superset of both the Mash bound max <= min * (2e^{dk}-1) and the
    # Leiden ratio >= 0.5 window
    radio_safe = max(2, int(math.ceil(2.0 * math.exp(
        threshold * kmer_size))) + 1)
    ii, jj, common = distributed_candidate_edges(
        plane0, sizes, threshold, kmer_size, mesh=mesh, cap=cap,
        radio=radio_safe, packed_plane1=plane1)
    keep = (ii < n) & (jj < n)
    ii, jj, common = ii[keep], jj[keep], common[keep]
    s = np.array([len(h) for h in hashes], dtype=np.int64)
    s0, s1 = s[ii], s[jj]
    ratio = np.minimum(s0, s1) / np.maximum(np.maximum(s0, s1), 1)
    d = np.clip(mash_distance(common, s0, s1, kmer_size), 0.0, 1.0)
    ok = (ratio >= 0.5) & (d < threshold)
    frm = np.minimum(ii[ok], jj[ok])
    to = np.maximum(ii[ok], jj[ok])
    return frm, to, 1.0 - d[ok]


def distributed_threshold_clusters(hashes, threshold: float, kmer_size: int,
                                   is_containment: bool = False, mesh=None,
                                   cap: int = 4096):
    """Exact single-linkage clusters at ``threshold`` over a device mesh
    (BFS-ordered like the reference MST cut)."""
    from ..cluster.mst import clusters_from_forest, cut_forest

    res = distributed_mst(hashes, threshold, kmer_size,
                          is_containment=is_containment, mesh=mesh, cap=cap)
    return clusters_from_forest(cut_forest(res.mst, threshold), len(hashes))
