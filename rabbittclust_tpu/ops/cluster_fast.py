"""Fast exact threshold clustering: MXU filter + union-find-gated verify.

The single-linkage partition at threshold d is the connected components of
the graph of pairs with dist <= d.  Key observation: once two genomes are in
the same component, no further edge between that component's members can
change the partition — so their candidate pairs never need exact
verification.  Processing candidates in decreasing bitmap similarity makes
most true edges arrive first, collapsing components early; the number of
exact verifications drops from O(#candidates) to roughly
O(N + #cross-component rejects) while the result stays exactly the
single-linkage partition (every cross-component candidate is verified).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..cluster.union_find import UnionFind
from ..distance.mash import aaf_distance, mash_distance
from .bitmap import CsrSketches, candidate_pairs_threshold


def threshold_clusters_device(
    hashes: List[np.ndarray],
    threshold: float,
    kmer_size: int,
    is_containment: bool = False,
    bits: int = 8192,
    row_block: int = 4096,
    verify_chunk: int = 65536,
) -> List[List[int]]:
    """Exact single-linkage clusters at ``threshold`` (BFS-ordered like the
    reference MST cut; see cluster.mst.clusters_from_forest)."""
    n = len(hashes)
    if n == 0:
        return []
    ii, jj, _ = candidate_pairs_threshold(
        hashes, threshold, kmer_size, is_containment=is_containment,
        bits=bits, row_block=row_block, return_shared=True)
    # candidates arrive in row-major order; union-find gating converges
    # within a couple of chunks for clustered data regardless of ordering
    sizes = np.array([len(h) for h in hashes], dtype=np.int64)

    uf = UnionFind(n)
    kept_i: List[int] = []
    kept_j: List[int] = []
    kept_d: List[float] = []
    csr = CsrSketches(hashes)  # built once, reused across verify chunks
    for c0 in range(0, len(ii), verify_chunk):
        ci = ii[c0:c0 + verify_chunk]
        cj = jj[c0:c0 + verify_chunk]
        # gate: skip pairs already connected (cannot change the partition);
        # vectorized root lookup via full path compression
        roots = uf.roots_array()
        alive = roots[ci] != roots[cj]
        ci, cj = ci[alive], cj[alive]
        if len(ci) == 0:
            continue
        common = csr.count_common(ci, cj)
        if is_containment:
            d = aaf_distance(common, sizes[ci], sizes[cj], kmer_size)
        else:
            d = mash_distance(common, sizes[ci], sizes[cj], kmer_size)
        ok = (common > 0) & (d <= threshold)
        for a, b, dd in zip(ci[ok].tolist(), cj[ok].tolist(), d[ok].tolist()):
            if uf.merge(a, b) is not None:
                kept_i.append(a)
                kept_j.append(b)
                kept_d.append(dd)
    # components -> clusters in reference BFS order: build forest from kept
    # edges (they span every component) and BFS from lowest id
    from ..cluster.mst import clusters_from_forest, kruskal
    forest = kruskal((np.asarray(kept_i, dtype=np.int64),
                      np.asarray(kept_j, dtype=np.int64),
                      np.asarray(kept_d, dtype=np.float64)), n)
    return clusters_from_forest(forest, n)
