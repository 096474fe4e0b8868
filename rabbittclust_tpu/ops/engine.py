"""Device MST engine: tiled exact pair counts -> host streaming Kruskal.

Semantics identical to cluster.mst.compute_mst (edges for every pair with
common >= 1 passing the size-ratio filter), but the O(N^2) intersection
counting runs on the TPU as dense pair tiles.  Per-tile candidate edges are
extracted from the pulled counts and reduced by the same streaming Kruskal —
the partition-MST theorem (MST of edge-partition MSTs == global MST)
guarantees exactness.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..cluster.mst import (
    DENSE_SPAN,
    Edges,
    MstResult,
    concat_edges,
    kruskal,
)
from ..distance.mash import aaf_distance, mash_distance, size_ratio_limit
from .pack import pack_sketches
from .intersect import pair_counts_row


def compute_mst_device(
    hashes: List[np.ndarray],
    threshold: float,
    kmer_size: int,
    is_containment: bool = False,
    with_dense: bool = False,
    start_index: int = 0,
    pre_edges: Optional[Edges] = None,
    row_tile: int = 256,
    col_tile: int = 128,
    backend: str = "auto",
) -> MstResult:
    n = len(hashes)
    if n < 2:
        return MstResult(mst=(np.empty(0, np.int64), np.empty(0, np.int64),
                              np.empty(0, np.float64)), n=n,
                         dense=np.zeros((DENSE_SPAN, n), np.int64)
                         if with_dense else None,
                         ani=np.zeros(101, np.int64) if with_dense else None)
    use64 = hashes[0].dtype == np.uint64
    packed = pack_sketches(hashes, use64, pad_n_to=col_tile)
    sizes = packed.sizes.astype(np.int64)
    radio = size_ratio_limit(threshold, kmer_size - 1)

    dense = np.zeros((DENSE_SPAN, n), dtype=np.int64) if with_dense else None
    ani = np.zeros(101, dtype=np.int64) if with_dense else None
    radii = np.arange(DENSE_SPAN) / DENSE_SPAN

    partial: List[Edges] = []
    if pre_edges is not None and len(pre_edges[0]):
        partial.append(pre_edges)
    budget = 0

    n_pad = packed.n
    first_row = (start_index // row_tile) * row_tile
    row_starts = list(range(first_row, n_pad, row_tile))

    # counts never exceed the smaller sketch size, so when every sketch is
    # < 2^16 the count tiles pull losslessly as uint16 — halves the
    # dominant (gi x N) transfer (sketches that large need >256 Mb
    # genomes at drlevel 3; int32 stays for that corner)
    u16_ok = int(sizes[:n].max(initial=0)) < (1 << 16)

    def dispatch(i0):
        gi = min(row_tile, n_pad - i0)
        # triangular column trim: only pairs j < i are kept, so this row
        # panel needs columns [0, i0+gi) only — padded to a power of two
        # (multiple of col_tile) to keep compiled shapes logarithmic in N.
        # Halves both the device compute and the dominant (gi x N) int32
        # count pulls across the run.
        pow2 = 1 << (i0 + gi - 1).bit_length()
        nc = min(n_pad, max(col_tile, -(-pow2 // col_tile) * col_tile))
        c = pair_counts_row(packed.row_block(i0, gi),
                            packed.row_block(0, nc),
                            gj_tile=col_tile, backend=backend)
        if u16_ok:
            import jax.numpy as jnp
            c = c.astype(jnp.uint16)
        return c

    from ..utils.profiling import maybe_trace
    with maybe_trace("dense_mst_device"):
        # one-tile async prefetch: the device computes tile t+1 while the
        # host extracts edges / runs the streaming Kruskal for tile t
        pending = dispatch(row_starts[0]) if row_starts else None
        for t, i0 in enumerate(row_starts):
            fut = pending
            if t + 1 < len(row_starts):
                pending = dispatch(row_starts[t + 1])
            counts = np.asarray(fut)
            # host-side edge extraction for this row block
            # pair (i, j) kept once with i > j; append mode keeps only i >= start
            ii_local, jj = np.nonzero(counts)
            ii = ii_local + i0
            keep = (jj < ii) & (ii < n) & (ii >= start_index)
            ii, jj = ii[keep], jj[keep]
            if len(ii) == 0:
                continue
            common = counts[ii - i0, jj].astype(np.int64)
            s0 = sizes[ii]
            s1 = sizes[jj]
            mn = np.minimum(s0, s1)
            mx = np.maximum(s0, s1)
            ok = (mn > 0) & (mx <= radio * mn)
            ii, jj, common, s0, s1 = ii[ok], jj[ok], common[ok], s0[ok], s1[ok]
            if len(ii) == 0:
                continue
            if is_containment:
                d = aaf_distance(common, s0, s1, kmer_size)
            else:
                d = mash_distance(common, s0, s1, kmer_size)
            if with_dense:
                t0 = np.searchsorted(radii, d, side="left")
                inb = t0 < DENSE_SPAN
                np.add.at(dense, (t0[inb], ii[inb]), 1)
                np.add.at(dense, (t0[inb], jj[inb]), 1)
                a = np.minimum(((1.0 - d) * 100.0).astype(np.int64), 100)
                np.add.at(ani, a, 1)
            partial.append((ii.astype(np.int64), jj.astype(np.int64), d))
            budget += len(ii)
            if budget > 4 * n:
                partial = [kruskal(concat_edges(partial), n)]
                budget = len(partial[0][0])

    mst = kruskal(concat_edges(partial), n)
    if with_dense:
        dense = np.cumsum(dense, axis=0)
    return MstResult(mst=mst, n=n, dense=dense, ani=ani)
