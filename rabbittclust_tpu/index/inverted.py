"""Inverted index over sketch hashes — library-facing API.

Two forms (reference analogues: KssdInvertedIndex / MinHashInvertedIndex,
src/SketchInfo.h:59-161, and the CSR files kssd.sketch.{index,dict}):

  * InvertedIndex — dict-backed dynamic index (hash -> [genome ids]);
    supports incremental insertion and probing; persists to the reference's
    kssd/minhash index formats via state.sketch_io.
  * CsrIndex — immutable sorted-array form (unique hashes, posting offsets,
    concatenated ids); O(log H) probe via searchsorted, zero-copy friendly,
    and the form the engines build internally via one vectorized sort.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np


class InvertedIndex:
    def __init__(self):
        self.index: Dict[int, List[int]] = {}

    @classmethod
    def build(cls, hashes: Sequence[np.ndarray]) -> "InvertedIndex":
        idx = cls()
        for gid, h in enumerate(hashes):
            idx.insert(gid, h)
        return idx

    def insert(self, gid: int, h: np.ndarray) -> None:
        d = self.index
        for hv in h.tolist():
            d.setdefault(hv, []).append(gid)

    def probe(self, h: np.ndarray) -> Dict[int, int]:
        """Intersection counts against all indexed genomes (first-touch
        insertion order preserved, matching the engines' tie semantics)."""
        counts: Dict[int, int] = {}
        d = self.index
        for hv in h.tolist():
            lst = d.get(hv)
            if lst is None:
                continue
            for g in lst:
                counts[g] = counts.get(g, 0) + 1
        return counts

    def __len__(self) -> int:
        return len(self.index)


@dataclass
class CsrIndex:
    uniq: np.ndarray        # unique hashes, sorted ascending
    offsets: np.ndarray     # (H+1,) posting offsets
    gids: np.ndarray        # concatenated genome ids (ascending per posting)

    @classmethod
    def build(cls, hashes: Sequence[np.ndarray]) -> "CsrIndex":
        if not len(hashes):
            return cls(np.empty(0, np.uint64), np.zeros(1, np.int64),
                       np.empty(0, np.uint32))
        gid = np.repeat(np.arange(len(hashes), dtype=np.int64),
                        [len(h) for h in hashes])
        hv = np.concatenate(hashes)
        order = np.argsort(hv, kind="stable")
        hv_s, gid_s = hv[order], gid[order]
        starts = np.flatnonzero(np.r_[True, hv_s[1:] != hv_s[:-1]])
        uniq = hv_s[starts]
        offsets = np.r_[starts, len(hv_s)].astype(np.int64)
        return cls(uniq, offsets, gid_s.astype(np.uint32))

    def posting(self, hash_value) -> np.ndarray:
        i = np.searchsorted(self.uniq, hash_value)
        if i >= len(self.uniq) or self.uniq[i] != hash_value:
            return np.empty(0, dtype=np.uint32)
        return self.gids[self.offsets[i]:self.offsets[i + 1]]

    def probe_counts(self, h: np.ndarray, n_genomes: int) -> np.ndarray:
        """Vectorized intersection counts of a query against all genomes."""
        pos = np.searchsorted(self.uniq, h)
        pos = np.clip(pos, 0, len(self.uniq) - 1)
        hit = self.uniq[pos] == h
        counts = np.zeros(n_genomes, dtype=np.int64)
        for p in pos[hit]:
            counts[self.gids[self.offsets[p]:self.offsets[p + 1]]] += 1
        return counts

    @classmethod
    def from_folder(cls, folder: str, use64: bool) -> "CsrIndex":
        from ..state.sketch_io import load_kssd_index
        uniq, sizes, gids = load_kssd_index(folder, use64)
        offsets = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        return cls(uniq.copy(), offsets, gids.copy())

    def save(self, folder: str, use64: bool) -> None:
        import os
        import struct
        from ..state.sketch_io import ensure_folder
        ensure_folder(folder)
        with open(os.path.join(folder, "kssd.sketch.dict"), "wb") as f:
            f.write(self.gids.astype("<u4").tobytes())
        with open(os.path.join(folder, "kssd.sketch.index"), "wb") as f:
            f.write(struct.pack("<Q", len(self.uniq)))
            f.write(np.ascontiguousarray(
                self.uniq, dtype=np.uint64 if use64 else np.uint32).tobytes())
            f.write(np.diff(self.offsets).astype("<u4").tobytes())
