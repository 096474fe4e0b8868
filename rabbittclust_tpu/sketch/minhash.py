"""MinHash bottom-s sketching (Mash-compatible; reference default mode).

The reference delegates MinHash sketching to its RabbitSketch submodule
(empty in the snapshot; API documented in SURVEY.md §2.9).  This builder
implements Mash semantics: canonical k-mer = memcmp-smaller of k-mer and
reverse complement, MurmurHash3 seed 42 (x64_128 lower half for k > 16,
x86_32 otherwise), keep the s smallest distinct hashes.

Modes (reference src/SketchInfo.cpp:702-711,918-924):
  * Mash/Jaccard: fixed sketch size s (default 1000)
  * AAF containment (-c): per-genome size max(len/containCompress, 100)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..utils import native as native_mod
from .base import SketchSet


@dataclass(frozen=True)
class MinHashParams:
    kmer_size: int
    sketch_size: int            # fixed s (Jaccard mode); 0 in containment mode
    is_containment: bool = False
    contain_compress: int = 0   # sketch size ~ len/contain_compress

    @property
    def use64(self) -> bool:
        return self.kmer_size > 16


def _mh_numpy_hashes(seq: bytes, k: int) -> np.ndarray:
    """All canonical k-mer hashes of a sequence (NumPy fallback; uses the
    same murmur3 as the native path via mmh3-free pure implementation)."""
    from .murmur3 import murmur3_batch_canonical
    return murmur3_batch_canonical(seq, k)


def _bottom_s(hashes: np.ndarray, s: int) -> np.ndarray:
    u = np.unique(hashes)
    return u[:s] if s > 0 else u


def _file_length_for_containment(path: str) -> int:
    """Per-genome containment cap source (SketchInfo.cpp:890-915): the raw
    FILE BYTE SIZE as a C int — for .gz the gzip trailer ISIZE (uncompressed
    size mod 2^32, read as SIGNED int32), not the sequence length."""
    import struct
    if path.endswith("gz"):
        try:
            with open(path, "rb") as f:
                f.seek(-4, os.SEEK_END)
                return struct.unpack("<i", f.read(4))[0]
        except OSError:
            return 0
    try:
        n = os.stat(path).st_size
    except OSError:
        return 0
    return int(np.int32(n))  # reference stores (int)ftell


def sketch_files_minhash(files, min_len: int, p: MinHashParams,
                         threads: int = 0) -> SketchSet:
    threads = threads or (os.cpu_count() or 1)
    ss = SketchSet("minhash", p, True, True)
    lib = native_mod.load_native()
    if lib is not None:
        arr, _keep = native_mod.make_file_array(files)
        if p.is_containment:
            ptr = lib.rtc_sketch_files_minhash_contain(
                arr, len(files), int(min_len), p.kmer_size,
                p.contain_compress, threads)
        else:
            import ctypes
            ptr = lib.rtc_sketch_files(
                arr, len(files), int(min_len), 1, p.kmer_size,
                p.sketch_size, 0,
                ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)), threads)
        res = native_mod.SketchResultHandle(lib, ptr)
        b = res.bulk()
        bad = np.flatnonzero(b["ok"] == 0)
        if len(bad):
            raise FileNotFoundError(
                f"cannot open the genome file: {files[int(bad[0])]}")
        flat = b["flat_hashes"]
        offs = b["offs"]
        keep = np.flatnonzero(b["total_len"] >= min_len)
        ss.file_names = [b["files"][i] for i in keep]
        ss.names = [b["names"][i] for i in keep]
        ss.comments = [b["comments"][i] for i in keep]
        ss.seq0_lens = b["seq0_len"][keep].tolist()
        ss.total_lens = b["total_len"][keep].tolist()
        ss.num_seqs = b["num_seqs"][keep].tolist()
        ss.param_sizes = b["param_size"][keep].tolist()
        ss.hashes = [flat[offs[i]:offs[i + 1]] for i in keep.tolist()]
        return ss
    from ..io.fasta import read_fasta
    for fpath in files:
        records = list(read_fasta(fpath))
        total = sum(len(s) for _, _, s in records)
        if total < min_len or not records:
            continue
        parts = [_mh_numpy_hashes(s, p.kmer_size) for _, _, s in records]
        allh = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        s = (max(_file_length_for_containment(fpath) // p.contain_compress,
                 100)
             if p.is_containment else p.sketch_size)
        h = _bottom_s(allh, s)
        name, comment, seq0 = records[0]
        ss.append_genome(
            file_name=fpath, name=name or "noName",
            comment=comment or "noName", seq0_len=len(seq0), total_len=total,
            num_seqs=len(records), hashes=h, param_size=s)
    return ss


def sketch_sequences_minhash(input_file: str, min_len: int, p: MinHashParams,
                             threads: int = 0) -> SketchSet:
    threads = threads or (os.cpu_count() or 1)
    ss = SketchSet("minhash", p, False, True)
    lib = native_mod.load_native()
    if lib is not None:
        import ctypes
        ptr = lib.rtc_sketch_sequences(
            os.fsencode(input_file), int(min_len), 1, p.kmer_size,
            p.sketch_size if not p.is_containment else 0,
            p.contain_compress if p.is_containment else 0,
            ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)), threads)
        res = native_mod.SketchResultHandle(lib, ptr)
        b = res.bulk()
        flat = b["flat_hashes"]
        offs = b["offs"]
        keep = np.flatnonzero(b["total_len"] >= min_len)
        ss.file_names = [b["files"][i] for i in keep]
        ss.names = [b["names"][i] for i in keep]
        ss.comments = [b["comments"][i] for i in keep]
        ss.seq0_lens = b["seq0_len"][keep].tolist()
        ss.total_lens = b["total_len"][keep].tolist()
        ss.num_seqs = [1] * len(keep)
        ss.param_sizes = b["param_size"][keep].tolist()
        ss.hashes = [flat[offs[i]:offs[i + 1]] for i in keep.tolist()]
        return ss
    from ..io.fasta import read_fasta
    for name, comment, seq in read_fasta(input_file):
        if len(seq) < min_len:
            continue
        allh = _mh_numpy_hashes(seq, p.kmer_size)
        s = (max(len(seq) // p.contain_compress, 100) if p.is_containment
             else p.sketch_size)
        ss.append_genome(
            file_name=input_file, name=name or "noName",
            comment=comment or "noName", seq0_len=len(seq),
            total_len=len(seq), num_seqs=1, hashes=_bottom_s(allh, s),
            param_size=s)
    return ss
