"""ctypes bindings for the native runtime (native/librtc_native.so).

The native library provides the host-side, string/IO-bound components:
glibc-rand shuffle table, KSSD/MinHash sketchers, and parallel FASTA ingest.
If the library is missing we attempt to build it with g++; pure-NumPy
fallbacks exist for everything (slower, used in restricted environments).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtc_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "rtc_native.cpp")

_c_u64p = ctypes.POINTER(ctypes.c_uint64)
_c_i64p = ctypes.POINTER(ctypes.c_int64)
_c_i32p = ctypes.POINTER(ctypes.c_int32)
_c_u32p = ctypes.POINTER(ctypes.c_uint32)


def _try_build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC_PATH, "-lz"],
            check=True, capture_output=True, timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


@lru_cache(maxsize=1)
def load_native():
    """Load (building if needed) the native library; None if unavailable.

    A stale .so (older than rtc_native.cpp, e.g. after a git pull) is
    rebuilt automatically — new ctypes signatures below would otherwise
    fail on missing symbols."""
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH)
             and os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH))
    if stale:
        _try_build()  # failure falls through to loading the stale copy
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # signatures
    lib.rtc_version.restype = ctypes.c_int
    lib.rtc_glibc_rand_stream.argtypes = [ctypes.c_uint32, ctypes.c_int64, _c_u32p]
    lib.rtc_fisher_yates.argtypes = [_c_i32p, ctypes.c_int64, ctypes.c_uint32]
    lib.rtc_generate_shuffle_dim.argtypes = [ctypes.c_int, _c_i32p]
    lib.rtc_sketch_files.restype = ctypes.c_void_p
    lib.rtc_sketch_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _c_i32p, ctypes.c_int,
    ]
    lib.rtc_sketch_sequences.restype = ctypes.c_void_p
    lib.rtc_sketch_sequences.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, _c_i32p, ctypes.c_int,
    ]
    lib.rtc_sketch_files_minhash_contain.restype = ctypes.c_void_p
    lib.rtc_sketch_files_minhash_contain.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rtc_result_count.restype = ctypes.c_int64
    lib.rtc_result_count.argtypes = [ctypes.c_void_p]
    for fn in ("rtc_result_ok",):
        getattr(lib, fn).restype = ctypes.c_int32
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    for fn in ("rtc_result_total_len", "rtc_result_seq0_len",
               "rtc_result_num_seqs", "rtc_result_sketch_size",
               "rtc_result_param_size"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.rtc_result_hashes.argtypes = [ctypes.c_void_p, ctypes.c_int64, _c_u64p]
    for fn in ("rtc_result_name", "rtc_result_comment", "rtc_result_file"):
        getattr(lib, fn).restype = ctypes.c_char_p
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.rtc_result_free.argtypes = [ctypes.c_void_p]
    lib.rtc_result_meta.argtypes = [
        ctypes.c_void_p, _c_i32p, _c_i64p, _c_i64p, _c_i64p, _c_i64p,
        _c_i64p]
    lib.rtc_result_strings_len.restype = ctypes.c_int64
    lib.rtc_result_strings_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rtc_result_strings.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_void_p]
    lib.rtc_result_hashes_all.argtypes = [ctypes.c_void_p, _c_u64p]
    lib.rtc_kssd_create.restype = ctypes.c_void_p
    lib.rtc_kssd_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, _c_i32p]
    lib.rtc_kssd_reset.argtypes = [ctypes.c_void_p]
    lib.rtc_kssd_update.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.rtc_kssd_size.restype = ctypes.c_int64
    lib.rtc_kssd_size.argtypes = [ctypes.c_void_p]
    lib.rtc_kssd_extract.argtypes = [ctypes.c_void_p, _c_u64p]
    lib.rtc_kssd_destroy.argtypes = [ctypes.c_void_p]
    lib.rtc_stdsort_size_desc.argtypes = [_c_i64p, ctypes.c_int64, _c_i32p]
    lib.rtc_greedy_minhash.argtypes = [
        _c_u64p, _c_i64p, ctypes.c_int64, _c_i64p, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, _c_i32p]
    lib.rtc_scan_lengths.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, _c_i64p, ctypes.c_int]
    for fn in ("rtc_mst_u32", "rtc_mst_u64"):
        getattr(lib, fn).restype = ctypes.c_void_p
        getattr(lib, fn).argtypes = [
            ctypes.c_void_p, _c_i64p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int]
    lib.rtc_mst_edge_count.restype = ctypes.c_int64
    lib.rtc_mst_edge_count.argtypes = [ctypes.c_void_p]
    lib.rtc_mst_edges.argtypes = [ctypes.c_void_p, _c_i32p, _c_i32p,
                                  ctypes.POINTER(ctypes.c_double)]
    lib.rtc_mst_has_dense.restype = ctypes.c_int32
    lib.rtc_mst_has_dense.argtypes = [ctypes.c_void_p]
    lib.rtc_mst_dense.argtypes = [ctypes.c_void_p, _c_i32p, _c_u64p]
    lib.rtc_mst_free.argtypes = [ctypes.c_void_p]
    for fn in ("rtc_count_common_u32", "rtc_count_common_u64"):
        getattr(lib, fn).argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    _c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.rtc_louvain_one_level.restype = ctypes.c_int64
    lib.rtc_louvain_one_level.argtypes = [
        ctypes.c_int64, _c_i64p, _c_i64p, _c_f64p, _c_f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_void_p, ctypes.c_int64,
        _c_i64p]
    lib.rtc_leiden_refine_moves.argtypes = [
        ctypes.c_int64, _c_i64p, _c_i64p, _c_f64p, _c_f64p,
        ctypes.c_double, _c_i64p, ctypes.c_double, _c_f64p, _c_f64p,
        ctypes.c_void_p, _c_i64p]
    lib.rtc_csr_build.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _c_i64p, _c_i64p, _c_f64p,
        _c_i64p, _c_i64p, _c_f64p, _c_f64p]
    lib.rtc_sort_u64.argtypes = [_c_u64p, ctypes.c_int64, ctypes.c_int]
    lib.rtc_pack_postings_u32.argtypes = [_c_u32p, _c_i64p, ctypes.c_int64,
                                          _c_u64p, ctypes.c_int]
    lib.rtc_unpack_postings_u32.argtypes = [_c_u64p, ctypes.c_int64,
                                            _c_u32p, _c_u32p, ctypes.c_int]
    for fn in ("rtc_intra_mst_u32", "rtc_intra_mst_u64"):
        getattr(lib, fn).restype = ctypes.c_void_p
        getattr(lib, fn).argtypes = [
            ctypes.c_void_p, _c_i64p, ctypes.c_int64, _c_i32p,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, _c_i32p,
            ctypes.c_int]
    return lib


def flatten_csr(hashes, use64: bool):
    """(flat, offs) CSR flatten of per-genome hash arrays — parallel
    native gather (rtc_flatten) when the arrays are uniform/contiguous,
    np.concatenate otherwise."""
    dt = np.uint64 if use64 else np.uint32
    n = len(hashes)
    offs = np.zeros(n + 1, dtype=np.int64)
    if not n:
        return np.empty(0, dtype=dt), offs
    np.cumsum([len(h) for h in hashes], out=offs[1:])
    lib = load_native()
    if lib is not None and all(
            h.dtype == dt and h.flags.c_contiguous for h in hashes):
        flat = np.empty(int(offs[-1]), dtype=dt)
        ptrs = np.fromiter((h.ctypes.data for h in hashes),
                           dtype=np.uint64, count=n)
        lib.rtc_flatten.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int]
        lib.rtc_flatten(ptrs.ctypes.data, offs.ctypes.data, n,
                        dt().itemsize, flat.ctypes.data,
                        os.cpu_count() or 1)
        return flat, offs
    return np.concatenate(hashes).astype(dt), offs


def native_mst(hashes, threshold: float, kmer_size: int,
               is_containment: bool, start_index: int, with_dense: bool,
               threads: int):
    """Run the native MST engine over CSR sketches; returns
    (edges(i,j,d), dense|None, ani|None) or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    n = len(hashes)
    use64 = n > 0 and hashes[0].dtype == np.uint64
    flat, offs = flatten_csr(hashes, use64)
    fn = lib.rtc_mst_u64 if use64 else lib.rtc_mst_u32
    h = fn(flat.ctypes.data, offs.ctypes.data_as(_c_i64p), n,
           float(threshold), int(kmer_size), int(is_containment),
           int(start_index), int(with_dense), int(threads))
    try:
        m = int(lib.rtc_mst_edge_count(h))
        ei = np.empty(m, dtype=np.int32)
        ej = np.empty(m, dtype=np.int32)
        ed = np.empty(m, dtype=np.float64)
        if m:
            lib.rtc_mst_edges(h, ei.ctypes.data_as(_c_i32p),
                              ej.ctypes.data_as(_c_i32p),
                              ed.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_double)))
        dense = ani = None
        if with_dense and lib.rtc_mst_has_dense(h):
            dense = np.empty(100 * n, dtype=np.int32)
            ani = np.empty(101, dtype=np.uint64)
            lib.rtc_mst_dense(h, dense.ctypes.data_as(_c_i32p),
                              ani.ctypes.data_as(_c_u64p))
            dense = dense.reshape(100, n).astype(np.int64)
            ani = ani.astype(np.int64)
        return ((ei.astype(np.int64), ej.astype(np.int64), ed), dense, ani)
    finally:
        lib.rtc_mst_free(h)


def native_intra_mst(hashes, labels, threshold: float, kmer_size: int,
                     is_containment: bool, abort_on_cross: bool = False):
    """Intra-partition -t 1 cadence replay (rtc_intra_mst_*): the MST of
    each cluster's internal candidate edges, in the reference's final edge
    order — cut at the threshold this yields the byte-identical
    generateClusterWithBfs member order for a known-exact partition.
    Returns (edges (i, j, d), has_cross) — ``has_cross`` False certifies
    the replay byte-identical to the global -t 1 engine (no hash shared
    across clusters) — or None if the native library is unavailable.
    ``abort_on_cross`` returns empty edges immediately when the
    certificate fails (the caller reruns the full global engine)."""
    lib = load_native()
    if lib is None:
        return None
    n = len(hashes)
    use64 = n > 0 and hashes[0].dtype == np.uint64
    flat, offs = flatten_csr(hashes, use64)
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    has_cross = np.zeros(1, dtype=np.int32)
    fn = lib.rtc_intra_mst_u64 if use64 else lib.rtc_intra_mst_u32
    h = fn(flat.ctypes.data, offs.ctypes.data_as(_c_i64p), n,
           labels.ctypes.data_as(_c_i32p), float(threshold),
           int(kmer_size), int(is_containment),
           has_cross.ctypes.data_as(_c_i32p), int(abort_on_cross))
    try:
        m = int(lib.rtc_mst_edge_count(h))
        ei = np.empty(m, dtype=np.int32)
        ej = np.empty(m, dtype=np.int32)
        ed = np.empty(m, dtype=np.float64)
        if m:
            lib.rtc_mst_edges(h, ei.ctypes.data_as(_c_i32p),
                              ej.ctypes.data_as(_c_i32p),
                              ed.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_double)))
        return ((ei.astype(np.int64), ej.astype(np.int64), ed),
                bool(has_cross[0]))
    finally:
        lib.rtc_mst_free(h)


def have_native() -> bool:
    return load_native() is not None


def make_file_array(files):
    arr = (ctypes.c_char_p * len(files))()
    keep = [os.fsencode(f) for f in files]
    for i, b in enumerate(keep):
        arr[i] = b
    return arr, keep


class SketchResultHandle:
    """RAII wrapper over a native SketchResult*."""

    def __init__(self, lib, ptr):
        self._lib = lib
        self._ptr = ptr

    def __len__(self):
        return int(self._lib.rtc_result_count(self._ptr))

    def genome(self, i: int):
        lib, p = self._lib, self._ptr
        n = int(lib.rtc_result_sketch_size(p, i))
        hashes = np.empty(n, dtype=np.uint64)
        if n:
            lib.rtc_result_hashes(p, i, hashes.ctypes.data_as(_c_u64p))
        return {
            "ok": bool(lib.rtc_result_ok(p, i)),
            "file": os.fsdecode(lib.rtc_result_file(p, i) or b""),
            "name": (lib.rtc_result_name(p, i) or b"").decode("utf-8", "replace"),
            "comment": (lib.rtc_result_comment(p, i) or b"").decode("utf-8", "replace"),
            "seq0_len": int(lib.rtc_result_seq0_len(p, i)),
            "total_len": int(lib.rtc_result_total_len(p, i)),
            "num_seqs": int(lib.rtc_result_num_seqs(p, i)),
            "param_size": int(lib.rtc_result_param_size(p, i)),
            "hashes": hashes,
        }

    def bulk(self):
        """One-call-per-field extraction of the whole result set (the
        per-genome accessor loop costs ~0.5 s at 10k genomes).  Returns a
        dict of arrays/lists: ok, seq0_len, total_len, num_seqs,
        param_size, plus per-genome ``hashes`` views (uint64) into one
        flat buffer and decoded name/comment/file lists."""
        lib, p = self._lib, self._ptr
        n = len(self)
        ok = np.empty(n, dtype=np.int32)
        seq0 = np.empty(n, dtype=np.int64)
        total = np.empty(n, dtype=np.int64)
        nseq = np.empty(n, dtype=np.int64)
        psize = np.empty(n, dtype=np.int64)
        ssize = np.empty(n, dtype=np.int64)
        lib.rtc_result_meta(p, ok.ctypes.data_as(_c_i32p),
                            seq0.ctypes.data_as(_c_i64p),
                            total.ctypes.data_as(_c_i64p),
                            nseq.ctypes.data_as(_c_i64p),
                            psize.ctypes.data_as(_c_i64p),
                            ssize.ctypes.data_as(_c_i64p))
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ssize, out=offs[1:])
        flat = np.empty(int(offs[-1]), dtype=np.uint64)
        if len(flat):
            lib.rtc_result_hashes_all(p, flat.ctypes.data_as(_c_u64p))
        strs = []
        for field in range(3):
            ln = int(lib.rtc_result_strings_len(p, field))
            buf = np.empty(ln, dtype=np.uint8)
            if ln:
                lib.rtc_result_strings(p, field, buf.ctypes.data)
            parts = buf.tobytes().split(b"\0")[:n]
            strs.append(parts)
        return {
            "ok": ok, "seq0_len": seq0, "total_len": total,
            "num_seqs": nseq, "param_size": psize, "offs": offs,
            "flat_hashes": flat,
            "names": [b.decode("utf-8", "replace") for b in strs[0]],
            "comments": [b.decode("utf-8", "replace") for b in strs[1]],
            "files": [os.fsdecode(b) for b in strs[2]],
        }

    def __del__(self):
        try:
            if self._ptr:
                self._lib.rtc_result_free(self._ptr)
                self._ptr = None
        except Exception:
            pass
