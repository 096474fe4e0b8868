"""Device-side KSSD sketching — the experimental TPU sketch path.

Reference hot loop: src/SketchInfo.cpp:1126-1165 (rolling 2-bit encode of
both strands, canonical k-mer = min(fwd, rc), dimension filter via the
shuffled table, compression to dr_tuple).  The reference scans serially
with rolling state; that recurrence is NOT data-dependent — the k-mer
tuple at position i is a pure function of the k bases in its window:

    tup_i = sum_j code[i+j] << 2*(k-1-j)      (disjoint 2-bit fields)
    rvs_i = sum_j (3 ^ code[i+j]) << 2*j

so the device formulation is k shifted elementwise adds over the whole
chunk (unrolled, VPU-friendly, XLA-fused) instead of a serial scan.  The
4*half_k-bit tuples (44 bits at k=21) exceed 32 bits; since every shift is
even, no 2-bit field ever straddles a 32-bit boundary and the tuple splits
into two carry-free uint32 lanes.  Canonical min and the mask/shift algebra
of SketchInfo.cpp:1044-1048,1141-1152 are emulated on (hi, lo) lane pairs
(helpers below), keeping the whole kernel in native-TPU uint32.

Chunk carry-over: long sequences stream through fixed-length chunks that
overlap by k-1 bases, so every window is seen exactly once and compiled
shapes stay static (SURVEY §5 long-sequence handling).  Windows containing
non-ACGT bases are masked, replicating the reference's window reset.

Bit-exactness: hashes equal native/rtc_native.cpp (and therefore the
reference) exactly; tests cover 32/64-bit params, Ns, lowercase, and
multi-record genomes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

from ..sketch.kssd import BASE_MAP, KssdParams, get_shuffle_table

# default chunk: positions per device dispatch (bases = CHUNK + k - 1)
CHUNK = 1 << 20


# ---------------------------------------------------------------------
# (hi, lo) uint32 lane-pair helpers for the <=64-bit tuple algebra.
# All shifts/masks are Python-int constants at trace time.

def _pair_and(a, mask: int):
    import jax.numpy as jnp
    hi, lo = a
    return (hi & jnp.uint32((mask >> 32) & 0xFFFFFFFF),
            lo & jnp.uint32(mask & 0xFFFFFFFF))


def _pair_or(a, b):
    hi, lo = a
    bhi, blo = b
    return hi | bhi, lo | blo


def _pair_shl(a, s: int):
    """Left shift by a constant (result truncated to 64 bits)."""
    import jax.numpy as jnp
    hi, lo = a
    if s == 0:
        return a
    if s >= 64:
        z = jnp.zeros_like(lo)
        return z, z
    if s >= 32:
        return (lo << jnp.uint32(s - 32)) if s > 32 else lo, \
            jnp.zeros_like(lo)
    return (hi << jnp.uint32(s)) | (lo >> jnp.uint32(32 - s)), \
        lo << jnp.uint32(s)


def _pair_shr(a, s: int):
    import jax.numpy as jnp
    hi, lo = a
    if s == 0:
        return a
    if s >= 64:
        z = jnp.zeros_like(lo)
        return z, z
    if s >= 32:
        return jnp.zeros_like(hi), \
            (hi >> jnp.uint32(s - 32)) if s > 32 else hi
    return hi >> jnp.uint32(s), \
        (lo >> jnp.uint32(s)) | (hi << jnp.uint32(32 - s))


def _pair_lt(a, b):
    hi, lo = a
    bhi, blo = b
    return (hi < bhi) | ((hi == bhi) & (lo < blo))


def _pair_where(c, a, b):
    import jax.numpy as jnp
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


# ---------------------------------------------------------------------

def _chunk_kernel(codes, table, p: KssdParams):
    """codes: (C + k - 1,) int32 (-1 = invalid); returns per-position
    (dr_hi, dr_lo, keep) for the C windows starting at each position."""
    import jax.numpy as jnp

    k = p.kmer_size
    n_pos = codes.shape[0] - (k - 1)
    u = codes.astype(jnp.uint32)
    z = jnp.zeros(n_pos, dtype=jnp.uint32)
    tup = (z, z)
    rvs = (z, z)
    valid = jnp.ones(n_pos, dtype=bool)
    for j in range(k):
        c = u[j:j + n_pos]
        vj = codes[j:j + n_pos] >= 0
        valid &= vj
        cc = jnp.where(vj, c, 0)
        s_f = 2 * (k - 1 - j)
        s_r = 2 * j
        # disjoint 2-bit fields: plain OR into the right lane
        if s_f >= 32:
            tup = (tup[0] | (cc << jnp.uint32(s_f - 32)), tup[1])
        else:
            tup = (tup[0], tup[1] | (cc << jnp.uint32(s_f)))
        rc = cc ^ jnp.uint32(3)
        rc = jnp.where(vj, rc, 0)
        if s_r >= 32:
            rvs = (rvs[0] | (rc << jnp.uint32(s_r - 32)), rvs[1])
        else:
            rvs = (rvs[0], rvs[1] | (rc << jnp.uint32(s_r)))
    uni = _pair_where(_pair_lt(tup, rvs), tup, rvs)
    # dim id = middle half_subk-nt context (domask bits)
    hol2 = 2 * (p.half_k - p.half_subk)
    dim = _pair_shr(_pair_and(uni, p.domask), hol2)
    dim_id = dim[1].astype(jnp.int32)  # < 16^half_subk <= 2^24
    pf = jnp.take(table, jnp.where(valid, dim_id, 0))
    keep = valid & (pf >= 0) & (pf < p.dim_end)
    # dr_tuple = ((uni & undomask0) | ((uni & undomask1) << shift1))
    #            >> 4*drlevel, OR shuffle rank (SketchInfo.cpp:1044-1048)
    shift1 = 2 * p.kmer_size - 4 * (p.half_k - p.half_subk)
    dr = _pair_shr(
        _pair_or(_pair_and(uni, p.undomask0),
                 _pair_shl(_pair_and(uni, p.undomask1), shift1)),
        4 * p.drlevel)
    dr = _pair_or(dr, (jnp.zeros_like(dr[0]), pf.astype(jnp.uint32)))
    return dr[0], dr[1], keep


@lru_cache(maxsize=8)
def _jitted_chunk_kernel(p: KssdParams, n_codes: int):
    import jax

    def fn(codes, table):
        return _chunk_kernel(codes, table, p)

    return jax.jit(fn)


def _encode_codes(seq: bytes) -> np.ndarray:
    return BASE_MAP[np.frombuffer(seq, dtype=np.uint8)].astype(np.int32)


def device_kmer_hashes(seq: bytes, p: KssdParams,
                       chunk: int = CHUNK) -> np.ndarray:
    """All kept (non-deduplicated) KSSD hashes of one sequence as uint64 —
    the device twin of sketch.kssd.kssd_kmer_hashes_numpy, bit-identical."""
    import jax.numpy as jnp

    k = p.kmer_size
    codes = _encode_codes(seq)
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    table = _device_table(p.half_subk)
    out: List[np.ndarray] = []
    # fixed-length chunks with k-1 overlap; the tail chunk pads with -1
    # (invalid) so every compiled shape is (chunk + k - 1,)
    for start in range(0, n - k + 1, chunk):
        block = codes[start:start + chunk + k - 1]
        if len(block) < chunk + k - 1:
            pad = np.full(chunk + k - 1 - len(block), -1, dtype=np.int32)
            block = np.concatenate([block, pad])
        hi, lo, keep = _jitted_chunk_kernel(p, chunk + k - 1)(
            jnp.asarray(block), table)
        keep = np.asarray(keep)
        hi = np.asarray(hi)[keep].astype(np.uint64)
        lo = np.asarray(lo)[keep].astype(np.uint64)
        out.append((hi << np.uint64(32)) | lo)
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out)


@lru_cache(maxsize=4)
def _device_table(half_subk: int):
    import jax.numpy as jnp

    return jnp.asarray(get_shuffle_table(half_subk))


def sketch_kssd_device(genomes: List[List[bytes]], p: KssdParams,
                       chunk: int = CHUNK) -> List[np.ndarray]:
    """Device-sketch a batch of genomes (each = list of record sequences).

    Returns per-genome sorted deduplicated hash arrays (uint64 if p.use64
    else uint32) bit-identical to the native/NumPy sketchers."""
    out = []
    for records in genomes:
        parts = [device_kmer_hashes(s, p, chunk=chunk) for s in records]
        h = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.uint64))
        out.append(h if p.use64 else h.astype(np.uint32))
    return out


def sketch_files_kssd_device(files, min_len: int, kmer_size: int,
                             drlevel: int, chunk: int = CHUNK
                             ) -> Tuple[object, KssdParams]:
    """Device-sketch a list of FASTA(.gz) files — drop-in equivalent of
    sketch.kssd.sketch_files_kssd (same SketchSet contents)."""
    from ..io.fasta import read_fasta
    from ..sketch.base import SketchSet

    p = KssdParams.from_kmer_size(kmer_size, drlevel)
    ss = SketchSet("kssd", p, True, p.use64)
    for f in files:
        records = list(read_fasta(f))
        total = sum(len(s) for _, _, s in records)
        if total < min_len or not records:
            continue
        (h,) = sketch_kssd_device([[s for _, _, s in records]], p,
                                  chunk=chunk)
        name, comment, seq0 = records[0]
        ss.append_genome(
            file_name=f, name=name or "noName", comment=comment or "noName",
            seq0_len=len(seq0), total_len=total, num_seqs=len(records),
            hashes=h)
    return ss, p
