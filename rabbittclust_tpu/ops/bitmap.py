"""MXU bitmap candidate filter — the scalable TPU path for threshold-bounded
clustering (clusters / greedy probing / serving).

Idea: each genome gets a B-bit signature (bit set iff some sketch hash maps
to it); the int8 matmul  X_rows @ X^T  computes shared-bit counts for all
pairs on the MXU (B MACs/pair, hundreds of Tera-ops/s).  A deterministic
lower bound makes the filter *safe* (no false negatives):

    shared_bits(i,j) >= common(i,j) - min(c_i, c_j)

where c_g = sketch_size_g - popcount(signature_g) is genome g's internal
collision count (known exactly at pack time).  A pair can reach distance
<= d only if common >= common_min(i,j), so keeping pairs with

    shared_bits >= common_min(i,j) - min(c_i, c_j)

never drops a true candidate.  Survivors are verified exactly with the
native two-pointer kernel (utils/native.rtc_count_common_*), and final
distances use float64 on the host — bit-exact clustering at MXU speed.
"""

from __future__ import annotations

import ctypes
import functools
import math
from typing import List, Tuple

import numpy as np

from ..distance.mash import min_jaccard_for_threshold, size_ratio_limit
from ..utils import native as native_mod

_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def pack_bitmaps(hashes: List[np.ndarray], bits: int = 8192,
                 pad_n_to: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X int8 (N_pad, bits), collisions int32 (N_pad,))."""
    n = len(hashes)
    n_pad = max(((n + pad_n_to - 1) // pad_n_to) * pad_n_to, pad_n_to)
    shift = np.uint64(64 - int(math.log2(bits)))
    x = np.zeros((n_pad, bits), dtype=np.int8)
    coll = np.zeros(n_pad, dtype=np.int32)
    if n:
        sizes = np.array([len(h) for h in hashes], dtype=np.int64)
        gid = np.repeat(np.arange(n, dtype=np.int64), sizes)
        hv = np.concatenate(hashes).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((hv * _MIX64) >> shift).astype(np.int64)
        x[gid, b] = 1
        coll[:n] = sizes - x[:n].sum(axis=1, dtype=np.int64)
    return x, coll


def _filter_block_fn(xi, x, ci, c, si, s, row_start, jmin_num, jmin_den,
                     c_min, radio, is_containment):
    """Device: shared-bit counts + safe candidate mask for one row block.

    Returns a packed uint32 bitmask of shape (GI, N//32)."""
    import jax
    import jax.numpy as jnp

    shared = jax.lax.dot_general(
        xi, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    si_c = si[:, None].astype(jnp.float32)
    s_c = s[None, :].astype(jnp.float32)
    # float32 bound with a -2 safety margin: the device bound must never
    # exceed the exact float64 ceil the host uses (false negatives are
    # correctness bugs; false positives only cost verify work)
    if is_containment:
        mn = jnp.minimum(si_c, s_c)
        common_min = jnp.floor(c_min * mn).astype(jnp.int32) - 1
    else:
        common_min = jnp.floor(
            jmin_num * (si_c + s_c) / jmin_den).astype(jnp.int32) - 1
    thresh = common_min - jnp.minimum(ci[:, None], c[None, :])
    mni = jnp.minimum(si[:, None], s[None, :])
    mxi = jnp.maximum(si[:, None], s[None, :])
    ratio_ok = (mni > 0) & (mxi <= radio * mni)
    gi, n = shared.shape
    jidx = jax.lax.broadcasted_iota(jnp.int32, (gi, n), 1)
    iidx = jax.lax.broadcasted_iota(jnp.int32, (gi, n), 0) + row_start
    mask = (shared >= thresh) & ratio_ok & (jidx < iidx)
    # pack to uint32 along axis 1
    m = mask.reshape(gi, n // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(m * weights[None, None, :], axis=-1, dtype=jnp.uint32)


@functools.lru_cache(maxsize=1)
def _jitted_filter():
    import jax
    return jax.jit(_filter_block_fn,
                   static_argnames=("is_containment",))


def candidate_pairs_threshold(
    hashes: List[np.ndarray],
    threshold: float,
    kmer_size: int,
    is_containment: bool = False,
    bits: int = 8192,
    row_block: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All pairs (i > j) that can possibly have distance <= threshold, with
    exact common counts.  Returns (i, j, common) — every returned pair passed
    the size-ratio filter and common >= 1; callers apply the distance.
    """
    import jax.numpy as jnp
    from ..utils.jaxcfg import configure_jax
    configure_jax()

    n = len(hashes)
    x, coll = pack_bitmaps(hashes, bits=bits, pad_n_to=128)
    n_pad = x.shape[0]
    sizes = np.zeros(n_pad, dtype=np.int32)
    sizes[:n] = [len(h) for h in hashes]
    j_min = min_jaccard_for_threshold(threshold, kmer_size)
    c_min = math.exp(-threshold * kmer_size)
    radio = size_ratio_limit(threshold, kmer_size - 1)

    xd = jnp.asarray(x)
    cd = jnp.asarray(coll)
    sd = jnp.asarray(sizes)
    filt = _jitted_filter()

    cand_i: List[np.ndarray] = []
    cand_j: List[np.ndarray] = []
    for r0 in range(0, n_pad, row_block):
        gi = min(row_block, n_pad - r0)
        packed_mask = np.asarray(filt(
            xd[r0:r0 + gi], xd, cd[r0:r0 + gi], cd, sd[r0:r0 + gi], sd,
            jnp.int32(r0), jnp.float32(j_min), jnp.float32(1.0 + j_min),
            jnp.float32(c_min), jnp.int32(radio), is_containment))
        bitsarr = np.unpackbits(
            np.ascontiguousarray(packed_mask).view(np.uint8),
            bitorder="little").reshape(gi, n_pad)
        ii_l, jj = np.nonzero(bitsarr)
        if len(ii_l):
            cand_i.append((ii_l + r0).astype(np.int64))
            cand_j.append(jj.astype(np.int64))
    if not cand_i:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.copy(), np.empty(0, dtype=np.int64)
    ii = np.concatenate(cand_i)
    jj = np.concatenate(cand_j)
    keep = ii < n  # drop padded rows
    ii, jj = ii[keep], jj[keep]
    common = exact_common_counts(hashes, ii, jj)
    nz = common > 0
    return ii[nz], jj[nz], common[nz].astype(np.int64)


def exact_common_counts(hashes: List[np.ndarray], ii: np.ndarray,
                        jj: np.ndarray, threads: int = 0) -> np.ndarray:
    """Exact |A_i ∩ A_j| for candidate pairs (native two-pointer;
    NumPy fallback)."""
    import os
    out = np.zeros(len(ii), dtype=np.int32)
    if len(ii) == 0:
        return out
    use64 = hashes[0].dtype == np.uint64
    lib = native_mod.load_native()
    if lib is not None:
        flat = np.concatenate(hashes).astype(
            np.uint64 if use64 else np.uint32)
        offs = np.zeros(len(hashes) + 1, dtype=np.int64)
        np.cumsum([len(h) for h in hashes], out=offs[1:])
        fn = lib.rtc_count_common_u64 if use64 else lib.rtc_count_common_u32
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        ii32 = ii.astype(np.int32)
        jj32 = jj.astype(np.int32)
        fn(flat.ctypes.data, offs.ctypes.data, ii32.ctypes.data,
           jj32.ctypes.data, len(ii), out.ctypes.data,
           threads or (os.cpu_count() or 1))
        return out
    for p in range(len(ii)):
        out[p] = len(np.intersect1d(hashes[int(ii[p])], hashes[int(jj[p])],
                                    assume_unique=True))
    return out
