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
import os
from typing import List, Tuple

import numpy as np

from ..distance.mash import min_jaccard_for_threshold, size_ratio_limit
from ..utils import native as native_mod

_MIX64 = np.uint64(0x9E3779B97F4A7C15)

# device->host transfer accounting for the candidate filter (read by
# bench.py to evidence the pulled-byte budget; reset_pull_stats() to zero)
PULL_STATS = {"bytes": 0, "pulls": 0}


def reset_pull_stats() -> None:
    PULL_STATS["bytes"] = 0
    PULL_STATS["pulls"] = 0


def _account_pull(n_bytes: int) -> None:
    PULL_STATS["bytes"] += int(n_bytes)
    PULL_STATS["pulls"] += 1


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


def pack_bitmaps_packed(hashes: List[np.ndarray], bits: int = 8192,
                        pad_n_to: int = 128
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-packed signatures: (uint8 (N_pad, bits//8), collisions int32).
    Native C++ fast path; same bit layout as np.packbits(bitorder='little')
    of pack_bitmaps output."""
    import os
    n = len(hashes)
    n_pad = max(((n + pad_n_to - 1) // pad_n_to) * pad_n_to, pad_n_to)
    lib = native_mod.load_native()
    if lib is None or n == 0:
        x, coll = pack_bitmaps(hashes, bits=bits, pad_n_to=pad_n_to)
        return np.packbits(x, axis=1, bitorder="little"), coll
    use64 = hashes[0].dtype == np.uint64
    flat = np.concatenate(hashes).astype(np.uint64 if use64 else np.uint32)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(h) for h in hashes], out=offs[1:])
    out = np.zeros((n_pad, bits // 8), dtype=np.uint8)
    coll = np.zeros(n_pad, dtype=np.int32)
    fn = lib.rtc_pack_bitmaps_u64 if use64 else lib.rtc_pack_bitmaps_u32
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                   ctypes.c_int]
    fn(flat.ctypes.data, offs.ctypes.data, n, bits, out.ctypes.data,
       coll.ctypes.data, os.cpu_count() or 1)
    return out, coll


def _unpack_bits_device(xp, dtype=None):
    """(N, B//8) uint8 -> (N, B) 0/1 on device (default bfloat16).

    bfloat16 is deliberate: int8 dot_general does NOT lower to the MXU in
    this XLA (measured ~1.35 Tera-ops/s on v5e = VPU integer emulation,
    0.3% MFU); bf16 x bf16 -> f32 runs on the MXU at matmul speed, and is
    EXACT here — products are 0/1 and the f32 accumulator is exact for
    counts <= 2^24, far above any signature width."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (xp[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(xp.shape[0], -1).astype(dtype)


def _filter_block_fn(xi, x, ci, c, si, s, row_start, col_start, jmin_num,
                     jmin_den, c_min, radio, is_containment, cap):
    """Device: shared-bit counts + safe candidate mask for one pair tile
    (rows [row_start, row_start+gi) x columns [col_start, col_start+gj)).

    ``xi``/``x`` are bit-packed uint8 signatures (transferred 8x smaller and
    unpacked on device).  Returns one fused int32 array
    [count, flat_idx(cap)] where flat = local_i * gj + local_j."""
    import jax
    import jax.numpy as jnp

    xi = _unpack_bits_device(xi)
    x = _unpack_bits_device(x)
    shared = jax.lax.dot_general(
        xi, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
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
    gi, gj = shared.shape
    jidx = jax.lax.broadcasted_iota(jnp.int32, (gi, gj), 1) + col_start
    iidx = jax.lax.broadcasted_iota(jnp.int32, (gi, gj), 0) + row_start
    mask = (shared >= thresh) & ratio_ok & (jidx < iidx)
    # device-side compaction, one fused minimal int32 result
    # [count, flat_idx(cap)].  The remote tunnel charges ~0.6 s latency per
    # device->host pull and has low bandwidth, so everything returns in ONE
    # array (never read the count as a separate scalar!).
    count = jnp.sum(mask, dtype=jnp.int32)
    (flat_idx,) = jnp.nonzero(mask.reshape(-1), size=cap, fill_value=-1)
    return jnp.concatenate([count[None], flat_idx.astype(jnp.int32)])


@functools.lru_cache(maxsize=1)
def _jitted_filter():
    import jax
    return jax.jit(_filter_block_fn,
                   static_argnames=("is_containment", "cap"))


def candidate_pair_blocks(
    hashes: List[np.ndarray],
    threshold: float,
    kmer_size: int,
    is_containment: bool = False,
    bits: int = 8192,
    row_block: int = 1024,
):
    """Streaming MXU candidate filter: yields (ii, jj) int64 arrays of
    unverified candidate pairs (i > j) per complete row block.

    Pipelined: the NEXT row block's device program is dispatched (JAX async
    dispatch) BEFORE the current block's fused result is pulled, so device
    filtering of block b+1 overlaps the caller's host work on block b
    (exact verify / union-find).  On the tunnel-attached dev TPU this hides
    most of the host verify time behind device compute; on local hardware
    it hides the pull latency.
    """
    import jax.numpy as jnp
    from ..utils.jaxcfg import configure_jax
    configure_jax()

    n = len(hashes)
    xp, coll = pack_bitmaps_packed(hashes, bits=bits, pad_n_to=128)
    n_pad = xp.shape[0]
    sizes = np.zeros(n_pad, dtype=np.int32)
    sizes[:n] = [len(h) for h in hashes]
    j_min = min_jaccard_for_threshold(threshold, kmer_size)
    c_min = math.exp(-threshold * kmer_size)
    radio = size_ratio_limit(threshold, kmer_size - 1)

    xd = jnp.asarray(xp)  # 8x smaller transfer; unpacked on device
    cd = jnp.asarray(coll)
    sd = jnp.asarray(sizes)
    filt = _jitted_filter()
    # compaction buffer sized for <=3% pair density of one tile (covers
    # heavily clustered data; with two-step pulls a larger cap costs device
    # memory only, never pull bandwidth); a grown cap persists across tiles
    # (every distinct cap is a fresh ~4 min remote compile on the tunnel,
    # cached persistently afterwards)
    cur_cap = max(1 << 20, min(row_block, n_pad) ** 2 // 32)
    full_pull = bool(int(os.environ.get("RTC_FULL_PULL", "0")))

    def dispatch(r0, gi, c0, gj, cap):
        fused = filt(
            xd[r0:r0 + gi], xd[c0:c0 + gj], cd[r0:r0 + gi], cd[c0:c0 + gj],
            sd[r0:r0 + gi], sd[c0:c0 + gj],
            jnp.int32(r0), jnp.int32(c0), jnp.float32(j_min),
            jnp.float32(1.0 + j_min), jnp.float32(c_min), jnp.int32(radio),
            is_containment, cap)
        # start the 4-byte count transfer as soon as the filter completes on
        # device, so by the time the host needs it (after verifying the
        # previous tile) it has usually already landed
        cnt = fused[:1]
        if not full_pull:
            try:
                cnt.copy_to_host_async()
            except Exception:
                pass
        return fused, cnt, cap

    # square triangular tiling: only pairs j < i survive the mask, so row
    # panel [r0, r0+gi) needs columns [0, r0+gi) only — chunked into
    # row_block-wide tiles.  Exactly halves the MXU FLOPs vs full panels
    # (the filter is the measured bottleneck at N >= 16k) and, crucially,
    # every interior tile shares ONE compiled shape (row_block, row_block)
    # independent of N, so new dataset sizes skip the ~4-9 min remote
    # compile of the main kernel.
    tiles = []
    for r0 in range(0, n_pad, row_block):
        gi = min(row_block, n_pad - r0)
        for c0 in range(0, r0 + gi, row_block):
            tiles.append((r0, gi, c0, min(row_block, n_pad - c0)))

    pending = dispatch(*tiles[0], cur_cap) if tiles else None
    for t, (r0, gi, c0, gj) in enumerate(tiles):
        fused_dev, cnt_dev, used_cap = pending
        if full_pull:
            # legacy single-pull path (A/B benchmarking): pull the whole
            # cap-sized compacted buffer in one RPC
            if t + 1 < len(tiles):
                pending = dispatch(*tiles[t + 1], cur_cap)
            fused = np.asarray(fused_dev)
            _account_pull(4 * (1 + used_cap))
            count = int(fused[0])
            # compare against the cap THIS buffer was dispatched with (the
            # prefetch may predate a growth), else an overflowing count
            # would silently slice past the buffer and drop candidates
            while count > used_cap:
                cur_cap = max(cur_cap, used_cap * 4)
                used_cap = cur_cap
                fused = np.asarray(dispatch(r0, gi, c0, gj, cur_cap)[0])
                _account_pull(4 * (1 + used_cap))
                count = int(fused[0])
            idx = fused[1:1 + count].astype(np.int64)
        else:
            # two-step count+slice pull: the full cap-sized buffer stays on
            # device; only a quantized prefix of the ACTUAL candidates moves
            # over the (slow, high-latency) link.  Pull bytes drop from
            # 4*cap (4-17 MB/tile, growing with N^2) to
            # ~4*quantum(count) (16K-element floor, 4x ladder).
            count = int(np.asarray(cnt_dev)[0])
            _account_pull(4)
            while count > used_cap:
                cur_cap = max(cur_cap, used_cap * 4)
                used_cap = cur_cap  # rare: recompile with a larger buffer
                fused_dev, cnt_dev, _ = dispatch(r0, gi, c0, gj, cur_cap)
                count = int(np.asarray(cnt_dev)[0])
                _account_pull(4)
            # quantized prefix slice (few distinct shapes -> few tiny
            # compiles), dispatched BEFORE the next tile's filter so it
            # runs immediately and its pull overlaps that filter's compute
            prefix_dev = fused_dev[1:1 + _pull_quantum(count, used_cap)] \
                if count else None
            if t + 1 < len(tiles):
                pending = dispatch(*tiles[t + 1], cur_cap)
            if count:
                idx = np.asarray(prefix_dev)[:count].astype(np.int64)
                _account_pull(4 * _pull_quantum(count, used_cap))
            else:
                idx = None
        if count:
            ii = idx // gj + r0
            jj = idx % gj + c0
            keep = ii < n  # drop padded rows
            yield ii[keep], jj[keep]


def _pull_quantum(count: int, cap: int) -> int:
    """Smallest slice length >= count from a short ladder of sizes (16K,
    64K, 256K, ... 4x steps, capped at ``cap``) so the number of distinct
    slice shapes — each a tiny one-off compile — stays O(log cap)."""
    k = 1 << 14
    while k < count:
        k *= 4
    return min(k, cap)


def candidate_pairs_threshold(
    hashes: List[np.ndarray],
    threshold: float,
    kmer_size: int,
    is_containment: bool = False,
    bits: int = 8192,
    row_block: int = 1024,
    return_shared: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All pairs (i > j) that can possibly have distance <= threshold, with
    exact common counts.  Returns (i, j, common) — every returned pair passed
    the size-ratio filter and common >= 1; callers apply the distance.
    With ``return_shared`` the third column is the (approximate) shared-bit
    count instead and no exact verification is performed.
    """
    cand_i: List[np.ndarray] = []
    cand_j: List[np.ndarray] = []
    for ii, jj in candidate_pair_blocks(
            hashes, threshold, kmer_size, is_containment=is_containment,
            bits=bits, row_block=row_block):
        cand_i.append(ii)
        cand_j.append(jj)
    if not cand_i:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.copy(), np.empty(0, dtype=np.int64)
    ii = np.concatenate(cand_i)
    jj = np.concatenate(cand_j)
    if return_shared:
        # third column kept for API compatibility (candidate rank order)
        return ii, jj, np.zeros(len(ii), dtype=np.int64)
    common = exact_common_counts(hashes, ii, jj)
    nz = common > 0
    return ii[nz], jj[nz], common[nz].astype(np.int64)


class CsrSketches:
    """Flattened CSR view of a sketch list, built once and reused across
    exact-verification calls."""

    def __init__(self, hashes: List[np.ndarray]):
        self.n = len(hashes)
        self.use64 = self.n > 0 and hashes[0].dtype == np.uint64
        self.flat = (np.concatenate(hashes).astype(
            np.uint64 if self.use64 else np.uint32)
            if self.n else np.empty(0, dtype=np.uint32))
        self.offs = np.zeros(self.n + 1, dtype=np.int64)
        if self.n:
            np.cumsum([len(h) for h in hashes], out=self.offs[1:])

    def count_common(self, ii: np.ndarray, jj: np.ndarray,
                     threads: int = 0) -> np.ndarray:
        import os
        out = np.zeros(len(ii), dtype=np.int32)
        if len(ii) == 0:
            return out
        lib = native_mod.load_native()
        if lib is None:
            o = self.offs
            f = self.flat
            for p in range(len(ii)):
                a = f[o[ii[p]]:o[ii[p] + 1]]
                b = f[o[jj[p]]:o[jj[p] + 1]]
                out[p] = len(np.intersect1d(a, b, assume_unique=True))
            return out
        fn = (lib.rtc_count_common_u64 if self.use64
              else lib.rtc_count_common_u32)
        ii32 = np.ascontiguousarray(ii, dtype=np.int32)
        jj32 = np.ascontiguousarray(jj, dtype=np.int32)
        fn(self.flat.ctypes.data, self.offs.ctypes.data, ii32.ctypes.data,
           jj32.ctypes.data, len(ii), out.ctypes.data,
           threads or (os.cpu_count() or 1))
        return out


def exact_common_counts(hashes: List[np.ndarray], ii: np.ndarray,
                        jj: np.ndarray, threads: int = 0) -> np.ndarray:
    """Exact |A_i ∩ A_j| for candidate pairs (native two-pointer;
    NumPy fallback)."""
    return CsrSketches(hashes).count_common(ii, jj, threads)
