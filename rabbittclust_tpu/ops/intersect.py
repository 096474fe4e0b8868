"""Pairwise exact sketch-intersection counts on device.

Two implementations with identical semantics:
  * ``pair_counts_jnp`` — pure jnp broadcast/compare (reference + CPU tests)
  * ``pair_counts_pallas`` — Pallas TPU kernel: grid over column tiles, row
    tile resident in VMEM, per-(r, s) slot comparison over the bucket axis
    (VPU elementwise compare + integer accumulate; lanes = buckets).

Per-pair work is K * W^2 compares where K = bucket count (~sketch size) and
W = max bucket occupancy; the HBM traffic is one pass over the column tiles
per row tile (Mosaic double-buffers the streaming automatically).

Counts are exact set-intersection sizes |A∩B| (see ops/pack.py for why the
bucketed compare is exact).  The final Mash/AAF distances are computed from
these integer counts on the host in float64 — device float rounding can
never change a cluster decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU backends
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def pair_counts_jnp(a0, b0, a1=None, b1=None):
    """Exact pair counts: a* (GI, W, K), b* (GJ, W, K) -> (GI, GJ) int32."""
    gi, w, k = a0.shape
    gj = b0.shape[0]
    acc = jnp.zeros((gi, gj), dtype=jnp.int32)
    for r in range(w):
        for s in range(w):
            eq = a0[:, None, r, :] == b0[None, :, s, :]
            if a1 is not None:
                eq &= a1[:, None, r, :] == b1[None, :, s, :]
            acc += jnp.sum(eq, axis=-1, dtype=jnp.int32)
    return acc


def _slot(x, idx):
    """x (G, W, K) -> (G, K) slice at slot idx without gather lowering."""
    return jax.lax.index_in_dim(x, idx, axis=1, keepdims=False)


def _ref_slot_i(ref, idx, gi, kc):
    """ref (G, W, K): read slot idx -> (G, 1, K) via dynamic ref read."""
    return ref[:, pl.ds(idx, 1), :].reshape(gi, 1, kc)


def _ref_slot_j(ref, idx, gj, kc):
    return ref[:, pl.ds(idx, 1), :].reshape(1, gj, kc)


def _kernel_1plane(a0_ref, b0_ref, out_ref, *, w: int):
    gi, _, kc = a0_ref.shape
    gj = b0_ref.shape[0]

    def body(t, acc):
        ar = _ref_slot_i(a0_ref, t // w, gi, kc)
        bs = _ref_slot_j(b0_ref, t % w, gj, kc)
        return acc + jnp.sum(ar == bs, axis=-1, dtype=jnp.int32)

    acc = jax.lax.fori_loop(0, w * w, body,
                            jnp.zeros((gi, gj), dtype=jnp.int32))

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(pl.program_id(2) != 0)
    def _accum():
        out_ref[...] += acc


def _kernel_2plane(a0_ref, a1_ref, b0_ref, b1_ref, out_ref, *, w: int):
    gi, _, kc = a0_ref.shape
    gj = b0_ref.shape[0]

    def body(t, acc):
        r = t // w
        s = t % w
        eq = (_ref_slot_i(a0_ref, r, gi, kc) ==
              _ref_slot_j(b0_ref, s, gj, kc))
        eq &= (_ref_slot_i(a1_ref, r, gi, kc) ==
               _ref_slot_j(b1_ref, s, gj, kc))
        return acc + jnp.sum(eq, axis=-1, dtype=jnp.int32)

    acc = jax.lax.fori_loop(0, w * w, body,
                            jnp.zeros((gi, gj), dtype=jnp.int32))

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(pl.program_id(2) != 0)
    def _accum():
        out_ref[...] += acc


@functools.partial(jax.jit,
                   static_argnames=("gi_tile", "gj_tile", "interpret"))
def pair_counts_row_pallas(a0, b0, a1=None, b1=None, gi_tile: int = 8,
                           gj_tile: int = 128, interpret: bool = False):
    """Counts of one row block vs ALL columns: a0 (GI, W, K), b0 (N, W, K)
    -> (GI, N) int32.

    Grid is (nJ, nI) with the row subtile fastest: each column block is
    loaded into VMEM once and stays resident while all row subtiles sweep
    past it (Mosaic keeps blocks whose index map doesn't change)."""
    gi, w, k = a0.shape
    n = b0.shape[0]
    assert n % gj_tile == 0, (n, gj_tile)
    assert gi % gi_tile == 0, (gi, gi_tile)
    kc = min(k, 256)
    assert k % kc == 0, (k, kc)
    grid = (n // gj_tile, gi // gi_tile, k // kc)
    two = a1 is not None
    kern = functools.partial(_kernel_2plane if two else _kernel_1plane, w=w)
    a_spec = pl.BlockSpec((gi_tile, w, kc), lambda j, i, kk: (i, 0, kk))
    b_spec = pl.BlockSpec((gj_tile, w, kc), lambda j, i, kk: (j, 0, kk))
    out_spec = pl.BlockSpec((gi_tile, gj_tile), lambda j, i, kk: (i, j))
    in_specs = [a_spec, a_spec, b_spec, b_spec] if two else [a_spec, b_spec]
    args = (a0, a1, b0, b1) if two else (a0, b0)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((gi, n), jnp.int32),
        interpret=interpret,
    )(*args)


def pair_counts_row(a_block, b_packed, gj_tile: int = 128,
                    backend: str = "auto"):
    """Dispatch helper over PackedSketches blocks."""
    interpret = False
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "interpret":
        backend, interpret = "pallas", True
    if backend == "pallas":
        return pair_counts_row_pallas(
            jnp.asarray(a_block.plane0), jnp.asarray(b_packed.plane0),
            None if a_block.plane1 is None else jnp.asarray(a_block.plane1),
            None if b_packed.plane1 is None else jnp.asarray(b_packed.plane1),
            gj_tile=gj_tile, interpret=interpret)
    return _pair_counts_row_jnp(
        jnp.asarray(a_block.plane0), jnp.asarray(b_packed.plane0),
        None if a_block.plane1 is None else jnp.asarray(a_block.plane1),
        None if b_packed.plane1 is None else jnp.asarray(b_packed.plane1),
        gj_tile=gj_tile)


@functools.partial(jax.jit, static_argnames=("gj_tile",))
def _pair_counts_row_jnp(a0, b0, a1=None, b1=None, gj_tile: int = 128):
    n = b0.shape[0]

    def body(carry, j):
        sl = jax.lax.dynamic_slice_in_dim(b0, j * gj_tile, gj_tile, 0)
        sl1 = None if a1 is None else jax.lax.dynamic_slice_in_dim(
            b1, j * gj_tile, gj_tile, 0)
        return carry, pair_counts_jnp(a0, sl, a1, sl1)

    _, tiles = jax.lax.scan(body, None, jnp.arange(n // gj_tile))
    # tiles: (nJ, GI, gj_tile) -> (GI, N)
    return jnp.transpose(tiles, (1, 0, 2)).reshape(a0.shape[0], n)
