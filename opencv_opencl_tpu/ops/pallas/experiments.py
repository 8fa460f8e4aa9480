"""Rejected-on-hardware kernel experiments — kept as TESTED RECORDS.

Production kernels live in ``ops/pallas/natural.py``; everything here was
measured on real TPU hardware, found slower than the shipping design, and
quarantined so the hot module stays auditable.  Each docstring cites the
measurement that rejected it.  The tests (tests/test_natural_kernels.py)
still cover these in interpret mode so the records stay executable.

Contents:

- ``_tile_hist_radix8_kernel`` / ``_tile_hist_radixn_kernel`` — rows-per-
  MXU-dot batching of the radix-16 histogram (nb in {2, 4, 8}).  REJECTED:
  nb=8 measured 0.93 vs 0.52 ms/frame at 4K (scripts/tpu_r2_v3.json);
  nb=2/4 probed the crossover and still lost (scripts/tpu_r2b_lut.json).
  The FLOP overshoot (x nb) outweighs the dot-issue savings (/ nb).
- ``clahe_interp_and_hist_natural`` — the fused streaming step mapping
  frame N with frame N-1's LUTs while accumulating frame N's tile
  histograms in the same pass (the ``accel.cpp:36-40`` two-input design
  extended to CLAHE).  REJECTED: the in-kernel histogram side-contraction
  lowers ~4x slower than the separate radix kernel (3.79 vs 1.42 ms/frame
  at 4K — scripts/tpu_r2_stream_diag.json); the streaming mode ships as a
  two-pass scan instead (models/enhancer.StreamingEnhancer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencv_opencl_tpu.ops.pallas.natural import (
    NaturalSpec, _interpret_default, _pad_tiles)

__all__ = [
    "clahe_interp_and_hist_natural",
    "tile_histograms_radix_batched",
]


def _tile_hist_radix8_kernel(y_ref, out_ref):
    """Radix-16 histogram with 8 rows batched into ONE MXU dot: the hi/lo
    one-hots of 8 rows are sublane-concatenated to (128, W) and contracted
    lane-wise; only the 8 diagonal (16, 16) blocks of the (128, 128) result
    are real (cross-row blocks are discarded) — 8x more MXU FLOPs, 8x fewer
    dot issues.  REJECTED on hardware: 0.93 vs 0.52 ms/frame at 4K (the
    FLOP overshoot outweighs the issue savings; scripts/tpu_r2_v3.json)."""
    thp, twp = y_ref.shape
    bins16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def body(r8, acc):
        base = pl.multiple_of(r8 * 8, 8)
        chunk = y_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, W)
        hi = chunk >> 4
        lo = chunk & 15
        a_rows = [(bins16 == hi[k : k + 1, :]).astype(jnp.bfloat16)
                  for k in range(8)]
        b_rows = [(bins16 == lo[k : k + 1, :]).astype(jnp.bfloat16)
                  for k in range(8)]
        a8 = jnp.concatenate(a_rows, axis=0)        # (128, W)
        b8 = jnp.concatenate(b_rows, axis=0)        # (128, W)
        d = jax.lax.dot_general(
            a8, b8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (128, 128)
        for k in range(8):
            acc = acc + d[16 * k : 16 * k + 16, 16 * k : 16 * k + 16]
        return acc

    acc = jax.lax.fori_loop(
        0, thp // 8, body, jnp.zeros((16, 16), jnp.float32)
    )
    out_ref[0, :, :] = acc.astype(jnp.int32)


def _tile_hist_radixn_kernel(nb: int, y_ref, out_ref):
    """Radix-16 histogram with ``nb`` rows batched per MXU dot: the hi/lo
    one-hots of nb rows are sublane-concatenated to (16*nb, W) and
    contracted lane-wise; only the nb diagonal (16, 16) blocks of the
    result are real.  nb trades FLOP overshoot (x nb) against dot-issue
    count (/ nb) — nb=8 was rejected on hardware (0.93 vs 0.52 ms/frame,
    scripts/tpu_r2_v3.json); nb in {2, 4} probed the crossover and also
    lost (scripts/tpu_r2b_lut.json)."""
    thp, twp = y_ref.shape
    bins16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def body(r8, acc):
        base = pl.multiple_of(r8 * 8, 8)
        chunk = y_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, W)
        hi = chunk >> 4
        lo = chunk & 15
        for g in range(0, 8, nb):
            a = jnp.concatenate(
                [(bins16 == hi[k : k + 1, :]).astype(jnp.bfloat16)
                 for k in range(g, g + nb)], axis=0)        # (16nb, W)
            b = jnp.concatenate(
                [(bins16 == lo[k : k + 1, :]).astype(jnp.bfloat16)
                 for k in range(g, g + nb)], axis=0)
            d = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (16nb, 16nb)
            for k in range(nb):
                acc = acc + d[16 * k : 16 * k + 16, 16 * k : 16 * k + 16]
        return acc

    acc = jax.lax.fori_loop(
        0, thp // 8, body, jnp.zeros((16, 16), jnp.float32)
    )
    out_ref[0, :, :] = acc.astype(jnp.int32)


def tile_histograms_radix_batched(ext: jax.Array, tiles_y: int, tiles_x: int,
                                  tile_h: int, tile_w: int,
                                  interpret: bool | None = None,
                                  batch_rows: int = 8) -> jax.Array:
    """The experiment variants of ``natural.tile_histograms_radix``:
    ``batch_rows`` rows per MXU dot, in {2, 4, 8}.  Same contract (zero
    alignment padding subtracted from bin 0)."""
    if batch_rows not in (2, 4, 8):
        raise ValueError(
            f"batch_rows must be one of (2, 4, 8), got {batch_rows}")
    if interpret is None:
        interpret = _interpret_default()
    blk, thp, twp, slack = _pad_tiles(ext, tiles_y, tiles_x, tile_h, tile_w)
    kern = (_tile_hist_radix8_kernel if batch_rows == 8
            else functools.partial(_tile_hist_radixn_kernel, batch_rows))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tiles_y * tiles_x, 16, 16), jnp.int32),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((thp, twp), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 16),
                               lambda ty, tx: (ty * tiles_x + tx, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blk)
    hists = out.reshape(tiles_y * tiles_x, 256)
    if slack:
        hists = hists.at[:, 0].add(-slack)
    return hists


# ------------------------------------------------- fused streaming mode ----


def _natural_interp_hist_kernel(TX, Pp2,
                                y_ref, lp_ref, mlo_ref, mhi_ref, xat_ref,
                                seg_ref, rp_ref, ya_ref, sel_ref,
                                out_ref, h0_ref, h1_ref):
    """v2 interpolation + per-block partial tile histograms in ONE pass —
    the streaming (ref-frame) mode: the LUT pack comes from the PREVIOUS
    frame, so this frame's histograms can be accumulated while mapping it
    (the two-input ``accel.cpp:36-40`` design extended to CLAHE).

    Per row the 256-wide one-hot is built ONCE and used twice: the (Pp2,
    256) interp dot and a lane-contracted (256, W) x (TXp, W) segment dot
    that buckets the row's counts by tile column (lane-lane dot_general —
    padding the tile-col axis to 128 MXU output lanes instead cost 8x the
    interp dot and made the fused mode SLOWER than two kernels).  A block
    may straddle one tile-row boundary, so each row adds its counts to
    accumulator 0 or 1 per the SMEM ``sel`` flag; the caller reduces the
    per-block partials with a static row-block -> tile-row mapping.  f32
    counts are exact (< 2^24).
    """
    rs, w = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    mlo = mlo_ref[:]
    mhi = mhi_ref[:]
    xat = xat_ref[:]
    seg = seg_ref[:]                                # (TXp, W) bf16 0/1
    xa1 = xat[0:1, :]
    xa = xat[1:2, :]
    acc0 = jnp.zeros(h0_ref.shape[1:], jnp.float32)  # (256, TXp)
    acc1 = jnp.zeros(h1_ref.shape[1:], jnp.float32)
    for r in range(rs):  # static unroll
        rp = rp_ref[0, 0, r]
        lp = lp_ref[pl.ds(rp * Pp2, Pp2), :]
        v = y_ref[r : r + 1, :].astype(jnp.int32)
        oh = (bins == v).astype(jnp.bfloat16)       # (256, W) — built once
        d = jnp.dot(lp, oh, preferred_element_type=jnp.float32)
        dmlo = d * mlo
        dmhi = d * mhi
        l11 = jnp.sum(dmlo[0:TX, :], axis=0, keepdims=True)
        l21 = jnp.sum(dmlo[TX : 2 * TX, :], axis=0, keepdims=True)
        l12 = jnp.sum(dmhi[0:TX, :], axis=0, keepdims=True)
        l22 = jnp.sum(dmhi[TX : 2 * TX, :], axis=0, keepdims=True)
        r1 = l11 * xa1 + l12 * xa
        r2 = l21 * xa1 + l22 * xa
        ya = ya_ref[0, 0, r]
        res = r1 * (jnp.float32(1.0) - ya) + r2 * ya
        out_ref[r : r + 1, :] = (
            jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )
        hrow = jax.lax.dot_general(
            oh, seg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (256, TXp)
        sel = sel_ref[0, 0, r].astype(jnp.float32)   # 0 -> acc0, 1 -> acc1
        acc0 = acc0 + hrow * (jnp.float32(1.0) - sel)
        acc1 = acc1 + hrow * sel
    h0_ref[0, :, :] = acc0.astype(jnp.int32)
    h1_ref[0, :, :] = acc1.astype(jnp.int32)


def clahe_interp_and_hist_natural(y: jax.Array, luts: jax.Array,
                                  spec: "NaturalSpec",
                                  interpret: bool | None = None):
    """Fused streaming step for TILE-DIVISIBLE geometry: returns
    ``(mapped_frame, tile_hists)`` where ``luts`` came from the previous
    frame and ``tile_hists`` is THIS frame's (T, 256) int32 histogram set
    (exactly ``tile_histograms_radix`` of it).

    REJECTED on hardware: the in-kernel histogram side-contraction lowers
    ~4x slower than running the separate radix kernel (3.79 vs 1.42
    ms/frame at 4K — scripts/tpu_r2_stream_diag.json), under both the
    (256,W)@(W,TXpad128) and the lane-contracted (256,W)x(TX,W) forms.
    The streaming mode uses the two-pass scan instead; this stays as a
    tested record of the experiment."""
    if interpret is None:
        interpret = _interpret_default()
    h, w = spec.height, spec.width
    assert y.shape == (h, w)
    tx, ty = spec.tiles_x, spec.tiles_y
    assert h % ty == 0 and w % tx == 0, "fused mode needs divisible geometry"
    tile_h, tile_w = h // ty, w // tx
    rs, Pp2 = spec.rs, spec.pack2_rows
    # the two-accumulator partials assume each rs-aligned block touches at
    # most TWO tile rows ((rs-1)//tile_h <= 1) and that blocks tile the
    # frame exactly (h % rs == 0)
    assert (rs - 1) // (h // ty) <= 1, "fused mode: tile_h too small for rs"
    assert h % rs == 0, "fused mode needs height % rs == 0"
    txp = -(-tx // 8) * 8  # sublane-pad the tile-col axis (lane-lane dot)
    nrb = spec.nrb

    luts_flat = luts.reshape(-1, 256)
    lp = jnp.take(luts_flat, jnp.asarray(spec.pack2_idx), axis=0).astype(
        jnp.bfloat16)

    # static row -> tile-row bookkeeping
    rows = np.arange(nrb * rs)
    trow = np.minimum(rows // tile_h, ty - 1)
    trow_blocks = trow.reshape(nrb, rs)
    first = trow_blocks[:, :1]
    sel = (trow_blocks != first).astype(np.int32).reshape(nrb, 1, rs)
    # per-block target tile rows for accumulators 0 and 1
    t0 = first[:, 0]
    t1 = trow_blocks.max(axis=1)

    seg = np.zeros((txp, w), np.float32)
    seg[np.minimum(np.arange(w) // tile_w, tx - 1), np.arange(w)] = 1.0

    kern = functools.partial(_natural_interp_hist_kernel, tx, Pp2)
    row_blk = pl.BlockSpec((rs, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    smem_blk = pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    out, h0, h1 = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((nrb, 256, txp), jnp.int32),
            jax.ShapeDtypeStruct((nrb, 256, txp), jnp.int32),
        ),
        grid=(nrb,),
        in_specs=[
            row_blk,
            const((spec.row_pairs * Pp2, 256)),
            const((Pp2, w)),
            const((Pp2, w)),
            const((8, w)),
            const((txp, w)),
            smem_blk,
            smem_blk,
            smem_blk,
        ],
        out_specs=(
            row_blk,
            pl.BlockSpec((1, 256, txp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256, txp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        y, lp, jnp.asarray(spec.mlo2), jnp.asarray(spec.mhi2),
        jnp.asarray(spec.xat), jnp.asarray(seg).astype(jnp.bfloat16),
        jnp.asarray(spec.rp_rows), jnp.asarray(spec.ya_rows),
        jnp.asarray(sel),
    )
    # reduce per-block partials into tile rows (static mapping)
    hists = jnp.zeros((ty, 256, txp), jnp.int32)
    hists = hists.at[jnp.asarray(t0)].add(h0)
    hists = hists.at[jnp.asarray(t1)].add(h1)
    hists = hists[:, :, :tx]                      # drop lane padding
    return out, hists.transpose(0, 2, 1).reshape(ty * tx, 256)
