"""TPU computation of H.264 intra CAVLC quantized levels.

The reference always encodes before emitting (``omxh264enc`` in every
relay, ``/root/reference/OpenCVequalHist.cpp:308-332``); its encoder is
a hardware block (the VCU).  The in-repo analogue is the CAVLC intra
encoder (io/h264_cavlc.py oracle, native C++ production path) — whose
profile shows the *arithmetic* (prediction, 4x4 integer transforms, DC
Hadamards, quantization, reconstruction) dominating and the entropy
coding a minority.  This module moves that arithmetic onto the TPU:

- one **slice per MB row** (the logical limit of the reference's
  ``num-slices=8`` OMX tuning): H.264 slices share no contexts, so the
  top neighbor is never available and the only dependency left is the
  *left* reconstructed macroblock — a ``lax.scan`` over MB columns,
  fully vectorized over MB rows (and over batched frames, which simply
  concatenate on the row axis);
- all arithmetic is int32 on the VPU (exact; MXU dots are bf16-split
  and inexact for wide ints — see CLAUDE.md), byte-for-byte identical
  to the oracle's int64 math because every intermediate provably fits
  int32 (bounds in the docstrings below);
- the scan carries only the reconstructed *right edge* of each
  macroblock (16 luma + 2x8 chroma pixels per row) — the full
  reconstruction is never materialized;
- the output is the complete set of quantized coefficients
  (``LevelArrays``), which the host-side entropy coder (native
  ``fp_cavlc_entropy_slices`` or the pure-Python fallback in
  io/h264_cavlc.py) turns into the bitstream.  Entropy coding is the
  only CPU stage left.

Bit-exactness contract: ``encode_levels_jit`` must produce levels such
that the assembled stream is byte-identical to
``io.h264_cavlc.encode_frame_cavlc_slices(..., slices=mb_h)``
(tests/test_h264_levels.py), which itself is decoder-conformance proven
through libavcodec.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LevelArrays", "encode_levels", "encode_levels_jit",
           "PACKED_LANES", "pack_levels", "unpack_levels_host"]

# Constants mirrored from io/h264_cavlc.py (the oracle).  _MF/_V per
# qp%6 by coefficient-position class; position-class matrix; chroma QP
# mapping (spec Table 8-15); level clamp for the 12-bit CAVLC escape.
_MF_TAB = np.array([(13107, 5243, 8066), (11916, 4660, 7490),
                    (10082, 4194, 6554), (9362, 3647, 5825),
                    (8192, 3355, 5243), (7282, 2893, 4559)], np.int32)
_V_TAB = np.array([(10, 16, 13), (11, 18, 14), (13, 20, 16),
                   (14, 23, 18), (16, 25, 20), (18, 29, 23)], np.int32)
_POS_CLASS = np.full((4, 4), 2, np.int32)
_POS_CLASS[::2, ::2] = 0
_POS_CLASS[1::2, 1::2] = 1
_QPC_TAB = np.array(list(range(30)) +
                    [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                     36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39],
                    np.int32)
_LEVEL_CLAMP = 2063


class LevelArrays(NamedTuple):
    """Quantized coefficients for every MB of a frame, raster layouts
    matching the native entropy coder's expectations (pre-zigzag).

    Shapes (mb_h = rows of 16x16 macroblocks, mb_w = columns):
      zdc:  (mb_h, mb_w, 16)        luma DC, 4x4 raster [by*4+bx]
      acz:  (mb_h, mb_w, 16, 16)    luma AC per block [by*4+bx], 4x4
                                    raster coeffs, DC slot zeroed
      czdc: (mb_h, mb_w, 2, 4)      chroma DC per comp (cb, cr), 2x2
      cacz: (mb_h, mb_w, 2, 4, 16)  chroma AC per comp/block [by*2+bx]
    """

    zdc: jax.Array
    acz: jax.Array
    czdc: jax.Array
    cacz: jax.Array


def _cf1d(x: jax.Array, axis: int) -> jax.Array:
    """Forward core transform matrix CF applied along ``axis`` (len 4).

    CF rows (1,1,1,1),(2,1,-1,-2),(1,-1,-1,1),(1,-2,2,-1) — the
    standard butterfly.  |out| <= 6 * max|in|.
    """
    x0, x1, x2, x3 = (jnp.take(x, i, axis=axis) for i in range(4))
    s0, s1 = x0 + x3, x1 + x2
    s2, s3 = x1 - x2, x0 - x3
    return jnp.stack([s0 + s1, 2 * s3 + s2, s0 - s1, s3 - 2 * s2],
                     axis=axis)


def _h1d(x: jax.Array, axis: int) -> jax.Array:
    """Hadamard H4 along ``axis``: rows (1,1,1,1),(1,1,-1,-1),
    (1,-1,-1,1),(1,-1,1,-1).  H4 is symmetric, so H4 @ x @ H4 is this
    applied to both axes in either order."""
    x0, x1, x2, x3 = (jnp.take(x, i, axis=axis) for i in range(4))
    return jnp.stack([x0 + x1 + x2 + x3, x0 + x1 - x2 - x3,
                      x0 - x1 - x2 + x3, x0 - x1 + x2 - x3], axis=axis)


def _h2_2d(x: jax.Array) -> jax.Array:
    """H2 @ x @ H2 for trailing (2, 2) axes (chroma DC Hadamard)."""
    a, b = x[..., 0, 0], x[..., 0, 1]
    c, d = x[..., 1, 0], x[..., 1, 1]
    return jnp.stack([a + b + c + d, a - b + c - d,
                      a + b - c - d, a - b - c + d],
                     axis=-1).reshape(*x.shape[:-2], 2, 2)


def _quant(w: jax.Array, mf: jax.Array, f: jax.Array,
           qbits: jax.Array) -> jax.Array:
    """sign(w) * ((|w| * mf + f) >> qbits), clamped to the CAVLC escape
    range.  ``w`` has block axes (..., by, r, bx, c); ``mf`` is the
    (4, 4) per-position multiplier, broadcast over (r, c).  Max |w| is
    9180 (residual 255 x 2D gain 36) and max mf 13107 -> |w|*mf + f <
    1.21e8 + 2.8e6: int32-safe."""
    q = (jnp.abs(w) * mf[None, None, :, None, :] + f) >> qbits
    return jnp.clip(jnp.sign(w) * q, -_LEVEL_CLAMP, _LEVEL_CLAMP)


def _inv4_2d(d: jax.Array) -> jax.Array:
    """Spec 8.5.12.3 inverse core transform on trailing (4, 4) axes,
    rows then columns (matches oracle _inv4x4; output residual << 6).
    Max |d| = 2063*29 << 8 = 15.3M, x gain 36 -> 551M: int32-safe."""

    def pass1(x, axis):
        d0, d1, d2, d3 = (jnp.take(x, i, axis=axis) for i in range(4))
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=axis)

    return pass1(pass1(d, -1), -2)


def _luma_dc_dequant(f: jax.Array, qp: jax.Array) -> jax.Array:
    """Spec 8.5.10 (oracle _luma_dc_dequant), branchless on traced qp.
    |f| <= 2063*16 = 33k, ls <= 288 -> f*ls <= 9.6M, << 2 max: int32."""
    ls = 16 * jnp.asarray(_V_TAB[:, 0])[qp % 6]
    k = qp // 6
    hi = (f * ls) << jnp.maximum(k - 6, 0)
    lo = (f * ls + (1 << jnp.maximum(5 - k, 0))) >> jnp.maximum(6 - k, 0)
    return jnp.where(qp >= 36, hi, lo)


def _chroma_dc_dequant(f: jax.Array, qpc: jax.Array) -> jax.Array:
    """Spec 8.5.11.2: ((f * 16*V0) << qpc//6) >> 5."""
    ls = 16 * jnp.asarray(_V_TAB[:, 0])[qpc % 6]
    return ((f * ls) << (qpc // 6)) >> 5


def encode_levels(y: jax.Array, cb: jax.Array, cr: jax.Array,
                  qp: jax.Array) -> LevelArrays:
    """Compute the quantized CAVLC levels of one 16-aligned frame with
    one-slice-per-MB-row semantics (top neighbor never available).

    y: (H, W) uint8 with H, W % 16 == 0; cb, cr: (H/2, W/2) uint8;
    qp: scalar int32 in [0, 51] (traced — one compile serves all QPs).
    """
    H, W = y.shape
    if H % 16 or W % 16:
        raise ValueError("encode_levels requires 16-aligned frames")
    mb_h, mb_w = H // 16, W // 16
    qp = jnp.asarray(qp, jnp.int32)
    qpc = jnp.asarray(_QPC_TAB)[jnp.clip(qp, 0, 51)]

    mf_y = jnp.asarray(_MF_TAB)[qp % 6][jnp.asarray(_POS_CLASS)]
    mf_c = jnp.asarray(_MF_TAB)[qpc % 6][jnp.asarray(_POS_CLASS)]
    v_y = jnp.asarray(_V_TAB)[qp % 6][jnp.asarray(_POS_CLASS)]
    v_c = jnp.asarray(_V_TAB)[qpc % 6][jnp.asarray(_POS_CLASS)]
    qbits = 15 + qp // 6
    qbits_c = 15 + qpc // 6
    f_y = (1 << qbits) // 3          # intra rounding, oracle _quant4x4
    f_c = (1 << qbits_c) // 3
    mf0_y, mf0_c = jnp.asarray(_MF_TAB)[qp % 6][0], \
        jnp.asarray(_MF_TAB)[qpc % 6][0]

    # MB-column-major layout for the scan: (mb_w, mb_h, 16|8, 16|8)
    ycols = y.reshape(mb_h, 16, mb_w, 16).transpose(2, 0, 1, 3)
    ycols = ycols.astype(jnp.int32)
    cbcols = cb.reshape(mb_h, 8, mb_w, 8).transpose(2, 0, 1, 3)
    cbcols = cbcols.astype(jnp.int32)
    crcols = cr.reshape(mb_h, 8, mb_w, 8).transpose(2, 0, 1, 3)
    crcols = crcols.astype(jnp.int32)

    def chroma_mb(src: jax.Array, edge: jax.Array, left_ok: jax.Array,
                  ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """One 8x8 chroma component for all rows: returns (czdc raster
        (mb_h,2,2), cacz (mb_h,2,2,4,4) [by,bx], pred plane (mb_h,8,8),
        per-block DC pre-Hadamard cwdc (mb_h,2,2))."""
        # DC pred per quadrant: with top never available, the top and
        # bottom halves each take the mean of their 4 left pixels
        # (oracle _pred_dc_chroma with top_ok=False).
        v0 = (jnp.sum(edge[:, 0:4], axis=1) + 2) >> 2
        v1 = (jnp.sum(edge[:, 4:8], axis=1) + 2) >> 2
        v0 = jnp.where(left_ok, v0, 128)
        v1 = jnp.where(left_ok, v1, 128)
        pred = jnp.concatenate(
            [jnp.broadcast_to(v0[:, None, None], (mb_h, 4, 8)),
             jnp.broadcast_to(v1[:, None, None], (mb_h, 4, 8))], axis=1)
        res = src - pred
        blk = res.reshape(mb_h, 2, 4, 2, 4)      # (row, by, r, bx, c)
        t = _cf1d(_cf1d(blk, 2), 4)
        cwdc = t[:, :, 0, :, 0]                  # (mb_h, 2, 2) [by, bx]
        acz = _quant(t, mf_c, f_c, qbits_c)
        acz = acz.at[:, :, 0, :, 0].set(0)
        fdc = _h2_2d(cwdc)
        zq = (jnp.abs(fdc) * mf0_c + 2 * f_c) >> (qbits_c + 1)
        czdc = jnp.clip(jnp.sign(fdc) * zq, -_LEVEL_CLAMP, _LEVEL_CLAMP)
        return czdc, acz, pred, cwdc

    def chroma_edge(czdc: jax.Array, acz: jax.Array, pred: jax.Array,
                    ) -> jax.Array:
        """Reconstructed right column (mb_h, 8) of one chroma comp."""
        cdcd = _chroma_dc_dequant(_h2_2d(czdc), qpc)    # (mb_h, 2, 2)
        d = (acz[:, :, :, 1, :] * v_c) << (qpc // 6)    # bx=1 blocks
        d = d.at[:, :, 0, 0].set(cdcd[:, :, 1])
        r = (_inv4_2d(d) + 32) >> 6                     # (mb_h, 2, 4, 4)
        col = r[:, :, :, 3] + pred[:, :, 7:8].reshape(mb_h, 2, 4)
        return jnp.clip(col, 0, 255).reshape(mb_h, 8)

    def step(carry, xs):
        y_edge, cb_edge, cr_edge = carry      # recon right cols (int32)
        ysrc, cbsrc, crsrc, mbx = xs
        left_ok = mbx > 0

        # ---- luma: DC-16x16 pred from the left edge (top never ok)
        pred = jnp.where(left_ok,
                         (jnp.sum(y_edge, axis=1) + 8) >> 4, 128)
        res = ysrc - pred[:, None, None]
        blk = res.reshape(mb_h, 4, 4, 4, 4)   # (row, by, r, bx, c)
        t = _cf1d(_cf1d(blk, 2), 4)
        wdc = t[:, :, 0, :, 0]                # (mb_h, 4, 4) [by, bx]
        acz = _quant(t, mf_y, f_y, qbits)
        acz = acz.at[:, :, 0, :, 0].set(0)
        # luma DC Hadamard ((H4 . wdc . H4) >> 1) + DC-rate quant
        ydc = _h1d(_h1d(wdc, 1), 2) >> 1
        zq = (jnp.abs(ydc) * mf0_y + 2 * f_y) >> (qbits + 1)
        zdc = jnp.clip(jnp.sign(ydc) * zq, -_LEVEL_CLAMP, _LEVEL_CLAMP)

        # ---- chroma
        czdc_cb, acz_cb, pred_cb, _ = chroma_mb(cbsrc, cb_edge, left_ok)
        czdc_cr, acz_cr, pred_cr, _ = chroma_mb(crsrc, cr_edge, left_ok)

        # ---- reconstruct ONLY the right edge for the next column
        dcd = _luma_dc_dequant(_h1d(_h1d(zdc, 1), 2), qp)
        d = (acz[:, :, :, 3, :] * v_y) << (qp // 6)     # bx=3 blocks
        d = d.at[:, :, 0, 0].set(dcd[:, :, 3])
        r = (_inv4_2d(d) + 32) >> 6                     # (mb_h, 4, 4, 4)
        ycol = jnp.clip(r[:, :, :, 3] + pred[:, None, None], 0, 255)
        y_edge = ycol.reshape(mb_h, 16)
        cb_edge = chroma_edge(czdc_cb, acz_cb, pred_cb)
        cr_edge = chroma_edge(czdc_cr, acz_cr, pred_cr)

        out = (zdc.reshape(mb_h, 16).astype(jnp.int16),
               acz.transpose(0, 1, 3, 2, 4)       # -> [by, bx, r, c]
               .reshape(mb_h, 16, 16).astype(jnp.int16),
               jnp.stack([czdc_cb, czdc_cr], axis=1)
               .reshape(mb_h, 2, 4).astype(jnp.int16),
               jnp.stack(
                   [acz_cb.transpose(0, 1, 3, 2, 4),
                    acz_cr.transpose(0, 1, 3, 2, 4)], axis=1)
               .reshape(mb_h, 2, 4, 16).astype(jnp.int16))
        return (y_edge, cb_edge, cr_edge), out

    init = (jnp.zeros((mb_h, 16), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32))
    xs = (ycols, cbcols, crcols, jnp.arange(mb_w, dtype=jnp.int32))
    _, (zdc, acz, czdc, cacz) = jax.lax.scan(step, init, xs)
    # scan stacks on axis 0 = mb_w; entropy wants (mb_h, mb_w, ...)
    return LevelArrays(zdc.transpose(1, 0, 2),
                       acz.transpose(1, 0, 2, 3),
                       czdc.transpose(1, 0, 2, 3),
                       cacz.transpose(1, 0, 2, 3, 4))


encode_levels_jit = jax.jit(encode_levels)

# One packed int16 lane vector per macroblock: 16 luma DC + 256 luma AC
# + 8 chroma DC + 128 chroma AC = 408 levels, plus the QP the levels
# were quantized with in lane 408 (the slice header must encode the
# SAME qp; carrying it in-band keeps a pipelined producer/consumer —
# the FrameFeeder dispatch vs the retire-side entropy coder — coherent
# when closed-loop rate control moves qp between the two moments).
PACKED_LANES = 409


def pack_levels(lv: LevelArrays, qp: jax.Array) -> jax.Array:
    """Flatten LevelArrays (+ qp) into one (mb_h, mb_w, 409) int16 array
    — a single D2H-friendly buffer the FrameFeeder can retire like a
    frame (``np.asarray`` + per-frame indexing)."""
    mbh, mbw = lv.zdc.shape[:2]
    qp_lane = jnp.broadcast_to(qp.astype(jnp.int16), (mbh, mbw, 1))
    return jnp.concatenate(
        [lv.zdc.reshape(mbh, mbw, 16),
         lv.acz.reshape(mbh, mbw, 256),
         lv.czdc.reshape(mbh, mbw, 8),
         lv.cacz.reshape(mbh, mbw, 128),
         qp_lane], axis=-1)


def unpack_levels_host(packed: np.ndarray) -> tuple[LevelArrays, int]:
    """Host-side inverse of :func:`pack_levels`: (LevelArrays of numpy
    views, qp).  The entropy bindings re-contiguify as needed."""
    packed = np.asarray(packed)
    mbh, mbw, lanes = packed.shape
    if lanes != PACKED_LANES:
        raise ValueError(f"packed levels have {lanes} lanes, "
                         f"expected {PACKED_LANES}")
    return LevelArrays(
        packed[:, :, :16],
        packed[:, :, 16:272].reshape(mbh, mbw, 16, 16),
        packed[:, :, 272:280].reshape(mbh, mbw, 2, 4),
        packed[:, :, 280:408].reshape(mbh, mbw, 2, 4, 16),
    ), int(packed[0, 0, 408])


def encode_levels_nv12(nv12: np.ndarray, width: int, height: int,
                       qp: int) -> LevelArrays:
    """Convenience host-NV12 entry (16-aligned): split planes, run the
    jitted level computation, return device arrays."""
    y = jnp.asarray(nv12[:height])
    uv = np.asarray(nv12[height:]).reshape(height // 2, width // 2, 2)
    return encode_levels_jit(y, jnp.asarray(uv[:, :, 0]),
                             jnp.asarray(uv[:, :, 1]),
                             jnp.int32(qp))
