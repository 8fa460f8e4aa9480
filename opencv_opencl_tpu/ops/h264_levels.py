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

import os
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# MB-column scan unroll: the level scans run mb_w tiny sequential
# steps (240 at 4K), so per-iteration fixed cost dominates the now-
# MXU-accelerated programs; unrolling is a PURE loop transformation
# (byte-exact — proven on chip, scripts/tpu_r5_unroll.json
# equal_vs_unroll1).  Hardware-probed: unroll=8 takes the fused 4K
# search=2 program 15.83 -> 14.13 ms/frame (70.8 fps) and leaves the
# standalone P program within noise.  CPU backends keep unroll=1
# (8x trace size would only slow the test suite's compiles — the
# outputs are identical either way).  Env override for probing.
_SCAN_UNROLL_ENV = os.environ.get("OPENCV_TPU_SCAN_UNROLL")


def _scan_unroll() -> int:
    if _SCAN_UNROLL_ENV is not None:
        return int(_SCAN_UNROLL_ENV)
    return 8 if jax.default_backend() == "tpu" else 1

__all__ = ["LevelArrays", "encode_levels", "encode_levels_jit",
           "encode_levels_recon_jit", "PLevelArrays", "encode_p_levels",
           "encode_p_levels_jit", "encode_p_levels2_jit", "INTRA_BIAS",
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


def _inv_blocks(d: jax.Array) -> jax.Array:
    """Inverse-transform every 4x4 block of a (mb_h, by, r, bx, c)
    tensor: _inv4_2d works on the trailing (r, c) axes, so swap bx<->r
    around it.  Output is the rounded residual ((x + 32) >> 6)."""
    r = (_inv4_2d(d.transpose(0, 1, 3, 2, 4)) + 32) >> 6
    return r.transpose(0, 1, 3, 2, 4)


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


# z-scan of 4x4 luma blocks within a MB (oracle _BLOCK_SCAN): (bx, by)
_I4_SCAN = ((0, 0), (1, 0), (0, 1), (1, 1),
            (2, 0), (3, 0), (2, 1), (3, 1),
            (0, 2), (1, 2), (0, 3), (1, 3),
            (2, 2), (3, 2), (2, 3), (3, 3))
_I4_Z_OF = {bxby: z for z, bxby in enumerate(_I4_SCAN)}
# oracle _I4_MODE_BITS: flag-only vs flag+rem signaling cost proxy
_I4_MODE_BITS = (1, 4)


def _i4_pred_dev(mode: int, t8: jax.Array, l4: jax.Array,
                 c: jax.Array) -> jax.Array:
    """Device twin of the oracle's spec 8.3.1.2 Intra_4x4 predictors
    (io.h264_cavlc._pred_i4), with STATIC mode — each call traces one
    formula vectorized over the leading (mb_h,) axis.  ``t8`` is
    (mb_h, 8) p[0..7, -1] (top-right already substituted), ``l4`` is
    (mb_h, 4), ``c`` (mb_h,).  Returns (mb_h, 4, 4) indexed [y, x].
    All int32 (samples <= 255: every intermediate fits trivially)."""

    def T(i):
        return c if i == -1 else t8[:, i]

    def L(i):
        return c if i == -1 else l4[:, i]

    out = []
    for yy in range(4):
        for xx in range(4):
            if mode == 0:
                e = T(xx)
            elif mode == 1:
                e = L(yy)
            elif mode == 3:
                if xx == 3 and yy == 3:
                    e = (T(6) + 3 * T(7) + 2) >> 2
                else:
                    e = (T(xx + yy) + 2 * T(xx + yy + 1)
                         + T(xx + yy + 2) + 2) >> 2
            elif mode == 4:
                if xx > yy:
                    e = (T(xx - yy - 2) + 2 * T(xx - yy - 1)
                         + T(xx - yy) + 2) >> 2
                elif xx < yy:
                    e = (L(yy - xx - 2) + 2 * L(yy - xx - 1)
                         + L(yy - xx) + 2) >> 2
                else:
                    e = (T(0) + 2 * c + L(0) + 2) >> 2
            elif mode == 5:
                z = 2 * xx - yy
                i = xx - (yy >> 1)
                if z >= 0 and z % 2 == 0:
                    e = (T(i - 1) + T(i) + 1) >> 1
                elif z >= 0:
                    e = (T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2
                elif z == -1:
                    e = (L(0) + 2 * c + T(0) + 2) >> 2
                else:
                    e = (L(yy - 2 * xx - 1) + 2 * L(yy - 2 * xx - 2)
                         + L(yy - 2 * xx - 3) + 2) >> 2
            elif mode == 6:
                z = 2 * yy - xx
                i = yy - (xx >> 1)
                if z >= 0 and z % 2 == 0:
                    e = (L(i - 1) + L(i) + 1) >> 1
                elif z >= 0:
                    e = (L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2
                elif z == -1:
                    e = (L(0) + 2 * c + T(0) + 2) >> 2
                else:
                    e = (T(xx - 2 * yy - 1) + 2 * T(xx - 2 * yy - 2)
                         + T(xx - 2 * yy - 3) + 2) >> 2
            elif mode == 7:
                i = xx + (yy >> 1)
                if yy % 2 == 0:
                    e = (T(i) + T(i + 1) + 1) >> 1
                else:
                    e = (T(i) + 2 * T(i + 1) + T(i + 2) + 2) >> 2
            elif mode == 8:
                z = xx + 2 * yy
                i = yy + (xx >> 1)
                if z < 5 and z % 2 == 0:
                    e = (L(i) + L(i + 1) + 1) >> 1
                elif z < 5:
                    e = (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2
                elif z == 5:
                    e = (L(2) + 3 * L(3) + 2) >> 2
                else:
                    e = L(3)
            else:
                raise ValueError(f"bad device intra4x4 mode {mode}")
            out.append(e)
    return jnp.stack(out, axis=-1).reshape(-1, 4, 4)


def encode_levels(y: jax.Array, cb: jax.Array, cr: jax.Array,
                  qp: jax.Array, full_recon: bool = False,
                  i4: bool = False, chromah: bool = False):
    """Compute the quantized CAVLC levels of one 16-aligned frame with
    one-slice-per-MB-row semantics (top neighbor never available).

    y: (H, W) uint8 with H, W % 16 == 0; cb, cr: (H/2, W/2) uint8;
    qp: scalar int32 in [0, 51] (traced — one compile serves all QPs).

    With ``full_recon`` (static), also returns the full reconstructed
    planes ``(LevelArrays, ry, rcb, rcr)`` — the reference picture the
    GOP encoder's P frames predict from (it stays on device).  The
    default edge-only path is untouched: it reconstructs just the
    right column each scan step (cheaper; the hardware-timed intra
    configuration).
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

    def chroma_from_pred(src: jax.Array, pred: jax.Array):
        """Levels of one 8x8 chroma component given its prediction:
        (czdc raster (mb_h,2,2), cacz (mb_h,2,2,4,4) [by,bx])."""
        res = src - pred
        blk = res.reshape(mb_h, 2, 4, 2, 4)      # (row, by, r, bx, c)
        t = _cf1d(_cf1d(blk, 2), 4)
        cwdc = t[:, :, 0, :, 0]                  # (mb_h, 2, 2) [by, bx]
        acz = _quant(t, mf_c, f_c, qbits_c)
        acz = acz.at[:, :, 0, :, 0].set(0)
        fdc = _h2_2d(cwdc)
        zq = (jnp.abs(fdc) * mf0_c + 2 * f_c) >> (qbits_c + 1)
        czdc = jnp.clip(jnp.sign(fdc) * zq, -_LEVEL_CLAMP, _LEVEL_CLAMP)
        return czdc, acz

    def chroma_mb(src: jax.Array, edge: jax.Array, left_ok: jax.Array,
                  ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """One 8x8 chroma component for all rows (DC prediction):
        returns (czdc raster (mb_h,2,2), cacz (mb_h,2,2,4,4) [by,bx],
        pred plane (mb_h,8,8), unused slot kept for signature)."""
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
        czdc, acz = chroma_from_pred(src, pred)
        return czdc, acz, pred, None

    def chroma_edge(czdc: jax.Array, acz: jax.Array, pred: jax.Array,
                    ) -> jax.Array:
        """Reconstructed right column (mb_h, 8) of one chroma comp."""
        cdcd = _chroma_dc_dequant(_h2_2d(czdc), qpc)    # (mb_h, 2, 2)
        d = (acz[:, :, :, 1, :] * v_c) << (qpc // 6)    # bx=1 blocks
        d = d.at[:, :, 0, 0].set(cdcd[:, :, 1])
        r = (_inv4_2d(d) + 32) >> 6                     # (mb_h, 2, 4, 4)
        col = r[:, :, :, 3] + pred[:, :, 7:8].reshape(mb_h, 2, 4)
        return jnp.clip(col, 0, 255).reshape(mb_h, 8)

    def chroma_full(czdc: jax.Array, acz: jax.Array, pred: jax.Array,
                    ) -> jax.Array:
        """Full 8x8 recon (mb_h, 8, 8) of one chroma comp."""
        cdcd = _chroma_dc_dequant(_h2_2d(czdc), qpc)
        d = (acz * v_c[None, None, :, None, :]) << (qpc // 6)
        d = d.at[:, :, 0, :, 0].set(cdcd)      # DC of each (by, bx)
        r = _inv_blocks(d)                     # (mb_h, by, r, bx, c)
        full = jnp.clip(r + pred.reshape(mb_h, 2, 4, 2, 4), 0, 255)
        return full.reshape(mb_h, 8, 8)

    def _i4_mb(ysrc, y_edge, left_ok, lm4, lis4):
        """Device twin of the oracle Intra_4x4 MB trial
        (io.h264_cavlc._MbEncoder._i4_trial with top_ok=False — the
        one-row-slice contract makes by=0 availability STATIC here):
        16 sub-blocks in z-scan order, per block the best AVAILABLE
        spec mode by ``level_cost + _I4_MODE_BITS``, sequential
        within-MB reconstruction.  Vectorized over MB rows; ``lm4``/
        ``lis4`` carry the left MB's bx=3 modes and is-I4x4 flag for
        the spec 8.3.1.1 predicted-mode rule.  Returns (cost (mb_h,),
        levels-flat (mb_h, 16, 16) raster [by*4+bx] FULL 16-coeff
        blocks, modes z-order (mb_h, 16), recon (mb_h, 16, 16))."""
        big = jnp.int32(1 << 30)
        mbrec = jnp.zeros((mb_h, 16, 16), jnp.int32)
        modes: dict = {}
        zqs: dict = {}
        cost_i4 = jnp.zeros((mb_h,), jnp.int32)
        for z, (bx, by) in enumerate(_I4_SCAN):
            blk = ysrc[:, by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            l4 = (mbrec[:, by * 4:by * 4 + 4, bx * 4 - 1] if bx > 0
                  else y_edge[:, by * 4:by * 4 + 4])
            if by > 0:
                t4 = mbrec[:, by * 4 - 1, bx * 4:bx * 4 + 4]
                if not (bx == 3 or (bx == 1 and by in (1, 3))):
                    t8 = jnp.concatenate(
                        [t4, mbrec[:, by * 4 - 1, bx * 4 + 4:bx * 4 + 8]],
                        axis=1)
                else:       # above-right not yet decoded: p[3, -1]
                    t8 = jnp.concatenate(
                        [t4, jnp.broadcast_to(t4[:, 3:4], (mb_h, 4))],
                        axis=1)
                c_ = (mbrec[:, by * 4 - 1, bx * 4 - 1] if bx > 0
                      else y_edge[:, by * 4 - 1])
            else:
                t8 = jnp.zeros((mb_h, 8), jnp.int32)
                c_ = jnp.zeros((mb_h,), jnp.int32)
            # predicted mode (spec 8.3.1.1; top MB row: other slice)
            if by == 0:
                predm = jnp.full((mb_h,), 2, jnp.int32)
            else:
                mB = modes[(bx, by - 1)]
                if bx > 0:
                    predm = jnp.minimum(modes[(bx - 1, by)], mB)
                else:
                    mA = jnp.where(lis4, lm4[:, by], 2)
                    predm = jnp.where(left_ok,
                                      jnp.minimum(mA, mB), 2)
            cand = ([1, 2, 8] if by == 0 else list(range(9)))
            best_cost = jnp.full((mb_h,), big)
            best_zq = jnp.zeros((mb_h, 4, 4), jnp.int32)
            best_pred = jnp.zeros((mb_h, 4, 4), jnp.int32)
            best_mode = jnp.zeros((mb_h,), jnp.int32)
            for m in cand:
                valid = None
                if m == 2:
                    if by == 0:
                        dc = (jnp.sum(l4, axis=1) + 2) >> 2
                        if bx == 0:
                            dc = jnp.where(left_ok, dc, 128)
                    else:
                        both = (jnp.sum(t8[:, :4], axis=1)
                                + jnp.sum(l4, axis=1) + 4) >> 3
                        if bx == 0:
                            dc = jnp.where(
                                left_ok, both,
                                (jnp.sum(t8[:, :4], axis=1) + 2) >> 2)
                        else:
                            dc = both
                    pred = jnp.broadcast_to(dc[:, None, None],
                                            (mb_h, 4, 4))
                else:
                    pred = _i4_pred_dev(m, t8, l4, c_)
                    if bx == 0 and m in (1, 8, 4, 5, 6):
                        valid = left_ok
                t = _cf1d(_cf1d(blk - pred, 1), 2)
                q = (jnp.abs(t) * mf_y[None] + f_y) >> qbits
                zq = jnp.clip(jnp.sign(t) * q, -_LEVEL_CLAMP,
                              _LEVEL_CLAMP)
                lc = jnp.sum(2 * jnp.abs(zq)
                             + (zq != 0).astype(jnp.int32),
                             axis=(1, 2))
                cm = lc + jnp.where(predm == m, _I4_MODE_BITS[0],
                                    _I4_MODE_BITS[1])
                if valid is not None:
                    cm = jnp.where(valid, cm, big)
                take = cm < best_cost
                best_cost = jnp.where(take, cm, best_cost)
                best_mode = jnp.where(take, m, best_mode)
                best_zq = jnp.where(take[:, None, None], zq, best_zq)
                best_pred = jnp.where(take[:, None, None], pred,
                                      best_pred)
            modes[(bx, by)] = best_mode
            zqs[z] = best_zq
            cost_i4 = cost_i4 + best_cost
            d = (best_zq * v_y[None]) << (qp // 6)  # full block incl DC
            r = (_inv4_2d(d) + 32) >> 6
            mbrec = mbrec.at[:, by * 4:by * 4 + 4,
                             bx * 4:bx * 4 + 4].set(
                jnp.clip(r + best_pred, 0, 255))
        flat = jnp.stack(
            [zqs[_I4_Z_OF[(bxx, byy)]].reshape(mb_h, 16)
             for byy in range(4) for bxx in range(4)],
            axis=1)                              # (mb_h, 16, 16) raster
        zmodes = jnp.stack([modes[_I4_SCAN[z]] for z in range(16)],
                           axis=1)               # z-order
        return cost_i4, flat, zmodes, mbrec

    def step(carry, xs):
        if i4:
            y_edge, cb_edge, cr_edge, lm4, lis4 = carry
        else:
            y_edge, cb_edge, cr_edge = carry      # recon right cols
        ysrc, cbsrc, crsrc, mbx = xs
        left_ok = mbx > 0

        # ---- luma: DC and HORIZONTAL 16x16 candidates from the left
        # edge (top never ok); both predictions are per-row constants,
        # so one (mb_h, 16) row vector covers either.  The cheaper by
        # the shared luma level-cost proxy wins (chroma stays DC, so
        # its terms cancel); imode 2 = DC, 1 = HORIZONTAL.
        def luma_levels(pred_rows):
            res = ysrc - pred_rows[:, :, None]
            blk = res.reshape(mb_h, 4, 4, 4, 4)   # (row, by, r, bx, c)
            t = _cf1d(_cf1d(blk, 2), 4)
            wdc = t[:, :, 0, :, 0]                # (mb_h, 4, 4)
            acz = _quant(t, mf_y, f_y, qbits)
            acz = acz.at[:, :, 0, :, 0].set(0)
            ydc = _h1d(_h1d(wdc, 1), 2) >> 1
            zq = (jnp.abs(ydc) * mf0_y + 2 * f_y) >> (qbits + 1)
            zdc = jnp.clip(jnp.sign(ydc) * zq, -_LEVEL_CLAMP,
                           _LEVEL_CLAMP)
            return zdc, acz

        pred_dc = jnp.where(left_ok,
                            (jnp.sum(y_edge, axis=1) + 8) >> 4, 128)
        pred_dc_rows = jnp.broadcast_to(pred_dc[:, None], (mb_h, 16))
        zdc_d, acz_d = luma_levels(pred_dc_rows)
        zdc_h, acz_h = luma_levels(y_edge)
        cost_d = _cost_of(zdc_d, acz_d)
        cost_h = _cost_of(zdc_h, acz_h)
        use_h = jnp.logical_and(left_ok, cost_h < cost_d)
        zdc = jnp.where(use_h[:, None, None], zdc_h, zdc_d)
        acz = jnp.where(use_h[:, None, None, None, None], acz_h, acz_d)
        pred_rows = jnp.where(use_h[:, None], y_edge, pred_dc_rows)
        imode = jnp.where(use_h, 1, 2).astype(jnp.int16)

        # ---- Intra_4x4 candidate: strictly cheaper than the chosen
        # I_16x16 wins (oracle decision rule, i4cost < lcost)
        if i4:
            cost_i4, i4flat, i4zmodes, i4rec = _i4_mb(
                ysrc, y_edge, left_ok, lm4, lis4)
            cost16 = jnp.where(use_h, cost_h, cost_d)
            use_i4 = cost_i4 < cost16             # (mb_h,)
            imode = jnp.where(use_i4, 0, imode).astype(jnp.int16)
            lm4 = jnp.where(
                use_i4[:, None],
                jnp.stack([i4zmodes[:, _I4_Z_OF[(3, byy)]]
                           for byy in range(4)], axis=1), 2)
            lis4 = use_i4

        # ---- chroma
        czdc_cb, acz_cb, pred_cb, _ = chroma_mb(cbsrc, cb_edge, left_ok)
        czdc_cr, acz_cr, pred_cr, _ = chroma_mb(crsrc, cr_edge, left_ok)
        if chromah:
            # HORIZONTAL candidate (spec 8.3.4.2): pred[y][x] =
            # p[-1, y]; one mode covers both components, +2 for the
            # ue() bit difference, strict less-than keeps DC (oracle
            # decision in io.h264_cavlc chroma_cand)
            pred_cb_h = jnp.broadcast_to(cb_edge[:, :, None],
                                         (mb_h, 8, 8))
            pred_cr_h = jnp.broadcast_to(cr_edge[:, :, None],
                                         (mb_h, 8, 8))
            czdc_cb_h, acz_cb_h = chroma_from_pred(cbsrc, pred_cb_h)
            czdc_cr_h, acz_cr_h = chroma_from_pred(crsrc, pred_cr_h)
            cost_dc = (_cost_of(czdc_cb, acz_cb)
                       + _cost_of(czdc_cr, acz_cr))
            cost_hh = (_cost_of(czdc_cb_h, acz_cb_h)
                       + _cost_of(czdc_cr_h, acz_cr_h))
            use_ch = jnp.logical_and(left_ok, cost_hh + 2 < cost_dc)
            s1 = use_ch[:, None, None]
            s2 = use_ch[:, None, None, None, None]
            czdc_cb = jnp.where(s1, czdc_cb_h, czdc_cb)
            czdc_cr = jnp.where(s1, czdc_cr_h, czdc_cr)
            acz_cb = jnp.where(s2, acz_cb_h, acz_cb)
            acz_cr = jnp.where(s2, acz_cr_h, acz_cr)
            pred_cb = jnp.where(s1, pred_cb_h, pred_cb)
            pred_cr = jnp.where(s1, pred_cr_h, pred_cr)
            cmode = jnp.where(use_ch, 1, 0).astype(jnp.int16)

        dcd = _luma_dc_dequant(_h1d(_h1d(zdc, 1), 2), qp)
        pred_blk = pred_rows.reshape(mb_h, 4, 4)  # (row, by, r)
        if full_recon:
            # ---- full reconstruction (GOP mode: the next frame's
            # reference); the right edges fall out of it for free
            d = (acz * v_y[None, None, :, None, :]) << (qp // 6)
            d = d.at[:, :, 0, :, 0].set(dcd)
            ry_mb = jnp.clip(
                _inv_blocks(d) + pred_blk[:, :, :, None, None],
                0, 255).reshape(mb_h, 16, 16)
            if i4:
                ry_mb = jnp.where(use_i4[:, None, None], i4rec, ry_mb)
            rcb_mb = chroma_full(czdc_cb, acz_cb, pred_cb)
            rcr_mb = chroma_full(czdc_cr, acz_cr, pred_cr)
            y_edge = ry_mb[:, :, 15]
            cb_edge = rcb_mb[:, :, 7]
            cr_edge = rcr_mb[:, :, 7]
        else:
            # ---- reconstruct ONLY the right edge for the next column
            # (prediction is constant along the row for BOTH modes, so
            # the right column's pred is just pred_rows)
            d = (acz[:, :, :, 3, :] * v_y) << (qp // 6)  # bx=3 blocks
            d = d.at[:, :, 0, 0].set(dcd[:, :, 3])
            r = (_inv4_2d(d) + 32) >> 6                  # (mb_h,4,4,4)
            ycol = jnp.clip(r[:, :, :, 3] + pred_blk, 0, 255)
            y_edge = ycol.reshape(mb_h, 16)
            if i4:
                y_edge = jnp.where(use_i4[:, None], i4rec[:, :, 15],
                                   y_edge)
            cb_edge = chroma_edge(czdc_cb, acz_cb, pred_cb)
            cr_edge = chroma_edge(czdc_cr, acz_cr, pred_cr)

        zdc_flat = zdc.reshape(mb_h, 16)
        acz_flat = (acz.transpose(0, 1, 3, 2, 4)  # -> [by, bx, r, c]
                    .reshape(mb_h, 16, 16))
        if i4:
            # I_4x4 MBs have no luma DC block; their acz slots carry
            # the FULL 16-coeff blocks (DC in the raster slot)
            zdc_flat = jnp.where(use_i4[:, None], 0, zdc_flat)
            acz_flat = jnp.where(use_i4[:, None, None], i4flat,
                                 acz_flat)
        out = (zdc_flat.astype(jnp.int16),
               acz_flat.astype(jnp.int16),
               jnp.stack([czdc_cb, czdc_cr], axis=1)
               .reshape(mb_h, 2, 4).astype(jnp.int16),
               jnp.stack(
                   [acz_cb.transpose(0, 1, 3, 2, 4),
                    acz_cr.transpose(0, 1, 3, 2, 4)], axis=1)
               .reshape(mb_h, 2, 4, 16).astype(jnp.int16),
               imode)
        if i4:
            out = out + (jnp.where(use_i4[:, None], i4zmodes, 2)
                         .astype(jnp.int16),)
        if chromah:
            out = out + (cmode,)
        if full_recon:
            out = out + (ry_mb.astype(jnp.uint8),
                         rcb_mb.astype(jnp.uint8),
                         rcr_mb.astype(jnp.uint8))
        carry = ((y_edge, cb_edge, cr_edge, lm4, lis4) if i4
                 else (y_edge, cb_edge, cr_edge))
        return carry, out

    init = (jnp.zeros((mb_h, 16), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32))
    if i4:
        init = init + (jnp.full((mb_h, 4), 2, jnp.int32),
                       jnp.zeros((mb_h,), bool))
    xs = (ycols, cbcols, crcols, jnp.arange(mb_w, dtype=jnp.int32))
    _, outs = jax.lax.scan(step, init, xs, unroll=_scan_unroll())
    # scan stacks on axis 0 = mb_w; entropy wants (mb_h, mb_w, ...)
    lv = LevelArrays(outs[0].transpose(1, 0, 2),
                     outs[1].transpose(1, 0, 2, 3),
                     outs[2].transpose(1, 0, 2, 3),
                     outs[3].transpose(1, 0, 2, 3, 4))
    imode = outs[4].transpose(1, 0)
    nout = 5
    i4modes = None
    cmode = None
    if i4:
        i4modes = outs[nout].transpose(1, 0, 2)
        nout += 1
    if chromah:
        cmode = outs[nout].transpose(1, 0)
        nout += 1
    extra = (((i4modes,) if i4 else ())
             + ((cmode,) if chromah else ()))
    if not full_recon:
        return (lv, imode) + extra
    ry, rcb, rcr = outs[nout], outs[nout + 1], outs[nout + 2]
    full = (lv,
            ry.transpose(1, 2, 0, 3).reshape(H, W),
            rcb.transpose(1, 2, 0, 3).reshape(H // 2, W // 2),
            rcr.transpose(1, 2, 0, 3).reshape(H // 2, W // 2),
            imode)
    return full + extra


encode_levels_jit = jax.jit(encode_levels)
encode_levels_recon_jit = jax.jit(
    lambda y, cb, cr, qp: encode_levels(y, cb, cr, qp, full_recon=True))

INTRA_BIAS = 8  # intra syntax overhead in cost-proxy units (oracle
#                 io.h264_inter._INTRA_BIAS — the two MUST stay equal)


class PLevelArrays(NamedTuple):
    """Per-MB chosen-mode levels of one P frame (raster layouts like
    LevelArrays) plus the mode plane and the full reconstruction.

    mode: (mb_h, mb_w) int16 — 0 P_Skip, 1 P_L0_16x16, 2 I_16x16.
    zdc:  (mb_h, mb_w, 16)      intra luma DC (zeros for inter/skip)
    acz:  (mb_h, mb_w, 16, 16)  intra: AC with DC slot zeroed;
                                inter: FULL 4x4 levels; skip: zeros
    czdc: (mb_h, mb_w, 2, 4)
    cacz: (mb_h, mb_w, 2, 4, 16)
    recon_y/cb/cr: full reconstructed planes (uint8) — the next
        frame's reference; stays on device in the GOP encoder.
    mv:   (mb_h, mb_w, 2) int16 (dy, dx) QUARTER-pel luma MVs from
        the device motion search (None when encoded with search=0 —
        the zero-motion configuration has no MV field to ship).
    ref:  (mb_h, mb_w) int16 per-MB reference index (None unless the
        multi-reference configuration ran).
    """

    mode: jax.Array
    zdc: jax.Array
    acz: jax.Array
    czdc: jax.Array
    cacz: jax.Array
    recon_y: jax.Array
    recon_cb: jax.Array
    recon_cr: jax.Array
    mv: jax.Array | None = None
    ref: jax.Array | None = None
    # partition mode per MB (parts=1 configurations only): 0 P_L0_16x16,
    # 1 P_L0_L0_16x8, 2 P_L0_L0_8x16, 3 P_8x8 — and mv becomes the
    # quadrant-major (mb_h, mb_w, 4, 2) field (see motion_search_mc_parts)
    pmode: jax.Array | None = None


def _base_planes_jax(ry: jax.Array, margin: int,
                     extra: int = 0) -> list[jax.Array]:
    """Device twin of io.h264_inter._base_planes: [G, b, h, j] of
    spec 8.4.2.2.1 over the edge-extended reference, each
    (H+2m+extra, W+2m+extra) int32 (every 6-tap reads the replicated
    extension == the decoder clamping each sample coordinate)."""
    t = (1, -5, 20, 20, -5, 1)
    ext = jnp.pad(ry.astype(jnp.int32), margin + 3 + extra,
                  mode="edge")
    eh, ew = ext.shape
    H, W = ry.shape
    oh = H + 2 * margin + extra
    ow = W + 2 * margin + extra
    o = 3 + extra
    g = ext[o:o + oh, o:o + ow]
    b1 = sum(c * ext[o:o + oh, o - 2 + k:o - 2 + k + ow]
             for k, c in enumerate(t))
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h1f = sum(c * ext[k:eh - 5 + k, :] for k, c in enumerate(t))
    h = jnp.clip((h1f[o - 2:o - 2 + oh, o:o + ow] + 16) >> 5, 0, 255)
    j1 = sum(c * h1f[o - 2:o - 2 + oh, o - 2 + k:o - 2 + k + ow]
             for k, c in enumerate(t))
    j = jnp.clip((j1 + 512) >> 10, 0, 255)
    # uint8 storage: every plane is a clipped pixel value — the search
    # loop re-reads these once per candidate, so narrow storage cuts
    # its HBM traffic 4x vs int32 with identical integer values
    return [g.astype(jnp.uint8), b.astype(jnp.uint8),
            h.astype(jnp.uint8), j.astype(jnp.uint8)]


def halfpel_planes_jax(ry: jax.Array, margin: int) -> jax.Array:
    """The stacked [G, b, h, j] half-sample planes (4, H+2m, W+2m)."""
    return jnp.stack(_base_planes_jax(ry, margin))


def quarterpel_planes_jax(ry: jax.Array, margin: int) -> jax.Array:
    """Device twin of io.h264_inter.quarterpel_planes: all 16
    sub-sample planes in (fy, fx) raster order, stacked
    (16, H+2m, W+2m) — the 12 quarter positions are rounding averages
    of half-sample neighbors (spec 8.4.2.2.1)."""
    g2, b2, h2, j2 = (p.astype(jnp.int32)
                      for p in _base_planes_jax(ry, margin, extra=1))
    G, B = g2[:-1, :-1], b2[:-1, :-1]
    Hh, J = h2[:-1, :-1], j2[:-1, :-1]
    Gr, Gd = g2[:-1, 1:], g2[1:, :-1]
    m_, s_ = h2[:-1, 1:], b2[1:, :-1]
    return jnp.stack([
        G, (G + B + 1) >> 1, B, (Gr + B + 1) >> 1,
        (G + Hh + 1) >> 1, (B + Hh + 1) >> 1, (B + J + 1) >> 1,
        (B + m_ + 1) >> 1,
        Hh, (Hh + J + 1) >> 1, J, (J + m_ + 1) >> 1,
        (Gd + Hh + 1) >> 1, (Hh + s_ + 1) >> 1, (J + s_ + 1) >> 1,
        (m_ + s_ + 1) >> 1,
    ]).astype(jnp.uint8)


@lru_cache(maxsize=None)
def _sad_block_mats(H: int, W: int, b: int):
    """Block-ones matrices for the two-dot MXU SAD reduction:
    ``RB (H/b, H) @ |ad| @ CB (W, W/b)`` equals the block-b SAD field.
    Cached per geometry; returned as numpy so they become compile-time
    constants under jit."""
    cb = np.zeros((W, W // b), np.float32)
    rb = np.zeros((H // b, H), np.float32)
    for j in range(W // b):
        cb[j * b:(j + 1) * b, j] = 1.0
    for i in range(H // b):
        rb[i, i * b:(i + 1) * b] = 1.0
    return rb, cb


def _sad_field(ad: jax.Array, b: int) -> jax.Array:
    """Exact block-``b`` SAD of a flat (H, W) difference via two MXU
    block-ones dots — hardware-measured EXACT and 7x (b=16) / 21x
    (b=8) faster than the VPU window reduce
    (scripts/tpu_r5_mxu_sad.json: sum|vpu-mxu| = 0 over all 289
    full-pel offsets at 1080p).

    Exactness argument (per the measured bf16-split rule, CLAUDE.md /
    scripts/tpu_r2b_lut.json): the inner dot's operands are |ad| <=
    255 (8-bit, bf16-exact) and 0/1 block columns, so the default
    split passes are exact; the outer dot's colsum operand holds up to
    b*255 <= 4080 (12 bits), which needs ``Precision.HIGHEST`` split
    passes (exact for <= 15-bit operands).  Accumulation is f32 and
    every block sum <= 65280 < 2^24, so the cast back to int32 is
    exact.  On CPU both dots are plain f32 FMA over integers < 2^24 —
    exact as well, keeping the TPU/oracle byte-identity contract.
    """
    H, W = ad.shape
    rb, cb = _sad_block_mats(H, W, b)
    a = jnp.abs(ad).astype(jnp.float32)
    return jnp.dot(jnp.asarray(rb), a @ jnp.asarray(cb),
                   precision=jax.lax.Precision.HIGHEST
                   ).astype(jnp.int32)


@lru_cache(maxsize=None)
def _sad_quad_mats(H: int, W: int):
    """Quadrant-split block-ones matrices: even/odd 8-wide halves of
    each 16 block, so each MB-quadrant SAD comes off the MXU as a
    clean (mb_h, mb_w) array with no strided slices (Mosaic/XLA
    relayouts were the measured 22x parts slowdown —
    scripts/tpu_r5_parts_diag.log)."""
    mb_h, mb_w = H // 16, W // 16
    cbe = np.zeros((W, mb_w), np.float32)
    cbo = np.zeros((W, mb_w), np.float32)
    rbe = np.zeros((mb_h, H), np.float32)
    rbo = np.zeros((mb_h, H), np.float32)
    for j in range(mb_w):
        cbe[j * 16:j * 16 + 8, j] = 1.0
        cbo[j * 16 + 8:j * 16 + 16, j] = 1.0
    for i in range(mb_h):
        rbe[i, i * 16:i * 16 + 8] = 1.0
        rbo[i, i * 16 + 8:i * 16 + 16] = 1.0
    return rbe, rbo, cbe, cbo


def _sad_quad_fields(ad: jax.Array):
    """The four MB-quadrant SADs (q0 tl, q1 tr, q2 bl, q3 br), each
    (mb_h, mb_w) int32, via two colsum dots + four tiny row dots on
    the MXU.  Same exactness argument as :func:`_sad_field` (8x8 sums
    <= 16320 < 2^24)."""
    H, W = ad.shape
    rbe, rbo, cbe, cbo = _sad_quad_mats(H, W)
    a = jnp.abs(ad).astype(jnp.float32)
    ce = a @ jnp.asarray(cbe)
    co = a @ jnp.asarray(cbo)
    hp = jax.lax.Precision.HIGHEST
    q0 = jnp.dot(jnp.asarray(rbe), ce, precision=hp).astype(jnp.int32)
    q1 = jnp.dot(jnp.asarray(rbe), co, precision=hp).astype(jnp.int32)
    q2 = jnp.dot(jnp.asarray(rbo), ce, precision=hp).astype(jnp.int32)
    q3 = jnp.dot(jnp.asarray(rbo), co, precision=hp).astype(jnp.int32)
    return q0, q1, q2, q3


def motion_search_mc(y: jax.Array, ry: jax.Array, rcb: jax.Array,
                     rcr: jax.Array, search: int,
                     subpel: int = 0, clean_rows=None):
    """Device-side exhaustive motion search + motion compensation in
    ONE pass over the candidate set: per candidate, the SAD field and
    a running best-key/best-pred update — when the loop ends the
    prediction planes ARE the MC output at the winning MV, with no
    gather and no second sweep.

    ``subpel=0`` searches the full-pel grid (block copies of the
    edge-padded reference); ``subpel=1`` the EXHAUSTIVE half-pel
    lattice over the same window; ``subpel=2`` the full quarter-pel
    lattice: the spec 8.4.2.2.1 sub-sample planes (4 or 16,
    :func:`halfpel_planes_jax` / :func:`quarterpel_planes_jax`) are
    stacked and each candidate is one uniform dynamic-slice of the
    stack — the per-candidate plane index is just the leading slice
    coordinate, so the loop body is IDENTICAL in shape to the full-pel
    one (this flat formulation is what keeps every shift uniform; a
    best-first refinement pass would need per-MB shifts = gathers).

    Chroma uses mvC = mvL in eighth-chroma-sample units: integer part
    ``q >> 3``, fraction ``q & 7`` (∈ {0,2,4,6} at half-pel),
    interpolated with the spec 8.4.2.2.2 bilinear — four static views
    of one dynamic slice, blended with traced int32 weights (which
    collapse to the block copy at zero fractions; identical to the
    oracle io.h264_inter.mc_planes sample for sample).

    Byte-exactness contract with the oracle (io.h264_inter
    .motion_search): identical candidate order
    (io.h264_inter.search_candidates_qpel), identical edge-replicated
    padding (= spec 8.4.2.2.1 reference clipping), identical
    ``sad * SEARCH_KEY_RADIX + index`` packing (SAD <= 65280 < 2^16 so
    the packing is exact in int32; candidate counts bounded by the
    radius validation in search_candidates_qpel).

    Returns (mv (mb_h, mb_w, 2) int32 as (dy, dx) in QUARTER-pel
    units, pred_y, pred_cb, pred_cr int32 planes).
    """
    from opencv_opencl_tpu.io.h264_inter import (
        _BAD_KEY, _MC_ROW_EXT, SEARCH_KEY_RADIX, _plane_index,
        search_candidates_qpel)

    H, W = y.shape
    mb_h, mb_w = H // 16, W // 16
    cands = np.asarray(search_candidates_qpel(search, subpel),
                       np.int32)
    n = len(cands)
    if subpel == 2:
        margin = search + 1
        pstack = quarterpel_planes_jax(ry, margin)
    elif subpel == 1:
        margin = search + 1
        pstack = halfpel_planes_jax(ry, margin)
    else:
        margin = search
        pstack = jnp.pad(ry, search, mode="edge")[None]
    # plane index per candidate over the stack (0 on the full-pel grid)
    pidx = np.asarray(_plane_index(cands[:, 0] & 3, cands[:, 1] & 3,
                                   int(pstack.shape[0])), np.int32)
    # chroma int offset spans +-ceil(search/2), plus one for the
    # bilinear's +1 neighbor
    cs = search // 2 + 1
    pad_cb = jnp.pad(rcb, cs, mode="edge")
    pad_cr = jnp.pad(rcr, cs, mode="edge")
    cur = y.astype(jnp.int16)
    cand_arr = jnp.asarray(cands)
    pidx_arr = jnp.asarray(pidx)
    ch, cw = H // 2, W // 2

    def chroma_pred(pad_c, qy, qx):
        base = jax.lax.dynamic_slice(
            pad_c, (cs + (qy >> 3), cs + (qx >> 3)),
            (ch + 1, cw + 1)).astype(jnp.int32)
        fy = qy & 7
        fx = qx & 7
        wa = (8 - fx) * (8 - fy)
        wb = fx * (8 - fy)
        wc = (8 - fx) * fy
        wd = fx * fy
        return (((wa * base[:ch, :cw] + wb * base[:ch, 1:] +
                  wc * base[1:, :cw] + wd * base[1:, 1:] + 32) >> 6)
                .astype(jnp.uint8))

    def body(i, state):
        best_key, py, pcb, pcr = state
        qy, qx = cand_arr[i, 0], cand_arr[i, 1]
        ref = jax.lax.dynamic_slice(
            pstack, (pidx_arr[i], margin + (qy >> 2),
                     margin + (qx >> 2)), (1, H, W))[0]
        # |diff| <= 255 fits int16; block sums (max 65280) exact via
        # the MXU block-ones dots (see _sad_field)
        sad = _sad_field(cur - ref.astype(jnp.int16), 16)
        key = sad * SEARCH_KEY_RADIX + i
        if clean_rows is not None:
            # GDR clean-region restriction (oracle twin in
            # io.h264_inter.motion_search): refreshed MB rows must not
            # read at or below the wave, interpolation reach included
            rows = jnp.arange(mb_h, dtype=jnp.int32)
            maxrow = (16 * rows + 15 + (qy >> 2)
                      + jnp.asarray(_MC_ROW_EXT, jnp.int32)[qy & 3])
            bad = (rows < clean_rows) & (maxrow > 16 * clean_rows - 1)
            key = jnp.where(bad[:, None], jnp.int32(_BAD_KEY), key)
        take = key < best_key                       # (mb_h, mb_w)
        ty = jnp.repeat(jnp.repeat(take, 16, 0), 16, 1)
        tc = jnp.repeat(jnp.repeat(take, 8, 0), 8, 1)
        return (jnp.minimum(best_key, key),
                jnp.where(ty, ref, py),
                jnp.where(tc, chroma_pred(pad_cb, qy, qx), pcb),
                jnp.where(tc, chroma_pred(pad_cr, qy, qx), pcr))

    init = (jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max, jnp.int32),
            jnp.zeros((H, W), jnp.uint8),
            jnp.zeros((H // 2, W // 2), jnp.uint8),
            jnp.zeros((H // 2, W // 2), jnp.uint8))
    best_key, pred_y, pred_cb, pred_cr = jax.lax.fori_loop(
        0, n, body, init)
    mv = cand_arr[best_key % SEARCH_KEY_RADIX]      # (mb_h, mb_w, 2)
    return mv, pred_y, pred_cb, pred_cr


def motion_search_mc_fast(y: jax.Array, ry: jax.Array, rcb: jax.Array,
                          rcr: jax.Array, search: int,
                          clean_rows=None):
    """Hierarchical quarter-pel search + MC (``fastsub``; oracle:
    io.h264_inter.motion_search_fast — byte-exact decision contract).

    Stage 1 sweeps the exhaustive FULL-pel grid with the usual uniform
    dynamic-slice loop, but carries only the packed selection key (no
    prediction accumulation — the refinement re-reads the winner).

    Stage 2 is the TPU-shaped half of the design: ONE per-MB
    recentering gather pulls a 17x17 patch around each MB's full-pel
    winner out of every spec 8.4.2.2.1 sub-sample plane
    (16, mb_h, mb_w, 17, 17), and then ALL 49 refinement offsets in
    ±3/4 pel become STATIC slices of that tensor — the offset's
    fraction (off & 3 -> plane) and integer part (off >> 2 -> patch
    row/col) are the same for every MB because the full-pel winner
    contributes no fraction.  So the only non-uniform access in the
    whole search is one gather of ~18 frame-equivalents, against
    (8R+1)² - (2R+1)² ~ 3900 (at R=8) uniform full-frame passes the
    exhaustive lattice would spend on the same neighborhood.

    Chroma MC at the winning MV mirrors the oracle's mc_planes
    clipped-gather bilinear (spec 8.4.2.2.2) — per-sample clipping IS
    the edge replication, so no padding is needed.

    Returns (mv (mb_h, mb_w, 2) int32 quarter-pel, pred_y, pred_cb,
    pred_cr uint8 planes) — the motion_search_mc contract.
    """
    from opencv_opencl_tpu.io.h264_inter import (
        _BAD_KEY, _MC_ROW_EXT, FASTSUB_OFFSETS, SEARCH_KEY_RADIX,
        search_candidates_qpel)

    H, W = y.shape
    mb_h, mb_w = H // 16, W // 16
    cands = np.asarray(search_candidates_qpel(search, 0), np.int32)
    n = len(cands)
    pad = jnp.pad(ry, search, mode="edge")
    cur = y.astype(jnp.int16)
    cand_arr = jnp.asarray(cands)
    rows_mb = jnp.arange(mb_h, dtype=jnp.int32)

    def body(i, best_key):
        qy, qx = cand_arr[i, 0], cand_arr[i, 1]
        ref = jax.lax.dynamic_slice(
            pad, (search + (qy >> 2), search + (qx >> 2)), (H, W))
        sad = _sad_field(cur - ref.astype(jnp.int16), 16)
        key = sad * SEARCH_KEY_RADIX + i
        if clean_rows is not None:
            # full-pel candidates: interpolation reach is 0
            maxrow = 16 * rows_mb + 15 + (qy >> 2)
            bad = ((rows_mb < clean_rows)
                   & (maxrow > 16 * clean_rows - 1))
            key = jnp.where(bad[:, None], jnp.int32(_BAD_KEY), key)
        return jnp.minimum(best_key, key)

    init = jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max, jnp.int32)
    best_key = jax.lax.fori_loop(0, n, body, init)
    mv0 = cand_arr[best_key % SEARCH_KEY_RADIX]     # (mb_h, mb_w, 2)
    v = mv0 >> 2                                    # full-pel winner

    margin = search + 1
    planes = quarterpel_planes_jax(ry, margin)
    # the one per-MB gather: 17x17 recentered patches, every plane
    ri = ((margin - 1 + v[:, :, 0]
           + 16 * rows_mb[:, None])[:, :, None]
          + jnp.arange(17, dtype=jnp.int32)[None, None, :])
    ci = ((margin - 1 + v[:, :, 1]
           + 16 * jnp.arange(mb_w, dtype=jnp.int32)[None, :])
          [:, :, None]
          + jnp.arange(17, dtype=jnp.int32)[None, None, :])
    patches = planes[:, ri[:, :, :, None], ci[:, :, None, :]]

    curb = (cur.reshape(mb_h, 16, mb_w, 16)
            .transpose(0, 2, 1, 3))                 # (mb_h, mb_w, 16, 16)
    best_key = jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max,
                        jnp.int32)
    best_pred = jnp.zeros((mb_h, mb_w, 16, 16), jnp.uint8)
    ext = _MC_ROW_EXT
    for j, (qy, qx) in enumerate(FASTSUB_OFFSETS):
        p = (qy & 3) * 4 + (qx & 3)
        oy, ox = (qy >> 2) + 1, (qx >> 2) + 1       # static in {0, 1}
        ref = patches[p, :, :, oy:oy + 16, ox:ox + 16]
        sad = jnp.sum(
            jnp.abs(curb - ref.astype(jnp.int16)).astype(jnp.int32),
            axis=(2, 3))
        key = sad * SEARCH_KEY_RADIX + j
        if clean_rows is not None:
            ty = mv0[:, :, 0] + qy
            maxrow = (16 * rows_mb[:, None] + 15 + (ty >> 2)
                      + int(ext[qy & 3]))
            bad = ((rows_mb[:, None] < clean_rows)
                   & (maxrow > 16 * clean_rows - 1))
            key = jnp.where(bad, jnp.int32(_BAD_KEY), key)
        take = key < best_key
        best_key = jnp.minimum(best_key, key)
        best_pred = jnp.where(take[:, :, None, None], ref, best_pred)
    offs = jnp.asarray(np.asarray(FASTSUB_OFFSETS, np.int32))
    mv = mv0 + offs[best_key % SEARCH_KEY_RADIX]
    pred_y = best_pred.transpose(0, 2, 1, 3).reshape(H, W)

    # chroma MC at the per-MB winner: clipped-gather bilinear, the
    # exact arithmetic of io.h264_inter.mc_planes
    ch, cw = H // 2, W // 2
    cdy = jnp.repeat(jnp.repeat(mv[:, :, 0] >> 3, 8, 0), 8, 1)
    cdx = jnp.repeat(jnp.repeat(mv[:, :, 1] >> 3, 8, 0), 8, 1)
    fy = jnp.repeat(jnp.repeat(mv[:, :, 0] & 7, 8, 0), 8, 1)
    fx = jnp.repeat(jnp.repeat(mv[:, :, 1] & 7, 8, 0), 8, 1)
    rbase = jnp.arange(ch, dtype=jnp.int32)[:, None] + cdy
    cbase = jnp.arange(cw, dtype=jnp.int32)[None, :] + cdx
    r0 = jnp.clip(rbase, 0, ch - 1)
    r1 = jnp.clip(rbase + 1, 0, ch - 1)
    c0 = jnp.clip(cbase, 0, cw - 1)
    c1 = jnp.clip(cbase + 1, 0, cw - 1)
    wa = (8 - fx) * (8 - fy)
    wb = fx * (8 - fy)
    wc = (8 - fx) * fy
    wd = fx * fy

    def chroma_mc(plane):
        p = plane.astype(jnp.int32)
        return (((wa * p[r0, c0] + wb * p[r0, c1] +
                  wc * p[r1, c0] + wd * p[r1, c1] + 32) >> 6)
                .astype(jnp.uint8))

    return mv, pred_y, chroma_mc(rcb), chroma_mc(rcr)


def motion_search_mc_fast_multi(y: jax.Array, refs: list[tuple],
                                search: int):
    """Multi-reference hierarchical quarter-pel search + MC (oracle:
    io.h264_inter.motion_search_fast_multi + mc_planes_multi).  The
    full-pel stage sweeps references ref-major with strict less-than
    (earlier/more recent reference wins ties — motion_search_mc_multi's
    rule), carrying key + ref only; the per-MB recentering gather then
    adds ``best_ref * 16`` to the plane index, and the 49 refinement
    offsets stay STATIC slices exactly as in the single-reference
    :func:`motion_search_mc_fast`.  Chroma gathers from the stacked
    reference planes with the per-MB ref grid (clipped-gather
    bilinear, = mc_planes_multi sample for sample).

    Returns (mv quarter-pel, ref field, pred_y, pred_cb, pred_cr).
    """
    from opencv_opencl_tpu.io.h264_inter import (
        FASTSUB_OFFSETS, SEARCH_KEY_RADIX, search_candidates_qpel)

    H, W = y.shape
    mb_h, mb_w = H // 16, W // 16
    cands = np.asarray(search_candidates_qpel(search, 0), np.int32)
    n = len(cands)
    nrefs = len(refs)
    margin = search + 1
    pstack = jnp.concatenate(
        [quarterpel_planes_jax(r[0], margin) for r in refs])
    cur = y.astype(jnp.int16)
    cand_arr = jnp.asarray(cands)
    rows_mb = jnp.arange(mb_h, dtype=jnp.int32)

    def body(i, state):
        best_key, best_ref = state
        r = i // n
        idx = i % n
        qy, qx = cand_arr[idx, 0], cand_arr[idx, 1]
        # plane r*16 + 0 IS reference r's integer samples
        ref = jax.lax.dynamic_slice(
            pstack, (r * 16, margin + (qy >> 2), margin + (qx >> 2)),
            (1, H, W))[0]
        sad = _sad_field(cur - ref.astype(jnp.int16), 16)
        key = sad * SEARCH_KEY_RADIX + idx
        take = key < best_key
        return (jnp.minimum(best_key, key),
                jnp.where(take, r, best_ref))

    init = (jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max,
                     jnp.int32),
            jnp.zeros((mb_h, mb_w), jnp.int32))
    best_key, best_ref = jax.lax.fori_loop(0, nrefs * n, body, init)
    mv0 = cand_arr[best_key % SEARCH_KEY_RADIX]
    v = mv0 >> 2

    # per-MB recentering gather from the WINNING reference's stack
    ri = ((margin - 1 + v[:, :, 0]
           + 16 * rows_mb[:, None])[:, :, None]
          + jnp.arange(17, dtype=jnp.int32)[None, None, :])
    ci = ((margin - 1 + v[:, :, 1]
           + 16 * jnp.arange(mb_w, dtype=jnp.int32)[None, :])
          [:, :, None]
          + jnp.arange(17, dtype=jnp.int32)[None, None, :])
    pidx = (best_ref[None, :, :] * 16
            + jnp.arange(16, dtype=jnp.int32)[:, None, None])
    patches = pstack[pidx[:, :, :, None, None],
                     ri[None, :, :, :, None],
                     ci[None, :, :, None, :]]

    curb = cur.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3)
    best_key = jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max,
                        jnp.int32)
    best_pred = jnp.zeros((mb_h, mb_w, 16, 16), jnp.uint8)
    for j, (qy, qx) in enumerate(FASTSUB_OFFSETS):
        p = (qy & 3) * 4 + (qx & 3)
        oy, ox = (qy >> 2) + 1, (qx >> 2) + 1
        ref = patches[p, :, :, oy:oy + 16, ox:ox + 16]
        sad = jnp.sum(
            jnp.abs(curb - ref.astype(jnp.int16)).astype(jnp.int32),
            axis=(2, 3))
        key = sad * SEARCH_KEY_RADIX + j
        take = key < best_key
        best_key = jnp.minimum(best_key, key)
        best_pred = jnp.where(take[:, :, None, None], ref, best_pred)
    offs = jnp.asarray(np.asarray(FASTSUB_OFFSETS, np.int32))
    mv = mv0 + offs[best_key % SEARCH_KEY_RADIX]
    pred_y = best_pred.transpose(0, 2, 1, 3).reshape(H, W)

    ch, cw = H // 2, W // 2
    rg = jnp.repeat(jnp.repeat(best_ref, 8, 0), 8, 1)
    cdy = jnp.repeat(jnp.repeat(mv[:, :, 0] >> 3, 8, 0), 8, 1)
    cdx = jnp.repeat(jnp.repeat(mv[:, :, 1] >> 3, 8, 0), 8, 1)
    fy = jnp.repeat(jnp.repeat(mv[:, :, 0] & 7, 8, 0), 8, 1)
    fx = jnp.repeat(jnp.repeat(mv[:, :, 1] & 7, 8, 0), 8, 1)
    rbase = jnp.arange(ch, dtype=jnp.int32)[:, None] + cdy
    cbase = jnp.arange(cw, dtype=jnp.int32)[None, :] + cdx
    r0 = jnp.clip(rbase, 0, ch - 1)
    r1 = jnp.clip(rbase + 1, 0, ch - 1)
    c0 = jnp.clip(cbase, 0, cw - 1)
    c1 = jnp.clip(cbase + 1, 0, cw - 1)
    wa = (8 - fx) * (8 - fy)
    wb = fx * (8 - fy)
    wc = (8 - fx) * fy
    wd = fx * fy

    def chroma_mc(idx: int):
        p = jnp.stack([r[idx] for r in refs]).astype(jnp.int32)
        return (((wa * p[rg, r0, c0] + wb * p[rg, r0, c1] +
                  wc * p[rg, r1, c0] + wd * p[rg, r1, c1] + 32) >> 6)
                .astype(jnp.uint8))

    return mv, best_ref, pred_y, chroma_mc(1), chroma_mc(2)


def motion_search_mc_parts(y: jax.Array, ry: jax.Array, rcb: jax.Array,
                           rcr: jax.Array, search: int, subpel: int,
                           qp: jax.Array, refs2: tuple | None = None):
    """Device twin of io.h264_inter.motion_search_parts + the block-8
    mc_planes: one sweep over the shared candidate order accumulates
    8x8-granular SAD minima (four running keys: quadrants, 16x8
    halves, 8x16 halves, whole MB — each ``sad * SEARCH_KEY_RADIX +
    idx``), the partition mode minimizes ``SAD + PART_LAMBDA[qp] *
    extra_mvs`` with coarser-partition tie preference, and ONE
    per-quadrant recentering gather assembles the prediction planes
    (the fastsub patch-gather pattern at 8x8 granularity; chroma is
    the clipped-gather spec 8.4.2.2.2 bilinear at 4x4 granularity).

    With ``refs2 = (ry2, rcb2, rcr2)`` the sweep runs ref-major over
    BOTH references' plane stacks (flat index i = r * n + idx, like
    the oracle motion_search_parts_multi: at equal SAD the earlier
    reference wins), so each hypothesis key's winner carries its own
    (ref, mv) and per-PARTITION reference indices fall out of the
    same nine minima.

    Returns ``(pmode (mb_h, mb_w) int32, mv4 (mb_h, mb_w, 4, 2) int32
    quarter-pel quadrant-major, ref4 ((mb_h, mb_w, 4) int32 or None),
    pred_y, pred_cb, pred_cr uint8)`` — byte-exact decision +
    prediction twin of the oracle (part of the stream byte-identity
    contract).
    """
    from opencv_opencl_tpu.io.h264_inter import (
        PART_LAMBDA, SEARCH_KEY_RADIX, _plane_index,
        search_candidates_qpel)

    H, W = y.shape
    mb_h, mb_w = H // 16, W // 16
    cands = np.asarray(search_candidates_qpel(search, subpel),
                       np.int32)
    n = len(cands)
    nrefs = 2 if refs2 is not None else 1
    if nrefs * n > SEARCH_KEY_RADIX:
        raise ValueError(
            f"parts refs={nrefs} at this sub-pel radius exceeds the "
            f"key packing ({nrefs}*{n} > {SEARCH_KEY_RADIX}); "
            "quarter-pel parts with 2 references needs R <= 7")
    ry_list = [ry] + ([refs2[0]] if refs2 is not None else [])
    if subpel == 2:
        margin = search + 1
        pstack = jnp.concatenate(
            [quarterpel_planes_jax(r, margin) for r in ry_list])
    elif subpel == 1:
        margin = search + 1
        pstack = jnp.concatenate(
            [halfpel_planes_jax(r, margin) for r in ry_list])
    else:
        margin = search
        pstack = jnp.concatenate(
            [jnp.pad(r, search, mode="edge")[None] for r in ry_list])
    P = int(pstack.shape[0]) // nrefs
    pidx = np.asarray(_plane_index(cands[:, 0] & 3, cands[:, 1] & 3,
                                   P), np.int32)
    cur = y.astype(jnp.int16)
    cand_arr = jnp.asarray(cands)
    pidx_arr = jnp.asarray(pidx)
    R = SEARCH_KEY_RADIX

    # Layout note (measured on hardware, scripts/tpu_r5_parts_diag):
    # an interleaved (mb_h, 2, 8, mb_w, 2, 8) SAD reduce costs 15x the
    # (mb_h, 16, mb_w, 16) one, and per-iteration sums over the tiny
    # interleaved key arrays another ~300 ms/frame — all relayouts.
    # So the loop carries NINE clean (mb_h, mb_w) int32 keys (four
    # quadrants, four halves, whole MB); each quadrant SAD comes off
    # the MXU via the quadrant-split block-ones dots (_sad_quad_fields
    # — hardware-measured 21x over the VPU 8x8 window reduce,
    # scripts/tpu_r5_mxu_sad.json); the halves/whole are plain adds.
    def body(i, st):
        kq0, kq1, kq2, kq3, kh0, kh1, kv0, kv1, kf = st
        idx = i % n
        qy, qx = cand_arr[idx, 0], cand_arr[idx, 1]
        ref = jax.lax.dynamic_slice(
            pstack, ((i // n) * P + pidx_arr[idx],
                     margin + (qy >> 2),
                     margin + (qx >> 2)), (1, H, W))[0]
        ad = cur - ref.astype(jnp.int16)
        # |diff| <= 255; 8x8 sums <= 16320 (int32 keys stay exact:
        # whole-MB sum 65280 * 8192 + idx < 2^31, the existing bound)
        q0, q1, q2, q3 = _sad_quad_fields(ad)
        h0, h1 = q0 + q1, q2 + q3
        v0, v1 = q0 + q2, q1 + q3
        return (jnp.minimum(kq0, q0 * R + i),
                jnp.minimum(kq1, q1 * R + i),
                jnp.minimum(kq2, q2 * R + i),
                jnp.minimum(kq3, q3 * R + i),
                jnp.minimum(kh0, h0 * R + i),
                jnp.minimum(kh1, h1 * R + i),
                jnp.minimum(kv0, v0 * R + i),
                jnp.minimum(kv1, v1 * R + i),
                jnp.minimum(kf, (h0 + h1) * R + i))

    big = jnp.iinfo(jnp.int32).max
    init = tuple(jnp.full((mb_h, mb_w), big, jnp.int32)
                 for _ in range(9))
    kq0, kq1, kq2, kq3, kh0, kh1, kv0, kv1, kf = jax.lax.fori_loop(
        0, nrefs * n, body, init)
    # reassemble the interleaved hypothesis-key tensors the decision
    # and the oracle twin speak (one-time, outside the loop)
    kq = jnp.stack([jnp.stack([kq0, kq1], -1),
                    jnp.stack([kq2, kq3], -1)], 1)  # (mb_h,2,mb_w,2)
    kh = jnp.stack([kh0, kh1], 1)                   # (mb_h, 2, mb_w)
    kv = jnp.stack([kv0, kv1], -1)                  # (mb_h, mb_w, 2)

    lam = jnp.asarray(np.asarray(PART_LAMBDA, np.int32)
                      )[jnp.clip(qp, 0, 51)]
    cost_f = kf // R
    cost_h = jnp.sum(kh // R, axis=1) + lam
    cost_v = jnp.sum(kv // R, axis=2) + lam
    cost_q = jnp.sum(kq // R, axis=(1, 3)) + 3 * lam
    pmode = jnp.zeros((mb_h, mb_w), jnp.int32)
    best = cost_f
    for m, c in ((1, cost_h), (2, cost_v), (3, cost_q)):
        take = c < best                 # strict: ties keep coarser
        pmode = jnp.where(take, m, pmode)
        best = jnp.where(take, c, best)
    # per-quadrant chosen candidate index on the (mb_h, 2, mb_w, 2)
    # quadrant grid, selected by partition mode
    pm4 = pmode[:, None, :, None]
    iq = jnp.where(
        pm4 == 0,
        jnp.broadcast_to((kf % R)[:, None, :, None],
                         (mb_h, 2, mb_w, 2)),
        jnp.where(pm4 == 1,
                  jnp.broadcast_to((kh % R)[:, :, :, None],
                                   (mb_h, 2, mb_w, 2)),
                  jnp.where(pm4 == 2,
                            jnp.broadcast_to((kv % R)[:, None, :, :],
                                             (mb_h, 2, mb_w, 2)),
                            kq % R)))
    # quadrant-major (q0 tl, q1 tr, q2 bl, q3 br) per-MB fields; iq
    # carries the FLAT index (ref * n + idx)
    iq4 = iq.transpose(0, 2, 1, 3).reshape(mb_h, mb_w, 4)
    mv4 = cand_arr[iq4 % n]
    ref4 = (iq4 // n) if nrefs > 1 else None

    # ---- MC at quadrant granularity (oracle: mc_planes block=8): a
    # SECOND uniform-dynamic-slice sweep selecting each quadrant's
    # pixels where its chosen candidate comes up — gathers are far
    # slower than n more uniform passes on this hardware (measured:
    # the per-quadrant patch gather cost 735 ms/frame at 1080p R=8)
    iq8 = iq.reshape(2 * mb_h, 2 * mb_w)
    cs = search // 2 + 1
    rcb_list = [rcb] + ([refs2[1]] if refs2 is not None else [])
    rcr_list = [rcr] + ([refs2[2]] if refs2 is not None else [])
    pad_cb = jnp.stack([jnp.pad(c, cs, mode="edge") for c in rcb_list])
    pad_cr = jnp.stack([jnp.pad(c, cs, mode="edge") for c in rcr_list])
    ch, cw = H // 2, W // 2

    def chroma_pred(pad_c, r, qy, qx):
        base = jax.lax.dynamic_slice(
            pad_c, (r, cs + (qy >> 3), cs + (qx >> 3)),
            (1, ch + 1, cw + 1))[0].astype(jnp.int32)
        fy = qy & 7
        fx = qx & 7
        wa = (8 - fx) * (8 - fy)
        wb = fx * (8 - fy)
        wc = (8 - fx) * fy
        wd = fx * fy
        return (((wa * base[:ch, :cw] + wb * base[:ch, 1:] +
                  wc * base[1:, :cw] + wd * base[1:, 1:] + 32) >> 6)
                .astype(jnp.uint8))

    def body_mc(i, st):
        py, pcb, pcr = st
        r = i // n
        idx = i % n
        qy, qx = cand_arr[idx, 0], cand_arr[idx, 1]
        ref = jax.lax.dynamic_slice(
            pstack, (r * P + pidx_arr[idx], margin + (qy >> 2),
                     margin + (qx >> 2)), (1, H, W))[0]
        take = iq8 == i                     # (2mb_h, 2mb_w)
        ty = jnp.repeat(jnp.repeat(take, 8, 0), 8, 1)
        tc = jnp.repeat(jnp.repeat(take, 4, 0), 4, 1)
        return (jnp.where(ty, ref, py),
                jnp.where(tc, chroma_pred(pad_cb, r, qy, qx), pcb),
                jnp.where(tc, chroma_pred(pad_cr, r, qy, qx), pcr))

    pred_y, pred_cb, pred_cr = jax.lax.fori_loop(
        0, nrefs * n, body_mc,
        (jnp.zeros((H, W), jnp.uint8),
         jnp.zeros((ch, cw), jnp.uint8),
         jnp.zeros((ch, cw), jnp.uint8)))
    return pmode, mv4, ref4, pred_y, pred_cb, pred_cr


def _cost_of(*arrays):
    """CAVLC bit-cost proxy: sum of 2|l| + (l != 0) over every
    coefficient, reduced over all but the leading MB-row axis — MUST
    match the oracle's io.h264_inter._cost exactly (the mode decision
    is part of the byte-exactness contract)."""
    total = 0
    for a in arrays:
        aa = jnp.abs(a)
        total = total + jnp.sum(2 * aa + (aa != 0).astype(jnp.int32),
                                axis=tuple(range(1, a.ndim)))
    return total


def motion_search_mc_multi(y: jax.Array, refs: list[tuple],
                           search: int, subpel: int):
    """Multi-reference device search+MC: references are searched in
    list order as a FLAT candidate sequence (ref-major, matching the
    oracle io.h264_inter.motion_search_multi: i = r * n + idx, strict
    less-than — at equal (sad, idx) the earlier/more recent reference
    wins), over per-reference sub-pel plane stacks concatenated on the
    leading axis (plane id = r * P + sub-position, so each candidate
    stays one uniform dynamic-slice).  Chroma stacks the padded
    reference planes the same way.

    Returns (mv quarter-pel, ref field, pred_y, pred_cb, pred_cr).
    """
    from opencv_opencl_tpu.io.h264_inter import (
        SEARCH_KEY_RADIX, _plane_index, search_candidates_qpel)

    H, W = y.shape
    mb_h, mb_w = H // 16, W // 16
    cands = np.asarray(search_candidates_qpel(search, subpel),
                       np.int32)
    n = len(cands)
    nrefs = len(refs)
    if subpel == 2:
        margin = search + 1
        stacks = [quarterpel_planes_jax(r[0], margin) for r in refs]
    elif subpel == 1:
        margin = search + 1
        stacks = [halfpel_planes_jax(r[0], margin) for r in refs]
    else:
        margin = search
        stacks = [jnp.pad(r[0], search, mode="edge")[None]
                  for r in refs]
    P = int(stacks[0].shape[0])
    pstack = jnp.concatenate(stacks)
    cs = search // 2 + 1
    pad_cb = jnp.stack([jnp.pad(r[1], cs, mode="edge") for r in refs])
    pad_cr = jnp.stack([jnp.pad(r[2], cs, mode="edge") for r in refs])
    cur = y.astype(jnp.int16)
    cand_arr = jnp.asarray(cands)
    base_pidx = np.asarray(
        _plane_index(cands[:, 0] & 3, cands[:, 1] & 3, P), np.int32)
    pidx_arr = jnp.asarray(base_pidx)
    ch, cw = H // 2, W // 2

    def chroma_pred(pad_c, r, qy, qx):
        base = jax.lax.dynamic_slice(
            pad_c, (r, cs + (qy >> 3), cs + (qx >> 3)),
            (1, ch + 1, cw + 1))[0].astype(jnp.int32)
        fy = qy & 7
        fx = qx & 7
        wa = (8 - fx) * (8 - fy)
        wb = fx * (8 - fy)
        wc = (8 - fx) * fy
        wd = fx * fy
        return (((wa * base[:ch, :cw] + wb * base[:ch, 1:] +
                  wc * base[1:, :cw] + wd * base[1:, 1:] + 32) >> 6)
                .astype(jnp.uint8))

    def body(i, state):
        best_key, best_ref, py, pcb, pcr = state
        r = i // n
        idx = i % n
        qy, qx = cand_arr[idx, 0], cand_arr[idx, 1]
        ref = jax.lax.dynamic_slice(
            pstack, (r * P + pidx_arr[idx], margin + (qy >> 2),
                     margin + (qx >> 2)), (1, H, W))[0]
        sad = _sad_field(cur - ref.astype(jnp.int16), 16)
        key = sad * SEARCH_KEY_RADIX + idx
        take = key < best_key
        ty = jnp.repeat(jnp.repeat(take, 16, 0), 16, 1)
        tc = jnp.repeat(jnp.repeat(take, 8, 0), 8, 1)
        return (jnp.minimum(best_key, key),
                jnp.where(take, r, best_ref),
                jnp.where(ty, ref, py),
                jnp.where(tc, chroma_pred(pad_cb, r, qy, qx), pcb),
                jnp.where(tc, chroma_pred(pad_cr, r, qy, qx), pcr))

    init = (jnp.full((mb_h, mb_w), jnp.iinfo(jnp.int32).max, jnp.int32),
            jnp.zeros((mb_h, mb_w), jnp.int32),
            jnp.zeros((H, W), jnp.uint8),
            jnp.zeros((H // 2, W // 2), jnp.uint8),
            jnp.zeros((H // 2, W // 2), jnp.uint8))
    best_key, best_ref, pred_y, pred_cb, pred_cr = jax.lax.fori_loop(
        0, nrefs * n, body, init)
    mv = cand_arr[best_key % SEARCH_KEY_RADIX]
    return mv, best_ref, pred_y, pred_cb, pred_cr


def encode_p_levels(y: jax.Array, cb: jax.Array, cr: jax.Array,
                    ry: jax.Array, rcb: jax.Array, rcr: jax.Array,
                    qp: jax.Array, search: int = 0,
                    subpel: int = 0,
                    ry2: jax.Array | None = None,
                    rcb2: jax.Array | None = None,
                    rcr2: jax.Array | None = None,
                    gdr_band: tuple | None = None,
                    parts: int = 0) -> PLevelArrays:
    """Levels + mode decisions + reconstruction of one P frame with one
    slice per MB row (oracle: io.h264_inter.encode_frame_p_slices at
    slices=mb_h; byte-identity proven in tests/test_h264_inter_tpu.py).

    y: (H, W) uint8 16-aligned source; cb/cr: (H/2, W/2) uint8;
    ry/rcb/rcr: reconstructed previous picture (uint8, same shapes —
    what this function or encode_levels(full_recon=True) returned);
    qp: traced scalar int32; search: static motion search radius in
    pixels (0 = zero-motion); subpel: static — 0 full-pel grid,
    1 exhaustive half-pel lattice, 2 exhaustive quarter-pel lattice
    (see :func:`motion_search_mc`).

    Structure: the inter candidate is PURE elementwise work (prediction
    reads the previous picture — with search, the MC planes — never
    spatial neighbors); only the intra candidate's left-edge prediction
    forces the scan over MB columns.  The mode decision stays
    raster-free with motion because P_Skip is restricted to
    mv == (0, 0) (== the skip MV predictor when the top neighbor is in
    another slice), so the coded MV field always equals the searched
    field and mvd becomes a pure host entropy-stage function.
    All int32 VPU arithmetic, like the intra program.
    """
    H, W = y.shape
    if H % 16 or W % 16:
        raise ValueError("encode_p_levels requires 16-aligned frames")
    mb_h, mb_w = H // 16, W // 16
    qp = jnp.asarray(qp, jnp.int32)
    qpc = jnp.asarray(_QPC_TAB)[jnp.clip(qp, 0, 51)]

    refsel = None
    pmode_f = None
    if gdr_band is not None and ry2 is not None:
        raise ValueError("gdr_band does not compose with two "
                         "references")
    if parts:
        # sub-16x16 partitions (static config): same composition
        # limits as the oracle (encode_frame_p_slices parts=True)
        if not search:
            raise ValueError("parts requires search=R > 0")
        if subpel == 3:
            raise ValueError("parts does not compose with fastsub")
        if gdr_band is not None:
            raise ValueError("parts requires no gdr")
        refs2 = (None if ry2 is None else (ry2, rcb2, rcr2))
        pmode_f, mv, ref4, pred_y, pred_cb, pred_cr = (
            motion_search_mc_parts(y, ry, rcb, rcr, search, subpel,
                                   qp, refs2=refs2))
        # P_Skip needs the whole-MB hypothesis at (0, 0) on ref 0
        mv_zero = ((pmode_f == 0) & (mv[:, :, 0, 0] == 0)
                   & (mv[:, :, 0, 1] == 0))
        if ref4 is not None:
            refsel = ref4              # (mb_h, mb_w, 4) quadrant refs
            mv_zero = mv_zero & (ref4[:, :, 0] == 0)
    elif search and ry2 is not None:
        # two-reference search: P_Skip additionally requires ref 0
        if subpel == 3:
            mv, refsel, pred_y, pred_cb, pred_cr = (
                motion_search_mc_fast_multi(
                    y, [(ry, rcb, rcr), (ry2, rcb2, rcr2)], search))
        else:
            mv, refsel, pred_y, pred_cb, pred_cr = (
                motion_search_mc_multi(
                    y, [(ry, rcb, rcr), (ry2, rcb2, rcr2)], search,
                    subpel))
        mv_zero = ((mv[:, :, 0] == 0) & (mv[:, :, 1] == 0)
                   & (refsel == 0))
    elif search and subpel == 3:
        # hierarchical quarter-pel (fastsub): full-pel sweep + one
        # per-MB recentering gather + 49 static refinement slices
        mv, pred_y, pred_cb, pred_cr = motion_search_mc_fast(
            y, ry, rcb, rcr, search,
            clean_rows=None if gdr_band is None
            else jnp.asarray(gdr_band[0], jnp.int32))
        mv_zero = (mv[:, :, 0] == 0) & (mv[:, :, 1] == 0)
    elif search:
        mv, pred_y, pred_cb, pred_cr = motion_search_mc(
            y, ry, rcb, rcr, search, subpel,
            clean_rows=None if gdr_band is None
            else jnp.asarray(gdr_band[0], jnp.int32))
        mv_zero = (mv[:, :, 0] == 0) & (mv[:, :, 1] == 0)
    else:
        mv = None
        pred_y, pred_cb, pred_cr = ry, rcb, rcr
        mv_zero = jnp.ones((mb_h, mb_w), bool)

    # GDR refresh band (io.h264_inter GopCavlcEncoder gdr=N): MB rows
    # in [lo, hi) are forced intra — the marching wave; traced scalars
    # so the band position moves every frame without recompiling
    band = None
    if gdr_band is not None:
        lo, hi = gdr_band
        rows = jnp.arange(mb_h, dtype=jnp.int32)
        band = (rows >= jnp.asarray(lo, jnp.int32)) & (
            rows < jnp.asarray(hi, jnp.int32))

    mf_y = jnp.asarray(_MF_TAB)[qp % 6][jnp.asarray(_POS_CLASS)]
    mf_c = jnp.asarray(_MF_TAB)[qpc % 6][jnp.asarray(_POS_CLASS)]
    v_y = jnp.asarray(_V_TAB)[qp % 6][jnp.asarray(_POS_CLASS)]
    v_c = jnp.asarray(_V_TAB)[qpc % 6][jnp.asarray(_POS_CLASS)]
    qbits = 15 + qp // 6
    qbits_c = 15 + qpc // 6
    f_y_i = (1 << qbits) // 3           # intra rounding offset
    f_c_i = (1 << qbits_c) // 3
    f_y_p = (1 << qbits) // 6           # inter rounding offset
    f_c_p = (1 << qbits_c) // 6
    mf0_y = jnp.asarray(_MF_TAB)[qp % 6][0]
    mf0_c = jnp.asarray(_MF_TAB)[qpc % 6][0]

    def cols(a, n):
        return (a.reshape(mb_h, n, mb_w, n).transpose(2, 0, 1, 3)
                .astype(jnp.int32))

    ycols, cbcols, crcols = cols(y, 16), cols(cb, 8), cols(cr, 8)
    rycols, rcbcols, rcrcols = (cols(pred_y, 16), cols(pred_cb, 8),
                                cols(pred_cr, 8))
    mvzcols = mv_zero.transpose(1, 0)          # (mb_w, mb_h)

    def chroma_intra(srcmb, edge, left_ok):
        v0 = (jnp.sum(edge[:, 0:4], axis=1) + 2) >> 2
        v1 = (jnp.sum(edge[:, 4:8], axis=1) + 2) >> 2
        v0 = jnp.where(left_ok, v0, 128)
        v1 = jnp.where(left_ok, v1, 128)
        pred = jnp.concatenate(
            [jnp.broadcast_to(v0[:, None, None], (mb_h, 4, 8)),
             jnp.broadcast_to(v1[:, None, None], (mb_h, 4, 8))], axis=1)
        res = srcmb - pred
        t = _cf1d(_cf1d(res.reshape(mb_h, 2, 4, 2, 4), 2), 4)
        cwdc = t[:, :, 0, :, 0]
        acz = _quant(t, mf_c, f_c_i, qbits_c)
        acz = acz.at[:, :, 0, :, 0].set(0)
        fdc = _h2_2d(cwdc)
        zq = (jnp.abs(fdc) * mf0_c + 2 * f_c_i) >> (qbits_c + 1)
        czdc = jnp.clip(jnp.sign(fdc) * zq, -_LEVEL_CLAMP, _LEVEL_CLAMP)
        return czdc, acz, pred

    def chroma_inter(srcmb, refmb):
        res = srcmb - refmb
        t = _cf1d(_cf1d(res.reshape(mb_h, 2, 4, 2, 4), 2), 4)
        cwdc = t[:, :, 0, :, 0]
        acz = _quant(t, mf_c, f_c_p, qbits_c)
        acz = acz.at[:, :, 0, :, 0].set(0)
        fdc = _h2_2d(cwdc)
        zq = (jnp.abs(fdc) * mf0_c + 2 * f_c_p) >> (qbits_c + 1)
        czdc = jnp.clip(jnp.sign(fdc) * zq, -_LEVEL_CLAMP, _LEVEL_CLAMP)
        return czdc, acz

    def chroma_recon(czdc, acz, pred):
        cdcd = _chroma_dc_dequant(_h2_2d(czdc), qpc)
        d = (acz * v_c[None, None, :, None, :]) << (qpc // 6)
        d = d.at[:, :, 0, :, 0].set(cdcd)
        full = jnp.clip(_inv_blocks(d) + pred.reshape(mb_h, 2, 4, 2, 4),
                        0, 255)
        return full.reshape(mb_h, 8, 8)

    def step(carry, xs):
        y_edge, cb_edge, cr_edge = carry
        ysrc, cbsrc, crsrc, yref, cbref, crref, mvz, mbx = xs
        left_ok = mbx > 0

        # ---------- intra candidates (identical math to encode_levels)
        # DC, plus HORIZONTAL when the left recon column exists — the
        # cheaper of the two by the shared luma level-cost proxy wins
        # (chroma prediction stays DC for both, so chroma terms cancel)
        def intra_luma(pred_full):
            t_i = _cf1d(_cf1d((ysrc - pred_full)
                              .reshape(mb_h, 4, 4, 4, 4), 2), 4)
            wdc = t_i[:, :, 0, :, 0]
            acz = _quant(t_i, mf_y, f_y_i, qbits)
            acz = acz.at[:, :, 0, :, 0].set(0)
            ydc = _h1d(_h1d(wdc, 1), 2) >> 1
            zq = (jnp.abs(ydc) * mf0_y + 2 * f_y_i) >> (qbits + 1)
            zdc = jnp.clip(jnp.sign(ydc) * zq, -_LEVEL_CLAMP,
                           _LEVEL_CLAMP)
            return zdc, acz

        ipred_dc = jnp.where(left_ok,
                             (jnp.sum(y_edge, axis=1) + 8) >> 4, 128)
        pred_dc_full = jnp.broadcast_to(ipred_dc[:, None, None],
                                        (mb_h, 16, 16))
        zdc_d, acz_d = intra_luma(pred_dc_full)
        pred_h_full = jnp.broadcast_to(y_edge[:, :, None],
                                       (mb_h, 16, 16))
        zdc_h, acz_h = intra_luma(pred_h_full)
        cost_d = _cost_of(zdc_d, acz_d)
        cost_h = _cost_of(zdc_h, acz_h)
        use_h = jnp.logical_and(left_ok, cost_h < cost_d)
        uh4 = use_h[:, None, None, None, None]
        zdc_i = jnp.where(use_h[:, None, None], zdc_h, zdc_d)
        acz_i = jnp.where(uh4, acz_h, acz_d)
        ipred_full = jnp.where(use_h[:, None, None], pred_h_full,
                               pred_dc_full)
        czdc_cb_i, cacz_cb_i, pred_cb_i = chroma_intra(
            cbsrc, cb_edge, left_ok)
        czdc_cr_i, cacz_cr_i, pred_cr_i = chroma_intra(
            crsrc, cr_edge, left_ok)

        # ---------- inter candidate (pure elementwise vs reference)
        t_p = _cf1d(_cf1d((ysrc - yref).reshape(mb_h, 4, 4, 4, 4),
                          2), 4)
        lz = _quant(t_p, mf_y, f_y_p, qbits)    # full blocks, DC incl.
        czdc_cb_p, cacz_cb_p = chroma_inter(cbsrc, cbref)
        czdc_cr_p, cacz_cr_p = chroma_inter(crsrc, crref)

        # ---------- decision (oracle order: skip first, then cost);
        # skip additionally requires mv == (0,0) — the skip MV
        # predictor with one slice per MB row (spec 8.4.1.1, B in
        # another slice); mvz is constant-True at search=0
        cost_p = _cost_of(lz, czdc_cb_p, czdc_cr_p, cacz_cb_p, cacz_cr_p)
        cost_i = _cost_of(zdc_i, acz_i, czdc_cb_i, czdc_cr_i,
                          cacz_cb_i, cacz_cr_i) + INTRA_BIAS
        skip = jnp.logical_and(cost_p == 0, mvz)
        use_intra = jnp.logical_and(~skip, cost_i < cost_p)
        if band is not None:  # GDR wave rows: intra regardless of cost
            skip = jnp.logical_and(skip, ~band)
            use_intra = jnp.logical_or(use_intra, band)
        # intra mode value: 2 = I_16x16 DC, 3 = I_16x16 HORIZONTAL
        mode = jnp.where(skip, 0,
                         jnp.where(use_intra,
                                   jnp.where(use_h, 3, 2), 1)
                         ).astype(jnp.int16)

        # ---------- reconstructions of both candidates
        dcd = _luma_dc_dequant(_h1d(_h1d(zdc_i, 1), 2), qp)
        d_i = (acz_i * v_y[None, None, :, None, :]) << (qp // 6)
        d_i = d_i.at[:, :, 0, :, 0].set(dcd)
        ipred_blk = ipred_full.reshape(mb_h, 4, 4, 4, 4)
        recon_y_i = jnp.clip(_inv_blocks(d_i) + ipred_blk, 0, 255)
        d_p = (lz * v_y[None, None, :, None, :]) << (qp // 6)
        recon_y_p = jnp.clip(
            _inv_blocks(d_p) + yref.reshape(mb_h, 4, 4, 4, 4), 0, 255)

        m4 = mode.astype(jnp.int32)[:, None, None, None, None]
        recon_y_mb = jnp.where(
            m4 >= 2, recon_y_i,
            jnp.where(m4 == 1, recon_y_p,
                      yref.reshape(mb_h, 4, 4, 4, 4))
        ).reshape(mb_h, 16, 16)       # (by, r, bx, c) merges to 16x16

        recon_cb_i = chroma_recon(czdc_cb_i, cacz_cb_i, pred_cb_i)
        recon_cr_i = chroma_recon(czdc_cr_i, cacz_cr_i, pred_cr_i)
        recon_cb_p = chroma_recon(czdc_cb_p, cacz_cb_p,
                                  cbref.reshape(mb_h, 8, 8))
        recon_cr_p = chroma_recon(czdc_cr_p, cacz_cr_p,
                                  crref.reshape(mb_h, 8, 8))
        m3 = mode.astype(jnp.int32)[:, None, None]
        recon_cb = jnp.where(m3 >= 2, recon_cb_i,
                             jnp.where(m3 == 1, recon_cb_p,
                                       cbref.reshape(mb_h, 8, 8)))
        recon_cr = jnp.where(m3 >= 2, recon_cr_i,
                             jnp.where(m3 == 1, recon_cr_p,
                                       crref.reshape(mb_h, 8, 8)))

        # ---------- chosen-mode level outputs
        m2 = mode.astype(jnp.int32)
        acz_sel = jnp.where(m4 >= 2, acz_i, jnp.where(m4 == 1, lz, 0))
        czdc_cb = jnp.where((m2 >= 2)[:, None, None], czdc_cb_i,
                            jnp.where((m2 == 1)[:, None, None],
                                      czdc_cb_p, 0))
        czdc_cr = jnp.where((m2 >= 2)[:, None, None], czdc_cr_i,
                            jnp.where((m2 == 1)[:, None, None],
                                      czdc_cr_p, 0))
        cacz_cb = jnp.where(m4 >= 2, cacz_cb_i,
                            jnp.where(m4 == 1, cacz_cb_p, 0))
        cacz_cr = jnp.where(m4 >= 2, cacz_cr_i,
                            jnp.where(m4 == 1, cacz_cr_p, 0))
        zdc_flat = jnp.where((m2 >= 2)[:, None],
                             zdc_i.reshape(mb_h, 16), 0)

        out = (mode,
               zdc_flat.astype(jnp.int16),
               acz_sel.transpose(0, 1, 3, 2, 4)
               .reshape(mb_h, 16, 16).astype(jnp.int16),
               jnp.stack([czdc_cb, czdc_cr], axis=1)
               .reshape(mb_h, 2, 4).astype(jnp.int16),
               jnp.stack([cacz_cb.transpose(0, 1, 3, 2, 4),
                          cacz_cr.transpose(0, 1, 3, 2, 4)], axis=1)
               .reshape(mb_h, 2, 4, 16).astype(jnp.int16),
               recon_y_mb.astype(jnp.uint8),
               recon_cb.astype(jnp.uint8),
               recon_cr.astype(jnp.uint8))
        return (recon_y_mb[:, :, 15].astype(jnp.int32),
                recon_cb[:, :, 7].astype(jnp.int32),
                recon_cr[:, :, 7].astype(jnp.int32)), out

    init = (jnp.zeros((mb_h, 16), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32),
            jnp.zeros((mb_h, 8), jnp.int32))
    xs = (ycols, cbcols, crcols, rycols, rcbcols, rcrcols, mvzcols,
          jnp.arange(mb_w, dtype=jnp.int32))
    _, (mode, zdc, acz, czdc, cacz, ryo, rcbo, rcro) = jax.lax.scan(
        step, init, xs, unroll=_scan_unroll())
    return PLevelArrays(
        mode.transpose(1, 0),
        zdc.transpose(1, 0, 2),
        acz.transpose(1, 0, 2, 3),
        czdc.transpose(1, 0, 2, 3),
        cacz.transpose(1, 0, 2, 3, 4),
        ryo.transpose(1, 2, 0, 3).reshape(H, W),
        rcbo.transpose(1, 2, 0, 3).reshape(H // 2, W // 2),
        rcro.transpose(1, 2, 0, 3).reshape(H // 2, W // 2),
        None if mv is None else mv.astype(jnp.int16),
        None if refsel is None else refsel.astype(jnp.int16),
        None if pmode_f is None else pmode_f.astype(jnp.int16),
    )


# old reference planes are dead once the new recon exists: donate them;
# the search radius and sub-pel mode are static compile-time config
encode_p_levels_jit = jax.jit(encode_p_levels, donate_argnums=(3, 4, 5),
                              static_argnums=(7, 8))
# two-reference chain: ref 0 (previous picture) becomes the NEXT
# frame's ref 1 so it must survive; only ref 1 (the oldest) dies
encode_p_levels2_jit = jax.jit(encode_p_levels,
                               donate_argnums=(9, 10, 11),
                               static_argnums=(7, 8))


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
                       qp: int):
    """Convenience host-NV12 entry (16-aligned): split planes, run the
    jitted level computation, return (LevelArrays, imode) device
    arrays."""
    y = jnp.asarray(nv12[:height])
    uv = np.asarray(nv12[height:]).reshape(height // 2, width // 2, 2)
    return encode_levels_jit(y, jnp.asarray(uv[:, :, 0]),
                             jnp.asarray(uv[:, :, 1]),
                             jnp.int32(qp))
