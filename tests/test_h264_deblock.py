"""In-loop deblocking filter (io/h264_deblock.py) conformance.

The bar is the repo's usual one: streams emitted with
``disable_deblocking_filter_idc=0`` decode through libavcodec to planes
BIT-IDENTICAL to ``deblock_picture`` of the encoder reconstruction —
for all-IDR intra streams across the QP range (every reachable
alpha/beta/tC0 table entry), and for whole GOPs where every P frame
references the FILTERED previous picture (spec 8.7 + 8.4.2.2), across
search/subpel/multi-ref modes.  Chroma is proven via the
lossless-PCM-recode trick (same swscale path), like test_h264_inter.
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_cavlc import (
    build_pps_cavlc, encode_frame_cavlc_slices)
from opencv_opencl_tpu.io.h264_deblock import (
    ALPHA, BETA, TC0, DeblockInfo, deblock_picture)
from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder
from opencv_opencl_tpu.io.h264_pcm import _START4, build_sps

from tests.test_h264_inter import decode_frames, moving_frames


def noise_nv12(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h * 3 // 2, w), np.uint8)


def encode_gop_deblock(frames, w, h, qp, gop, **kw):
    enc = GopCavlcEncoder(w, h, qp=qp, gop=gop, deblock=True, **kw)
    aus, recons = [], []
    for f in frames:
        aus.append(enc.encode(f)[0])
        # _recon IS the filtered picture when deblock=True
        recons.append(tuple(p.copy() for p in enc._recon))
    return aus, recons


class TestTables:
    def test_shapes_and_monotonicity(self):
        assert ALPHA.shape == BETA.shape == (52,)
        assert TC0.shape == (3, 52)
        assert (np.diff(ALPHA) >= 0).all()
        assert (np.diff(BETA) >= 0).all()
        assert (np.diff(TC0, axis=1) >= 0).all()
        # tC0 grows with bS at every index
        assert (np.diff(TC0, axis=0) >= 0).all()
        assert ALPHA[15] == 0 and ALPHA[16] == 4 and ALPHA[51] == 255
        assert BETA[51] == 18 and tuple(TC0[:, 51]) == (13, 17, 25)


class TestIntraConformance:
    """All-IDR streams: decoder output == deblock_picture(recon).
    The QP sweep reaches every table entry the filter can use."""

    @pytest.mark.parametrize("qp", [8, 14, 18, 22, 26, 30, 34, 38, 42,
                                    46, 51])
    def test_qp_sweep_bitexact(self, qp, tmp_path):
        w, h = 64, 48
        nv12 = noise_nv12(w, h, seed=qp)
        nals, recon = encode_frame_cavlc_slices(
            nv12, w, h, qp, return_recon=True, deblock=True)
        es = (_START4 + build_sps(w, h) + _START4 + build_pps_cavlc() +
              b"".join(_START4 + bytes(n) for n in nals))
        fy, _, _ = deblock_picture(*recon, qp)
        dec = decode_frames(es, tmp_path, 1, es)[0]
        assert np.array_equal(dec[:h, :w].astype(np.int64), fy[:h, :w])

    def test_multislice_filters_across_slice_boundary(self, tmp_path):
        """idc=0 filters across the MB-row slice boundary: a 3-slice
        frame must decode to the same filtered picture as 1-slice."""
        w, h = 64, 48
        nv12 = noise_nv12(w, h, seed=3)
        nals, recon = encode_frame_cavlc_slices(
            nv12, w, h, 28, slices=3, return_recon=True, deblock=True)
        es = (_START4 + build_sps(w, h) + _START4 + build_pps_cavlc() +
              b"".join(_START4 + bytes(n) for n in nals))
        fy, _, _ = deblock_picture(*recon, 28)
        dec = decode_frames(es, tmp_path, 1, es)[0]
        assert np.array_equal(dec[:h, :w].astype(np.int64), fy[:h, :w])

    def test_filter_actually_changes_pixels(self):
        """Guard against a silently-disabled filter: smooth gradient
        content at high QP shows blocking, so the strong filter must
        modify a meaningful share of edge pixels.  (On pure noise the
        |p0-q0| < alpha activity gate keeps the filter mostly off —
        measured 0.5% changed at QP 40 — which is correct behavior.)"""
        w, h = 64, 48
        nv12 = moving_frames(w, h, 1, seed=7)[0]
        _, recon = encode_frame_cavlc_slices(
            nv12, w, h, 44, return_recon=True, deblock=True)
        fy, _, _ = deblock_picture(*recon, 44)
        assert (fy != recon[0]).mean() > 0.10


class TestGopConformance:
    """P frames reference the filtered picture; whole GOPs bit-exact."""

    @pytest.mark.parametrize("qp", [20, 28, 38, 46])
    @pytest.mark.parametrize("search,subpel,refs", [
        (0, {}, 1),
        (4, {}, 1),
        (2, {"quarterpel": True}, 1),
        (2, {"halfpel": True}, 1),
        (3, {"quarterpel": True}, 2),
    ])
    def test_gop_luma_bitexact(self, qp, search, subpel, refs,
                               tmp_path):
        w, h = 64, 48
        kw = dict(search=search, **subpel)
        if refs > 1:
            kw.update(refs=refs, slices=h // 16)
        frames = moving_frames(w, h, 6, seed=qp + search)
        aus, recons = encode_gop_deblock(frames, w, h, qp=qp, gop=4,
                                         **kw)
        dec = decode_frames(b"".join(aus), tmp_path, 6, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} mismatch (qp={qp} search={search})"

    def test_chroma_exact_via_lossless_recode(self, tmp_path):
        from opencv_opencl_tpu.io.h264_pcm import PcmH264Encoder

        w, h = 64, 48
        frames = moving_frames(w, h, 3, seed=5)
        frames[1][h:] = np.clip(
            frames[1][h:].astype(np.int64) + 30, 0, 255).astype(np.uint8)
        aus, recons = encode_gop_deblock(frames, w, h, qp=24, gop=10)
        bgr = decode_frames(b"".join(aus), tmp_path, 3, aus[-1],
                            gray=False)
        for i in (1, 2):
            ry, rcb, rcr = recons[i]
            recon_uv = np.empty((h // 2, w), np.uint8)
            recon_uv[:, 0::2] = rcb[:h // 2, :w // 2].astype(np.uint8)
            recon_uv[:, 1::2] = rcr[:h // 2, :w // 2].astype(np.uint8)
            recon = np.concatenate(
                [ry[:h, :w].astype(np.uint8), recon_uv])
            pcm_es = b"".join(PcmH264Encoder(w, h).encode(recon))
            import cv2

            p = tmp_path / f"pcm{i}.h264"
            p.write_bytes(pcm_es + pcm_es)
            cap = cv2.VideoCapture(str(p))
            ok, bgr_pcm = cap.read()
            cap.release()
            assert ok
            assert np.array_equal(bgr[i], bgr_pcm), f"frame {i} chroma"

    def test_nonaligned_geometry(self, tmp_path):
        """Cropped geometry (100x56) through the padded encode path."""
        w, h = 100, 56
        frames = moving_frames(w, h, 4, seed=9)
        aus, recons = encode_gop_deblock(frames, w, h, qp=30, gop=4,
                                         search=2)
        dec = decode_frames(b"".join(aus), tmp_path, 4, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w])


class TestFilterSemantics:
    def test_all_skip_picture_is_unfiltered(self):
        """bS=0 everywhere (inter, no residual, equal zero MVs): the
        filter must be an exact identity."""
        rng = np.random.default_rng(0)
        y = rng.integers(0, 256, (48, 64)).astype(np.int64)
        cb = rng.integers(0, 256, (24, 32)).astype(np.int64)
        cr = rng.integers(0, 256, (24, 32)).astype(np.int64)
        info = DeblockInfo(3, 4)  # all-inter, nnz 0, mv 0, ref 0
        fy, fcb, fcr = deblock_picture(y, cb, cr, 40, info)
        assert np.array_equal(fy, y)
        assert np.array_equal(fcb, cb)
        assert np.array_equal(fcr, cr)

    def test_mv_discontinuity_triggers_bs1(self):
        """Two inter MBs with |mv| delta >= 4 quarter-pel across the MB
        edge and no residual: bS=1 filters the shared edge only."""
        y = np.zeros((16, 32), dtype=np.int64)
        y[:, 16:] = 12  # a visible step right at the MB boundary
        cb = np.full((8, 16), 128, dtype=np.int64)
        cr = cb.copy()
        info = DeblockInfo(1, 2)
        info.mv[0, 1] = (0, 4)  # one full pel apart horizontally
        fy, _, _ = deblock_picture(y, cb, cr, 36, info)
        assert (fy[:, 15:17] != y[:, 15:17]).any()  # edge filtered
        assert np.array_equal(fy[:, :12], y[:, :12])  # interior not
        assert np.array_equal(fy[:, 20:], y[:, 20:])
        # same geometry with equal MVs: identity
        info2 = DeblockInfo(1, 2)
        fy2, _, _ = deblock_picture(y, cb, cr, 36, info2)
        assert np.array_equal(fy2, y)

    def test_streams_unchanged_when_deblock_off(self):
        """deblock=False must stay byte-identical to the historic
        streams (the default path is untouched)."""
        w, h = 64, 48
        frames = moving_frames(w, h, 3, seed=1)
        a = GopCavlcEncoder(w, h, qp=28, gop=4)
        b = GopCavlcEncoder(w, h, qp=28, gop=4, deblock=False)
        for f in frames:
            assert a.encode(f) == b.encode(f)


class TestPartsDeblock:
    """parts x deblock: quadrant-granular bS metadata (per-8x8 mv/ref
    from the partition modes feed the spec 8.7.2.1 derivation at 4x4
    granularity)."""

    @staticmethod
    def _shear_frames(w, h, n):
        rng = np.random.default_rng(7)
        base = (rng.integers(0, 256, (h // 4, w // 4), np.uint8)
                .repeat(4, 0).repeat(4, 1))
        uvb = rng.integers(96, 160, (h // 2, w), np.uint8)
        frames = []
        split = 24      # INSIDE MB row 1: straddling MBs want 16x8
        for i in range(n):
            y = base.copy()
            y[:split] = np.roll(base[:split], 3 * i, 1)
            y[split:] = np.roll(base[split:], -3 * i, 1)
            frames.append(np.concatenate([y, uvb.copy()], 0))
        return frames

    @pytest.mark.parametrize("refs", [1, 2])
    def test_gop_luma_bitexact(self, refs, tmp_path):
        w, h = 64, 48
        frames = self._shear_frames(w, h, 5)
        aus, recons = encode_gop_deblock(
            frames, w, h, qp=30, gop=5, search=3, parts=True,
            refs=refs, slices=h // 16)
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} mismatch (refs={refs})"

    def test_partitions_and_quadrant_bs_exercised(self):
        """The composition is only meaningful if partitioned MBs occur
        AND some within-MB quadrant edge gets a motion-driven bS."""
        from opencv_opencl_tpu.io.h264_deblock import (DeblockInfo,
                                                       _bs_edges)
        from opencv_opencl_tpu.io.h264_inter import (
            mc_planes, motion_search_parts, mv4_to_quadrant_field)

        w, h = 64, 48
        frames = self._shear_frames(w, h, 3)
        y1 = frames[2][:h].astype(np.int64)
        y0 = frames[1][:h].astype(np.int64)
        pmode, mv4 = motion_search_parts(y1, y0, 3, qp=30)
        assert (pmode > 0).any()
        info = DeblockInfo(h // 16, w // 16, parts=True)
        info.mv[:] = mv4_to_quadrant_field(mv4)
        bs_h = _bs_edges(info, vertical=False)
        # the horizontal mid-MB edges (block rows 2 mod 4) must carry
        # motion-driven bS 1 somewhere on the shear line
        assert (bs_h[2::4] >= 1).any()
