"""P-slice / low-delay-P GOP encoder (io/h264_inter.py).

Conformance bar (same as the intra encoder): whole GOPs decode through
libavcodec and every frame's luma is BIT-IDENTICAL to the encoder's
reconstruction; chroma is proven via the lossless-PCM-recode trick
(identical BGR through the same swscale path).  Stream shape mirrors
the reference's ``gop-mode=low-delay-p periodicity-idr`` VCU tuning
(``OpenCVequalHist.cpp:313-315``).
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_cavlc import (
    build_pps_cavlc, encode_frame_cavlc_slices)
from opencv_opencl_tpu.io.h264_inter import (
    GopCavlcEncoder, build_sps_gop, encode_frame_p_slices)
from opencv_opencl_tpu.io.h264_pcm import _START4


def moving_frames(w, h, n, seed=0, step=2):
    """Smooth base + a square moving ``step`` px/frame + light noise."""
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 200, w)[None, :]
    gy = np.linspace(0, 55, h)[:, None]
    out = []
    for i in range(n):
        y = gx + gy
        y0, x0 = 8 + step * i, 16 + step * i
        y[y0:y0 + 16, x0:x0 + 16] += 40
        uv = np.full((h // 2, w), 128.0)
        uv[4:12, 20 + step * i:40 + step * i] += 25
        f = np.concatenate([y, uv], 0) + rng.normal(0, 2, (h * 3 // 2, w))
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


def decode_frames(es: bytes, tmp_path, n, flush_au: bytes,
                  gray: bool = True):
    import cv2

    p = tmp_path / "gop.h264"
    p.write_bytes(es + flush_au)  # libavcodec's one-frame delay
    cap = cv2.VideoCapture(str(p))
    assert cap.isOpened()
    if gray:
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for i in range(n):
        ok, f = cap.read()
        assert ok, f"decoder produced only {i}/{n} frames"
        out.append(f.copy())
    cap.release()
    return out


def encode_gop(frames, w, h, qp, gop, slices=1):
    enc = GopCavlcEncoder(w, h, qp=qp, gop=gop, slices=slices)
    aus, recons = [], []
    for f in frames:
        aus.append(enc.encode(f)[0])
        recons.append(tuple(p.copy() for p in enc._recon))
    return aus, recons


class TestPConformance:
    @pytest.mark.parametrize("w,h,slices", [(96, 64, 1), (96, 64, 2),
                                            (100, 56, 2)])
    def test_gop_luma_bitexact(self, w, h, slices, tmp_path):
        frames = moving_frames(w, h, 5, seed=hash((w, slices)) & 0xFF)
        aus, recons = encode_gop(frames, w, h, qp=26, gop=5,
                                 slices=slices)
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"

    def test_midstream_idr_resets(self, tmp_path):
        """gop=3 over 7 frames: IDRs at 0/3/6, every frame bit-exact."""
        w, h = 96, 64
        frames = moving_frames(w, h, 7, seed=11)
        aus, recons = encode_gop(frames, w, h, qp=28, gop=3)
        dec = decode_frames(b"".join(aus), tmp_path, 7, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w])

    def test_chroma_exact_via_lossless_recode(self, tmp_path):
        """Decode a 2-frame GOP in BGR; the P frame's BGR must equal the
        BGR of a lossless PCM recode of its reconstruction — identical
        swscale path proves chroma (and luma) conformance."""
        from opencv_opencl_tpu.io.h264_pcm import PcmH264Encoder

        w, h = 64, 48
        frames = moving_frames(w, h, 2, seed=5)
        # strong chroma so the P residual codes chroma too
        frames[1][h:] = np.clip(
            frames[1][h:].astype(np.int64) + 30, 0, 255).astype(np.uint8)
        aus, recons = encode_gop(frames, w, h, qp=24, gop=10)
        bgr = decode_frames(b"".join(aus), tmp_path, 2, aus[-1],
                            gray=False)
        ry, rcb, rcr = recons[1]
        recon_uv = np.empty((h // 2, w), np.uint8)
        recon_uv[:, 0::2] = rcb[:h // 2, :w // 2].astype(np.uint8)
        recon_uv[:, 1::2] = rcr[:h // 2, :w // 2].astype(np.uint8)
        recon = np.concatenate([ry[:h, :w].astype(np.uint8), recon_uv])
        pcm_es = b"".join(PcmH264Encoder(w, h).encode(recon))
        import cv2

        p = tmp_path / "pcm.h264"
        p.write_bytes(pcm_es + pcm_es)
        cap = cv2.VideoCapture(str(p))
        ok, bgr_pcm = cap.read()
        cap.release()
        assert ok
        assert np.array_equal(bgr[1], bgr_pcm)


class TestCompression:
    def test_static_content_collapses_to_skip_runs(self):
        w, h = 96, 64
        base = np.random.default_rng(2).integers(
            0, 256, (h * 3 // 2, w), np.uint8)
        enc = GopCavlcEncoder(w, h, qp=28, gop=10)
        aus = [enc.encode(base)[0] for _ in range(4)]
        # frame 1 codes the quantization-drift correction; frames 2+
        # reference a recon the source already matches -> pure skip
        assert len(aus[2]) < 40 and len(aus[3]) < 40
        assert len(aus[0]) > 100 * len(aus[3])

    def test_p_cheaper_than_intra_on_motion(self):
        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        w, h = 96, 64
        frames = moving_frames(w, h, 4, seed=9)
        gop_enc = GopCavlcEncoder(w, h, qp=28, gop=10)
        p_sizes = [len(gop_enc.encode(f)[0]) for f in frames][1:]
        intra = CavlcH264Encoder(w, h, qp=28)
        i_sizes = [len(intra.encode(f)[0]) for f in frames][1:]
        # zero-motion P on moving-but-mostly-static content: > 2x win
        assert sum(p_sizes) * 2 < sum(i_sizes)

    def test_global_motion_bounded_by_intra(self):
        """Per-MB intra fallback: on content where temporal prediction
        loses everywhere (fresh noise per frame), a P frame costs at
        most ~intra + per-MB mode overhead — never the blown-up
        zero-MV residual."""
        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        w, h = 96, 64
        rng = np.random.default_rng(17)
        frames = [rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
                  for _ in range(4)]
        gop_enc = GopCavlcEncoder(w, h, qp=30, gop=10)
        g = [len(gop_enc.encode(f)[0]) for f in frames][1:]
        intra = CavlcH264Encoder(w, h, qp=30)
        i = [len(intra.encode(f)[0]) for f in frames][1:]
        assert sum(g) <= 1.05 * sum(i)

    def test_mixed_modes_in_one_frame(self, tmp_path):
        """Half-static/half-replaced frame: skips + intra MBs coexist in
        one P slice, decode stays bit-exact, and the AU is much smaller
        than intra (the static half skips)."""
        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        w, h = 96, 64
        rng = np.random.default_rng(23)
        f0 = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        f1 = f0.copy()
        f1[:h // 2] = rng.integers(0, 256, (h // 2, w), np.uint8)
        aus, recons = encode_gop([f0, f1], w, h, qp=30, gop=10)
        dec = decode_frames(b"".join(aus), tmp_path, 2, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(d[:h, :w].astype(np.int64),
                                  recons[i][0][:h, :w])
        i_size = len(CavlcH264Encoder(w, h, qp=30).encode(f1)[0])
        assert len(aus[1]) < 0.75 * i_size

    def test_all_skip_frame_reproduces_reference_picture(self, tmp_path):
        w, h = 96, 64
        base = np.random.default_rng(4).integers(
            0, 256, (h * 3 // 2, w), np.uint8)
        aus, recons = encode_gop([base, base, base], w, h, qp=28, gop=10)
        dec = decode_frames(b"".join(aus), tmp_path, 3, aus[-1])
        assert np.array_equal(dec[1], dec[2])  # skip == copy


class TestStreamStructure:
    def test_idr_cadence_and_nal_types(self):
        w, h = 64, 48
        frames = moving_frames(w, h, 6, seed=1)
        aus, _ = encode_gop(frames, w, h, qp=30, gop=3)
        for i, au in enumerate(aus):
            first_nal_type = au[4] & 0x1F
            if i % 3 == 0:
                assert first_nal_type == 7, f"AU {i} should start SPS"
                assert b"\x00\x00\x00\x01" + bytes([au[4]]) in au
            else:
                assert first_nal_type == 1, f"AU {i} should be non-IDR"
                assert (au[4] >> 5) != 0  # nal_ref_idc: reference pic

    def test_sps_advertises_one_reference(self):
        # ue(1) for max_num_ref_frames: distinguishable from the all-IDR
        # SPS (byte-compare is enough: same geometry, one field differs)
        from opencv_opencl_tpu.io.h264_pcm import build_sps

        assert build_sps_gop(96, 64) != build_sps(96, 64)

    def test_p_oracle_requires_aligned(self):
        with pytest.raises(ValueError, match="16-aligned"):
            encode_frame_p_slices(
                np.zeros((150, 100), np.uint8),
                (np.zeros((96, 96)),) * 3, 100, 96, 30, 1)


class TestRateControl:
    def test_windowed_control_ignores_lone_idr(self):
        w, h = 96, 64
        enc = GopCavlcEncoder(w, h, gop=4, bitrate_kbps=30, fps=30.0)
        qp0 = enc.qp
        base = np.random.default_rng(6).integers(
            0, 256, (h * 3 // 2, w), np.uint8)
        enc.encode(base)
        assert enc.qp == qp0  # one oversized IDR: no reaction yet
        for _ in range(3):
            enc.encode(base)
        # window full: the noisy IDR dominates the mean -> qp rises
        assert enc.qp > qp0

    def test_gop_validation(self):
        with pytest.raises(ValueError, match="gop"):
            GopCavlcEncoder(96, 64, gop=0)


class TestEncoderBoundary:
    def test_make_encoder_gop(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        enc = make_encoder("cavlc:qp=30:gop=5", 96, 64)
        assert isinstance(enc, GopCavlcEncoder) and enc.gop == 5
        enc2 = make_encoder("cavlc:gop=4", 96, 64, bitrate_kbps=500)
        assert isinstance(enc2, GopCavlcEncoder)
        assert enc2.bitrate_kbps == 500
        # gop=1 stays the plain all-IDR intra encoder
        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        enc3 = make_encoder("cavlc:qp=30:gop=1", 96, 64)
        assert type(enc3) is CavlcH264Encoder
        with pytest.raises(ValueError):
            make_encoder("cavlc:gop=0", 96, 64)
        with pytest.raises(ValueError):
            make_encoder("cavlc:gop=", 96, 64)


class TestRtpPath:
    def test_gop_stream_survives_rtp_loopback(self, tmp_path):
        """GOP AUs through H26xRtpSink/Receiver reassemble byte-
        identically (P NALs are non-IDR type 1 — the payloader must not
        care)."""
        import threading

        from opencv_opencl_tpu.io.rtp_h26x import (
            H26xRtpReceiver, H26xRtpSink)

        w, h = 96, 64
        frames = moving_frames(w, h, 4, seed=13)
        aus, _ = encode_gop(frames, w, h, qp=30, gop=4)
        rx = H26xRtpReceiver("127.0.0.1", 0, codec="h264", timeout=1.0)
        got = []

        def pump():
            import time

            t0 = time.time()
            while time.time() - t0 < 20 and len(got) < 4:
                try:
                    au = rx.recv_access_unit()
                except Exception:
                    continue
                if au:
                    got.append(au)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        tx = H26xRtpSink("127.0.0.1", rx.port, codec="h264", fps=30.0)
        for au in aus:
            tx.write(au)
        t.join(timeout=25)
        tx.close()
        rx.close()
        assert got == aus


def panning_frames(w, h, n, step=4, seed=0):
    """A fixed random scene translated ``step`` px right + ``step`` px
    down per frame (np.roll: content wraps, edges become unpredictable
    — exercising the MC edge clamp).  ``step`` must be even so the
    chroma plane shifts a whole sample."""
    rng = np.random.default_rng(seed)
    base_y = rng.integers(0, 256, (h, w), np.uint8)
    # piecewise-smooth scene: blur the noise so residuals quantize away
    base_y = (base_y.astype(np.int64).reshape(h // 8, 8, w // 8, 8)
              .mean(axis=(1, 3)).astype(np.uint8)
              .repeat(8, 0).repeat(8, 1))
    base_uv = rng.integers(96, 160, (h // 2, w), np.uint8)
    base_uv = (base_uv.astype(np.int64).reshape(h // 8, 4, w // 8, 8)
               .mean(axis=(1, 3)).astype(np.uint8)
               .repeat(4, 0).repeat(8, 1))
    out = []
    for i in range(n):
        y = np.roll(np.roll(base_y, i * step, 0), i * step, 1)
        uv = np.roll(np.roll(base_uv, i * step // 2, 0), i * step, 1)
        out.append(np.concatenate([y, uv], 0))
    return out


class TestMotionSearch:
    @pytest.mark.parametrize("w,h,slices,step", [(96, 64, 1, 4),
                                                 (96, 64, 4, 4),
                                                 (112, 80, 2, 6),
                                                 (96, 64, 1, -4)])
    def test_search_gop_luma_bitexact(self, w, h, slices, step,
                                      tmp_path):
        """Panning GOP with search=8 decodes bit-identically through
        libavcodec — proving mvd coding, the 8.4.1.3 median predictor,
        the skip-vs-mvp guard, and the out-of-picture MC clamp at every
        slice geometry."""
        frames = panning_frames(w, h, 5, step=step, seed=3)
        enc = GopCavlcEncoder(w, h, qp=28, gop=5, slices=slices,
                              search=8)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"

    def test_search_chroma_exact_via_lossless_recode(self, tmp_path):
        from opencv_opencl_tpu.io.h264_pcm import PcmH264Encoder

        w, h = 64, 48
        frames = panning_frames(w, h, 2, step=4, seed=7)
        enc = GopCavlcEncoder(w, h, qp=24, gop=10, search=8)
        aus = [enc.encode(f)[0] for f in frames]
        recons = tuple(p.copy() for p in enc._recon)
        bgr = decode_frames(b"".join(aus), tmp_path, 2, aus[-1],
                            gray=False)
        ry, rcb, rcr = recons
        recon_uv = np.empty((h // 2, w), np.uint8)
        recon_uv[:, 0::2] = rcb[:h // 2, :w // 2].astype(np.uint8)
        recon_uv[:, 1::2] = rcr[:h // 2, :w // 2].astype(np.uint8)
        recon = np.concatenate([ry[:h, :w].astype(np.uint8), recon_uv])
        pcm_es = b"".join(PcmH264Encoder(w, h).encode(recon))
        import cv2

        p = tmp_path / "pcm.h264"
        p.write_bytes(pcm_es + pcm_es)
        cap = cv2.VideoCapture(str(p))
        ok, bgr_pcm = cap.read()
        cap.release()
        assert ok
        assert np.array_equal(bgr[1], bgr_pcm)

    def test_search_beats_zero_motion_on_pan(self):
        """On global translation the searched P frames are far smaller
        than zero-motion P frames (which degrade to intra fallback)."""
        w, h = 96, 64
        frames = panning_frames(w, h, 4, step=4, seed=1)
        zm = GopCavlcEncoder(w, h, qp=28, gop=10)
        ms = GopCavlcEncoder(w, h, qp=28, gop=10, search=8)
        z_sizes = [len(zm.encode(f)[0]) for f in frames][1:]
        m_sizes = [len(ms.encode(f)[0]) for f in frames][1:]
        assert sum(m_sizes) * 3 < sum(z_sizes), (m_sizes, z_sizes)

    def test_search_static_stream_identical_to_zero_motion(self):
        """Static content: (0, 0) is candidate 0 and wins every SAD
        tie, so the searched stream is byte-identical to search=0."""
        w, h = 96, 64
        base = np.random.default_rng(2).integers(
            0, 256, (h * 3 // 2, w), np.uint8)
        a = GopCavlcEncoder(w, h, qp=28, gop=10)
        b = GopCavlcEncoder(w, h, qp=28, gop=10, search=8)
        for _ in range(3):
            assert a.encode(base) == b.encode(base)

    def test_search_validation(self):
        with pytest.raises(ValueError):
            GopCavlcEncoder(96, 64, search=16)
        with pytest.raises(ValueError):
            GopCavlcEncoder(96, 64, search=-2)
        GopCavlcEncoder(96, 64, search=3)   # odd full-pel is valid

    def test_candidate_order_prefers_small_motion(self):
        from opencv_opencl_tpu.io.h264_inter import search_candidates

        c = search_candidates(4)
        assert c[0] == (0, 0)
        assert len(c) == 81 and len(set(c)) == 81
        costs = [abs(dy) + abs(dx) for dy, dx in c]
        assert costs == sorted(costs)

    def test_odd_pan_conformance_and_compression(self, tmp_path):
        """Odd full-pel MVs: chroma lands on half-sample positions
        (spec 8.4.2.2.2 bilinear) — the stream must stay bit-exact
        through libavcodec and still beat zero motion."""
        w, h = 96, 64
        frames = panning_frames(w, h, 5, step=3, seed=21)
        enc = GopCavlcEncoder(w, h, qp=28, gop=5, search=5)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"
        zm = GopCavlcEncoder(w, h, qp=28, gop=5)
        z = [len(zm.encode(f)[0]) for f in frames][1:]
        assert sum(len(a) for a in aus[1:]) * 2 < sum(z)


def subpel_panning_frames(w, h, n, seed=0):
    """Half-pel panning (conftest.sinusoid_pan_frames at step 0.5)."""
    from tests.conftest import sinusoid_pan_frames

    return sinusoid_pan_frames(w, h, n, step=0.5, seed=seed)


class TestHalfPel:
    def test_halfpel_conformance_through_libavcodec(self, tmp_path):
        """Half-pel MVs exercise the 6-tap Wiener planes (b/h/j) in
        the prediction loop; whole-GOP decode must stay bit-exact —
        the decisive check that our 8.4.2.2.1 interpolation equals
        libavcodec's."""
        w, h = 96, 64
        frames = subpel_panning_frames(w, h, 5, seed=3)
        enc = GopCavlcEncoder(w, h, qp=26, gop=5, search=4,
                              halfpel=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"

    def test_halfpel_mvs_actually_chosen(self):
        from opencv_opencl_tpu.io.h264_inter import (
            halfpel_planes, motion_search)

        w, h = 96, 64
        frames = subpel_panning_frames(w, h, 2, seed=5)
        y0 = frames[0][:h].astype(np.int64)
        y1 = frames[1][:h].astype(np.int64)
        mv = motion_search(y1, y0, 4, subpel=1)
        assert (mv % 4 == 2).any(), "no half-pel component selected"

    def test_halfpel_beats_fullpel_on_subpel_motion(self):
        w, h = 96, 64
        frames = subpel_panning_frames(w, h, 4, seed=1)
        fp = GopCavlcEncoder(w, h, qp=28, gop=10, search=4)
        hp = GopCavlcEncoder(w, h, qp=28, gop=10, search=4,
                             halfpel=True)
        f_sizes = [len(fp.encode(f)[0]) for f in frames][1:]
        h_sizes = [len(hp.encode(f)[0]) for f in frames][1:]
        assert sum(h_sizes) < 0.8 * sum(f_sizes), (h_sizes, f_sizes)

    def test_halfpel_candidates_order(self):
        from opencv_opencl_tpu.io.h264_inter import (
            search_candidates_qpel)

        c = search_candidates_qpel(2, subpel=1)
        assert c[0] == (0, 0)
        assert len(c) == 81 and len(set(c)) == 81  # (4*2+1)^2
        assert all(qy % 2 == 0 and qx % 2 == 0 for qy, qx in c)
        costs = [abs(a) + abs(b) for a, b in c]
        assert costs == sorted(costs)
        # full-pel set in quarter-pel units keeps its relative order
        f = search_candidates_qpel(4)
        assert f[0] == (0, 0) and len(f) == 81
        assert all(qy % 4 == 0 and qx % 4 == 0 for qy, qx in f)

    def test_halfpel_validation(self):
        import pytest as _p

        with _p.raises(ValueError, match="halfpel"):
            GopCavlcEncoder(96, 64, halfpel=True)


def quarterpel_panning_frames(w, h, n, seed=0):
    """Quarter-pel panning (conftest.sinusoid_pan_frames, step 0.25)."""
    from tests.conftest import sinusoid_pan_frames

    return sinusoid_pan_frames(w, h, n, step=0.25, seed=seed)


class TestQuarterPel:
    def test_quarterpel_conformance_through_libavcodec(self, tmp_path):
        """Quarter-pel MVs exercise the averaged sub-sample planes
        (a..r) in the prediction loop; whole-GOP decode must stay
        bit-exact against libavcodec."""
        w, h = 96, 64
        frames = quarterpel_panning_frames(w, h, 5, seed=3)
        enc = GopCavlcEncoder(w, h, qp=26, gop=5, search=3,
                              quarterpel=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"

    def test_quarterpel_mvs_actually_chosen(self):
        from opencv_opencl_tpu.io.h264_inter import motion_search

        w, h = 96, 64
        frames = quarterpel_panning_frames(w, h, 2, seed=5)
        mv = motion_search(frames[1][:h].astype(np.int64),
                           frames[0][:h].astype(np.int64), 3, subpel=2)
        assert (mv % 2 == 1).any(), "no quarter-pel component selected"

    def test_quarterpel_beats_halfpel_on_quarter_motion(self):
        w, h = 96, 64
        frames = quarterpel_panning_frames(w, h, 4, seed=1)
        hp = GopCavlcEncoder(w, h, qp=28, gop=10, search=3,
                             halfpel=True)
        qp_ = GopCavlcEncoder(w, h, qp=28, gop=10, search=3,
                              quarterpel=True)
        h_sizes = [len(hp.encode(f)[0]) for f in frames][1:]
        q_sizes = [len(qp_.encode(f)[0]) for f in frames][1:]
        assert sum(q_sizes) < 0.85 * sum(h_sizes), (q_sizes, h_sizes)

    def test_quarterpel_radius_bound(self):
        import pytest as _p

        with _p.raises(ValueError, match="11"):
            GopCavlcEncoder(96, 64, gop=3, search=12, quarterpel=True)
        GopCavlcEncoder(96, 64, gop=3, search=12, halfpel=True)  # ok


class TestMultiRef:
    def flicker(self, w, h, n, seed=0):
        from tests.conftest import flicker_frames

        return flicker_frames(w, h, n, seed=seed)

    def test_multiref_conformance_through_libavcodec(self, tmp_path):
        """2-reference GOP decodes bit-identically — proving the SPS
        max_num_ref_frames, the slice-header active-override, te(v)
        ref_idx coding, the DPB list order, and multi-ref MC against
        libavcodec."""
        w, h = 96, 64
        frames = self.flicker(w, h, 6, seed=3)
        enc = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                              search=4, refs=2)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 6, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"

    def test_ref1_actually_chosen_and_wins(self):
        """On flicker content the 2-ref encoder must pick reference 1
        somewhere and compress far better than single-ref."""
        w, h = 96, 64
        frames = self.flicker(w, h, 6, seed=7)
        one = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                              search=4)
        two = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                              search=4, refs=2)
        s1 = [len(one.encode(f)[0]) for f in frames]
        s2 = [len(two.encode(f)[0]) for f in frames]
        # frames 2+ can reference two back: flicker collapses
        assert sum(s2[2:]) * 2 < sum(s1[2:]), (s2, s1)

    def test_multiref_with_subpel_conformance(self, tmp_path):
        w, h = 96, 64
        frames = self.flicker(w, h, 5, seed=5)
        enc = GopCavlcEncoder(w, h, qp=26, gop=5, slices=h // 16,
                              search=3, refs=2, quarterpel=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 5, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i}"

    @pytest.mark.parametrize("refs", [3, 4])
    def test_many_refs_conformance(self, refs, tmp_path):
        """refs=3/4: ue(v) ref_idx coding (not the 2-ref te(v) bit)
        and 3-4 entry DPB ordering — bit-exact through libavcodec,
        across a frame_num wrap (gop=19 > 16)."""
        w, h = 64, 48
        frames = self.flicker(w, h, 20, seed=40 + refs)
        enc = GopCavlcEncoder(w, h, qp=30, gop=19, slices=h // 16,
                              search=3, refs=refs)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 20, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} (refs={refs})"

    def test_multiref_validation(self):
        with pytest.raises(ValueError, match="refs"):
            GopCavlcEncoder(96, 64, gop=3, search=4, refs=5,
                            slices=4)
        with pytest.raises(ValueError, match="search"):
            GopCavlcEncoder(96, 64, gop=3, refs=2, slices=4)
        with pytest.raises(ValueError, match="slice"):
            GopCavlcEncoder(96, 64, gop=3, search=4, refs=2)


class TestLongGop:
    def test_frame_num_wrap_conformance(self, tmp_path):
        """gop=20 > max_frame_num=16: frame_num wraps mod 16 inside
        one GOP (the reference runs periodicity-idr=240) — the decoder
        must track PicNum across the wrap and every frame stay
        bit-exact."""
        w, h = 64, 48
        frames = moving_frames(w, h, 21, seed=31, step=1)
        enc = GopCavlcEncoder(w, h, qp=30, gop=20)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 21, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch (wrap at 16)"

    def test_frame_num_wrap_with_motion_and_refs(self, tmp_path):
        """Same wrap with search + 2 references: PicNum-based list
        order must survive the wrap."""
        w, h = 64, 48
        frames = moving_frames(w, h, 20, seed=33, step=1)
        enc = GopCavlcEncoder(w, h, qp=30, gop=19, slices=h // 16,
                              search=4, refs=2)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, 20, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                f"frame {i} luma mismatch"


class TestFuzzMotionConformance:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_config_decodes_bitexact(self, seed, tmp_path):
        """Property fuzz: random geometry / qp / search config / GOP on
        mixed random+panning content — whole stream decodes bit-exact
        through libavcodec."""
        rng = np.random.default_rng(100 + seed)
        w = int(rng.integers(3, 8)) * 16
        h = int(rng.integers(3, 7)) * 16
        qp = int(rng.integers(18, 42))
        gop = int(rng.integers(2, 7))
        subpel = int(rng.integers(0, 3))
        search = int(rng.integers(1, 6)) if subpel != 2 \
            else int(rng.integers(1, 4))
        refs = int(rng.integers(1, 3))
        n = int(rng.integers(4, 8))
        enc = GopCavlcEncoder(w, h, qp=qp, gop=gop, slices=h // 16,
                              search=search, halfpel=subpel == 1,
                              quarterpel=subpel == 2, refs=refs)
        # content: pan + noise bursts + a scene cut
        base = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        frames = []
        for i in range(n):
            f = np.concatenate(
                [np.roll(base[:h], (i * int(rng.integers(-3, 4)),
                                    i * int(rng.integers(-3, 4))),
                         (0, 1)),
                 base[h:]], 0)
            if i == n // 2:
                f[: h // 2] = rng.integers(0, 256, (h // 2, w),
                                           np.uint8)
            frames.append(f)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        dec = decode_frames(b"".join(aus), tmp_path, n, aus[-1])
        for i, d in enumerate(dec):
            assert np.array_equal(
                d[:h, :w].astype(np.int64), recons[i][0][:h, :w]), \
                (f"frame {i}: {w}x{h} qp={qp} gop={gop} "
                 f"search={search} subpel={subpel} refs={refs}")
