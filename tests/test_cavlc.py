"""Compressed intra H.264 encoder (io.h264_cavlc) tests.

Conformance strategy (mirrors the reference's parity harness idea,
``/root/reference/1frameMeasure.cpp:90-100`` — independent decoder as
the oracle): every stream is decoded through libavcodec (cv2's FFMPEG
backend) and the decoded LUMA must be BIT-IDENTICAL to the encoder's
own reconstruction (the in-loop deblocking filter is disabled, so a
conformant decoder has no freedom).  Chroma is proven through the same
decoder with a lossless recode: PCM-encode the CAVLC reconstruction and
require both streams to decode to identical BGR through the identical
libavcodec+swscale path.
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_cavlc import (
    _CT_NC0, _CT_NC2, _CT_NC4, _CT_NCM1, _RUN_BEFORE, _TZ, _TZ_CDC,
    CavlcH264Encoder, build_pps_cavlc, encode_frame_cavlc)
from opencv_opencl_tpu.io.h264_pcm import _START4, PcmH264Encoder, build_sps
from opencv_opencl_tpu.io.rtp_h26x import split_annexb


def smooth_nv12(w, h, seed=0, noise=12.0):
    """Gradient + gaussian noise: realistic camera-ish content."""
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 80, h)[:, None]
    y = np.clip(gx + gy + rng.normal(0, noise, (h, w)), 0, 255)
    uv = np.clip(128 + rng.normal(0, noise, (h // 2, w)), 0, 255)
    return np.concatenate([y, uv], axis=0).astype(np.uint8)


def rand_nv12(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h * 3 // 2, w), np.uint8)


def au_bytes(nal: bytes, w: int, h: int) -> bytes:
    return (_START4 + build_sps(w, h) + _START4 + build_pps_cavlc() +
            _START4 + bytes(nal))


def decode_y(es: bytes, tmp_path, n_frames=1) -> list[np.ndarray]:
    """Decode an Annex-B ES through libavcodec, grayscale (Y) output."""
    import cv2

    p = tmp_path / "es.h264"
    # libavcodec holds one frame of delay: append a copy of the last AU
    # so every real frame flushes out (same trick as test_encoder.py).
    p.write_bytes(es + es[-len(es) // max(n_frames, 1):]
                  if n_frames == 1 else es)
    cap = cv2.VideoCapture(str(p))
    assert cap.isOpened()
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    for _ in range(n_frames):
        ok, f = cap.read()
        assert ok, f"decoder produced only {len(out)}/{n_frames} frames"
        out.append(f.copy())
    cap.release()
    return out


def decode_bgr(es: bytes, tmp_path, name: str) -> np.ndarray:
    import cv2

    p = tmp_path / f"{name}.h264"
    p.write_bytes(es + es)  # flush via duplicate AU
    cap = cv2.VideoCapture(str(p))
    assert cap.isOpened()
    ok, f = cap.read()
    cap.release()
    assert ok
    return f


# ------------------------------------------------------------- tables ----


def _check_prefix_free(codes):
    """No codeword may be a prefix of another (Kraft check by pairs)."""
    items = sorted(codes)  # (len, value) pairs
    as_bits = [format(v, f"0{ln}b") for ln, v in items]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1:]:
            assert not b.startswith(a) and not a.startswith(b), \
                f"{a} / {b} not prefix-free"


class TestTables:
    def test_coeff_token_tables_complete_and_prefix_free(self):
        for tbl, maxc in ((_CT_NC0, 16), (_CT_NC2, 16), (_CT_NC4, 16),
                          (_CT_NCM1, 4)):
            expect = {(t, o) for t in range(maxc + 1)
                      for o in range(min(t, 3) + 1)}
            assert set(tbl) == expect
            _check_prefix_free(tbl.values())

    def test_total_zeros_tables(self):
        for total in range(1, 16):
            assert len(_TZ[total]) == 17 - total
            _check_prefix_free(_TZ[total])
        for total in range(1, 4):
            assert len(_TZ_CDC[total]) == 5 - total
            _check_prefix_free(_TZ_CDC[total])

    def test_run_before_tables(self):
        for zl in range(1, 7):
            assert len(_RUN_BEFORE[zl]) == zl + 1
            _check_prefix_free(_RUN_BEFORE[zl])
        assert len(_RUN_BEFORE[7]) == 15  # runs 0..14
        _check_prefix_free(_RUN_BEFORE[7])


# ---------------------------------------------------- decoder parity ----


class TestDecodeExact:
    @pytest.mark.parametrize("qp", [0, 10, 22, 28, 35, 40, 51])
    def test_luma_bitexact_across_qp(self, qp, tmp_path):
        w, h = 64, 48
        f = smooth_nv12(w, h, seed=qp)
        nal, (ry, _, _) = encode_frame_cavlc(f, w, h, qp,
                                             return_recon=True)
        (dec,) = decode_y(au_bytes(nal, w, h), tmp_path)
        assert np.array_equal(dec[:h, :w], ry[:h, :w].astype(np.uint8))

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_luma_bitexact_random_noise_low_qp(self, seed, tmp_path):
        """Full-range noise at low QP: dense coefficients, large levels,
        suffix-length adaptation, nC>=8 FLC contexts."""
        w, h = 48, 32
        f = rand_nv12(w, h, seed)
        nal, (ry, _, _) = encode_frame_cavlc(f, w, h, qp=4,
                                             return_recon=True)
        (dec,) = decode_y(au_bytes(nal, w, h), tmp_path)
        assert np.array_equal(dec[:h, :w], ry[:h, :w].astype(np.uint8))

    def test_luma_bitexact_extreme_checkerboard(self, tmp_path):
        """0/255 checkerboard: max-magnitude residuals exercise the
        level_prefix-15 12-bit escape branch."""
        w, h = 32, 32
        y = np.zeros((h, w), np.uint8)
        y[::2, ::2] = 255
        y[1::2, 1::2] = 255
        f = np.concatenate([y, np.full((h // 2, w), 128, np.uint8)])
        for qp in (0, 20, 51):
            nal, (ry, _, _) = encode_frame_cavlc(f, w, h, qp,
                                                 return_recon=True)
            (dec,) = decode_y(au_bytes(nal, w, h), tmp_path)
            assert np.array_equal(dec[:h, :w],
                                  ry[:h, :w].astype(np.uint8)), f"qp={qp}"

    def test_flat_frame_tiny_stream(self, tmp_path):
        """All-gray frame: every MB codes CBP=0 via mb_type, stream is
        a few bytes/MB, and the decode is exact (DC pred chain)."""
        w, h = 64, 64
        f = np.full((h * 3 // 2, w), 128, np.uint8)
        nal, (ry, rcb, rcr) = encode_frame_cavlc(f, w, h, qp=30,
                                                 return_recon=True)
        assert len(nal) < w * h // 64  # massively compressed
        assert np.array_equal(ry[:h, :w], f[:h].astype(np.int64))
        (dec,) = decode_y(au_bytes(nal, w, h), tmp_path)
        assert np.array_equal(dec[:h, :w], f[:h])

    def test_level_clamp_black_frame_qp0(self, tmp_path):
        """All-black Y at QP 0: the first MB's DC level quantizes to
        ~3277, beyond what the suffix-0 12-bit escape can code (2063).
        Unclamped this silently corrupted the stream; with the encoder
        clamp the stream stays conformant (decode == reconstruction)."""
        w, h = 48, 32
        f = np.zeros((h * 3 // 2, w), np.uint8)
        f[h:] = 128
        nal, (ry, _, _) = encode_frame_cavlc(f, w, h, qp=0,
                                             return_recon=True)
        (dec,) = decode_y(au_bytes(nal, w, h), tmp_path)
        assert np.array_equal(dec[:h, :w], ry[:h, :w].astype(np.uint8))

    def test_chroma_exact_via_lossless_recode(self, tmp_path):
        """Chroma conformance: PCM-encode (lossless) the CAVLC
        reconstruction; both streams decode through the identical
        libavcodec+swscale BGR path, so identical BGR proves the decoder
        reproduced Y AND chroma of the reconstruction exactly."""
        w, h = 64, 48
        f = smooth_nv12(w, h, seed=9)
        # make chroma non-trivial
        f[h:] = rand_nv12(w, h, seed=10)[h:]
        nal, (ry, rcb, rcr) = encode_frame_cavlc(f, w, h, qp=26,
                                                 return_recon=True)
        recon_uv = np.empty((h // 2, w), np.uint8)
        recon_uv[:, 0::2] = rcb[: h // 2, : w // 2].astype(np.uint8)
        recon_uv[:, 1::2] = rcr[: h // 2, : w // 2].astype(np.uint8)
        recon = np.concatenate([ry[:h, :w].astype(np.uint8), recon_uv])
        pcm_es = b"".join(PcmH264Encoder(w, h).encode(recon))
        bgr_cavlc = decode_bgr(au_bytes(nal, w, h), tmp_path, "cavlc")
        bgr_pcm = decode_bgr(pcm_es, tmp_path, "pcm")
        assert np.array_equal(bgr_cavlc, bgr_pcm)

    @pytest.mark.parametrize("slices", [2, 3, 5])
    def test_multi_slice_luma_bitexact(self, slices, tmp_path):
        """Independent MB-row-band slices (reference num-slices analogue):
        contexts reset at each band, the whole picture still decodes
        bit-exactly to the encoder's reconstruction."""
        from opencv_opencl_tpu.io.h264_cavlc import (
            encode_frame_cavlc_slices)

        w, h = 64, 96  # 6 MB rows
        f = smooth_nv12(w, h, seed=slices)
        nals, (ry, _, _) = encode_frame_cavlc_slices(
            f, w, h, qp=26, slices=slices, return_recon=True)
        assert len(nals) == slices
        es = (_START4 + build_sps(w, h) + _START4 + build_pps_cavlc() +
              b"".join(_START4 + bytes(n) for n in nals))
        (dec,) = decode_y(es, tmp_path)
        assert np.array_equal(dec[:h, :w], ry[:h, :w].astype(np.uint8))

    def test_multi_slice_differs_from_single_at_boundaries_only(self):
        """Band-top MBs lose their top predictor, so recon may differ
        ONLY in boundary MB rows; interior rows must be identical."""
        from opencv_opencl_tpu.io.h264_cavlc import (
            encode_frame_cavlc_slices)

        w, h = 48, 64  # 4 MB rows
        f = smooth_nv12(w, h, seed=7)
        _, (r1, _, _) = encode_frame_cavlc_slices(
            f, w, h, qp=26, slices=1, return_recon=True)
        _, (r2, _, _) = encode_frame_cavlc_slices(
            f, w, h, qp=26, slices=2, return_recon=True)
        assert np.array_equal(r1[:32], r2[:32])  # first band identical

    def test_quality_improves_with_lower_qp(self):
        w, h = 64, 48
        f = smooth_nv12(w, h, seed=5)
        y = f[:h].astype(np.int64)
        prev_mse = None
        sizes = []
        for qp in (45, 35, 25, 15):
            nal, (ry, _, _) = encode_frame_cavlc(f, w, h, qp,
                                                 return_recon=True)
            mse = float(np.mean((ry[:h, :w] - y) ** 2))
            if prev_mse is not None:
                assert mse < prev_mse
            prev_mse = mse
            sizes.append(len(nal))
        assert sizes == sorted(sizes)  # lower QP -> more bits
        assert prev_mse < 4.0  # QP 15 is near-transparent


# ------------------------------------------------------ encoder class ----


class TestCavlcEncoder:
    def test_au_structure(self):
        enc = CavlcH264Encoder(96, 64, qp=30)
        (au,) = enc.encode(smooth_nv12(96, 64))
        nals = split_annexb(au)
        assert [n[0] & 0x1F for n in nals] == [7, 8, 5]  # SPS, PPS, IDR

    def test_idr_pic_id_alternates(self):
        enc = CavlcH264Encoder(32, 32, qp=30)
        f = smooth_nv12(32, 32)
        au1 = enc.encode(f)[0]
        au2 = enc.encode(f)[0]
        assert au1 != au2  # idr_pic_id toggles per §7.4.3
        assert enc.encode(f)[0] == au1

    def test_cropped_geometry_decodes_right_size(self, tmp_path):
        """Non-16-aligned frames: edge-pad to the MB grid, SPS crop
        restores the true size; stream decodes at exactly w x h."""
        w, h = 36, 28
        enc = CavlcH264Encoder(w, h, qp=18)
        f = smooth_nv12(w, h, seed=3)
        es = b"".join(enc.encode(f)) + b"".join(enc.encode(f))
        (dec, _) = decode_y(es, tmp_path, n_frames=2)
        assert dec.shape == (h, w)
        # near-transparent QP: decoded luma tracks the source closely
        assert float(np.mean(
            (dec.astype(np.int64) - f[:h].astype(np.int64)) ** 2)) < 16.0

    def test_rate_control_converges(self):
        """Closed-loop QP adaptation drives frame size toward the
        bitrate budget (reference: omxh264enc target-bitrate,
        OpenCVequalHist.cpp:313-315)."""
        w, h = 96, 64
        target_kbps = 200
        fps = 30.0
        enc = CavlcH264Encoder(w, h, qp=40, bitrate_kbps=target_kbps,
                               fps=fps)
        sizes = []
        for i in range(40):
            (au,) = enc.encode(smooth_nv12(w, h, seed=i))
            sizes.append(len(au))
        budget = target_kbps * 1000 / 8 / fps
        # steady state: the last frames sit inside the AIMD deadband
        tail = np.mean(sizes[-8:])
        assert 0.5 * budget < tail < 1.5 * budget, (tail, budget)
        assert 10 <= enc.qp <= 51

    def test_rate_control_converges_fast_from_bad_start(self):
        """Proportional QP steps (~6*log2 of the bit-error ratio): a
        14x-overshooting start must land near budget within ~5 frames,
        not the ~16 a one-step AIMD would take."""
        enc = CavlcH264Encoder(96, 64, qp=12, bitrate_kbps=100, fps=30)
        budget = 100 * 1000 / 8 / 30
        sizes = []
        for i in range(8):
            (au,) = enc.encode(smooth_nv12(96, 64, seed=i))
            sizes.append(len(au))
        assert any(s < 1.5 * budget for s in sizes[:6]), sizes

    def test_qp_clamps(self):
        enc = CavlcH264Encoder(32, 32, qp=51, bitrate_kbps=100000)
        for _ in range(3):
            enc.encode(rand_nv12(32, 32))
        assert enc.qp <= 51
        enc2 = CavlcH264Encoder(32, 32, qp=10, bitrate_kbps=1)
        for _ in range(3):
            enc2.encode(np.full((48, 32), 128, np.uint8))
        assert enc2.qp >= 10

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError):
            CavlcH264Encoder(33, 32)

    def test_unaligned_raw_frame_rejected(self):
        with pytest.raises(ValueError):
            encode_frame_cavlc(smooth_nv12(36, 28), 36, 28, qp=30)

    def test_make_encoder_cavlc_backends(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        enc = make_encoder("cavlc", 64, 48, bitrate_kbps=500, fps=30.0)
        assert isinstance(enc, CavlcH264Encoder)
        assert enc.bitrate_kbps == 500
        enc2 = make_encoder("cavlc:qp=35", 64, 48)
        assert enc2.qp == 35 and enc2.bitrate_kbps is None
        enc3 = make_encoder("cavlc:qp=28:slices=4", 64, 96)
        assert enc3.qp == 28 and enc3.slices == 4
        enc4 = make_encoder("cavlc:slices=2", 64, 96, bitrate_kbps=300)
        assert enc4.slices == 2 and enc4.bitrate_kbps == 300
        with pytest.raises(ValueError):
            make_encoder("cavlc:qp=52", 64, 48)
        with pytest.raises(ValueError):
            make_encoder("cavlc:35", 64, 48)
        with pytest.raises(ValueError):
            make_encoder("cavlc:slices=0", 64, 48)
        with pytest.raises(ValueError):
            make_encoder("cavlc", 64, 48, codec="h265")

    def test_cavlc_rtp_loopback_and_decode(self, tmp_path):
        """The full reference emit chain with the compressed encoder:
        enhanced-frame sink -> CAVLC encode -> RFC 6184 RTP -> receiver
        reassembles an ES libavcodec decodes at the right size."""
        from opencv_opencl_tpu.io.encoder import EncodedRtpSink, make_encoder
        from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

        rx = H26xRtpReceiver(codec="h264", timeout=10.0)
        sink = EncodedRtpSink(make_encoder("cavlc:qp=26", 64, 48),
                              "127.0.0.1", rx.port, fps=30.0)
        frames = [smooth_nv12(64, 48, seed=i) for i in range(3)]
        for f in frames:
            sink.write(f)
        aus = []
        for _ in frames:
            au = rx.recv_access_unit()
            assert au is not None
            aus.append(au)
        sink.close()
        rx.close()
        decs = decode_y(b"".join(aus) + aus[-1], tmp_path,
                        n_frames=len(frames))
        for d, f in zip(decs, frames):
            assert d.shape == (48, 64)
            mse = float(np.mean(
                (d.astype(np.int64) - f[:48].astype(np.int64)) ** 2))
            assert mse < 30.0  # qp 26 on smooth content

    def test_compression_beats_pcm_by_far(self):
        """The whole point: CAVLC at visually-good QP is a fraction of
        the lossless PCM size (PCM cannot honor --bitrate at all)."""
        w, h = 96, 96
        f = smooth_nv12(w, h, seed=4, noise=5.0)
        cavlc = CavlcH264Encoder(w, h, qp=28).encode(f)[0]
        pcm = PcmH264Encoder(w, h).encode(f)[0]
        assert len(cavlc) < len(pcm) / 5
