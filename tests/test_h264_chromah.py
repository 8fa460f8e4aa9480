"""Chroma HORIZONTAL intra prediction (``chromah``) — conformance,
decision and device-twin tests.

The remaining feasible piece of the chroma intra breadth the reference
VCU has (OpenCVequalHist.cpp:308-332): VERTICAL/PLANE need the above
MB (another slice under the one-row contract), HORIZONTAL needs only
the left column.  Chroma conformance uses the repo's lossless-recode
technique (tests/test_cavlc.py): PCM-encode the reconstruction, decode
both streams through the identical libavcodec+swscale BGR path, and
require identical BGR — proving Y AND chroma exact.
"""

import numpy as np
import pytest

from opencv_opencl_tpu.io import h264_cavlc as hc
from opencv_opencl_tpu.io.h264_pcm import PcmH264Encoder

W, H = 128, 96
MB_H = H // 16


def _nv12():
    rng = np.random.default_rng(3)
    y = ((np.mgrid[0:H, 0:W][1] + np.mgrid[0:H, 0:W][0] * 2)
         * 4 % 256).astype(np.uint8)
    y = np.clip(y.astype(np.int32) + rng.integers(-3, 4, y.shape),
                0, 255).astype(np.uint8)
    # vertical chroma gradients: HORIZONTAL prediction wins
    cu = (np.mgrid[0:H // 2, 0:W // 2][0] * 8 % 256).astype(np.uint8)
    cv_ = ((np.mgrid[0:H // 2, 0:W // 2][0] + 40) * 8
           % 256).astype(np.uint8)
    uv = np.empty((H // 2, W), np.uint8)
    uv[:, 0::2], uv[:, 1::2] = cu, cv_
    return np.concatenate([y, uv])


def _decode_bgr(es: bytes, tmp_path, tag: str):
    import cv2

    p = tmp_path / f"{tag}.h264"
    p.write_bytes(es + es)
    cap = cv2.VideoCapture(str(p))
    ok, f = cap.read()
    cap.release()
    assert ok
    return f


class TestConformance:
    @pytest.mark.parametrize("qp", [24, 32])
    @pytest.mark.parametrize("i4", [False, True])
    def test_y_and_chroma_exact(self, qp, i4, tmp_path):
        nv12 = _nv12()
        nals, (ry, rcb, rcr) = hc.encode_frame_cavlc_slices(
            nv12, W, H, qp, slices=MB_H, return_recon=True,
            i4=i4, chromah=True)
        au = (hc._START4 + hc.build_sps(W, H) + hc._START4
              + hc.build_pps_cavlc()
              + b"".join(hc._START4 + bytes(n) for n in nals))
        recon_uv = np.empty((H // 2, W), np.uint8)
        recon_uv[:, 0::2] = rcb[:H // 2, :W // 2].astype(np.uint8)
        recon_uv[:, 1::2] = rcr[:H // 2, :W // 2].astype(np.uint8)
        recon = np.concatenate(
            [ry[:H, :W].astype(np.uint8), recon_uv])
        pcm = b"".join(PcmH264Encoder(W, H).encode(recon))
        assert np.array_equal(
            _decode_bgr(au, tmp_path, f"c{qp}{i4}"),
            _decode_bgr(pcm, tmp_path, f"p{qp}{i4}"))


class TestDecision:
    def test_wins_on_gradient_chroma(self):
        nv12 = _nv12()
        n0 = sum(len(n) for n in hc.encode_frame_cavlc_slices(
            nv12, W, H, 28, slices=MB_H))
        n1 = sum(len(n) for n in hc.encode_frame_cavlc_slices(
            nv12, W, H, 28, slices=MB_H, chromah=True))
        assert n1 < 0.95 * n0, (n1, n0)

    def test_noop_when_dc_wins(self):
        """Flat chroma: DC always wins, streams identical."""
        rng = np.random.default_rng(0)
        y = rng.integers(0, 256, (H, W), np.uint8)
        uv = np.full((H // 2, W), 128, np.uint8)
        nv12 = np.concatenate([y, uv])
        a = hc.encode_frame_cavlc_slices(nv12, W, H, 30, slices=MB_H)
        b = hc.encode_frame_cavlc_slices(nv12, W, H, 30, slices=MB_H,
                                         chromah=True)
        assert [bytes(x) for x in a] == [bytes(x) for x in b]


class TestDeviceTwin:
    @pytest.mark.parametrize("tail", ["qp=28:chromah",
                                      "qp=28:chromah:i4"])
    def test_stream_byte_identity(self, tail):
        from opencv_opencl_tpu.io.encoder import make_encoder

        nv12 = _nv12()
        et = make_encoder("tpu:" + tail, W, H, 30)
        eo = make_encoder(f"cavlc:{tail}:slices={MB_H}", W, H, 30)
        assert (b"".join(et.encode(nv12))
                == b"".join(eo.encode(nv12)))

    def test_gop_stream_byte_identity(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        nv12 = _nv12()
        frames = [nv12, np.roll(nv12, 3, axis=1).copy(),
                  np.roll(nv12, 6, axis=1).copy()]

        def run(spec):
            enc = make_encoder(spec, W, H, 30)
            return b"".join(b"".join(enc.encode(f)) for f in frames)

        assert (run("tpu:qp=28:gop=3:search=2:chromah:i4")
                == run(f"cavlc:qp=28:gop=3:search=2:slices={MB_H}"
                       ":chromah:i4"))


class TestBitpack:
    """Device bit-packing speaks chromah (and i4): streams from the
    on-device entropy bits byte-identical to the oracle."""

    @pytest.mark.parametrize("tail", ["chromah", "chromah:i4"])
    def test_bitpack_stream_matches_oracle(self, tail):
        from opencv_opencl_tpu.io.encoder import make_encoder

        nv12 = _nv12()
        et = make_encoder(f"tpu:qp=28:{tail}:bitpack", W, H, 30)
        eo = make_encoder(f"cavlc:qp=28:{tail}:slices={MB_H}",
                          W, H, 30)
        assert (b"".join(et.encode(nv12))
                == b"".join(eo.encode(nv12)))

    def test_gop_bitpack_stream_matches_oracle(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        nv12 = _nv12()
        frames = [nv12, np.roll(nv12, 3, axis=1).copy(),
                  np.roll(nv12, 6, axis=1).copy()]

        def run(spec):
            enc = make_encoder(spec, W, H, 30)
            return b"".join(b"".join(enc.encode(f)) for f in frames)

        assert (run("tpu:qp=28:gop=3:search=2:chromah:i4:bitpack")
                == run(f"cavlc:qp=28:gop=3:search=2:slices={MB_H}"
                       ":chromah:i4"))
