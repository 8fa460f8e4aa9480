"""ISO-BMFF muxer (io/mp4.py): the in-repo encoder streams wrapped in
a real MP4 container, validated by decoding the FILE through
libavformat+libavcodec bit-exactly against the encoder recon."""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.mp4 import parse_sps_dims, split_nals, write_mp4


def smooth(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.integers(0, 256, (h, w), np.uint8).astype(np.int64)
            .reshape(h // 8, 8, w // 8, 8).mean(axis=(1, 3))
            .astype(np.uint8).repeat(8, 0).repeat(8, 1))
    uv = np.full((h // 2, w), 128, np.uint8)
    return [np.concatenate([np.roll(base, 3 * i, 1), uv], 0)
            for i in range(n)]


class TestMuxGop:
    def test_gop_stream_decodes_bitexact(self, tmp_path):
        import cv2

        from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder

        w, h = 96, 64
        enc = GopCavlcEncoder(w, h, qp=26, gop=4, search=4)
        aus, recons = [], []
        for f in smooth(w, h, 8, seed=1):
            aus.append(enc.encode(f)[0])
            recons.append(tuple(p.copy() for p in enc._recon))
        p = str(tmp_path / "a.mp4")
        info = write_mp4(p, aus, 30.0)
        assert info["width"] == w and info["height"] == h
        assert info["samples"] == 8 and info["sync_samples"] == 2
        cap = cv2.VideoCapture(p)
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(8):
            ok, d = cap.read()
            assert ok, i
            assert np.array_equal(d[:h, :w].astype(np.int64),
                                  recons[i][0][:h, :w]), i
        # exactly 8 samples: no trailing garbage frame
        assert not cap.read()[0]
        cap.release()

    def test_odd_geometry_cropping(self, tmp_path):
        """SPS frame cropping must land in the tkhd/avc1 dims."""
        import cv2

        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        w, h = 100, 56           # pads to 112x64 with cropping
        rng = np.random.default_rng(3)
        f = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        enc = CavlcH264Encoder(w, h, qp=30, native="never")
        aus = [enc.encode(f)[0] for _ in range(2)]
        p = str(tmp_path / "c.mp4")
        info = write_mp4(p, aus, 25.0)
        assert (info["width"], info["height"]) == (w, h)
        cap = cv2.VideoCapture(p)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == w
        assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == h
        assert abs(cap.get(cv2.CAP_PROP_FPS) - 25.0) < 0.1
        cap.release()

    def test_sps_parser_matches_generators(self):
        from opencv_opencl_tpu.io.h264_cavlc import build_sps
        from opencv_opencl_tpu.io.h264_inter import build_sps_gop

        for w, h in ((1920, 1080), (3840, 2160), (1919, 1079),
                     (96, 64), (100, 56)):
            w2, h2 = w - w % 2, h - h % 2
            assert parse_sps_dims(bytes(build_sps(w2, h2))) == (w2, h2)
            assert parse_sps_dims(
                bytes(build_sps_gop(w2, h2, refs=2))) == (w2, h2)

    def test_split_nals_both_start_codes(self):
        a = (b"\x00\x00\x00\x01" + b"\x67\x01"
             + b"\x00\x00\x01" + b"\x68\x02"
             + b"\x00\x00\x00\x01" + b"\x65\x03\x04")
        assert split_nals(a) == [b"\x67\x01", b"\x68\x02",
                                 b"\x65\x03\x04"]
        with pytest.raises(ValueError):
            split_nals(b"\x65\x00")

    def test_rejects_parameterless_stream(self, tmp_path):
        with pytest.raises(ValueError, match="SPS"):
            write_mp4(str(tmp_path / "x.mp4"),
                      [b"\x00\x00\x00\x01\x65\x01\x02"], 30.0)


class TestReceiverMp4:
    def test_receiver_muxes_mp4(self, tmp_path):
        """relay --sink=rtp+h264 -> rtp_receiver --output=x.mp4: the
        received stream lands as a decodable MP4, no transcode."""
        import threading

        import cv2
        import jax

        jax.config.update("jax_platforms", "cpu")
        from opencv_opencl_tpu.apps import relay, rtp_receiver

        out = str(tmp_path / "rx.mp4")
        res = {}

        def rx():
            res["rc"] = rtp_receiver.run(
                ["--port=56095", "--kind=h264", f"--output={out}",
                 "--max-frames=6", "--timeout=60", "--fps=30"])

        t = threading.Thread(target=rx, daemon=True)
        t.start()
        rc = relay.run(["--source=test", "--width=160", "--height=96",
                        "--fps=30", "--op=none", "--batch=2",
                        "--max-frames=6",
                        "--sink=rtp+h264://127.0.0.1:56095",
                        "--encoder=cavlc:qp=30:gop=3"])
        t.join(timeout=90)
        assert rc == 0 and res.get("rc") == 0
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 6


class TestClaheVideoTee:
    def test_same_encode_tee_udp_plus_mp4(self, tmp_path, capsys):
        """clahe_video with an h264 udp leg AND an .mp4 output: ONE
        encode feeds both (the reference's CLAHECompare tee) — the
        received RTP elementary stream and the MP4 samples come from
        the same AUs, and the file decodes."""
        import threading

        import cv2
        import jax

        jax.config.update("jax_platforms", "cpu")
        import numpy as np

        from opencv_opencl_tpu.apps import clahe_video
        from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

        rng = np.random.default_rng(5)
        vid = str(tmp_path / "in.mp4")
        wtr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                              (64, 48))
        assert wtr.isOpened()
        for _ in range(6):
            wtr.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
        wtr.release()

        rx = H26xRtpReceiver(codec="h264", timeout=30.0)
        got = []

        def drain():
            for _ in range(6):
                au = rx.recv_access_unit()
                if au is None:
                    break
                got.append(au)

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        out = str(tmp_path / "tee.mp4")
        rc = clahe_video.run([
            f"--input={vid}", f"--output={out}",
            f"--udp=127.0.0.1:{rx.port}", "--udp-kind=h264",
            "--encoder=cavlc:qp=30:gop=3", "--resolution=64x48",
            "--tile=4", "--max-frames=6", "--fps=30"])
        t.join(timeout=60)
        rx.close()
        assert rc == 0
        text = capsys.readouterr().out
        assert "same-encode" in text
        cap = cv2.VideoCapture(out)
        assert cap.isOpened()
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert n == 6
        assert len(got) == 6
