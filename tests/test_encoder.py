"""Encoder boundary tests: the pure-Python I_PCM H.264 encoder, the
pluggable backend selection, and the relay's encoded-RTP emit chain
(<- reference ``OpenCVequalHist.cpp:308-332``: the emit side always
encodes before transmit)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_pcm import (
    PcmH264Encoder, build_pps, build_sps, encode_frame_pcm, _slice_head)
from opencv_opencl_tpu.io.rtp_h26x import split_annexb


def rand_nv12(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h * 3 // 2, w), np.uint8)


def unescape(data: bytes) -> bytes:
    """Remove emulation-prevention bytes (inverse of §7.4.1.1)."""
    return re.sub(b"\x00\x00\x03(?=[\x00-\x03])", b"\x00\x00", data,
                  flags=re.DOTALL)


def parse_pcm_slice(nal: bytes, width: int, height: int,
                    idr_pic_id: int) -> np.ndarray:
    """Mini I_PCM decoder: reconstruct the padded-MB NV12 from a slice
    NAL (structure must match the encoder's fixed layout)."""
    rbsp = unescape(nal)
    head = _slice_head(idr_pic_id)
    assert rbsp[: len(head)] == head
    mb_w, mb_h = -(-width // 16), -(-height // 16)
    n = mb_w * mb_h
    body = rbsp[len(head):]
    blocks = []
    pos = 0
    for i in range(n):
        if i > 0:
            assert body[pos : pos + 2] == b"\x0d\x00", f"MB {i} prefix"
            pos += 2
        blocks.append(np.frombuffer(body[pos : pos + 384], np.uint8))
        pos += 384
    assert body[pos:] == b"\x80"  # rbsp_slice_trailing_bits
    mbs = np.stack(blocks)
    y = (mbs[:, :256].reshape(mb_h, mb_w, 16, 16)
         .transpose(0, 2, 1, 3).reshape(mb_h * 16, mb_w * 16))
    cb = (mbs[:, 256:320].reshape(mb_h, mb_w, 8, 8)
          .transpose(0, 2, 1, 3).reshape(mb_h * 8, mb_w * 8))
    cr = (mbs[:, 320:].reshape(mb_h, mb_w, 8, 8)
          .transpose(0, 2, 1, 3).reshape(mb_h * 8, mb_w * 8))
    uv = np.stack([cb[: height // 2, : width // 2],
                   cr[: height // 2, : width // 2]], axis=-1)
    return np.concatenate(
        [y[:height, :width], uv.reshape(height // 2, width)], axis=0)


class TestPcmBitstream:
    def test_au_structure(self):
        enc = PcmH264Encoder(96, 64)
        (au,) = enc.encode(rand_nv12(96, 64))
        nals = split_annexb(au)
        assert [n[0] & 0x1F for n in nals] == [7, 8, 5]  # SPS, PPS, IDR
        assert all((n[0] >> 5) & 3 == 3 for n in nals)   # nal_ref_idc 3

    def test_full_lossless_roundtrip_mini_parser(self):
        w, h = 96, 64
        f = rand_nv12(w, h, seed=3)
        sl = encode_frame_pcm(f, w, h, idr_pic_id=0)
        out = parse_pcm_slice(sl, w, h, 0)
        assert np.array_equal(out, f)  # luma AND chroma, bit-exact

    def test_lossless_through_real_decoder(self, tmp_path):
        """libavcodec (cv2's FFMPEG) decodes the stream and the Y plane
        is bit-exact — independent proof of standards compliance."""
        import cv2

        w, h = 96, 64
        enc = PcmH264Encoder(w, h)
        frames = [rand_nv12(w, h, seed=i) for i in range(3)]
        es = b"".join(b"".join(enc.encode(f)) for f in frames)
        p = tmp_path / "pcm.h264"
        p.write_bytes(es)
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for f in frames:
            ok, raw = cap.read()
            assert ok
            assert np.array_equal(raw[:h, :w], f[:h])
        cap.release()

    def test_cropped_geometry_decodes_right_size(self, tmp_path):
        """Non-multiple-of-16 frames use SPS cropping (36x28 -> 3x2 MBs
        with crop offsets)."""
        import cv2

        w, h = 36, 28
        enc = PcmH264Encoder(w, h)
        f = rand_nv12(w, h, seed=7)
        es = b"".join(enc.encode(f))
        p = tmp_path / "crop.h264"
        p.write_bytes(es)
        cap = cv2.VideoCapture(str(p))
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        ok, raw = cap.read()
        assert ok
        assert raw.shape[1] == w and raw.shape[0] >= h
        assert np.array_equal(raw[:h, :w], f[:h])
        cap.release()

    def test_emulation_prevention_on_zero_frames(self):
        """An all-zero frame is the emulation worst case: every PCM byte
        is 0x00.  The escaped stream must contain no start-code or
        3-zero run inside a NAL, and must unescape losslessly."""
        w, h = 32, 32
        f = np.zeros((h * 3 // 2, w), np.uint8)
        sl = encode_frame_pcm(f, w, h, 0)
        assert b"\x00\x00\x00" not in sl
        assert b"\x00\x00\x01" not in sl
        assert b"\x00\x00\x02" not in sl
        out = parse_pcm_slice(sl, w, h, 0)
        assert np.array_equal(out, f)

    def test_idr_pic_id_alternates(self):
        enc = PcmH264Encoder(32, 32)
        f = rand_nv12(32, 32)
        au0 = enc.encode(f)[0]
        au1 = enc.encode(f)[0]
        au2 = enc.encode(f)[0]
        assert au0 != au1  # differing idr_pic_id (spec 7.4.3)
        assert au0 == au2

    def test_odd_dimensions_rejected(self):
        with pytest.raises(ValueError, match="even"):
            encode_frame_pcm(np.zeros((49, 33), np.uint8), 33, 32)

    def test_sps_pps_parse_basics(self):
        sps = build_sps(1920, 1080)
        assert sps[0] & 0x1F == 7
        assert sps[1] == 66  # baseline profile
        pps = build_pps()
        assert pps[0] & 0x1F == 8


class TestBackendSelection:
    def test_auto_falls_back_to_pcm_here(self):
        from opencv_opencl_tpu.io.encoder import (
            available_encoders, make_encoder)

        avail = available_encoders()
        assert avail[-1] == "pcm"  # always present, last resort
        enc = make_encoder("auto", 64, 48)
        assert enc.codec == "h264"

    def test_unknown_backend_rejected(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        with pytest.raises(ValueError, match="unknown encoder"):
            make_encoder("nvenc", 64, 48)

    def test_pcm_h265_rejected(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        with pytest.raises(ValueError, match="h264-only"):
            make_encoder("pcm", 64, 48, codec="h265")

    @pytest.mark.parametrize("spec,cls", [
        ("cavlc:qp=30:deblock", "CavlcH264Encoder"),
        ("cavlc:qp=30:gop=8:search=2:deblock", "GopCavlcEncoder"),
        ("tpu:qp=30:deblock", "TpuCavlcEncoder"),
        ("tpu:qp=30:gop=8:deblock", "TpuGopEncoder"),
    ])
    def test_deblock_flag_in_specs(self, spec, cls):
        from opencv_opencl_tpu.io.encoder import make_encoder

        enc = make_encoder(spec, 64, 48)
        assert type(enc).__name__ == cls
        assert enc.deblock is True

    def test_deblock_flag_takes_no_value(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        with pytest.raises(ValueError, match="bad cavlc option"):
            make_encoder("cavlc:deblock=1", 64, 48)


class TestEncodedRtp:
    def test_rtp_loopback_byte_identical_es(self):
        """The VERDICT acceptance bar: encoded AUs ride RFC 6184 RTP and
        the receiver reassembles a byte-identical elementary stream."""
        from opencv_opencl_tpu.io.encoder import EncodedRtpSink, make_encoder
        from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

        rx = H26xRtpReceiver(codec="h264", timeout=10.0)
        enc = make_encoder("pcm", 64, 48)
        sink = EncodedRtpSink(enc, "127.0.0.1", rx.port, fps=30.0)
        sent = []
        frames = [rand_nv12(64, 48, seed=i) for i in range(4)]
        # capture what goes out by re-encoding with an identical encoder
        ref_enc = make_encoder("pcm", 64, 48)
        for f in frames:
            sink.write(f)
            sent.extend(ref_enc.encode(f))
        got = []
        for _ in sent:
            au = rx.recv_access_unit()
            assert au is not None
            got.append(au)
        sink.close()
        rx.close()
        assert got == sent  # byte-identical ES through the wire

    def test_relay_sink_rtp_h264_end_to_end(self, tmp_path):
        """relay --sink=rtp+h264://: enhanced frames leave the process as
        a decodable H.264 RTP stream (full reference emit chain)."""
        import threading

        import cv2

        from opencv_opencl_tpu.apps import relay
        from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

        rx = H26xRtpReceiver(codec="h264", timeout=30.0)
        aus = []

        def collect():
            for _ in range(3):
                au = rx.recv_access_unit()
                if au is not None:
                    aus.append(au)

        t = threading.Thread(target=collect)
        t.start()
        rc = relay.run([
            "--source=test", "--width=96", "--height=64", "--max-frames=6",
            f"--sink=rtp+h264://127.0.0.1:{rx.port}", "--batch=2",
            "--op=histeq", "--encoder=pcm",
        ])
        t.join(timeout=60)
        rx.close()
        assert rc == 0
        assert len(aus) == 3
        es = tmp_path / "relay.h264"
        es.write_bytes(b"".join(aus))
        cap = cv2.VideoCapture(str(es))
        assert cap.isOpened()
        ok, frame = cap.read()
        assert ok and frame.shape[:2] == (64, 96)
        cap.release()

    def test_rtp_receiver_app_records_h264(self, tmp_path):
        """rtp_receiver --kind=h264 records the ES the relay ships."""
        import threading

        from opencv_opencl_tpu.apps import rtp_receiver
        from opencv_opencl_tpu.io.encoder import EncodedRtpSink, make_encoder

        out = tmp_path / "rx.h264"
        import socket

        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        rc = {}

        def run_rx():
            rc["rc"] = rtp_receiver.run([
                f"--port={port}", "--kind=h264", f"--output={out}",
                "--max-frames=2", "--timeout=20",
            ])

        t = threading.Thread(target=run_rx)
        t.start()
        import time

        time.sleep(0.5)
        enc = make_encoder("pcm", 64, 48)
        ref_enc = make_encoder("pcm", 64, 48)
        sink = EncodedRtpSink(enc, "127.0.0.1", port)
        expect = b""
        for i in range(2):
            f = rand_nv12(64, 48, seed=i)
            sink.write(f)
            expect += b"".join(ref_enc.encode(f))
        t.join(timeout=30)
        sink.close()
        assert rc.get("rc") == 0
        assert out.read_bytes() == expect


class TestGiPipelineEncoder:
    """The gi encoder's push/pull mapping against a fake Gst (the real
    engine is absent in this container; the description and buffer flow
    are what we can verify)."""

    class _FakeEncSink:
        def __init__(self):
            self.queue = []
            self.eos = False

        def connect(self, *a):
            pass

        def emit(self, signal, *args):
            if signal in ("try-pull-sample", "pull-sample"):
                return self.queue.pop(0) if self.queue else None
            raise KeyError(signal)

        def get_property(self, name):
            if name == "eos":
                return self.eos
            raise AttributeError(name)

    def _fake_gst(self):
        from tests.fake_gst import Buffer, FakeGst, MapFlags

        class EncGst(FakeGst):
            pass

        EncGst.Buffer = Buffer  # class bodies can't see function locals
        EncGst.MapFlags = MapFlags
        return EncGst()

    def test_pipeline_desc_and_flow(self):
        import numpy as np

        from opencv_opencl_tpu.io.gst_encoder import (
            GiPipelineEncoder, encoder_pipeline_desc)
        from tests.fake_gst import Buffer, Caps, Sample

        desc = encoder_pipeline_desc(96, 64, 30.0, "h264", 2000,
                                     use_omx=False)
        assert "x264enc tune=zerolatency" in desc
        assert "h264parse config-interval=-1" in desc
        assert "appsrc name=enc_src" in desc and "appsink name=enc_sink" in desc
        omx = encoder_pipeline_desc(96, 64, 30.0, "h264", 2000, use_omx=True)
        assert "omxh264enc" in omx

        gst = self._fake_gst()
        enc = GiPipelineEncoder(96, 64, fps=30.0, gst=gst, use_omx=False)
        pipe = gst.pipelines[0]
        src = pipe.get_by_name("enc_src")
        sink = pipe.get_by_name("enc_sink")
        # swap the appsink for the encoder-behavior fake
        fake_sink = self._FakeEncSink()
        enc.sink = fake_sink
        f = np.zeros((96, 96), np.uint8)  # 64*3//2 rows
        # the "encoder" hasn't produced output yet
        assert enc.encode(f) == []
        assert len(src.pushed) == 1
        assert src.pushed[0].pts == 0
        # queue two encoded AUs; next encode drains both
        fake_sink.queue = [Sample(Buffer(b"AU-1"), Caps()),
                           Sample(Buffer(b"AU-2"), Caps())]
        got = enc.encode(f)
        assert got == [b"AU-1", b"AU-2"]
        assert src.pushed[1].pts == src.pushed[0].pts + src.pushed[1].duration
        # flush sends EOS and drains the tail
        fake_sink.queue = [Sample(Buffer(b"AU-3"), Caps())]
        fake_sink.eos = True
        assert enc.flush() == [b"AU-3"]
        assert src.eos_sent
        enc.close()
        from tests.fake_gst import State

        assert pipe.state == State.NULL


def test_multi_relay_rtp_h264_per_stream(tmp_path):
    """multi_relay --sink=rtp+h264://: each stream gets its own encoder
    + RTP session on the 2-port stride."""
    import threading

    from opencv_opencl_tpu.apps import multi_relay
    from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

    rx0 = H26xRtpReceiver(codec="h264", timeout=40.0)
    # grab an adjacent even-stride pair: receiver 1 on rx0.port + 2
    rx1 = H26xRtpReceiver(codec="h264", port=rx0.port + 2, timeout=40.0)
    got = {0: [], 1: []}

    def collect(i, rx):
        for _ in range(2):
            au = rx.recv_access_unit()
            if au is not None:
                got[i].append(au)

    ts = [threading.Thread(target=collect, args=(i, rx))
          for i, rx in ((0, rx0), (1, rx1))]
    [t.start() for t in ts]
    rc = multi_relay.run([
        "--streams=2", "--width=96", "--height=64", "--op=histeq",
        f"--sink=rtp+h264://127.0.0.1:{rx0.port}", "--encoder=pcm",
        "--max-frames=6", "--batch=2",
    ])
    [t.join(timeout=60) for t in ts]
    rx0.close()
    rx1.close()
    assert rc == 0
    assert len(got[0]) == 2 and len(got[1]) == 2
    # both streams carry valid SPS-led AUs
    for aus in got.values():
        assert aus[0][4] & 0x1F == 7  # starts with SPS after start code


def test_relay_full_composition_ref_frame_native_encoded_adaptive(tmp_path):
    """Everything at once: streaming ref-frame CLAHE + GIL-free native
    staging + encoded H.264 RTP emit + RTCP-driven adaptive rate, one
    relay run — the subsystems must compose, not just work alone."""
    import threading

    import cv2

    from opencv_opencl_tpu import native
    from opencv_opencl_tpu.apps import relay
    from opencv_opencl_tpu.io.rtp_h26x import H26xRtpReceiver

    if not native.available():
        pytest.skip("native toolchain unavailable")

    rx = H26xRtpReceiver(codec="h264", timeout=40.0)
    aus = []

    def collect():
        for _ in range(3):
            au = rx.recv_access_unit()
            if au is not None:
                aus.append(au)

    t = threading.Thread(target=collect)
    t.start()
    rc = relay.run([
        "--source=test", "--width=96", "--height=64", "--max-frames=8",
        f"--sink=rtp+h264://127.0.0.1:{rx.port}", "--batch=2",
        "--op=clahe", "--ref-frame", "--native", "--encoder=pcm",
        # adaptive-rate admits on a slot grid (videorate drop-only); a
        # non-realtime burst source needs a high ceiling to pass frames
        "--adaptive-rate", "--max-rate=100000",
    ])
    t.join(timeout=60)
    rx.close()
    assert rc == 0
    assert len(aus) == 3
    es = tmp_path / "compose.h264"
    es.write_bytes(b"".join(aus))
    cap = cv2.VideoCapture(str(es))
    ok, frame = cap.read()
    assert ok and frame.shape[:2] == (64, 96)
    cap.release()


def test_ffmpeg_encoder_with_stub_process(tmp_path):
    """FfmpegEncoder's process plumbing (threaded stdout reader, AU
    framing, flush/drain) against a stub 'ffmpeg' that PCM-encodes each
    raw NV12 frame it reads — no real ffmpeg exists in this container."""
    import stat
    import sys
    import textwrap

    from opencv_opencl_tpu.io.encoder import FfmpegEncoder

    w, h = 64, 48
    stub = tmp_path / "ffmpeg"
    stub.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys
        sys.path.insert(0, {str(tmp_path.parent.parent)!r})
        sys.path.insert(0, "/root/repo")
        from opencv_opencl_tpu.io.h264_pcm import PcmH264Encoder
        import numpy as np
        enc = PcmH264Encoder({w}, {h})
        frame_bytes = {w * h * 3 // 2}
        data = sys.stdin.buffer
        out = sys.stdout.buffer
        while True:
            buf = data.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            arr = np.frombuffer(buf, np.uint8).reshape({h * 3 // 2}, {w})
            for au in enc.encode(arr):
                out.write(au)
        out.flush()
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    enc = FfmpegEncoder(w, h, fps=30.0, ffmpeg=str(stub))
    ref = PcmH264Encoder(w, h)
    frames = [rand_nv12(w, h, seed=i) for i in range(3)]
    got = []
    expect = []
    for f in frames:
        got.extend(enc.encode(f))
        expect.extend(ref.encode(f))
    got.extend(enc.flush())
    enc.close()
    # the stub's byte stream comes back re-framed into the same AUs
    assert got == expect
    assert enc.frames == 3


def test_relay_h264_sink_writes_sdp(tmp_path):
    """--sdp-file works for the encoded sink too: a stock player's
    session description for the H.264 RTP stream."""
    from opencv_opencl_tpu.apps import relay
    from opencv_opencl_tpu.io.sdp import parse_sdp

    sdp_path = tmp_path / "s.sdp"
    rc = relay.run([
        "--source=test", "--width=64", "--height=48", "--max-frames=2",
        "--sink=rtp+h264://127.0.0.1:15704", "--encoder=pcm", "--batch=2",
        f"--sdp-file={sdp_path}", "--op=histeq",
    ])
    assert rc == 0
    text = sdp_path.read_text()
    assert "H264/90000" in text
    assert "packetization-mode=1" in text
    sess = parse_sdp(text)
    assert sess.medias[0].kind == "video"


@pytest.mark.slow
def test_pcm_encoder_property_fuzz():
    """Random geometries x content classes: every stream reconstructs
    bit-exactly through the mini parser AND the Y plane decodes
    bit-exactly through libavcodec."""
    import cv2

    rng = np.random.default_rng(99)
    for trial in range(40):
        w = int(rng.integers(1, 40)) * 2
        h = int(rng.integers(1, 30)) * 2
        kind = trial % 4
        if kind == 0:
            f = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        elif kind == 1:
            f = np.zeros((h * 3 // 2, w), np.uint8)  # escape worst case
        elif kind == 2:
            f = np.full((h * 3 // 2, w), 255, np.uint8)
        else:  # small-byte soup: adversarial for emulation prevention
            f = rng.choice(
                np.array([0, 0, 1, 2, 3, 128], np.uint8),
                size=(h * 3 // 2, w)).astype(np.uint8)
        idr = trial % 2
        sl = encode_frame_pcm(f, w, h, idr_pic_id=idr)
        assert np.array_equal(parse_pcm_slice(sl, w, h, idr), f), (
            trial, w, h, kind)
    # one decoder pass over a mixed-content stream
    w, h = 48, 32
    enc = PcmH264Encoder(w, h)
    frames = [np.zeros((h * 3 // 2, w), np.uint8),
              rand_nv12(w, h, seed=5),
              np.full((h * 3 // 2, w), 255, np.uint8)]
    es = b"".join(b"".join(enc.encode(f)) for f in frames)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".h264") as tf:
        tf.write(es)
        tf.flush()
        cap = cv2.VideoCapture(tf.name)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for f in frames:
            ok, raw = cap.read()
            assert ok and np.array_equal(raw[:h, :w], f[:h])
        cap.release()


def test_ffmpeg_encoder_three_byte_start_codes(tmp_path):
    """x264 emits 3-byte start codes for non-first NALs; the AU-framing
    byte accounting must not corrupt the stream (split_access_units
    normalizes to 4-byte codes, so length arithmetic alone is wrong)."""
    import stat
    import sys
    import textwrap

    from opencv_opencl_tpu.io.encoder import FfmpegEncoder

    w, h = 32, 32
    # stub emits per frame: SPS(3-byte code) PPS(3-byte) IDR(4-byte)
    stub = tmp_path / "ffmpeg"
    stub.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys
        frame_bytes = {w * h * 3 // 2}
        data = sys.stdin.buffer
        out = sys.stdout.buffer
        i = 0
        while True:
            buf = data.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            # NALs never end in 0x00 (rbsp trailing bits) and a
            # picture-starting slice has its first header bit set
            # (first_mb_in_slice=0 -> leading ue(v) '1' bit)
            sps = bytes([0x67, 66, 0xC0, 10, (i & 0xFF) | 1])
            pps = bytes([0x68, 0xCE, 0x38, 0x80])
            idr = bytes([0x65, 0x88]) + bytes((j * 7 + i) % 255 + 1
                                              for j in range(40))
            out.write(b"\\x00\\x00\\x01" + sps)
            out.write(b"\\x00\\x00\\x01" + pps)
            out.write(b"\\x00\\x00\\x00\\x01" + idr)
            out.flush()
            i += 1
        """))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    enc = FfmpegEncoder(w, h, ffmpeg=str(stub))
    f = rand_nv12(w, h)
    got = []
    import time

    for _ in range(3):
        got.extend(enc.encode(f))
        time.sleep(0.1)  # let the reader thread drain the stub
    got.extend(enc.flush())
    enc.close()
    assert len(got) == 3
    for i, au in enumerate(got):
        nals = split_annexb(au)
        assert [n[0] & 0x1F for n in nals] == [7, 8, 5], (i, au.hex())
        assert nals[0][4] == (i | 1)  # per-frame SPS marker byte intact
        assert len(nals[2]) == 42


class TestMultiSlicePcm:
    def test_multi_slice_decodes_bit_exact(self, tmp_path):
        """slices=3 with a thread pool: NAL structure SPS PPS IDRx3 and
        Y bit-exact through libavcodec (incl. cropped odd geometry)."""
        import cv2

        for w, h, sl in [(96, 64, 3), (36, 28, 2)]:
            enc = PcmH264Encoder(w, h, slices=sl, threads=2)
            frames = [rand_nv12(w, h, seed=i) for i in range(2)]
            es = b"".join(b"".join(enc.encode(f)) for f in frames)
            p = tmp_path / f"ms_{w}x{h}.h264"
            p.write_bytes(es)
            nals = split_annexb(b"".join(enc.encode(frames[0])))
            assert [n[0] & 0x1F for n in nals] == [7, 8] + [5] * sl
            enc.close()
            cap = cv2.VideoCapture(str(p))
            cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
            for f in frames:
                ok, raw = cap.read()
                assert ok and np.array_equal(raw[:h, :w], f[:h]), (w, h, sl)
            cap.release()

    def test_pcm_slice_backend_syntax(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        enc = make_encoder("pcm:4", 64, 48)
        assert enc.slices == 4
        enc.close()
        with pytest.raises(ValueError, match="slice count"):
            make_encoder("pcm:x", 64, 48)

    def test_multi_slice_full_chroma_roundtrip_mini_parser(self):
        """Bit-exact luma AND chroma through the mini parser across
        slice boundaries (the decoder test only checks Y)."""
        from opencv_opencl_tpu.io.h264_pcm import encode_frame_pcm_slices

        w, h = 96, 64  # 4 MB rows
        f = rand_nv12(w, h, seed=11)
        nals = encode_frame_pcm_slices(f, w, h, idr_pic_id=1, slices=3)
        mb_w, mb_h = w // 16, h // 16
        bounds = [round(i * mb_h / 3) for i in range(4)]
        mbs_parts = []
        for i, nal in enumerate(nals):
            rbsp = unescape(nal)
            head = _slice_head(1, first_mb=bounds[i] * mb_w)
            assert rbsp[: len(head)] == head
            band = (bounds[i + 1] - bounds[i]) * mb_w
            body = rbsp[len(head):]
            pos = 0
            for k in range(band):
                if k > 0:
                    assert body[pos : pos + 2] == b"\x0d\x00"
                    pos += 2
                mbs_parts.append(
                    np.frombuffer(body[pos : pos + 384], np.uint8))
                pos += 384
            assert body[pos:] == b"\x80"
        mbs = np.stack(mbs_parts)
        y = (mbs[:, :256].reshape(mb_h, mb_w, 16, 16)
             .transpose(0, 2, 1, 3).reshape(h, w))
        cb = (mbs[:, 256:320].reshape(mb_h, mb_w, 8, 8)
              .transpose(0, 2, 1, 3).reshape(h // 2, w // 2))
        cr = (mbs[:, 320:].reshape(mb_h, mb_w, 8, 8)
              .transpose(0, 2, 1, 3).reshape(h // 2, w // 2))
        uv = np.stack([cb, cr], axis=-1).reshape(h // 2, w)
        assert np.array_equal(np.concatenate([y, uv], axis=0), f)

    def test_pcm_zero_or_negative_slices_rejected(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        for bad in ("pcm:0", "pcm:-3"):
            with pytest.raises(ValueError, match=">= 1"):
                make_encoder(bad, 64, 48)

    def test_slices_clamped_to_mb_rows(self):
        # 32 px = 2 MB rows: slices=8 clamps to 2
        enc = PcmH264Encoder(32, 32, slices=8)
        (au,) = enc.encode(rand_nv12(32, 32))
        assert [n[0] & 0x1F for n in split_annexb(au)] == [7, 8, 5, 5]


def test_tail_cut_with_trailing_bare_start_code():
    """A buffered snapshot ending exactly with a bare start code must
    not shift the tail cut (review repro: the kept AU's first NAL was
    deleted from the buffer, corrupting the next emitted AU)."""
    import threading

    from opencv_opencl_tpu.io.encoder import FfmpegEncoder

    enc = object.__new__(FfmpegEncoder)
    enc.codec = "h264"
    enc._lock = threading.Lock()
    au1 = (b"\x00\x00\x00\x01" + bytes([0x67, 66, 0xC0, 10, 0x11])
           + b"\x00\x00\x01" + bytes([0x68, 0xCE, 0x38, 0x80])
           + b"\x00\x00\x00\x01" + bytes([0x65, 0x88]) + b"\x10" * 20)
    au2_head = (b"\x00\x00\x00\x01" + bytes([0x67, 66, 0xC0, 10, 0x22])
                + b"\x00\x00\x01" + bytes([0x68, 0xCE, 0x38, 0x80])
                + b"\x00\x00\x00\x01" + bytes([0x65, 0x88]) + b"\x20" * 20)
    # snapshot ends with a BARE 4-byte start code (next NAL not arrived)
    enc._buf = bytearray(au1 + au2_head + b"\x00\x00\x00\x01")
    got = enc._take_complete_aus(final=False)
    assert len(got) == 1  # au1 complete; au2 still growing
    # the kept tail must retain ALL of au2's NALs (SPS intact!)
    from opencv_opencl_tpu.io.rtp_h26x import split_annexb

    kept = bytes(enc._buf)
    nals = split_annexb(kept)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    assert nals[0][4] == 0x22  # au2's own SPS marker byte survived
    # stream the rest: completing au2 emits it intact
    enc._buf.extend(bytes([0x65, 0x88]) + b"\x30" * 20
                    + b"\x00\x00\x00\x01" + bytes([0x67, 66, 0xC0, 10, 0x33]))
    got2 = enc._take_complete_aus(final=False)
    assert len(got2) >= 1
    n2 = split_annexb(got2[0])
    assert n2[0][4] == 0x22  # first emitted AU is au2 WITH its SPS


def test_relay_reports_indivisible_downsample_cleanly(capsys):
    """ValueError from the enhancer build path (hist-downsample vs tile
    height) must exit rc=2 with the message, not a traceback."""
    from opencv_opencl_tpu.apps import relay

    rc = relay.run(["--source=test", "--width=256", "--height=120",
                    "--op=clahe", "--hist-downsample=2",  # tile_h 15
                    "--max-frames=2", "--batch=2"])
    assert rc == 2
    assert "must divide the tile height" in capsys.readouterr().err
