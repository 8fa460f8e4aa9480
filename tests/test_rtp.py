"""RTP/UDP data plane: packets really go on the wire and decode back.

The strong JPEG claim: the receiver-side JFIF reconstruction (RFC 2435
Appendix B standard tables) must decode to EXACTLY the same pixels as
decoding the sender's original JPEG — proving the packetizer carried all
information (scan data + quant tables) and the header rebuild is correct.
"""

import struct

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import color as gcolor
from opencv_opencl_tpu.core.frames import FrameSpec
from opencv_opencl_tpu.io import rtp
from opencv_opencl_tpu.io.videofile import TestSource

W, H = 128, 96
ROWS = H * 3 // 2


def nv12_frame(seed=0):
    return TestSource(FrameSpec(width=W, height=H, fps=30), seed=seed).read()


class TestJpegParsing:
    def test_parse_and_rebuild_decodes_identically(self):
        nv12 = nv12_frame()
        bgr = cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12)
        ok, enc = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
        data = enc.tobytes()
        scan, qtables, w, h, jtype = rtp.parse_jpeg(data)
        assert (w, h) == (W, H)
        assert jtype == 1  # libjpeg default 4:2:0
        assert set(qtables) == {0, 1}
        rebuilt = rtp.rebuild_jfif(scan, qtables, w, h, jtype)
        a = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        b = cv2.imdecode(np.frombuffer(rebuilt, np.uint8), cv2.IMREAD_COLOR)
        assert b is not None, "rebuilt JFIF failed to decode"
        assert np.array_equal(a, b)

    def test_various_qualities(self):
        nv12 = nv12_frame(3)
        bgr = cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12)
        for q in (30, 70, 95):
            ok, enc = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, q])
            scan, qt, w, h, t = rtp.parse_jpeg(enc.tobytes())
            rebuilt = rtp.rebuild_jfif(scan, qt, w, h, t)
            a = cv2.imdecode(enc, cv2.IMREAD_COLOR)
            b = cv2.imdecode(np.frombuffer(rebuilt, np.uint8),
                             cv2.IMREAD_COLOR)
            assert np.array_equal(a, b), f"quality {q}"


class TestPacketFormat:
    def test_rtp_headers(self):
        p = rtp.JpegRtpPayloader(fps=30)
        pkts = p.packetize(nv12_frame())
        assert len(pkts) > 1
        for i, pkt in enumerate(pkts):
            assert pkt[0] >> 6 == 2                    # version
            assert pkt[1] & 0x7F == rtp.PT_JPEG
            seq = struct.unpack("!H", pkt[2:4])[0]
            assert seq == i
            marker = bool(pkt[1] & 0x80)
            assert marker == (i == len(pkts) - 1)      # marker on last
            assert len(pkt) <= rtp.DEFAULT_MTU
        # fragment offsets are cumulative over the scan
        offs = [(pkt[13] << 16) | (pkt[14] << 8) | pkt[15] for pkt in pkts]
        assert offs[0] == 0 and offs == sorted(offs)

    def test_timestamp_advances_per_frame(self):
        p = rtp.JpegRtpPayloader(fps=30)
        p.packetize(nv12_frame(0))
        pkts2 = p.packetize(nv12_frame(1))
        ts = struct.unpack("!I", pkts2[0][4:8])[0]
        assert ts == 3000  # 90000/30


class TestLoopback:
    def test_jpeg_over_udp(self):
        rx = rtp.RtpUdpReceiver(kind="jpeg")
        tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="jpeg", fps=30)
        nv12 = nv12_frame()
        tx.write(nv12)
        got = rx.recv_frame()
        tx.close()
        rx.close()
        assert got is not None and got.shape == (H, W, 3)
        # lossy path: compare against the direct decode of the same encode
        bgr = cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12)
        ok, enc = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
        direct = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        assert np.array_equal(got, direct)
        assert tx.packets > 1 and tx.bytes > 1000

    def test_raw_nv12_bit_exact(self):
        rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
        tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
        nv12 = nv12_frame(7)
        tx.write(nv12)
        got = rx.recv_frame()
        tx.close()
        rx.close()
        assert np.array_equal(got, nv12)

    def test_relay_streams_to_rtp_sink(self):
        """relay --sink=rtp://... : frames leave the process as RTP/UDP
        (the udpsink host=... port=5004 analogue)."""
        import threading

        from opencv_opencl_tpu.apps import relay

        rx = rtp.RtpUdpReceiver(kind="jpeg", timeout=30.0)
        frames = []

        def collect():
            for _ in range(2):
                f = rx.recv_frame()
                if f is not None:
                    frames.append(f)

        t = threading.Thread(target=collect)
        t.start()
        rc = relay.run([
            "--source=test", "--width=96", "--height=64", "--max-frames=6",
            f"--sink=rtp://127.0.0.1:{rx.port}", "--batch=2", "--op=histeq",
        ])
        t.join(timeout=30)
        rx.close()
        assert rc == 0
        assert len(frames) == 2
        assert frames[0].shape == (64, 96, 3)


def test_native_raw_sender_wire_identical():
    """The C++ sendmmsg raw path must put byte-identical packets on the
    wire vs the Python packetizer (same headers, same payload split)."""
    from opencv_opencl_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    nv12 = nv12_frame(11)
    # python packets (reference formatting)
    py = rtp.RawNv12Payloader(fps=30)
    expected = py.packetize(nv12)
    # native packets, captured off a loopback socket
    import socket as socklib

    rxs = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    rxs.bind(("127.0.0.1", 0))
    rxs.settimeout(5.0)
    port = rxs.getsockname()[1]
    txs = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    n = native.rtp_send_raw(txs.fileno(), nv12, rtp.DEFAULT_MTU, 0, 0,
                            0x54505532, rtp.PT_RAW, "127.0.0.1", port)
    assert n == len(expected)
    got = [rxs.recv(65536) for _ in range(n)]
    txs.close()
    rxs.close()
    assert got == expected


def test_native_raw_sink_roundtrip_and_speed():
    from opencv_opencl_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
    nv12 = nv12_frame(13)
    tx.write(nv12)
    got = rx.recv_frame()
    assert np.array_equal(got, nv12)
    # sequence continuity across the native path
    nv12b = nv12_frame(14)
    tx.write(nv12b)
    got2 = rx.recv_frame()
    assert np.array_equal(got2, nv12b)
    tx.close()
    rx.close()


def test_rtp_receiver_app_records(tmp_path):
    """relay --sink=rtp:// ... -> rtp_receiver --output=...mp4 end-to-end."""
    import threading

    from opencv_opencl_tpu.apps import relay, rtp_receiver

    out = str(tmp_path / "rx.mp4")
    # pick a free port via a throwaway receiver
    probe = rtp.RtpUdpReceiver(kind="jpeg")
    port = probe.port
    probe.close()
    res = {}

    def rx():
        res["rc"] = rtp_receiver.run([
            f"--port={port}", "--kind=jpeg", f"--output={out}",
            "--max-frames=3", "--timeout=25",
        ])

    t = threading.Thread(target=rx)
    t.start()
    import time

    time.sleep(0.3)
    rc_tx = relay.run([
        "--source=test", "--width=96", "--height=64", "--max-frames=8",
        f"--sink=rtp://127.0.0.1:{port}", "--batch=2", "--op=histeq",
    ])
    t.join(timeout=60)
    assert rc_tx == 0
    assert res.get("rc") == 0
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_jpeg_odd_dimensions_cropped_to_decodable():
    """RFC 2435 carries dim/8: odd geometry must crop to multiples of 8 so
    the receiver-rebuilt SOF matches the scan data (round-2 review fix)."""
    from opencv_opencl_tpu.core.frames import FrameSpec

    spec = FrameSpec(width=126, height=94, fps=30)  # not /8
    nv12 = TestSource(spec).read()
    rx = rtp.RtpUdpReceiver(kind="jpeg")
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="jpeg", fps=30)
    tx.write(nv12)
    got = rx.recv_frame()
    tx.close()
    rx.close()
    assert got is not None
    assert got.shape == (88, 120, 3)  # cropped to /8


def test_native_failure_never_resends_stale_seqs():
    """A failed native send must not fall back to re-packetizing the frame
    with stale sequence numbers (duplicate-seq corruption)."""
    from opencv_opencl_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    tx = rtp.RtpUdpSink("127.0.0.1", 1, kind="raw", fps=30)
    if not tx._use_native:
        pytest.skip("native path off")
    tx.sock.close()  # force sendmmsg failure (bad fd)
    import socket as socklib

    tx.sock = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    fd = tx.sock.fileno()
    tx.sock.close()  # fd now invalid -> native send fails immediately
    class _FakeSock:
        def fileno(self):
            return fd
        def close(self):
            pass
    tx.sock = _FakeSock()
    seq_before = tx.payloader.seq
    tx.write(nv12_frame())  # must not raise, must not python-resend
    assert tx.send_errors == 1
    assert tx.packets == 0  # nothing went out
    assert tx.payloader.seq == seq_before  # 0 sent -> seq unchanged
    assert tx.frames == 1


class TestPacketLoss:
    """Receivers must degrade to frame drops under loss, never to
    corrupted decodes (the reference's leaky-queue philosophy on the
    receive side)."""

    def _send_with_loss(self, rx_port, kind, frames, drop_pred):
        import socket as socklib

        pay = (rtp.RawNv12Payloader(fps=30) if kind == "raw"
               else rtp.JpegRtpPayloader(fps=30))
        sock = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
        i = 0
        for f in frames:
            for pkt in pay.packetize(f):
                if not drop_pred(i):
                    sock.sendto(pkt, ("127.0.0.1", rx_port))
                i += 1
        sock.close()

    def test_raw_drops_incomplete_frame(self):
        rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
        frames = [nv12_frame(1), nv12_frame(2)]
        # drop a mid-frame packet of frame 0 only
        self._send_with_loss(rx.port, "raw", frames, lambda i: i == 3)
        got = rx.recv_frame()
        rx.close()
        assert np.array_equal(got, frames[1])  # frame 0 dropped, 1 intact
        assert rx.frames_dropped == 1

    def test_jpeg_drops_incomplete_frame(self):
        rx = rtp.RtpUdpReceiver(kind="jpeg")
        frames = [nv12_frame(3), nv12_frame(4)]
        self._send_with_loss(rx.port, "jpeg", frames, lambda i: i == 1)
        got = rx.recv_frame()
        rx.close()
        assert got is not None
        # frame 1 decodes exactly as its direct encode
        bgr = cv2.cvtColor(frames[1], cv2.COLOR_YUV2BGR_NV12)
        ok, enc = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
        assert np.array_equal(got, cv2.imdecode(enc, cv2.IMREAD_COLOR))
        assert rx.frames_dropped == 1

    def test_lost_marker_resyncs_on_next_frame(self):
        rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
        frames = [nv12_frame(5), nv12_frame(6)]
        # drop frame 0's LAST packet (the marker)
        pay_probe = rtp.RawNv12Payloader(fps=30)
        n0 = len(pay_probe.packetize(frames[0]))
        self._send_with_loss(rx.port, "raw", frames, lambda i: i == n0 - 1)
        got = rx.recv_frame()
        rx.close()
        assert np.array_equal(got, frames[1])
        assert rx.frames_dropped == 1


def test_receiver_ignores_foreign_datagrams():
    """Runt / geometry-mismatched packets must be counted and skipped,
    never crash the receive loop."""
    import socket as socklib

    rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
    s = socklib.socket(socklib.AF_INET, socklib.SOCK_DGRAM)
    s.sendto(b"\x80", ("127.0.0.1", rx.port))          # runt
    s.sendto(b"\x80" * 14 + struct.pack("!HHH", 4, 9999, 0) + b"abcd",
             ("127.0.0.1", rx.port))                    # line out of range
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
    f = nv12_frame(21)
    tx.write(f)
    got = rx.recv_frame()
    s.close()
    tx.close()
    rx.close()
    assert np.array_equal(got, f)
    assert rx.packets_bad >= 2


def test_native_sink_bytes_counts_payload():
    from opencv_opencl_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
    f = nv12_frame(22)
    tx.write(f)
    rx.recv_frame()
    rx.close()
    assert tx.bytes >= f.nbytes  # payload counted, not just headers
    tx.close()


def test_receiver_ignores_foreign_ssrc_and_pt():
    """Two senders on one port: the receiver locks the first SSRC; the
    second stream neither corrupts reassembly nor saturates the RTCP
    loss stats (review finding: fraction_lost would hit 255 and drive
    --adaptive-rate to the floor on a loss-free link)."""
    import socket as socketmod

    rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(ROWS, W))
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
    stray = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
    foreign = rtp.RawNv12Payloader(ssrc=0xDEADBEEF)
    foreign.seq = 40000  # a disjoint sequence space
    try:
        f1 = nv12_frame(31)
        tx.write(f1)
        got1 = rx.recv_frame()
        for pkt in foreign.packetize(nv12_frame(32)):
            stray.sendto(pkt, ("127.0.0.1", rx.port))
        f2 = nv12_frame(33)
        tx.write(f2)
        got2 = rx.recv_frame()
    finally:
        stray.close()
        tx.close()
        rx.close()
    assert np.array_equal(got1, f1) and np.array_equal(got2, f2)
    assert rx.packets_bad >= 1
    if rx.rtcp is not None:
        assert rx.rtcp.stats.cumulative_lost == 0


def test_sink_rtcp_rides_companion_port():
    """RFC 3550 port convention: the sink's RTCP socket binds its RTP
    source port + 1 so standards peers can address RRs without having
    seen an SR first."""
    tx = rtp.RtpUdpSink("127.0.0.1", 59999, kind="raw", fps=30)
    try:
        assert tx.rtcp is not None
        assert tx.rtcp.port == tx.rtp_port + 1
    finally:
        tx.close()


def test_raw_payloader_last_ts():
    pay = rtp.RawNv12Payloader(fps=30)
    pay.packetize(np.zeros((6, 64), np.uint8))
    assert pay.last_ts == 0 and pay.ts == pay.ts_step


def test_jpeg_receiver_survives_truncated_qtable_header():
    """A matching-SSRC/PT datagram whose in-band Q-table header is
    truncated (or lies about its length) must be counted bad and the
    stream must recover on the next intact frame — not crash the loop."""
    rx = rtp.RtpUdpReceiver(kind="jpeg")
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="jpeg", fps=30)
    import socket as socketmod

    stray = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
    try:
        nv12 = nv12_frame(41)
        # lock the receiver onto the sink's stream first
        tx.write(nv12)
        assert rx.recv_frame() is not None
        # hand-craft a first-fragment packet with q>=128 but a body too
        # short for its claimed q-table length, using the locked SSRC
        p = tx.payloader
        hdr = rtp._rtp_header(rtp.PT_JPEG, p.seq, p.ts, p.ssrc, False)
        jpeg_hdr = struct.pack("!BBBBBBBB", 0, 0, 0, 0, 1, 255, 16, 12)
        evil = hdr + jpeg_hdr + struct.pack("!BBH", 0, 0, 4096) + b"\x00" * 8
        stray.sendto(evil, ("127.0.0.1", rx.port))
        tx.write(nv12)  # an intact frame follows
        got = rx.recv_frame()
        assert got is not None
        assert rx.packets_bad >= 1
    finally:
        stray.close()
        tx.close()
        rx.close()


def test_receiver_custom_pt():
    """--pt pins the payload type on the jpeg/raw plane too."""
    rx = rtp.RtpUdpReceiver(kind="raw", frame_shape=(6, 64), pt=111)
    tx = rtp.RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
    tx.payloader.ssrc = 0x42
    try:
        f = np.arange(6 * 64, dtype=np.uint8).reshape(6, 64)
        pkts = [bytearray(p) for p in tx.payloader.packetize(f)]
        import socket as socketmod

        s = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
        for p in pkts:
            p[1] = (p[1] & 0x80) | 111  # rewrite PT to 111
            s.sendto(bytes(p), ("127.0.0.1", rx.port))
        got = rx.recv_frame()
        s.close()
        assert np.array_equal(got, f)
    finally:
        tx.close()
        rx.close()


def test_empty_batch_histeq():
    import jax.numpy as jnp

    from opencv_opencl_tpu.ops import histeq

    out = histeq.equalize_hist_batch(jnp.zeros((0, 8, 128), jnp.uint8))
    assert out.shape == (0, 8, 128)


def test_stream_lock_rearms_after_silence():
    """A restarted standards sender picks a fresh SSRC (RFC 3550 §8);
    the lock must re-arm after silence instead of pinning the dead one."""
    from opencv_opencl_tpu.io.rtp import StreamLock, _rtp_header

    lock = StreamLock(pt=None, require_dynamic=True, relock_timeout=5.0)
    p1 = _rtp_header(96, 1, 1000, 0xAAAA0001, False) + b"x"
    p2 = _rtp_header(96, 900, 5000, 0xBBBB0002, False) + b"x"
    assert lock.accept(p1, now=0.0)
    # a foreign SSRC while the stream is live stays rejected
    assert not lock.accept(p2, now=1.0)
    assert lock.ssrc == 0xAAAA0001
    # ... but after the silence timeout the new stream takes the lock
    assert lock.accept(p2, now=7.0)
    assert lock.ssrc == 0xBBBB0002
    assert lock.relocks == 1
    # non-dynamic PT still refused even on re-arm
    p3 = _rtp_header(26, 5, 1, 0xCCCC0003, False) + b"x"
    assert not lock.accept(p3, now=20.0)
    # a pinned PT never relocks onto a different PT
    pinned = StreamLock(pt=96, relock_timeout=5.0)
    assert pinned.accept(p1, now=0.0)
    p4 = _rtp_header(97, 2, 1, 0xDDDD0004, False) + b"x"
    assert not pinned.accept(p4, now=30.0)
    assert pinned.pt == 96


def test_stream_lock_relock_disabled():
    from opencv_opencl_tpu.io.rtp import StreamLock, _rtp_header

    lock = StreamLock(relock_timeout=None)
    p1 = _rtp_header(96, 1, 0, 1, False) + b"x"
    p2 = _rtp_header(96, 1, 0, 2, False) + b"x"
    assert lock.accept(p1, now=0.0)
    assert not lock.accept(p2, now=1e9)  # never re-arms
