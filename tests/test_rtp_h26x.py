"""RTP H.264 (RFC 6184) / H.265 (RFC 7798) payloading tests.

The reference's wire format is whatever ``rtph264pay``/``rtph265pay``
emit after the OMX encoder (``OpenCVequalHist.cpp:308-332``); this repo's
native packetizer must interoperate with those elements, so these tests
pin the packet layouts (single NAL / STAP-A / FU-A / AP / FU) and the
loss-tolerance contract (an AU with a gap is dropped whole, never torn).

No H.26x encoder exists in this container (see io/rtp_h26x.py), so the
bitstreams are synthetic Annex-B: NAL headers are real, payloads are
pseudo-random.  Round-trip equality is byte-exact on the NAL level.
"""

import struct

import numpy as np
import pytest

from opencv_opencl_tpu.io.rtp_h26x import (
    H26xDepacketizer,
    H26xRtpReceiver,
    H26xRtpSink,
    H264RtpPayloader,
    H265RtpPayloader,
    split_annexb,
)


def _rng(seed):
    return np.random.default_rng(seed)


def h264_nal(ntype: int, size: int, seed: int = 0, nri: int = 3) -> bytes:
    body = _rng(seed).integers(1, 255, size - 1, dtype=np.uint8).tobytes()
    return bytes([(nri << 5) | ntype]) + body


def h265_nal(ntype: int, size: int, seed: int = 0) -> bytes:
    hdr = struct.pack("!H", (ntype << 9) | (0 << 3) | 1)  # layer 0, tid 1
    body = _rng(seed).integers(1, 255, size - 2, dtype=np.uint8).tobytes()
    return hdr + body


def annexb(*nals: bytes) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def roundtrip(payloader, codec, au: bytes) -> bytes | None:
    depay = H26xDepacketizer(codec)
    out = None
    for pkt in payloader.packetize(au):
        got = depay.push(pkt)
        if got is not None:
            out = got
    return out


class TestAnnexB:
    def test_split_mixed_start_codes(self):
        n1, n2, n3 = h264_nal(7, 10), h264_nal(8, 6), h264_nal(5, 50)
        data = b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x01" + n2 + \
               b"\x00\x00\x00\x01" + n3
        assert split_annexb(data) == [n1, n2, n3]

    def test_split_empty_and_garbage(self):
        assert split_annexb(b"") == []
        assert split_annexb(b"\x01\x02\x03") == []


class TestH264:
    def test_single_nal_roundtrip(self):
        au = annexb(h264_nal(5, 400))
        pay = H264RtpPayloader(mtu=1200)
        pkts = pay.packetize(au)
        assert len(pkts) == 1
        assert pkts[0][12] & 0x1F == 5  # single NAL unit packet
        assert pkts[0][1] & 0x80        # marker on last packet of AU
        assert roundtrip(H264RtpPayloader(mtu=1200), "h264", au) == au

    def test_stap_a_aggregates_sps_pps(self):
        sps, pps, idr = h264_nal(7, 20), h264_nal(8, 8), h264_nal(5, 5000)
        au = annexb(sps, pps, idr)
        pay = H264RtpPayloader(mtu=1200)
        pkts = pay.packetize(au)
        # first packet: STAP-A carrying SPS+PPS; then FU-A for the IDR
        assert pkts[0][12] & 0x1F == 24
        assert all(p[12] & 0x1F == 28 for p in pkts[1:])
        assert roundtrip(H264RtpPayloader(mtu=1200), "h264", au) == au

    def test_fu_a_fragment_layout(self):
        nal = h264_nal(1, 3000)
        pay = H264RtpPayloader(mtu=1200, aggregate=False)
        pkts = pay.packetize(annexb(nal))
        assert len(pkts) == 3
        for i, p in enumerate(pkts):
            assert p[12] & 0x1F == 28
            assert len(p) <= 1200
            fu = p[13]
            assert bool(fu & 0x80) == (i == 0)              # S bit
            assert bool(fu & 0x40) == (i == len(pkts) - 1)  # E bit
            assert fu & 0x1F == 1                           # original type
            assert p[12] & 0x60 == nal[0] & 0x60            # NRI preserved
        # marker only on the AU's last packet
        assert [bool(p[1] & 0x80) for p in pkts] == [False, False, True]

    def test_fu_boundary_exact_fit(self):
        # NAL exactly at the single-packet limit must NOT fragment
        room = 1200 - 12
        au = annexb(h264_nal(1, room))
        pkts = H264RtpPayloader(mtu=1200, aggregate=False).packetize(au)
        assert len(pkts) == 1
        # one byte over: fragments
        au2 = annexb(h264_nal(1, room + 1))
        pkts2 = H264RtpPayloader(mtu=1200, aggregate=False).packetize(au2)
        assert len(pkts2) == 2
        assert roundtrip(H264RtpPayloader(mtu=1200, aggregate=False),
                         "h264", au2) == au2

    def test_many_aus_sequence_and_timestamps(self):
        pay = H264RtpPayloader(mtu=300, fps=30)
        depay = H26xDepacketizer("h264")
        aus = [annexb(h264_nal(7, 15), h264_nal(8, 9), h264_nal(5, 900, i))
               for i in range(5)]
        got = []
        ts_seen = []
        for au in aus:
            pkts = pay.packetize(au)
            ts_seen.append(struct.unpack("!I", pkts[0][4:8])[0])
            for p in pkts:
                out = depay.push(p)
                if out is not None:
                    got.append(out)
        assert got == aus
        assert ts_seen == [i * 3000 for i in range(5)]

    def test_lost_packet_drops_whole_au(self):
        pay = H264RtpPayloader(mtu=300)
        depay = H26xDepacketizer("h264")
        au1 = annexb(h264_nal(5, 2000, 1))
        au2 = annexb(h264_nal(1, 2000, 2))
        pkts1 = pay.packetize(au1)
        got = [depay.push(p) for p in pkts1[:2] + pkts1[3:]]  # drop one
        assert all(g is None for g in got)
        assert depay.aus_dropped == 1
        # next AU still decodes (resync)
        got2 = [depay.push(p) for p in pay.packetize(au2)]
        assert got2[-1] == au2

    def test_lost_marker_does_not_poison_next_au(self):
        pay = H264RtpPayloader(mtu=300)
        depay = H26xDepacketizer("h264")
        au1 = annexb(h264_nal(5, 600, 1))
        au2 = annexb(h264_nal(1, 600, 2))
        pkts1 = pay.packetize(au1)
        for p in pkts1[:-1]:  # marker packet lost
            assert depay.push(p) is None
        # AU2's packets arrive: AU1 is dropped, but the single-seq gap
        # straddling the ts boundary is AU1's lost tail (a marker-setting
        # sender would have emitted AU1 otherwise), so AU2 survives
        got = [depay.push(p) for p in pay.packetize(au2)]
        assert got[-1] == au2
        assert depay.aus_dropped == 1

    def test_boundary_gap_of_two_poisons_next_au(self):
        # marker of AU1 AND first packet of AU2 both lost: gap >= 2 at
        # the ts boundary can hide a head loss, so AU2 must be dropped
        pay = H264RtpPayloader(mtu=300)
        depay = H26xDepacketizer("h264")
        au1 = annexb(h264_nal(5, 600, 1))
        au2 = annexb(h264_nal(1, 600, 2) + h264_nal(1, 100, 3))
        pkts1 = pay.packetize(au1)
        pkts2 = pay.packetize(au2)
        for p in pkts1[:-1]:
            assert depay.push(p) is None
        got = [depay.push(p) for p in pkts2[1:]]  # AU2 head also lost
        assert all(g is None for g in got)
        assert depay.aus_dropped == 2
        au3 = annexb(h264_nal(1, 600, 4))
        got3 = [depay.push(p) for p in pay.packetize(au3)]
        assert got3[-1] == au3

    def test_duplicate_packet_ignored(self):
        # an exact network duplicate must neither poison the AU nor
        # double its NAL
        pay = H264RtpPayloader(mtu=300)
        depay = H26xDepacketizer("h264")
        au = annexb(h264_nal(5, 600, 7))
        pkts = pay.packetize(au)
        results = []
        for p in pkts:
            results.append(depay.push(p))
            assert depay.push(p) is None  # duplicate of every packet
        assert results[-1] == au
        assert depay.packets_dup == len(pkts)
        assert depay.aus_dropped == 0
        # and the stream continues cleanly
        au2 = annexb(h264_nal(1, 600, 8))
        got2 = [depay.push(p) for p in pay.packetize(au2)]
        assert got2[-1] == au2


class TestH265:
    def test_single_nal_roundtrip(self):
        au = annexb(h265_nal(19, 700))  # IDR_W_RADL
        assert roundtrip(H265RtpPayloader(mtu=1200), "h265", au) == au

    def test_ap_aggregation(self):
        vps, sps, pps = h265_nal(32, 12), h265_nal(33, 30), h265_nal(34, 9)
        au = annexb(vps, sps, pps, h265_nal(19, 4000))
        pay = H265RtpPayloader(mtu=1200)
        pkts = pay.packetize(au)
        assert (struct.unpack("!H", pkts[0][12:14])[0] >> 9) & 0x3F == 48
        assert roundtrip(H265RtpPayloader(mtu=1200), "h265", au) == au

    def test_fu_layout_and_roundtrip(self):
        nal = h265_nal(19, 5000)
        au = annexb(nal)
        pay = H265RtpPayloader(mtu=1200, aggregate=False)
        pkts = pay.packetize(au)
        assert len(pkts) > 1
        for i, p in enumerate(pkts):
            (h,) = struct.unpack("!H", p[12:14])
            assert (h >> 9) & 0x3F == 49
            fu = p[14]
            assert bool(fu & 0x80) == (i == 0)
            assert bool(fu & 0x40) == (i == len(pkts) - 1)
            assert fu & 0x3F == 19
        assert roundtrip(H265RtpPayloader(mtu=1200, aggregate=False),
                         "h265", au) == au

    def test_layer_tid_preserved_through_fu(self):
        hdr = struct.pack("!H", (19 << 9) | (5 << 3) | 2)  # layer 5, tid 2
        nal = hdr + bytes(range(256)) * 12
        au = annexb(nal)
        got = roundtrip(H265RtpPayloader(mtu=300, aggregate=False),
                        "h265", au)
        assert got == au


class TestUdpLoopback:
    def test_sink_to_receiver_with_rtcp(self):
        rx = H26xRtpReceiver(port=0, codec="h264", timeout=5.0)
        assert rx.rtcp is not None
        rx.rtcp.interval = 0.0
        sink = H26xRtpSink("127.0.0.1", rx.port, codec="h264", fps=30)
        sink.rtcp.interval = 0.0
        try:
            aus = [annexb(h264_nal(7, 20), h264_nal(8, 10),
                          h264_nal(5, 9000, i)) for i in range(3)]
            got = []
            import time

            for au in aus:
                sink.write(au)
                got.append(rx.recv_access_unit())
                time.sleep(0.02)
            assert got == aus
            sink.rtcp.poll()
            assert sink.rtcp.remote_blocks
            assert sink.rtcp.remote_blocks[-1].cumulative_lost == 0
        finally:
            sink.close()
            rx.close()

    def test_receiver_app_records_elementary_stream(self, tmp_path):
        import threading

        from opencv_opencl_tpu.apps import rtp_receiver

        out = tmp_path / "cap.h264"
        result = []

        # grab a free port for the app to listen on
        import socket

        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        t = threading.Thread(
            target=lambda: result.append(rtp_receiver.run(
                [f"--port={port}", "--kind=h264", "--max-frames=2",
                 "--timeout=10", f"--output={out}"])))
        t.start()
        import time

        time.sleep(0.3)
        sink = H26xRtpSink("127.0.0.1", port, codec="h264")
        aus = [annexb(h264_nal(7, 20), h264_nal(5, 2500, i))
               for i in range(2)]
        for au in aus:
            sink.write(au)
            time.sleep(0.05)
        t.join(timeout=10)
        sink.close()
        assert result == [0]
        assert out.read_bytes() == b"".join(aus)


class TestRobustness:
    """Hardened depacketizer paths: malformed aggregation packets and
    misconfigured MTUs fail safe (review findings, round 2)."""

    def test_truncated_stap_length_drops_au(self):
        # STAP-A whose 16-bit NAL length exceeds the remaining bytes must
        # poison the AU, never emit a torn NAL
        pay = H264RtpPayloader()
        (pkt,) = pay.packetize(annexb(h264_nal(7, 10), h264_nal(8, 6)))
        p = bytearray(pkt)
        # first aggregation-unit length field lives at payload offset 1
        struct.pack_into("!H", p, 12 + 1, 0x4000)
        depay = H26xDepacketizer("h264")
        assert depay.push(bytes(p)) is None
        assert depay.aus_dropped == 1 and depay.packets_bad == 1

    def test_zero_length_stap_unit_drops_au(self):
        pay = H264RtpPayloader()
        (pkt,) = pay.packetize(annexb(h264_nal(7, 10), h264_nal(8, 6)))
        p = bytearray(pkt)
        struct.pack_into("!H", p, 12 + 1, 0)
        depay = H26xDepacketizer("h264")
        assert depay.push(bytes(p)) is None
        assert depay.aus_dropped == 1

    def test_h265_truncated_ap_drops_au(self):
        pay = H265RtpPayloader()
        (pkt,) = pay.packetize(annexb(h265_nal(33, 12), h265_nal(34, 8)))
        p = bytearray(pkt)
        # AP payload: 2B PayloadHdr, then length at offset 2
        struct.pack_into("!H", p, 12 + 2, 0x4000)
        depay = H26xDepacketizer("h265")
        assert depay.push(bytes(p)) is None
        assert depay.aus_dropped == 1

    def test_tiny_mtu_rejected(self):
        # mtu so small FU fragments would carry 0 payload bytes used to
        # loop forever in _fu_fragments
        with pytest.raises(ValueError):
            H264RtpPayloader(mtu=14)
        with pytest.raises(ValueError):
            H265RtpPayloader(mtu=15)
        H264RtpPayloader(mtu=15)  # smallest legal
        H265RtpPayloader(mtu=16)

    def test_receiver_ignores_foreign_ssrc(self):
        """A second sender on the same port must not corrupt the locked
        stream's depacketizer or its RTCP loss statistics."""
        import socket as socketmod

        rx = H26xRtpReceiver(codec="h264", timeout=10.0)
        sink = H26xRtpSink("127.0.0.1", rx.port, codec="h264", rtcp=False)
        stray = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
        foreign = H264RtpPayloader(ssrc=0xDEADBEEF)
        try:
            au = annexb(h264_nal(7, 20), h264_nal(5, 2500, 1))
            sink.write(au)  # locks rx onto the sink's SSRC
            got1 = rx.recv_access_unit()
            # interleave foreign packets with a wildly different seq space
            foreign.seq = 30000
            for pkt in foreign.packetize(annexb(h264_nal(5, 900, 9))):
                stray.sendto(pkt, ("127.0.0.1", rx.port))
            au2 = annexb(h264_nal(7, 20), h264_nal(5, 2500, 2))
            sink.write(au2)
            got2 = rx.recv_access_unit()
        finally:
            stray.close()
            sink.close()
            rx.close()
        assert got1 == au and got2 == au2
        assert rx.depay.packets_bad >= 1  # foreign datagrams counted
        if rx.rtcp is not None:
            assert rx.rtcp.stats.cumulative_lost == 0

    def test_sr_timestamp_matches_sent_au(self):
        """The payloader exposes last_ts == the RTP timestamp of the AU
        just packetized (the SR NTP<->RTP pairing), while .ts has already
        advanced one frame period."""
        pay = H264RtpPayloader(fps=30)
        pay.packetize(annexb(h264_nal(5, 100)))
        assert pay.last_ts == 0
        assert pay.ts == pay.ts_step
        pay.packetize(annexb(h264_nal(5, 100, 1)))
        assert pay.last_ts == pay.ts_step


class TestFuzz:
    """Depacketizer robustness: arbitrary bytes and bit-flipped valid
    packets must never raise and never emit a torn access unit."""

    def test_random_garbage_never_raises(self):
        rng = _rng(123)
        for codec in ("h264", "h265"):
            depay = H26xDepacketizer(codec)
            for _ in range(300):
                n = int(rng.integers(0, 64))
                pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
                depay.push(pkt)  # must not raise

    def test_mutated_valid_stream_integrity(self):
        """Flip bytes in an otherwise valid packet stream: every AU that
        IS returned must byte-match one of the originals (drop, never
        corrupt) — the loss contract under corruption, not just loss."""
        rng = _rng(7)
        for codec, payloader, mknal in (
            ("h264", H264RtpPayloader(), h264_nal),
            ("h265", H265RtpPayloader(), h265_nal),
        ):
            aus = [
                annexb(mknal(7 if codec == "h264" else 33, 18, s),
                       mknal(5 if codec == "h264" else 19, 2200, s + 50))
                for s in range(12)
            ]
            packets = [p for au in aus for p in payloader.packetize(au)]
            depay = H26xDepacketizer(codec)
            got = []
            for pkt in packets:
                p = bytearray(pkt)
                if rng.random() < 0.3:  # corrupt ~30% of packets
                    # flip a byte in the payload region only: header
                    # corruption is covered by the SSRC/PT filters
                    idx = int(rng.integers(12, len(p)))
                    p[idx] ^= int(rng.integers(1, 256))
                out = depay.push(bytes(p))
                if out is not None:
                    got.append(out)
            valid = set(aus)
            for au in got:
                # every emitted AU decodes NAL-identically to an original
                # OR differs only inside one NAL body (payload byte flip
                # is undetectable without a CRC — structure must survive)
                nals = split_annexb(au)
                assert nals, "empty AU emitted"
                assert all(len(n) > 0 for n in nals), "empty NAL emitted"
                if au in valid:
                    continue
                ref = min(valid,
                          key=lambda a: abs(len(a) - len(au)))
                assert len(split_annexb(ref)) == len(nals), (
                    "NAL structure torn by payload corruption")


class TestInterop:
    def test_receiver_locks_any_dynamic_pt(self):
        """External senders negotiate arbitrary dynamic PTs (e.g. 97);
        pt=None (the default) locks onto the first dynamic PT seen."""
        rx = H26xRtpReceiver(codec="h264", timeout=10.0)
        sink = H26xRtpSink("127.0.0.1", rx.port, codec="h264", rtcp=False)
        sink.payloader.pt = 97  # what an ffmpeg/WebRTC SDP often assigns
        try:
            au = annexb(h264_nal(7, 20), h264_nal(5, 1500, 3))
            sink.write(au)
            assert rx.recv_access_unit() == au
        finally:
            sink.close()
            rx.close()

    def test_receiver_pinned_pt_rejects_others(self):
        rx = H26xRtpReceiver(codec="h264", timeout=2.0, pt=96)
        sink = H26xRtpSink("127.0.0.1", rx.port, codec="h264", rtcp=False)
        sink.payloader.pt = 97
        try:
            sink.write(annexb(h264_nal(5, 200)))
            with pytest.raises(TimeoutError):
                rx.recv_access_unit()
            assert rx.depay.packets_bad >= 1
        finally:
            sink.close()
            rx.close()


class TestH26xStreamApp:
    def test_au_splitter_heuristics(self):
        from opencv_opencl_tpu.apps.h26x_stream import split_access_units

        def slice_nal(ntype, first, size, seed=0):
            # slice header byte: first_mb_in_slice==0 encodes as a
            # leading 1-bit (ue(v))
            body = _rng(seed).integers(1, 255, size - 2,
                                       dtype=np.uint8).tobytes()
            return bytes([(3 << 5) | ntype,
                          0x88 if first else 0x08]) + body

        sps, pps = h264_nal(7, 10), h264_nal(8, 6)
        idr = slice_nal(5, True, 60, 1)
        p1a = slice_nal(1, True, 50, 2)   # picture 2, slice 1
        p1b = slice_nal(1, False, 40, 3)  # picture 2, slice 2 (same AU)
        p2 = slice_nal(1, True, 30, 4)
        es = annexb(sps, pps, idr, p1a, p1b, p2)
        aus = split_access_units(es, "h264")
        assert len(aus) == 3
        assert aus[0] == annexb(sps, pps, idr)  # params ride their AU
        assert aus[1] == annexb(p1a, p1b)       # multi-slice = ONE AU
        assert aus[2] == annexb(p2)

    def test_au_splitter_aud_and_suffix(self):
        from opencv_opencl_tpu.apps.h26x_stream import split_access_units

        aud = bytes([9, 0x10])
        sl = lambda seed: bytes([(3 << 5) | 1, 0x88]) + bytes(
            _rng(seed).integers(1, 255, 20, dtype=np.uint8))
        eos = bytes([10])  # end-of-sequence: suffix of the last AU
        es = annexb(aud, sl(1), aud, sl(2), eos)
        aus = split_access_units(es, "h264")
        assert len(aus) == 2
        assert aus[0] == annexb(aud, sl(1))
        assert aus[1] == annexb(aud, sl(2), eos)

    def test_stream_app_rejects_bad_args(self, tmp_path):
        from opencv_opencl_tpu.apps import h26x_stream

        es = tmp_path / "x.h264"
        es.write_bytes(b"\x00\x00\x00\x01" + bytes([0x65, 0x88, 1, 2]))
        assert h26x_stream.run([f"--input={es}", "--codec=avc"]) == 2
        assert h26x_stream.run([f"--input={es}", "--mtu=5"]) == 2
        assert h26x_stream.run([f"--input={es}", "--max-frames=0"]) == 2

    def test_record_then_replay_roundtrip(self, tmp_path):
        """rtp_receiver records an elementary stream; h26x_stream plays
        it back byte-identically over the wire."""
        import threading
        import time

        from opencv_opencl_tpu.apps import h26x_stream, rtp_receiver

        aus = [annexb(h264_nal(7, 12), h264_nal(5, 1800, 1)),
               annexb(h264_nal(1, 1500, 2)),
               annexb(h264_nal(1, 1200, 3))]
        es = tmp_path / "es.h264"
        es.write_bytes(b"".join(aus))

        out = tmp_path / "rx.h264"
        result = []
        t = threading.Thread(target=lambda: result.append(rtp_receiver.run(
            ["--port=47950", "--kind=h264", "--max-frames=3",
             "--timeout=15", f"--output={out}"])), daemon=True)
        t.start()
        time.sleep(0.3)
        rc = h26x_stream.run([f"--input={es}", "--host=127.0.0.1",
                              "--port=47950", "--fps=60"])
        t.join(timeout=15)
        assert rc == 0 and result == [0]
        assert out.read_bytes() == b"".join(aus)

    def test_missing_input_rejected(self, capsys):
        from opencv_opencl_tpu.apps import h26x_stream

        assert h26x_stream.run([]) == 2
        assert h26x_stream.run(["--input=/nonexistent.h264"]) == 2


def test_receiver_relocks_onto_restarted_sender():
    """A restarted sender picks a fresh SSRC (gst rtph264pay behavior);
    after the silence timeout the receiver must accept the new stream
    instead of pinning the dead SSRC forever (integration coverage of
    StreamLock's re-arm)."""
    import time as _time

    from opencv_opencl_tpu.io.rtp_h26x import (
        H264RtpPayloader, H26xRtpReceiver, H26xRtpSink)

    rx = H26xRtpReceiver(codec="h264", timeout=5.0, relock_timeout=0.3)
    au1 = annexb(h264_nal(5, 600, 1))
    au2 = annexb(h264_nal(1, 600, 2))
    # sender session A
    a = H26xRtpSink("127.0.0.1", rx.port, codec="h264")
    a.payloader.ssrc = 0x11110001
    a.write(au1)
    assert rx.recv_access_unit() == au1
    a.close()
    _time.sleep(0.4)  # silence > relock_timeout
    # "restarted" sender session B: fresh random SSRC
    b = H26xRtpSink("127.0.0.1", rx.port, codec="h264")
    b.payloader.ssrc = 0x22220002
    b.write(au2)
    assert rx.recv_access_unit() == au2  # re-locked, new stream accepted
    b.close()
    rx.close()
