"""RTCP (RFC 3550) control-plane tests.

The reference observes loss/jitter/RTT via WebRTC getStats
(webrtc/details.html:292-392); the native RTP plane reports the same
numbers via RTCP SR/RR (io/rtcp.py).  These tests pin the wire format,
the Appendix A.1 sequence machine, the A.8 jitter estimator, and the
end-to-end SR -> RR -> RTT loop over real loopback sockets.
"""

import time

import numpy as np
import pytest

from opencv_opencl_tpu.io.rtcp import (
    ReceiverStats,
    ReportBlock,
    RtcpPeer,
    build_bye,
    build_receiver_report,
    build_sdes_cname,
    build_sender_report,
    ntp_now,
    ntp_to_middle32,
    parse_compound,
)


class TestWireFormat:
    def test_sender_report_roundtrip(self):
        blk = ReportBlock(ssrc=7, fraction_lost=12, cumulative_lost=34,
                          ext_highest_seq=0x10020, jitter=55,
                          lsr=0xAABBCCDD, dlsr=123)
        sr = build_sender_report(0xCAFE, (100, 200), 90000, 42, 99999,
                                 [blk])
        assert len(sr) % 4 == 0
        pkts = parse_compound(sr)
        assert len(pkts) == 1
        p = pkts[0]
        assert p["type"] == "SR"
        assert p["ssrc"] == 0xCAFE
        assert p["ntp"] == (100, 200)
        assert p["rtp_ts"] == 90000
        assert p["packet_count"] == 42
        assert p["octet_count"] == 99999
        b = p["blocks"][0]
        assert (b.ssrc, b.fraction_lost, b.cumulative_lost) == (7, 12, 34)
        assert (b.ext_highest_seq, b.jitter, b.lsr, b.dlsr) == (
            0x10020, 55, 0xAABBCCDD, 123)

    def test_receiver_report_roundtrip(self):
        blk = ReportBlock(1, 0, -3, 5, 0, 0, 0)  # negative lost (dup-heavy)
        rr = build_receiver_report(0xBEEF, [blk])
        p = parse_compound(rr)[0]
        assert p["type"] == "RR"
        assert p["ssrc"] == 0xBEEF
        assert p["blocks"][0].cumulative_lost == -3

    def test_compound_sr_sdes_bye(self):
        data = (build_sender_report(1, ntp_now(), 0, 0, 0)
                + build_sdes_cname(1, "tpu@host")
                + build_bye(1))
        types = [p["type"] for p in parse_compound(data)]
        assert types == ["SR", "SDES", "BYE"]

    def test_sdes_cname_text(self):
        p = parse_compound(build_sdes_cname(9, "abc"))[0]
        assert p["items"][(9, 1)] == "abc"

    def test_garbage_ignored(self):
        assert parse_compound(b"\x00\x01\x02\x03") == []
        assert parse_compound(b"") == []
        # truncated length field
        sr = build_sender_report(1, (0, 0), 0, 0, 0)
        assert parse_compound(sr[: len(sr) - 4]) == []


class TestSequenceMachine:
    def test_in_order_no_loss(self):
        st = ReceiverStats()
        for s in range(100, 150):
            st.note(s, 0, arrival=0.0)
        assert st.received == 50
        assert st.cumulative_lost == 0
        assert st.ext_highest_seq == 149
        assert st.fraction_lost_interval() == 0

    def test_gap_counts_lost(self):
        st = ReceiverStats()
        for s in list(range(10)) + list(range(12, 20)):
            st.note(s, 0, arrival=0.0)
        assert st.cumulative_lost == 2
        # 18 received of 20 expected -> fraction = 2*256/20 = 25
        assert st.fraction_lost_interval() == 25

    def test_interval_fraction_resets(self):
        st = ReceiverStats()
        for s in range(8):
            st.note(s, 0, arrival=0.0)
        st.note(9, 0, arrival=0.0)  # one lost
        assert st.fraction_lost_interval() == 256 // 10
        for s in range(10, 20):  # clean interval
            st.note(s, 0, arrival=0.0)
        assert st.fraction_lost_interval() == 0
        assert st.cumulative_lost == 1  # cumulative stays

    def test_wraparound_extends_cycles(self):
        st = ReceiverStats()
        for s in [65533, 65534, 65535, 0, 1, 2]:
            st.note(s, 0, arrival=0.0)
        assert st.cumulative_lost == 0
        assert st.ext_highest_seq == (1 << 16) + 2

    def test_source_restart_resyncs(self):
        st = ReceiverStats()
        for s in range(5):
            st.note(s, 0, arrival=0.0)
        # a jump far beyond MAX_DROPOUT: first packet probation...
        st.note(40000, 0, arrival=0.0)
        # ...second consecutive confirms the restart
        st.note(40001, 0, arrival=0.0)
        assert st.base_seq == 40001
        assert st.cumulative_lost == 0


class TestJitter:
    def test_constant_transit_zero_jitter(self):
        st = ReceiverStats(clock_rate=90000)
        # 0.5 s spacing: exactly representable, so transit is exact
        for i in range(20):
            st.note(i, i * 45000, arrival=i * 0.5 + 0.5)
        assert st.jitter == 0.0

    def test_single_late_packet(self):
        st = ReceiverStats(clock_rate=90000)
        st.note(0, 0, arrival=0.0)
        st.note(1, 45000, arrival=0.5)          # on time
        st.note(2, 90000, arrival=1.0 + 0.010)  # 10 ms late
        # d = 900 RTP units; jitter = 900/16 = 56.25
        assert st.jitter == pytest.approx(56.25)
        assert st.jitter_ms() == pytest.approx(0.625)

    def test_report_block_lsr_dlsr(self):
        st = ReceiverStats()
        st.note(0, 0, arrival=0.0)
        ntp = (0x11112222, 0x33334444)
        st.note_sr(ntp, arrival=100.0)
        blk = st.report_block(now=100.5)
        assert blk.lsr == ntp_to_middle32(*ntp) == 0x22223333
        assert blk.dlsr == int(0.5 * 65536)


def _drain_frames(rx, n):
    out = []
    for _ in range(n):
        out.append(rx.recv_frame())
    return out


class TestEndToEnd:
    def test_sr_rr_rtt_loopback(self):
        from opencv_opencl_tpu.io.rtp import RtpUdpReceiver, RtpUdpSink

        shape = (48, 64)  # NV12 rows x width (32x64 frame)
        rx = RtpUdpReceiver(port=0, kind="raw", frame_shape=shape,
                            timeout=5.0)
        assert rx.rtcp is not None
        rx.rtcp.interval = 0.0
        sink = RtpUdpSink("127.0.0.1", rx.port, kind="raw", fps=30)
        assert sink.rtcp is not None
        sink.rtcp.interval = 0.0
        try:
            frame = np.arange(shape[0] * shape[1], dtype=np.uint8).reshape(
                shape)
            sink.write(frame)           # RTP packets then an SR
            got = rx.recv_frame()       # notes packets, emits an RR
            assert np.array_equal(got, frame)
            time.sleep(0.05)            # let the SR land
            sink.write(frame)
            rx.recv_frame()             # this RR now carries LSR/DLSR
            time.sleep(0.05)
            sink.rtcp.poll()
            assert sink.rtcp.remote_blocks, "no RR reached the sender"
            blk = sink.rtcp.remote_blocks[-1]
            assert blk.cumulative_lost == 0
            assert blk.fraction_lost == 0
            assert sink.rtt_ms is not None
            assert 0.0 <= sink.rtt_ms < 5000.0
            assert sink.payload_octets > 0
        finally:
            sink.close()
            rx.close()

    def test_receiver_reports_loss(self):
        """Drop one RTP packet in flight: the RR must say so."""
        import socket as socketmod

        from opencv_opencl_tpu.io.rtp import RawNv12Payloader, RtpUdpReceiver

        shape = (24, 64)
        rx = RtpUdpReceiver(port=0, kind="raw", frame_shape=shape,
                            timeout=2.0)
        # keep the default report interval: no RR fires mid-test, so the
        # manual report_block() below sees the full loss interval
        tx = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
        pay = RawNv12Payloader(mtu=80)
        frame = np.zeros(shape, np.uint8)
        try:
            pkts1 = pay.packetize(frame)
            for p in pkts1[:-2] + pkts1[-1:]:  # drop a mid-frame packet
                tx.sendto(p, ("127.0.0.1", rx.port))
            pkts2 = pay.packetize(frame)  # a clean frame to complete on
            for p in pkts2:
                tx.sendto(p, ("127.0.0.1", rx.port))
            got = rx.recv_frame()
            assert got is not None
            assert rx.frames_dropped == 1
            st = rx.rtcp.stats
            assert st.cumulative_lost == 1
            blk = st.report_block()
            assert blk.fraction_lost > 0
        finally:
            tx.close()
            rx.close()

    def test_rtcp_disabled(self):
        from opencv_opencl_tpu.io.rtp import RtpUdpReceiver, RtpUdpSink

        rx = RtpUdpReceiver(port=0, kind="raw", frame_shape=(6, 64),
                            timeout=1.0, rtcp=False)
        sink = RtpUdpSink("127.0.0.1", rx.port, kind="raw", rtcp=False)
        try:
            assert rx.rtcp is None and sink.rtcp is None
            assert sink.rtt_ms is None
            frame = np.zeros((6, 64), np.uint8)
            sink.write(frame)
            assert np.array_equal(rx.recv_frame(), frame)
        finally:
            sink.close()
            rx.close()

    def test_rtcp_port_conflict_degrades_gracefully(self):
        import socket as socketmod

        from opencv_opencl_tpu.io.rtp import RtpUdpReceiver

        # occupy a port pair's companion slot first
        rx1 = RtpUdpReceiver(port=0, kind="raw", frame_shape=(6, 64))
        blocker = None
        try:
            # a second receiver whose rtcp port collides with rx1's RTP port
            blocker = socketmod.socket(socketmod.AF_INET,
                                       socketmod.SOCK_DGRAM)
            # find a port P where P+1 is taken: use rx1.port - 1 as RTP port
            p = rx1.port - 1
            try:
                rx2 = RtpUdpReceiver(port=p, kind="raw",
                                     frame_shape=(6, 64))
            except OSError:
                pytest.skip("adjacent port unavailable")
            assert rx2.rtcp is None  # companion port taken: stats-only
            rx2.close()
        finally:
            if blocker is not None:
                blocker.close()
            rx1.close()


class TestBlockBookkeeping:
    def test_take_blocks_drains_once_and_history_bounded(self):
        """remote_blocks is bounded history (no unbounded growth in
        always-on serving); take_blocks() hands each RR to the governor
        exactly once."""
        from opencv_opencl_tpu.io.rtcp import (
            RtcpPeer, ReportBlock, build_receiver_report)

        peer = RtcpPeer(0xAABBCCDD)
        import socket as socketmod

        tx = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
        try:
            for i in range(100):
                blk = ReportBlock(0xAABBCCDD, i % 256, i, 1000 + i, 0, 0, 0)
                tx.sendto(build_receiver_report(0x1, [blk]),
                          ("127.0.0.1", peer.port))
            import time as timemod

            deadline = timemod.monotonic() + 5.0
            drained = []
            while timemod.monotonic() < deadline and len(drained) < 100:
                peer.poll()
                drained.extend(peer.take_blocks())
                timemod.sleep(0.01)
        finally:
            tx.close()
            peer.close()
        assert len(drained) == 100           # each block seen exactly once
        assert peer.take_blocks() == []      # and never twice
        assert len(peer.remote_blocks) == 64  # deque maxlen
        assert peer.remote_blocks[-1].cumulative_lost == 99


class TestRfc3550Schedule:
    """The full §6.2/§6.3/A.7 interval algorithm (opt-in schedule)."""

    def test_interval_deterministic_part(self):
        from opencv_opencl_tpu.io.rtcp import rtcp_interval

        # small group, big bandwidth: clamped to Tmin (5 s), halved
        # for the very first packet; rand pins the [0.5, 1.5) draw
        c = 2.71828 - 1.5
        t = rtcp_interval(2, 1, 25000.0, True, 80.0, initial=True, rand=0.0)
        assert abs(t - 2.5 * 0.5 / c) < 1e-9
        t = rtcp_interval(2, 1, 25000.0, True, 80.0, initial=False, rand=0.5)
        assert abs(t - 5.0 * 1.0 / c) < 1e-9
        # large group, tiny budget: bandwidth-scaled Td = n*avg/bw
        t = rtcp_interval(100, 0, 100.0, False, 100.0,
                          initial=False, rand=0.5)
        assert abs(t - 100.0 / c) < 1e-9

    def test_interval_sender_bandwidth_split(self):
        from opencv_opencl_tpu.io.rtcp import rtcp_interval

        c = 2.71828 - 1.5
        # senders <= 25% of members: the sender subgroup shares 25% of
        # the budget among `senders` members (Td above the Tmin clamp)
        t_s = rtcp_interval(100, 10, 100.0, True, 100.0,
                            initial=False, rand=0.5)
        assert abs(t_s - (100.0 * 10 / 25.0) / c) < 1e-9
        # ... and receivers share the other 75% among the rest
        t_r = rtcp_interval(100, 10, 100.0, False, 100.0,
                            initial=False, rand=0.5)
        assert abs(t_r - (100.0 * 90 / 75.0) / c) < 1e-9

    def test_randomization_spread(self):
        from opencv_opencl_tpu.io.rtcp import rtcp_interval

        c = 2.71828 - 1.5
        ts = [rtcp_interval(2, 1, 25000.0, True, 80.0, initial=False)
              for _ in range(200)]
        assert all(5.0 * 0.5 / c <= t <= 5.0 * 1.5 / c for t in ts)
        assert max(ts) - min(ts) > 0.5  # actually randomized

    def test_peer_defers_first_report(self):
        """rfc3550 mode: no report goes out before the (randomized,
        halved-minimum) initial interval elapses — unlike tick mode,
        which reports on the first write."""
        from opencv_opencl_tpu.io.rtcp import RtcpPeer

        peer = RtcpPeer(0x1, remote=("127.0.0.1", 65000),
                        schedule="rfc3550")
        try:
            assert peer.maybe_send_sr(0, 0, 0) is False
            assert peer._tn is not None
            # force the deadline into the past: the next call sends
            peer._tn = 0.0
            assert peer.maybe_send_sr(3000, 10, 1000) is True
            assert peer.sr_sent == 1
        finally:
            peer.close()

    def test_member_tracking_and_bye(self):
        """SR/RR/SDES feed the member/sender tables; BYE removes and
        reverse-reconsiders (§6.3.4: tn pulled forward)."""
        import socket as socketmod
        import time as timemod

        from opencv_opencl_tpu.io.rtcp import (
            RtcpPeer, build_bye, build_sdes_cname, build_sender_report,
            ntp_now)

        peer = RtcpPeer(0x1, schedule="rfc3550")
        tx = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
        try:
            tx.sendto(build_sender_report(0x2, ntp_now(), 0, 0, 0)
                      + build_sdes_cname(0x2, "peer2"),
                      ("127.0.0.1", peer.port))
            tx.sendto(build_sdes_cname(0x3, "peer3"),
                      ("127.0.0.1", peer.port))
            deadline = timemod.monotonic() + 5.0
            while timemod.monotonic() < deadline and len(peer.members) < 3:
                peer.poll()
                timemod.sleep(0.01)
            assert peer.members == {0x1, 0x2, 0x3}
            assert peer.senders == {0x2}
            # schedule a far-away deadline, then BYE one member: the
            # deadline must move closer (reverse reconsideration)
            now = timemod.monotonic()
            peer._tn = now + 12.0
            peer._pmembers = 3
            tx.sendto(build_bye(0x3), ("127.0.0.1", peer.port))
            deadline = timemod.monotonic() + 5.0
            while timemod.monotonic() < deadline and 0x3 in peer.members:
                peer.poll()
                timemod.sleep(0.01)
            assert peer.members == {0x1, 0x2}
            assert peer._tn < now + 12.0
        finally:
            tx.close()
            peer.close()

    def test_avg_rtcp_size_ewma(self):
        from opencv_opencl_tpu.io.rtcp import RtcpPeer

        peer = RtcpPeer(0x1, schedule="rfc3550")
        try:
            before = peer.avg_rtcp_size
            peer._note_rtcp_size(1000)
            assert before < peer.avg_rtcp_size < 1028
        finally:
            peer.close()

    def test_sink_accepts_schedule(self):
        from opencv_opencl_tpu.io.rtp import RtpUdpSink

        tx = RtpUdpSink("127.0.0.1", 59997, kind="raw", fps=30,
                        rtcp_schedule="rfc3550")
        try:
            assert tx.rtcp.schedule == "rfc3550"
        finally:
            tx.close()

    def test_unknown_schedule_rejected(self):
        from opencv_opencl_tpu.io.rtcp import RtcpPeer

        with pytest.raises(ValueError):
            RtcpPeer(0x1, schedule="cron")


class TestScheduleRefinements:
    def test_timer_reconsideration_defers(self):
        """A7 OnExpire: when the redrawn interval says tp+T is still in
        the future, the transmit is deferred, keeping the mean interval
        at Td (not 0.82*Td) — the e-3/2 compensation's other half."""
        import time as timemod

        from opencv_opencl_tpu.io.rtcp import RtcpPeer

        peer = RtcpPeer(0x1, remote=("127.0.0.1", 65001),
                        schedule="rfc3550")
        try:
            now = timemod.monotonic()
            peer._tp = now          # just transmitted
            peer._tn = now - 0.001  # timer expired anyway
            assert peer._due() is False   # reconsidered: deferred
            assert peer._tn > now         # pushed to tp + T
            # a transmit long enough ago passes
            peer._tp = now - 100.0
            peer._tn = now - 0.001
            assert peer._due() is True
        finally:
            peer.close()

    def test_member_timeout_prunes(self):
        """6.3.5: members not heard from within 5*Tmin are timed out
        (senders at 2*Tmin), so SSRC churn cannot inflate the interval
        forever."""
        import time as timemod

        from opencv_opencl_tpu.io.rtcp import RtcpPeer

        peer = RtcpPeer(0x1, schedule="rfc3550")
        try:
            now = timemod.monotonic()
            peer.members |= {0x2, 0x3}
            peer.senders |= {0x2}
            peer._heard[0x2] = now - 11.0   # sender stale (> 2*5 s)
            peer._heard[0x3] = now - 26.0   # member dead (> 5*5 s)
            peer._interval()
            assert peer.members == {0x1, 0x2}
            assert peer.senders == set()
        finally:
            peer.close()

    def test_companion_peer_port_edge(self):
        """rtp_port 65535 must fall back to an ephemeral RTCP port (not
        raise OverflowError binding 65536); a taken companion port falls
        back per fallback_ephemeral."""
        from opencv_opencl_tpu.io.rtcp import companion_peer

        peer = companion_peer(0x1, 65535)
        try:
            assert peer is not None and peer.port != 0
        finally:
            peer.close()
        # occupy a companion port, then ask for it
        blocker = companion_peer(0x1, 47500)  # binds 47501
        try:
            if blocker is None or blocker.port != 47501:
                pytest.skip("port 47501 unavailable")
            assert companion_peer(0x2, 47500,
                                  fallback_ephemeral=False) is None
            p2 = companion_peer(0x2, 47500)
            assert p2 is not None and p2.port != 47501
            p2.close()
        finally:
            if blocker is not None:
                blocker.close()


class TestParseFuzz:
    def test_parse_compound_garbage_never_raises(self):
        rng = np.random.default_rng(99)
        for _ in range(500):
            n = int(rng.integers(0, 96))
            parse_compound(bytes(rng.integers(0, 256, n, dtype=np.uint8)))

    def test_parse_compound_bitflipped_valid(self):
        """Bit-flip real compound packets: parse must never raise and
        never return blocks past the datagram bounds."""
        rng = np.random.default_rng(7)
        base = (build_sender_report(1, ntp_now(), 0, 5, 100,
                                    [ReportBlock(2, 0, 0, 9, 0, 0, 0)])
                + build_sdes_cname(1, "x") + build_bye(1))
        for _ in range(500):
            p = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                p[int(rng.integers(0, len(p)))] ^= int(rng.integers(1, 256))
            parse_compound(bytes(p))  # must not raise


class TestReviewFixes3:
    def test_sink_to_port_65535_never_crashes_write(self):
        """RTP destination 65535: the companion 'port 65536' must not
        crash the media write path (OverflowError is not an OSError)."""
        from opencv_opencl_tpu.io.rtp import RtpUdpSink

        tx = RtpUdpSink("127.0.0.1", 65535, kind="raw", fps=30)
        try:
            assert tx.rtcp is not None
            assert tx.rtcp.remote is None  # learned from far end instead
            tx.rtcp.interval = 0.0
            tx.write(np.zeros((6, 64), np.uint8))  # SR due: must not raise
        finally:
            tx.close()

    def test_send_overflow_port_is_advisory(self):
        peer = RtcpPeer(0x1, remote=("127.0.0.1", 65536))
        try:
            peer._send(build_bye(0x1))  # must not raise
        finally:
            peer.close()

    def test_defer_branch_updates_pmembers(self):
        """A.7 OnExpire updates pmembers in the reschedule branch too —
        else a later BYE's reverse reconsideration pushes tn OUT."""
        import time as timemod

        peer = RtcpPeer(0x1, schedule="rfc3550")
        try:
            now = timemod.monotonic()
            peer.members |= {0x2, 0x3, 0x4, 0x5}
            peer._pmembers = 2
            peer._tp = now            # just transmitted -> defer path
            peer._tn = now - 0.001
            assert peer._due() is False
            assert peer._pmembers == len(peer.members)
        finally:
            peer.close()

    def test_timeout_scales_with_td(self):
        """6.3.5 timeouts are multiples of the deterministic interval,
        not the 5 s floor: a big/slow session must not prune members
        that report every Td."""
        import time as timemod

        peer = RtcpPeer(0x1, schedule="rfc3550", session_bw=8000.0)
        try:
            # rtcp_bw = 50 B/s; ~100 members -> Td = 80*100/50 = 160 s
            for s in range(2, 100):
                peer.members.add(s)
                peer._heard[s] = timemod.monotonic() - 30.0  # stale > 25 s
            before = len(peer.members)
            peer._interval()
            assert len(peer.members) == before  # NOT pruned at 5*Tmin
        finally:
            peer.close()


def test_jitter_survives_rtp_timestamp_wrap():
    """RFC 3550 A.8 arithmetic is mod 2^32: the 32-bit RTP timestamp
    wrap (~13.2 h at 90 kHz) must cancel in the transit difference
    instead of poisoning the jitter EWMA with a ~2^32 delta."""
    st = ReceiverStats(clock_rate=90000)
    base = (1 << 32) - 90000  # wraps on the third packet
    for i in range(8):
        ts = (base + i * 45000) & 0xFFFFFFFF
        st.note(i, ts, arrival=i * 0.5)  # perfectly on time
    assert st.jitter == 0.0
    # and a genuinely late packet is still seen at its true size
    st.note(8, (base + 8 * 45000) & 0xFFFFFFFF, arrival=4.0 + 0.010)
    assert st.jitter == pytest.approx(900 / 16.0)


def test_rtcp_peer_thread_safety_stress():
    """RtcpPeer is driven from two threads in relay --adaptive-rate (the
    feeder's write()->maybe_send_sr() vs the main loop's
    poll()/take_blocks()); the internal lock must keep the member tables
    and fresh-block swap consistent (no RuntimeError from dict mutation
    during _timeout_members iteration, no lost blocks)."""
    import threading

    from opencv_opencl_tpu.io.rtcp import RtcpPeer, build_receiver_report

    peer = RtcpPeer(0x1234, schedule="rfc3550", interval=0.001)
    # a remote receiver that floods RRs about our stream
    remote = RtcpPeer(0x9999, remote=("127.0.0.1", peer.port))
    peer.remote = ("127.0.0.1", remote.port)
    errors = []
    stop = threading.Event()
    got_blocks = []

    def writer():
        try:
            i = 0
            while not stop.is_set():
                peer.maybe_send_sr(i * 3000, i, i * 100)
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            while not stop.is_set():
                peer.poll()
                got_blocks.extend(peer.take_blocks())
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer),
               threading.Thread(target=reader)]
    [t.start() for t in threads]
    deadline = time.monotonic() + 0.5
    sent = 0
    while time.monotonic() < deadline:
        blk = ReportBlock(ssrc=0x1234, fraction_lost=50, cumulative_lost=1,
                          ext_highest_seq=sent, jitter=2, lsr=0, dlsr=0)
        remote.sock.sendto(build_receiver_report(0x9999, [blk]),
                           ("127.0.0.1", peer.port))
        sent += 1
        time.sleep(0.001)
    stop.set()
    [t.join(timeout=5) for t in threads]
    got_blocks.extend(peer.take_blocks())
    assert not errors
    # every RR block that reached the socket is seen exactly once
    assert len(got_blocks) <= sent
    assert all(b.ssrc == 0x1234 for b in got_blocks)
    peer.close()
    remote.close()
