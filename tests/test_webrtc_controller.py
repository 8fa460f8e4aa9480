"""webrtcbin negotiation controller tests (fake-gi double).

Verifies the full reference signal flow
(``/root/reference/webrtc/sender.cpp:182-251,269-339``) without GStreamer:
the offer is produced BY the (fake) element via create-offer and
set-local-description, the answer is applied TO it via
set-remote-description, trickle ICE flows both ways, and ICE failure /
signaling reconnect rebuild the pipeline like ``vad2connection.cpp:65-160``.
"""

from __future__ import annotations

import time

import pytest

from opencv_opencl_tpu.io import sdp
from opencv_opencl_tpu.io.webrtc_controller import WebRtcSession
from tests.fake_webrtc import FakeWebRtcApi, FakeWebRtcGst, WebRtcBin

PIPE = ("v4l2src ! video/x-raw,format=NV12 ! omxh264enc ! rtph264pay ! "
        "webrtcbin name=sendrecv stun-server=stun://stun.example:19302")


class StubClient:
    def __init__(self):
        self.offers: list[str] = []
        self.ice: list[tuple[str, int]] = []
        self.fail = False

    def send_offer(self, sdp_text):
        if self.fail:
            raise RuntimeError("signaling down")
        self.offers.append(sdp_text)

    def send_ice(self, cand, mline):
        if self.fail:
            raise RuntimeError("signaling down")
        self.ice.append((cand, mline))


def make_session(client=None, logs=None):
    gst = FakeWebRtcGst()
    session = WebRtcSession(
        gst, FakeWebRtcApi(), PIPE, client=client,
        on_log=(logs.append if logs is not None else (lambda s: None)))
    return gst, session


class TestNegotiation:
    def test_offer_created_by_element_and_published(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        bin_ = session.webrtc
        assert isinstance(bin_, WebRtcBin)
        # PLAYING fired on-negotiation-needed -> create-offer on the bin
        assert bin_.offers_created == 1
        # the promise chain set the element's local description...
        assert bin_.local_desc is not None
        assert bin_.local_desc.type == "offer"
        # ...and published the element's OWN sdp (not a side-channel one)
        assert client.offers == [bin_.local_desc.sdp.as_text()]
        assert session.offers_sent == 1
        # the published offer is real, parseable SDP
        sess = sdp.parse_sdp(client.offers[0])
        assert sess.medias and sess.medias[0].kind == "video"
        session.stop()

    def test_answer_applied_to_element(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        offer = sdp.parse_sdp(client.offers[0])
        answer_text = sdp.build_answer(offer)
        assert session.handle_answer(answer_text)
        bin_ = session.webrtc
        assert bin_.remote_desc is not None
        assert bin_.remote_desc.type == "answer"
        assert bin_.remote_desc.sdp.as_text() == answer_text
        assert session.answers_applied == 1
        session.stop()

    def test_malformed_answer_counted_not_fatal(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        assert not session.handle_answer("this is not sdp")
        assert session.errors == 1
        assert session.webrtc.remote_desc is None
        # the session still works afterwards
        offer = sdp.parse_sdp(client.offers[0])
        assert session.handle_answer(sdp.build_answer(offer))
        session.stop()

    def test_trickle_ice_both_ways(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        # element -> signaling
        session.webrtc.trickle_ice(0, "candidate:1 1 UDP 2113937151 ...")
        assert client.ice == [("candidate:1 1 UDP 2113937151 ...", 0)]
        assert session.ice_sent == 1
        # signaling -> element
        assert session.handle_remote_ice("candidate:2 1 UDP 1 ...", 0)
        assert session.webrtc.remote_ice == [(0, "candidate:2 1 UDP 1 ...")]
        assert session.ice_applied == 1
        # empty candidate (end-of-candidates) is a no-op
        assert not session.handle_remote_ice("", 0)
        session.stop()

    def test_missing_webrtcbin_rejected(self):
        gst = FakeWebRtcGst()
        session = WebRtcSession(gst, FakeWebRtcApi(),
                                "videotestsrc ! fakesink",
                                on_log=lambda s: None)
        with pytest.raises(ValueError, match="webrtcbin"):
            session.start()

    def test_signaling_outage_counts_error_not_crash(self):
        client = StubClient()
        client.fail = True
        gst, session = make_session(client)
        session.start()  # offer publish fails -> errors, no raise
        assert session.errors == 1
        assert session.offers_sent == 1  # the element DID create one
        session.stop()


class TestRecovery:
    def test_reset_rebuilds_pipeline_and_renegotiates(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        first_pipe = session.pipeline
        assert session.reset()
        assert session.pipeline is not first_pipe
        assert session.resets == 1
        # the rebuilt bin negotiated again: a second offer went out
        assert len(client.offers) == 2
        assert session.webrtc.offers_created == 1  # fresh element
        session.stop()

    def test_ice_failure_triggers_reset(self):
        client = StubClient()
        logs = []
        gst, session = make_session(client, logs)
        session.start()
        session.webrtc.set_ice_state("failed")
        deadline = time.monotonic() + 5
        while session.resets == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert session.resets == 1
        assert any("failed" in line for line in logs)
        session.stop()

    def test_reset_after_stop_is_refused(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        session.stop()
        assert not session.reset()
        # stale teardown leaves no live element: handlers are no-ops
        assert not session.handle_answer("v=0\r\n")
        assert not session.handle_remote_ice("candidate:x", 0)

    def test_resend_offer_replays_local_description(self):
        client = StubClient()
        gst, session = make_session(client)
        session.start()
        assert session.resend_offer()
        assert client.offers[0] == client.offers[1]
        assert session.offers_sent == 2
        session.stop()


class TestEndToEndSignaling:
    def test_offer_answer_ice_over_real_websockets(self):
        """Full control-plane round trip: the fake element's offer rides
        the in-repo SignalingServer to a viewer client, whose answer and
        ICE come back and are applied to the element."""
        from opencv_opencl_tpu.io.signaling import (
            SignalingClient, SignalingServer)

        server = SignalingServer(host="127.0.0.1", port=0).start()
        try:
            sender_client = SignalingClient(
                server.url, room="e2e", client_type="sender")
            # the session publishes through the real signaling client
            gst, session = make_session(sender_client)

            got = {"offer": None, "sender_ice": None}

            def on_offer(sdp_text, frm):
                got["offer"] = sdp_text
                offer = sdp.parse_sdp(sdp_text)
                viewer.send_answer(sdp.build_answer(offer))
                viewer.send_ice("candidate:v 1 UDP 99 ...", 0)

            def on_viewer_ice(cand, mline):
                got["sender_ice"] = (cand, mline)

            viewer = SignalingClient(
                server.url, room="e2e", client_type="viewer",
                on_offer=on_offer, on_ice=on_viewer_ice)
            sender_client.on_answer = session.handle_answer
            sender_client.on_ice = session.handle_remote_ice
            sender_client.start()
            assert sender_client.wait_connected(10)
            viewer.start()
            assert viewer.wait_connected(10)
            session.start()  # negotiates -> offer -> server -> viewer

            deadline = time.monotonic() + 10
            while (session.webrtc.remote_desc is None
                   or not session.webrtc.remote_ice
                   ) and time.monotonic() < deadline:
                time.sleep(0.05)
            # offer produced by the element reached the viewer...
            assert got["offer"] == session.last_offer_text
            # ...and the viewer's answer + ICE reached the element
            assert session.webrtc.remote_desc is not None
            assert session.webrtc.remote_ice == [(0, "candidate:v 1 UDP 99 ...")]
            # element-side trickle ICE reaches the viewer too
            session.webrtc.trickle_ice(0, "candidate:s 1 UDP 42 ...")
            deadline = time.monotonic() + 10
            while got["sender_ice"] is None and time.monotonic() < deadline:
                time.sleep(0.05)
            assert got["sender_ice"] == ("candidate:s 1 UDP 42 ...", 0)
            session.stop()
            viewer.stop()
            sender_client.stop()
        finally:
            server.stop()


class TestSenderAppIntegration:
    def test_sender_uses_webrtcbin_when_gi_present(self, monkeypatch,
                                                   capsys):
        """apps/sender drives the controller whenever 'gi' is available:
        the viewer's answer lands on the (fake) element."""
        import threading

        from opencv_opencl_tpu.apps import sender
        from opencv_opencl_tpu.io import webrtc_controller
        from opencv_opencl_tpu.io.signaling import SignalingClient

        sessions = []

        def fake_build(pipeline_desc, client=None, webrtc_name="sendrecv",
                       on_log=print):
            gst = FakeWebRtcGst()
            s = WebRtcSession(gst, FakeWebRtcApi(), pipeline_desc,
                              client=client, webrtc_name=webrtc_name,
                              on_log=on_log)
            sessions.append(s)
            return s

        monkeypatch.setattr(webrtc_controller, "gi_webrtc_available",
                            lambda: True)
        monkeypatch.setattr(webrtc_controller, "build_gi_session",
                            fake_build)

        rc = {}

        def run_sender():
            rc["rc"] = sender.run([
                "--ws=ws://127.0.0.1:18096", "--room=gi",
                "--serve-signaling", "--duration=4",
            ])

        t = threading.Thread(target=run_sender)
        t.start()
        time.sleep(1.0)

        def on_offer(sdp_text, frm):
            offer = sdp.parse_sdp(sdp_text)
            viewer.send_answer(sdp.build_answer(offer))

        viewer = SignalingClient("ws://127.0.0.1:18096", room="gi",
                                 client_type="viewer", on_offer=on_offer)
        viewer.start()
        assert viewer.wait_connected(10)
        t.join(timeout=20)
        viewer.stop()
        assert rc["rc"] == 0
        assert len(sessions) == 1
        s = sessions[0]
        # the element negotiated and the viewer's answer was applied to it
        assert s.webrtc is None  # stopped/torn down at shutdown
        assert s.offers_sent >= 1
        assert s.answers_applied == 1
        out = capsys.readouterr().out
        assert "webrtcbin negotiation wired" in out
        assert "set-remote-description applied to webrtcbin" in out
        assert "webrtcbin: offers=" in out


class TestSequentialViewers:
    def test_two_viewers_in_sequence(self, monkeypatch, capsys):
        """The vad2connection '2 connections' scenario: viewer 1 joins,
        negotiates, disconnects; viewer 2 joins later and gets the offer
        re-published, and ITS answer lands on the element too."""
        import threading

        from opencv_opencl_tpu.apps import sender
        from opencv_opencl_tpu.io import webrtc_controller
        from opencv_opencl_tpu.io.signaling import SignalingClient

        sessions = []

        def fake_build(pipeline_desc, client=None, webrtc_name="sendrecv",
                       on_log=print):
            s = WebRtcSession(FakeWebRtcGst(), FakeWebRtcApi(),
                              pipeline_desc, client=client,
                              webrtc_name=webrtc_name, on_log=on_log)
            sessions.append(s)
            return s

        monkeypatch.setattr(webrtc_controller, "gi_webrtc_available",
                            lambda: True)
        monkeypatch.setattr(webrtc_controller, "build_gi_session",
                            fake_build)

        rc = {}

        def run_sender():
            rc["rc"] = sender.run([
                "--ws=ws://127.0.0.1:18092", "--room=seq",
                "--serve-signaling", "--duration=7",
            ])

        t = threading.Thread(target=run_sender)
        t.start()
        time.sleep(1.0)

        answers_sent = []

        def make_viewer():
            def on_offer(sdp_text, frm):
                ans = sdp.build_answer(sdp.parse_sdp(sdp_text))
                answers_sent.append(ans)
                v.send_answer(ans)
            v = SignalingClient("ws://127.0.0.1:18092", room="seq",
                                client_type="viewer", on_offer=on_offer)
            return v

        # viewer 1: join, answer, leave
        v1 = make_viewer()
        v1.start()
        assert v1.wait_connected(10)
        deadline = time.monotonic() + 10
        while len(answers_sent) < 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert len(answers_sent) == 1
        v1.stop()
        time.sleep(0.5)

        # viewer 2: a fresh peer after v1 is gone
        v2 = make_viewer()
        v2.start()
        assert v2.wait_connected(10)
        deadline = time.monotonic() + 10
        while len(answers_sent) < 2 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert len(answers_sent) == 2
        t.join(timeout=20)
        v2.stop()
        assert rc["rc"] == 0
        s = sessions[0]
        # both viewers' answers were applied to the live element
        assert s.answers_applied == 2
        assert s.offers_sent >= 2  # initial negotiation + re-publish
        out = capsys.readouterr().out
        assert out.count("Viewer joined") == 2


def test_controller_ice_uses_peer_dialect_after_peer_answer():
    """Once a peer-id answer arrived (client.remote_peer_id set), the
    element's trickle ICE goes out as nested ice-candidate addressed to
    that peer (vad.cpp:119-144), not the flat room form."""

    class PeerStubClient(StubClient):
        def __init__(self):
            super().__init__()
            self.remote_peer_id = None
            self.peer_ice = []

        def send_ice_peer(self, cand, mline, peer_id=None):
            self.peer_ice.append((cand, mline, peer_id))

    client = PeerStubClient()
    gst, session = make_session(client)
    session.start()
    # room dialect first: flat ice
    session.webrtc.trickle_ice(0, "candidate:a")
    assert client.ice == [("candidate:a", 0)]
    # a peer-id answer arrives (the signaling client records the peer)
    client.remote_peer_id = "viewer-9"
    session.webrtc.trickle_ice(1, "candidate:b")
    assert client.peer_ice == [("candidate:b", 1, "viewer-9")]
    assert client.ice == [("candidate:a", 0)]  # unchanged
    session.stop()
