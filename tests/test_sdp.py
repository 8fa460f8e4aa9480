"""SDP offer/answer generation + parsing, and the peer-id signaling dialect
(reference message shapes: webrtc/vad.cpp:69-144, atc.cpp identical)."""

import json

import pytest

from opencv_opencl_tpu.io import sdp
from opencv_opencl_tpu.io.signaling import SignalingClient


class TestSdp:
    def test_offer_roundtrip_video(self):
        offer = sdp.build_offer([sdp.media_for_codec("h264")])
        sess = sdp.parse_sdp(offer)
        assert len(sess.medias) == 1
        m = sess.medias[0]
        assert (m.kind, m.encoding_name, m.payload_type, m.clock_rate) == (
            "video", "H264", 96, 90000)
        assert m.direction == "sendonly"
        assert m.mid == "video0"
        assert sess.ice_ufrag and sess.ice_pwd
        assert sess.fingerprint.startswith("sha-256 ")

    def test_offer_two_track(self):
        offer = sdp.build_offer([
            sdp.media_for_codec("vp8", "video", mid="video0"),
            sdp.media_for_codec("opus", "audio", mid="audio1"),
        ])
        sess = sdp.parse_sdp(offer)
        assert [m.kind for m in sess.medias] == ["video", "audio"]
        assert sess.medias[1].encoding_name == "OPUS"
        assert sess.medias[1].channels == 2
        assert "group:BUNDLE video0 audio1" in sess.session_attributes

    def test_answer_mirrors_and_reverses(self):
        offer = sdp.parse_sdp(sdp.build_offer([
            sdp.media_for_codec("h265"),
            sdp.media_for_codec("opus", "audio", mid="audio1"),
        ]))
        ans = sdp.parse_sdp(sdp.build_answer(offer))
        assert len(ans.medias) == 2
        for mo, ma in zip(offer.medias, ans.medias):
            assert ma.kind == mo.kind
            assert ma.payload_type == mo.payload_type
            assert ma.encoding_name == mo.encoding_name
            assert ma.direction == "recvonly"
            assert ma.mid == mo.mid

    def test_offers_have_fresh_credentials(self):
        a = sdp.parse_sdp(sdp.build_offer([sdp.media_for_codec("h264")]))
        b = sdp.parse_sdp(sdp.build_offer([sdp.media_for_codec("h264")]))
        assert a.ice_ufrag != b.ice_ufrag
        assert a.fingerprint != b.fingerprint

    def test_crlf_and_lf_parse_the_same(self):
        offer = sdp.build_offer([sdp.media_for_codec("vp8")])
        a = sdp.parse_sdp(offer)
        b = sdp.parse_sdp(offer.replace("\r\n", "\n"))
        assert [m.mid for m in a.medias] == [m.mid for m in b.medias]

    def test_unknown_codec_raises(self):
        with pytest.raises(KeyError):
            sdp.media_for_codec("av2")


class TestPeerIdDialect:
    """Receive-side peer-id dialect in SignalingClient._dispatch."""

    def make_client(self, **cb):
        return SignalingClient("ws://unused", room="r", **cb)

    def test_registered_stores_id(self):
        got = {}
        c = self.make_client(on_registered=lambda i: got.update(id=i))
        c._dispatch(json.dumps({"type": "registered", "id": "abc123"}))
        assert c.my_id == "abc123"
        assert got["id"] == "abc123"

    def test_answer_with_from_records_peer(self):
        got = {}
        c = self.make_client(on_answer=lambda s: got.update(sdp=s))
        c._dispatch(json.dumps(
            {"type": "answer", "sdp": "v=0...", "from": "peer-7"}))
        assert c.remote_peer_id == "peer-7"
        assert got["sdp"] == "v=0..."

    def test_nested_ice_candidate(self):
        got = {}
        c = self.make_client(on_ice=lambda s, m: got.update(cand=s, mline=m))
        c._dispatch(json.dumps({
            "type": "ice-candidate",
            "from": "peer-7",
            "candidate": {"candidate": "candidate:42 1 udp ...",
                          "sdpMLineIndex": 1, "sdpMid": "audio1"},
        }))
        assert got == {"cand": "candidate:42 1 udp ...", "mline": 1}
        assert c.remote_peer_id == "peer-7"

    def test_empty_candidate_is_end_of_candidates(self):
        # vad.cpp:100-104: empty candidate string must be ignored
        hits = []
        c = self.make_client(on_ice=lambda s, m: hits.append(s))
        c._dispatch(json.dumps({
            "type": "ice-candidate", "candidate": {"candidate": ""},
        }))
        assert hits == []

    def test_offer_with_from(self):
        got = {}
        c = self.make_client(
            on_offer=lambda s, f: got.update(sdp=s, frm=f))
        c._dispatch(json.dumps(
            {"type": "offer", "sdp": "v=0 O", "from": "sender-1"}))
        assert got == {"sdp": "v=0 O", "frm": "sender-1"}

    def test_room_dialect_still_works(self):
        got = {}
        c = self.make_client(on_ice=lambda s, m: got.update(cand=s, mline=m))
        c._dispatch(json.dumps(
            {"type": "ice", "candidate": "candidate:1", "sdpMLineIndex": 0}))
        assert got == {"cand": "candidate:1", "mline": 0}


def test_peer_id_roundtrip_over_relay():
    """Full peer-id dialect roundtrip through the in-repo relay server:
    sender offer -> viewer answers with from -> sender ice-candidate with
    to/nested shape -> viewer receives it."""
    import time

    from opencv_opencl_tpu.io.signaling import SignalingServer

    server = SignalingServer().start()
    try:
        events = {"offer": None, "answer": None, "ice": None}

        def viewer_offer(sdp_text, frm):
            events["offer"] = sdp_text
            events["offer_from"] = frm
            viewer.send_answer("v=0 ANSWER", to=frm)

        sender_c = SignalingClient(
            server.url, room="p", client_type="sender",
            on_ready=lambda: sender_c.send_offer(
                sdp.build_offer([sdp.media_for_codec("vp8")])),
            on_answer=lambda s: events.update(answer=s),
        ).start()
        assert sender_c.wait_connected(10)
        viewer = SignalingClient(
            server.url, room="p", client_type="viewer",
            on_offer=viewer_offer,
            on_ice=lambda s, m: events.update(ice=(s, m)),
        ).start()
        assert viewer.wait_connected(10)
        deadline = time.time() + 5
        while events["answer"] is None and time.time() < deadline:
            time.sleep(0.05)
        assert events["offer"] and "m=video" in events["offer"]
        assert events["answer"] == "v=0 ANSWER"
        # the relay attaches real peer ids: the offer carried the sender's,
        # the answer carried the viewer's, and both clients registered
        assert events["offer_from"] == sender_c.my_id
        assert sender_c.remote_peer_id == viewer.my_id
        assert viewer.my_id and sender_c.my_id
        # sender pushes a peer-id ICE candidate; viewer gets the nested shape
        sender_c.send_ice_peer("candidate:9 1 udp", 0,
                               peer_id=sender_c.remote_peer_id)
        deadline = time.time() + 5
        while events["ice"] is None and time.time() < deadline:
            time.sleep(0.05)
        assert events["ice"] == ("candidate:9 1 udp", 0)
        viewer.stop()
        sender_c.stop()
    finally:
        server.stop()


class TestRtpSessionSdp:
    def test_jpeg_session(self):
        from opencv_opencl_tpu.io.sdp import build_rtp_session_sdp, parse_sdp

        text = build_rtp_session_sdp("10.0.0.2", 5004, "jpeg")
        assert "m=video 5004 RTP/AVP 26" in text
        assert "a=rtpmap:26 JPEG/90000" in text
        assert "c=IN IP4 10.0.0.2" in text
        sess = parse_sdp(text)  # our own parser can read it back
        assert sess.medias and sess.medias[0].payload_type == 26

    def test_h264_session(self):
        from opencv_opencl_tpu.io.sdp import build_rtp_session_sdp

        text = build_rtp_session_sdp("192.168.25.69", 5004, "h264")
        assert "a=rtpmap:96 H264/90000" in text
        assert "packetization-mode=1" in text

    def test_raw_session_honest_private_name(self):
        from opencv_opencl_tpu.io.sdp import build_rtp_session_sdp

        text = build_rtp_session_sdp("127.0.0.1", 6000, "raw",
                                     width=1920, height=1080)
        assert "X-NV12/90000" in text
        assert "width=1920; height=1080" in text

    def test_unknown_kind(self):
        import pytest

        from opencv_opencl_tpu.io.sdp import build_rtp_session_sdp

        with pytest.raises(ValueError):
            build_rtp_session_sdp("h", 1, "mpeg2")


def test_relay_writes_sdp_file(tmp_path):
    from opencv_opencl_tpu.apps import relay

    sdp = tmp_path / "stream.sdp"
    rc = relay.run([
        "--source=test", "--width=96", "--height=64", "--op=histeq",
        "--batch=2", "--max-frames=4", "--fps=30",
        "--sink=rtp://127.0.0.1:55999", f"--sdp-file={sdp}",
    ])
    assert rc == 0
    text = sdp.read_text()
    assert "m=video 55999 RTP/AVP 26" in text


class TestParseRobustness:
    def test_malformed_lines_never_raise(self):
        """A broken peer's SDP must not crash the signaling dispatch:
        bad m-lines, non-numeric PTs, truncated rtpmaps all degrade to
        skipped fields."""
        from opencv_opencl_tpu.io.sdp import parse_sdp

        bad = "\r\n".join([
            "v=0", "s=x",
            "m=video 5004 RTP/AVP 96",
            "a=rtpmap:96 H264/90000",
            "a=mid:video0",
            "m=",                      # empty m-line: section discarded
            "a=mid:evil",              # ...with its attributes
            "m=video 5004 RTP/AVP xx 97",  # bad token among valid PTs
            "a=rtpmap:96",             # no space
            "a=rtpmap:zz H264/90000",  # non-numeric pt
            "a=rtpmap:97 H265",        # missing clock rate
            "a=rtpmap:97 H265/ninety", # non-numeric clock rate
        ])
        sess = parse_sdp(bad)
        assert len(sess.medias) == 2
        # the garbled section's attributes must not leak into a valid one
        assert sess.medias[0].mid == "video0"
        assert sess.medias[0].encoding_name == "H264"
        # ...and a non-numeric token doesn't discard the valid PTs
        assert sess.medias[1].payload_type == 97

    def test_fuzz_garbage_never_raises(self):
        import numpy as np

        from opencv_opencl_tpu.io.sdp import parse_sdp

        rng = np.random.default_rng(5)
        chars = "vsmoactbk=:/ \r\n0123456789abcdefHRTPAVP-"
        for _ in range(300):
            n = int(rng.integers(0, 200))
            text = "".join(chars[i] for i in rng.integers(0, len(chars), n))
            parse_sdp(text)  # must not raise

    def test_bitflipped_valid_offer_never_raises(self):
        import numpy as np

        from opencv_opencl_tpu.io.sdp import (
            build_offer, media_for_codec, parse_sdp)

        rng = np.random.default_rng(6)
        offer = build_offer([media_for_codec("h264")])
        for _ in range(300):
            chars = list(offer)
            for _ in range(int(rng.integers(1, 5))):
                i = int(rng.integers(0, len(chars)))
                chars[i] = chr(int(rng.integers(32, 127)))
            parse_sdp("".join(chars))  # must not raise
