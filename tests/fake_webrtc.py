"""Fake-gi webrtcbin double for the negotiation controller.

Extends ``tests/fake_gst.py`` with the GstWebRTC surface the controller
uses: promises with change funcs, ``create-offer`` /
``set-local-description`` / ``set-remote-description`` /
``add-ice-candidate`` action signals, ``on-negotiation-needed`` and
``on-ice-candidate`` emission, and an ``ice-connection-state`` property
with gi-style ``notify::`` dispatch.  The offer the fake produces is a
REAL parseable SDP (io.sdp) so the signaling path carries valid blobs
end-to-end, mirroring what a live webrtcbin would publish.
"""

from __future__ import annotations

from typing import Any, Callable

from tests.fake_gst import Element, FakeGst, Pipeline, State


class Promise:
    """Gst.Promise: optionally resolved through a change func."""

    def __init__(self, change_func: Callable | None = None,
                 user_data: tuple = ()):
        self._cb = change_func
        self._ud = user_data
        self._reply = None
        self.interrupted = False

    @classmethod
    def new(cls) -> "Promise":
        return cls()

    @classmethod
    def new_with_change_func(cls, cb: Callable, *user_data: Any) -> "Promise":
        return cls(cb, user_data)

    def get_reply(self):
        return self._reply

    def interrupt(self) -> None:
        self.interrupted = True

    def resolve(self, reply) -> None:
        self._reply = reply
        if self._cb is not None:
            self._cb(self, *self._ud)


class _Reply:
    """The structure returned by create-offer's promise."""

    def __init__(self, fields: dict):
        self._fields = fields

    def get_value(self, key: str):
        return self._fields[key]


class _SdpMessage:
    def __init__(self, text: str):
        self._text = text

    def as_text(self) -> str:
        return self._text


class SessionDescription:
    """GstWebRTCSessionDescription stand-in: .type + .sdp.as_text()."""

    def __init__(self, kind: str, text: str):
        self.type = kind
        self.sdp = _SdpMessage(text)


class _IceState:
    def __init__(self, nick: str):
        self.value_nick = nick


class WebRtcBin(Element):
    """webrtcbin stand-in implementing the negotiation action signals."""

    def __init__(self, name: str):
        super().__init__(name)
        self.local_desc: SessionDescription | None = None
        self.remote_desc: SessionDescription | None = None
        self.remote_ice: list[tuple[int, str]] = []
        self.offers_created = 0
        self._ice_state = _IceState("new")
        self._notify_handlers: dict[str, Callable] = {}
        # what SDP the "element" offers; tests may override before PLAYING
        from opencv_opencl_tpu.io import sdp

        self.offer_text = sdp.build_offer(
            [sdp.media_for_codec("h264", "video", mid="video0")])

    def connect(self, signal: str, cb: Callable) -> None:
        if signal.startswith("notify::"):
            self._notify_handlers[signal.split("::", 1)[1]] = cb
        else:
            super().connect(signal, cb)

    def emit(self, signal: str, *args):
        if signal == "create-offer":
            _options, promise = args
            self.offers_created += 1
            offer = SessionDescription("offer", self.offer_text)
            promise.resolve(_Reply({"offer": offer}))
            return None
        if signal == "set-local-description":
            desc, _promise = args
            self.local_desc = desc
            return None
        if signal == "set-remote-description":
            desc, _promise = args
            self.remote_desc = desc
            return None
        if signal == "add-ice-candidate":
            mline, cand = args
            self.remote_ice.append((int(mline), cand))
            return None
        return super().emit(signal, *args)

    def get_property(self, name: str):
        if name == "ice-connection-state":
            return self._ice_state
        raise AttributeError(name)

    # -- test hooks (what the real engine would do on its own) ------------

    def trigger_negotiation(self) -> None:
        if "on-negotiation-needed" in self._handlers:
            self._handlers["on-negotiation-needed"](self)

    def trickle_ice(self, mline: int, candidate: str) -> None:
        self._handlers["on-ice-candidate"](self, mline, candidate)

    def set_ice_state(self, nick: str) -> None:
        self._ice_state = _IceState(nick)
        cb = self._notify_handlers.get("ice-connection-state")
        if cb is not None:
            cb(self, None)


class WebRtcPipeline(Pipeline):
    """Pipeline whose `webrtcbin name=X` elements are WebRtcBin and whose
    transition to PLAYING fires on-negotiation-needed, like the engine."""

    def __init__(self, desc: str):
        super().__init__(desc)
        toks = desc.replace("!", " ").split()
        for i, tok in enumerate(toks):
            if tok == "webrtcbin" and i + 1 < len(toks) \
                    and toks[i + 1].startswith("name="):
                name = toks[i + 1].split("=", 1)[1]
                self.elements[name] = WebRtcBin(name)

    def set_state(self, state):
        super().set_state(state)
        if state == State.PLAYING:
            for el in self.elements.values():
                if isinstance(el, WebRtcBin):
                    el.trigger_negotiation()


class FakeWebRtcGst(FakeGst):
    Promise = Promise

    def parse_launch(self, desc: str) -> WebRtcPipeline:
        p = WebRtcPipeline(desc)
        self.pipelines.append(p)
        return p


class FakeWebRtcApi:
    """The WebRtcApi seam for the fake stack."""

    def desc_text(self, desc: SessionDescription) -> str:
        return desc.sdp.as_text()

    def answer_from_text(self, sdp_text: str) -> SessionDescription:
        # mirror GstSdp strictness: reject obviously non-SDP blobs
        if "v=0" not in sdp_text:
            raise ValueError("not an SDP")
        return SessionDescription("answer", sdp_text)
