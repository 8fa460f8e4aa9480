"""A minimal in-memory fake of the python-gi ``Gst`` surface used by
io.gst_adapter — lets the full appsink->feeder->appsrc mapping logic run
without GStreamer.  The fake mirrors real gi semantics: signal connect/emit,
buffer map/unmap, bus message callbacks, pipeline states, flushing seek.
"""

from __future__ import annotations

import enum
from typing import Any, Callable


class FlowReturn(enum.Enum):
    OK = 0
    ERROR = -1
    EOS = -2


class MapFlags(enum.IntFlag):
    READ = 1
    WRITE = 2


class MessageType(enum.Enum):
    EOS = "eos"
    ERROR = "error"


class State(enum.Enum):
    NULL = 0
    PLAYING = 4


class Format(enum.Enum):
    TIME = 3


class SeekFlags(enum.IntFlag):
    FLUSH = 1
    KEY_UNIT = 2


CLOCK_TIME_NONE = 2**64 - 1


class _MapInfo:
    def __init__(self, data: bytes):
        self.data = data


class Buffer:
    def __init__(self, data: bytes):
        self.data = data
        self.pts = CLOCK_TIME_NONE
        self.dts = CLOCK_TIME_NONE
        self.duration = CLOCK_TIME_NONE
        self.mapped = 0

    @classmethod
    def new_wrapped(cls, data: bytes) -> "Buffer":
        return cls(data)

    def map(self, flags):
        self.mapped += 1
        return True, _MapInfo(self.data)

    def unmap(self, info):
        self.mapped -= 1


class _CapsStructure:
    def __init__(self, fields: dict):
        self.fields = fields

    def get_value(self, key):
        return self.fields[key]


class Caps:
    def __init__(self, **fields):
        self._s = _CapsStructure(fields)

    def get_structure(self, i):
        return self._s


class Sample:
    def __init__(self, buf: Buffer, caps: Caps):
        self._buf = buf
        self._caps = caps

    def get_buffer(self):
        return self._buf

    def get_caps(self):
        return self._caps


class Element:
    """appsink/appsrc stand-in with gi-style signal connect/emit."""

    def __init__(self, name: str):
        self.name = name
        self._handlers: dict[str, Callable] = {}
        # appsink-side test hooks
        self.pending_samples: list[Sample] = []
        # appsrc-side capture
        self.pushed: list[Buffer] = []
        self.eos_sent = False
        self.push_return = FlowReturn.OK

    def connect(self, signal: str, cb: Callable) -> None:
        self._handlers[signal] = cb

    def emit(self, signal: str, *args):
        if signal == "pull-sample":
            return self.pending_samples.pop(0) if self.pending_samples else None
        if signal == "push-buffer":
            self.pushed.append(args[0])
            return self.push_return
        if signal == "end-of-stream":
            self.eos_sent = True
            return FlowReturn.OK
        if signal in self._handlers:
            return self._handlers[signal](self, *args)
        raise KeyError(signal)

    # test helper: deliver one sample through the connected new-sample cb
    def deliver(self, sample: Sample):
        self.pending_samples.append(sample)
        return self._handlers["new-sample"](self)


class _Message:
    def __init__(self, mtype: MessageType):
        self.type = mtype


class Bus:
    def __init__(self):
        self._cb: Callable | None = None
        self.watching = False

    def add_signal_watch(self):
        self.watching = True

    def connect(self, signal: str, cb: Callable):
        self._cb = cb

    def post(self, mtype: MessageType):
        if self._cb is not None:
            self._cb(self, _Message(mtype))


class Pipeline:
    def __init__(self, desc: str):
        self.desc = desc
        self.elements: dict[str, Element] = {}
        # materialize named appsink/appsrc elements from the description
        for tok in desc.replace("!", " ").split():
            if tok.startswith("name="):
                name = tok.split("=", 1)[1]
                self.elements[name] = Element(name)
        self.bus = Bus()
        self.state = State.NULL
        self.seeks: list[tuple] = []

    def get_by_name(self, name: str):
        return self.elements.get(name)

    def get_bus(self):
        return self.bus

    def set_state(self, state):
        self.state = state

    def seek_simple(self, fmt, flags, position):
        self.seeks.append((fmt, flags, position))
        return True


class FakeGst:
    """Module-shaped namespace matching the used Gst API surface."""

    FlowReturn = FlowReturn
    MapFlags = MapFlags
    MessageType = MessageType
    State = State
    Format = Format
    SeekFlags = SeekFlags
    CLOCK_TIME_NONE = CLOCK_TIME_NONE
    Buffer = Buffer

    def __init__(self):
        self.pipelines: list[Pipeline] = []

    def parse_launch(self, desc: str) -> Pipeline:
        p = Pipeline(desc)
        self.pipelines.append(p)
        return p


def make_sample(frame_bytes: bytes, width: int, height: int,
                pts=CLOCK_TIME_NONE, dts=CLOCK_TIME_NONE,
                duration=CLOCK_TIME_NONE) -> Sample:
    buf = Buffer(frame_bytes)
    buf.pts, buf.dts, buf.duration = pts, dts, duration
    return Sample(buf, Caps(width=width, height=height))
