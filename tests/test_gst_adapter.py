"""appsink -> FrameFeeder -> appsrc bridge against the fake Gst (full
mapping logic), plus an auto-skipped live smoke test for gi hosts."""

import numpy as np
import pytest

from opencv_opencl_tpu.io import gst as gstb
from opencv_opencl_tpu.io.gst_adapter import (
    GstAppBridge,
    TimestampPolicy,
    gi_available,
)
from opencv_opencl_tpu.runtime import FrameFeeder
from tests.fake_gst import CLOCK_TIME_NONE, FakeGst, FlowReturn, MessageType, State, make_sample

W, H = 64, 48
ROWS = H * 3 // 2


def make_bridge(policy=TimestampPolicy.RELAY, loop=False, process=None,
                fps=30.0):
    gst = FakeGst()
    feeder = FrameFeeder(process or (lambda b: b), batch_size=2, depth=1)
    bridge = GstAppBridge(
        gst,
        capture_desc=gstb.capture_pipeline(width=W, height=H, fps=30),
        emit_desc=gstb.emit_pipeline(gstb.EncoderConfig(), width=W, height=H),
        feeder=feeder,
        frame_shape=(ROWS, W),
        fps=fps,
        policy=policy,
        loop=loop,
    )
    bridge.start()
    feeder.start()
    return gst, feeder, bridge


def frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (ROWS, W), dtype=np.uint8) for _ in range(n)]


def drain(bridge, feeder):
    feeder.stop(drain=True)


class TestRoundtrip:
    def test_frames_flow_in_order(self):
        gst, feeder, bridge = make_bridge(process=lambda b: b + 1)
        sink = bridge._appsink
        ins = frames(5)
        for f in ins:
            ret = sink.deliver(make_sample(f.tobytes(), W, H))
            assert ret == FlowReturn.OK
        drain(bridge, feeder)
        out = bridge._appsrc.pushed
        assert len(out) == 5
        for f, buf in zip(ins, out):
            got = np.frombuffer(buf.data, np.uint8).reshape(ROWS, W)
            assert np.array_equal(got, f + 1)

    def test_caps_cached_once(self):
        gst, feeder, bridge = make_bridge()
        sink = bridge._appsink
        sink.deliver(make_sample(frames(1)[0].tobytes(), W, H))
        assert bridge._video_info == (W, H)
        drain(bridge, feeder)

    def test_short_buffer_skipped(self):
        gst, feeder, bridge = make_bridge()
        ret = bridge._appsink.deliver(make_sample(b"\x00" * 10, W, H))
        assert ret == FlowReturn.OK
        drain(bridge, feeder)
        assert len(bridge._appsrc.pushed) == 0

    def test_push_failure_counted_not_raised(self):
        gst, feeder, bridge = make_bridge()
        bridge._appsrc.push_return = FlowReturn.ERROR
        bridge._appsink.deliver(make_sample(frames(1)[0].tobytes(), W, H))
        drain(bridge, feeder)
        assert feeder.stats["push_failures"] == 1


class TestTimestamps:
    def test_relay_clears(self):
        gst, feeder, bridge = make_bridge(TimestampPolicy.RELAY)
        bridge._appsink.deliver(
            make_sample(frames(1)[0].tobytes(), W, H, pts=123, dts=456,
                        duration=789))
        drain(bridge, feeder)
        buf = bridge._appsrc.pushed[0]
        assert buf.pts == CLOCK_TIME_NONE
        assert buf.dts == CLOCK_TIME_NONE
        assert buf.duration == CLOCK_TIME_NONE

    def test_synthesize_monotonic(self):
        gst, feeder, bridge = make_bridge(TimestampPolicy.SYNTHESIZE, fps=30)
        for f in frames(3):
            bridge._appsink.deliver(make_sample(f.tobytes(), W, H))
        drain(bridge, feeder)
        dur = int(round(1e9 / 30))
        for i, buf in enumerate(bridge._appsrc.pushed):
            assert buf.pts == i * dur
            assert buf.dts == i * dur
            assert buf.duration == dur

    def test_copy_passes_input_stamps(self):
        gst, feeder, bridge = make_bridge(TimestampPolicy.COPY)
        for i, f in enumerate(frames(3)):
            bridge._appsink.deliver(
                make_sample(f.tobytes(), W, H, pts=1000 * i, dts=1000 * i + 1,
                            duration=33))
        drain(bridge, feeder)
        for i, buf in enumerate(bridge._appsrc.pushed):
            assert buf.pts == 1000 * i
            assert buf.dts == 1000 * i + 1
            assert buf.duration == 33


class TestEosProtocol:
    def test_capture_eos_drains_then_appsrc_eos(self):
        gst, feeder, bridge = make_bridge()
        for f in frames(3):
            bridge._appsink.deliver(make_sample(f.tobytes(), W, H))
        bridge.capture.get_bus().post(MessageType.EOS)
        # queued frames must drain before EOS propagates (mp4 finalize)
        assert len(bridge._appsrc.pushed) == 3
        assert bridge._appsrc.eos_sent

    def test_emit_eos_finalizes(self):
        stopped = []
        gst = FakeGst()
        feeder = FrameFeeder(lambda b: b, batch_size=1)
        bridge = GstAppBridge(
            gst, gstb.capture_pipeline(width=W, height=H),
            gstb.emit_pipeline(gstb.EncoderConfig(), width=W, height=H),
            feeder, (ROWS, W), on_stop=lambda: stopped.append(1))
        bridge.start()
        feeder.start()
        bridge.emit.get_bus().post(MessageType.EOS)
        assert bridge.wait(1.0)
        assert stopped == [1]
        assert bridge.emit.state == State.NULL
        assert bridge.capture.state == State.NULL
        feeder.stop(drain=False)

    def test_loop_seeks_instead_of_eos(self):
        gst, feeder, bridge = make_bridge(loop=True)
        bridge.capture.get_bus().post(MessageType.EOS)
        assert bridge.capture.seeks, "loop mode must flush-seek to 0"
        assert bridge.capture.seeks[0][2] == 0
        assert not bridge._appsrc.eos_sent
        drain(bridge, feeder)

    def test_error_stops(self):
        gst, feeder, bridge = make_bridge()
        bridge.capture.get_bus().post(MessageType.ERROR)
        assert bridge.capture.state == State.NULL
        assert bridge.emit.state == State.NULL
        drain(bridge, feeder)


@pytest.mark.skipif(not gi_available(), reason="python-gi GStreamer absent")
def test_live_gi_smoke(tmp_path):
    """videotestsrc -> bridge -> filesink on a real GStreamer stack."""
    feeder = FrameFeeder(lambda b: b, batch_size=2)
    bridge = GstAppBridge.from_gi(
        f"videotestsrc num-buffers=10 ! video/x-raw,format=NV12,width={W},"
        f"height={H} ! appsink name=cv_sink emit-signals=true",
        f"appsrc name=my_src format=time caps=video/x-raw,format=NV12,"
        f"width={W},height={H},framerate=30/1 ! "
        f"filesink location={tmp_path}/out.raw",
        feeder, (ROWS, W), policy=TimestampPolicy.SYNTHESIZE,
    )
    bridge.start()
    feeder.start()
    import time

    time.sleep(2.0)
    feeder.stop(drain=True)
    bridge.stop()
    assert (tmp_path / "out.raw").stat().st_size > 0


def test_relay_io_gst_unavailable_exits_cleanly(capsys):
    """--io=gst on a gi-less host: clear error, rc=2, no traceback."""
    if gi_available():
        pytest.skip("gi present; the live smoke test covers this host")
    from opencv_opencl_tpu.apps import relay

    rc = relay.run(["--io=gst", "--source=test", "--width=64", "--height=48",
                    "--max-frames=2"])
    assert rc == 2
    assert "unavailable" in capsys.readouterr().err


def test_mp4_capture_pipeline_decoders():
    """The AirplanMP4 hardware-decode chain and its software fallback."""
    hw = gstb.mp4_capture_pipeline("/x.mp4")
    assert "qtdemux ! h264parse ! omxh264dec" in hw
    sw = gstb.mp4_capture_pipeline("/x.mp4", decoder="avdec")
    assert "avdec_h264" in sw and "omx" not in sw


def test_airplan_mp4_gst_unavailable(capsys):
    if gi_available():
        pytest.skip("gi present")
    from opencv_opencl_tpu.apps import airplan_mp4

    rc = airplan_mp4.run(["--input=/nonexistent.mp4", "--io=gst"])
    assert rc == 2
