"""Metrics: counters, status classifier, timing decomposition."""

from opencv_opencl_tpu.metrics import (
    FrameRateCounters,
    StatusReporter,
    TimingStats,
    classify_status,
)


def test_counters():
    c = FrameRateCounters()
    c.count("camera_frames")
    c.count("camera_frames", 3)
    c.count("encoder_bytes", 1024)
    s = c.snapshot()
    assert s["camera_frames"] == 4
    assert s["encoder_bytes"] == 1024
    assert s["processing_errors"] == 0


def test_classifier_priorities():
    # exact priority order of OpenCLequalHist.cpp:467-479
    assert classify_status(accel_errors=1, processing_errors=1, queue_length=9,
                           output_fps=30) == "ACCEL ERRORS"
    assert classify_status(accel_errors=0, processing_errors=1, queue_length=9,
                           output_fps=30) == "PROCESSING ERRORS"
    assert classify_status(accel_errors=0, processing_errors=0, queue_length=9,
                           output_fps=30) == "QUEUE BACKLOG"
    assert classify_status(accel_errors=0, processing_errors=0, queue_length=0,
                           output_fps=30) == "ACTIVE"
    assert classify_status(accel_errors=0, processing_errors=0, queue_length=0,
                           output_fps=0) == "IDLE"


def test_status_reporter_tick():
    lines = []
    c = FrameRateCounters()
    rep = StatusReporter(c, interval_s=2.0, printer=lines.append,
                         queue_length_fn=lambda: 3, num_workers=2)
    c.count("camera_frames", 60)
    c.count("output_frames", 60)
    c.count("encoder_frames", 60)
    c.count("encoder_bytes", 500_000)
    block = rep.tick()
    assert "FRAME RATE MONITORING" in block
    assert "Camera Capture Rate" in block
    assert "Output Bitrate" in block
    assert "Queue Length: 3" in block
    assert rep.last_status == "ACTIVE"
    assert lines  # printed


def test_timing_stats_reports():
    lines = []
    t = TimingStats(window=10, label="clipLimit=2.0, tileGrid=8x8",
                    printer=lines.append)
    for _ in range(20):
        t.record(2.0, 1.0, 4.0)
    assert t.frame_count == 20
    assert len(t.total_ms) == 10  # rolling window
    w = t.window_report()
    assert "TIMING ANALYSIS" in w
    assert "(250.0 FPS)" in w
    assert "Compute=50.0%" in w
    f = t.final_report()
    assert "FINAL PERFORMANCE ANALYSIS" in f
    assert "Total frames processed: 20" in f


def test_timing_frame_context():
    t = TimingStats()
    with t.frame() as (c, m):
        with c:
            pass
        with m:
            pass
    assert t.frame_count == 1
    assert t.total_ms[0] >= 0


class TestLatencyPercentiles:
    def test_percentiles_nearest_rank(self):
        from opencv_opencl_tpu.metrics.timing import TimingStats

        ts = TimingStats(window=100, printer=lambda *a: None)
        for i in range(1, 101):  # totals 1..100 ms
            ts.record(0.0, 0.0, float(i))
        assert ts.percentile_total_ms(50) == 50.0
        assert ts.percentile_total_ms(95) == 95.0
        assert ts.percentile_total_ms(99) == 99.0
        assert ts.percentile_total_ms(0) == 1.0
        assert ts.percentile_total_ms(100) == 100.0

    def test_percentiles_empty_and_in_report(self):
        from opencv_opencl_tpu.metrics.timing import TimingStats

        out = []
        ts = TimingStats(printer=out.append)
        assert ts.percentile_total_ms(95) == 0.0
        ts.record(1.0, 0.5, 2.0)
        ts.final_report()
        assert "p95=2.000 ms" in out[-1]
