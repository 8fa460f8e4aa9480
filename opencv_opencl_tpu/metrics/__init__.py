from opencv_opencl_tpu.metrics.counters import (
    FrameRateCounters,
    StatusReporter,
    classify_status,
)
from opencv_opencl_tpu.metrics.timing import Span, TimingStats

__all__ = [
    "FrameRateCounters",
    "StatusReporter",
    "classify_status",
    "Span",
    "TimingStats",
]
