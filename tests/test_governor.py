"""RateGovernor: drop-only rate capping (videorate drop-only semantics)."""

import pytest

from opencv_opencl_tpu.runtime.governor import RateGovernor


def test_caps_rate():
    t = [0.0]
    gov = RateGovernor(max_rate=30, clock=lambda: t[0])
    admitted = 0
    # 60 fps input for 2 simulated seconds
    for i in range(120):
        t[0] = i / 60.0
        if gov.admit():
            admitted += 1
    assert 58 <= admitted <= 61  # ~30 fps over 2 s
    assert gov.dropped == 120 - admitted


def test_slow_input_passes_through():
    t = [0.0]
    gov = RateGovernor(max_rate=30, clock=lambda: t[0])
    for i in range(30):
        t[0] = i / 10.0  # 10 fps input
        assert gov.admit()
    assert gov.dropped == 0


def test_resync_after_gap():
    t = [0.0]
    gov = RateGovernor(max_rate=30, clock=lambda: t[0])
    assert gov.admit()
    t[0] = 10.0  # long stall
    assert gov.admit()
    t[0] = 10.01  # immediately after: must be dropped (not a backlog burst)
    assert not gov.admit()


def test_rejects_bad_rate():
    with pytest.raises(ValueError):
        RateGovernor(0)
