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


# ---------------------------------------------------------------- adaptive --


def test_adaptive_backs_off_on_loss_and_recovers():
    from opencv_opencl_tpu.runtime.governor import AdaptiveRateGovernor

    t = [0.0]
    gov = AdaptiveRateGovernor(max_rate=60, min_rate=5,
                               clock=lambda: t[0])
    assert gov.rate == 60
    # 10% loss -> multiplicative backoff
    r1 = gov.on_receiver_report(26)          # 26/256 ~ 10%
    assert r1 == pytest.approx(60 * 0.7)
    r2 = gov.on_receiver_report(26)
    assert r2 == pytest.approx(60 * 0.49)
    assert gov.backoffs == 2
    # clean reports -> gentle recovery, capped at the ceiling
    r = r2
    for _ in range(100):
        r = gov.on_receiver_report(0)
    assert r == 60  # back to ceiling, never above
    # sustained heavy loss -> floor at min_rate
    for _ in range(100):
        r = gov.on_receiver_report(255)
    assert r == 5


def test_adaptive_rate_applies_to_admission():
    from opencv_opencl_tpu.runtime.governor import AdaptiveRateGovernor

    t = [0.0]
    gov = AdaptiveRateGovernor(max_rate=60, clock=lambda: t[0])
    gov.on_receiver_report(128)  # 50% loss -> 42 fps
    admitted = 0
    for i in range(240):
        t[0] = i / 120.0  # 120 fps input over 2 s
        if gov.admit():
            admitted += 1
    assert 80 <= admitted <= 88  # ~42 fps over 2 s


def test_adaptive_small_loss_below_threshold_recovers():
    from opencv_opencl_tpu.runtime.governor import AdaptiveRateGovernor

    gov = AdaptiveRateGovernor(max_rate=60)
    gov.on_receiver_report(26)
    rate_after_loss = gov.rate
    r = gov.on_receiver_report(2)  # 2/256 < 2% threshold: counts as clean
    assert r > rate_after_loss


def test_adaptive_rejects_bad_params():
    from opencv_opencl_tpu.runtime.governor import AdaptiveRateGovernor

    with pytest.raises(ValueError):
        AdaptiveRateGovernor(60, backoff=1.5)
    with pytest.raises(ValueError):
        AdaptiveRateGovernor(60, recover=0.5)


def test_feed_governor_single_backoff_per_drain():
    """A burst of queued RRs applies the multiplicative backoff ONCE
    (worst block wins), not once per block."""
    from opencv_opencl_tpu.io.rtcp import ReportBlock
    from opencv_opencl_tpu.runtime.governor import (
        AdaptiveRateGovernor, feed_governor_from_rtcp)

    class FakeRtcp:
        def __init__(self, blocks):
            self._blocks = blocks
        def poll(self):
            pass
        def take_blocks(self):
            b, self._blocks = self._blocks, []
            return b

    class FakeSink:
        def __init__(self, blocks):
            self.rtcp = FakeRtcp(blocks)

    gov = AdaptiveRateGovernor(30.0, backoff=0.7)
    blocks = [ReportBlock(1, 128, 0, 0, 0, 0, 0) for _ in range(4)]
    feed_governor_from_rtcp(gov, FakeSink(blocks))
    assert gov.rate == pytest.approx(30.0 * 0.7)  # once, not 0.7**4
    assert gov.backoffs == 1


def test_feed_governor_no_rtcp_is_noop():
    from opencv_opencl_tpu.runtime.governor import (
        AdaptiveRateGovernor, feed_governor_from_rtcp)

    gov = AdaptiveRateGovernor(30.0)
    feed_governor_from_rtcp(gov, object())  # no .rtcp attr
    assert gov.rate == 30.0
