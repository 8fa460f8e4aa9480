"""Frame-rate governor — the ``videorate drop-only=true max-rate=N`` stage.

The reference caps the camera rate by dropping frames in GStreamer
(``OpenCVequalHist.cpp:294-295``); this is the host-side equivalent for
non-GStreamer sources: a deterministic drop-only limiter that never
duplicates and never stalls.
"""

from __future__ import annotations

import time

__all__ = ["RateGovernor"]


class RateGovernor:
    """Drop-only rate limiter: ``admit()`` returns False for frames that
    would exceed ``max_rate`` (frames/second)."""

    def __init__(self, max_rate: float, clock=time.monotonic):
        if max_rate <= 0:
            raise ValueError("max_rate must be > 0")
        self.period = 1.0 / max_rate
        self.clock = clock
        self._next_due = None
        self.admitted = 0
        self.dropped = 0

    def admit(self) -> bool:
        now = self.clock()
        if self._next_due is None:
            self._next_due = now + self.period
            self.admitted += 1
            return True
        if now >= self._next_due:
            # schedule from the slot grid, not from `now`, so sustained
            # input converges to exactly max_rate (videorate semantics)
            self._next_due += self.period
            if self._next_due < now:  # fell behind: resync
                self._next_due = now + self.period
            self.admitted += 1
            return True
        self.dropped += 1
        return False
