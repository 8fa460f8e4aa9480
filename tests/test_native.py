"""Native C++ runtime: staging ring, resequencer, NV12 helpers."""

import os

import numpy as np
import pytest

from opencv_opencl_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native runtime unavailable: {native.build_error()}",
)

FRAME = 64 * 48


def _frames(rng, n):
    return rng.integers(0, 256, (n, FRAME), dtype=np.uint8)


class TestNativeRing:
    def test_push_pop_batch_order(self, rng):
        ring = native.NativeRing(capacity=8, frame_bytes=FRAME)
        fs = _frames(rng, 5)
        for i, f in enumerate(fs):
            assert ring.push(f, i)
        out = np.zeros((4, FRAME), dtype=np.uint8)
        n, seqs = ring.pop_batch(out, 4)
        assert n == 4
        assert list(seqs) == [0, 1, 2, 3]
        for i in range(4):
            assert np.array_equal(out[i], fs[i])
        n2, seqs2 = ring.pop_batch(out, 4)
        assert n2 == 1 and seqs2[0] == 4

    def test_leaky_drop_oldest(self, rng):
        ring = native.NativeRing(capacity=2, frame_bytes=FRAME)
        fs = _frames(rng, 3)
        assert ring.push(fs[0], 0)
        assert ring.push(fs[1], 1)
        assert not ring.push(fs[2], 2)  # frame 0 dropped
        assert ring.dropped == 1
        out = np.zeros((4, FRAME), dtype=np.uint8)
        n, seqs = ring.pop_batch(out, 4)
        assert list(seqs) == [1, 2]

    def test_pop_timeout_and_close(self, rng):
        ring = native.NativeRing(capacity=2, frame_bytes=FRAME)
        out = np.zeros((1, FRAME), dtype=np.uint8)
        n, _ = ring.pop_batch(out, 1, timeout_ms=10)
        assert n == 0  # timeout
        ring.close()
        n, _ = ring.pop_batch(out, 1, timeout_ms=10)
        assert n == -1  # closed + drained

    def test_slot_reuse(self, rng):
        ring = native.NativeRing(capacity=2, frame_bytes=FRAME)
        out = np.zeros((2, FRAME), dtype=np.uint8)
        for round_ in range(5):
            fs = _frames(rng, 2)
            ring.push(fs[0], 2 * round_)
            ring.push(fs[1], 2 * round_ + 1)
            n, seqs = ring.pop_batch(out, 2)
            assert n == 2
            assert np.array_equal(out[0], fs[0])
            assert np.array_equal(out[1], fs[1])


class TestNativeResequencer:
    def test_reorder(self, rng):
        rs = native.NativeResequencer(max_pending=8, frame_bytes=FRAME)
        fs = _frames(rng, 4)
        assert rs.push(1, fs[1]) == 0  # gap at 0
        assert rs.push(0, fs[0]) == 2  # both ready
        out = np.zeros(FRAME, dtype=np.uint8)
        assert rs.emit(out) == 0
        assert np.array_equal(out, fs[0])
        assert rs.emit(out) == 1
        assert rs.emit(out) == -1  # nothing ready

    def test_late_drop_and_skip(self, rng):
        rs = native.NativeResequencer(max_pending=2, frame_bytes=FRAME)
        fs = _frames(rng, 5)
        rs.push(1, fs[1])
        rs.push(2, fs[2])
        rs.push(3, fs[3])  # exceeds max_pending -> skip slot 0
        assert rs.frames_lost == 1
        out = np.zeros(FRAME, dtype=np.uint8)
        assert rs.emit(out) == 1
        rs.push(0, fs[0])  # too late
        assert rs.dropped_late == 1


class TestNv12Helpers:
    def test_interleave_roundtrip(self, rng):
        u = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        v = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        uv = native.uv_interleave(u, v)
        assert uv.shape == (24, 64)
        assert np.array_equal(uv[:, 0::2], u)
        assert np.array_equal(uv[:, 1::2], v)
        u2, v2 = native.uv_deinterleave(uv)
        assert np.array_equal(u2, u)
        assert np.array_equal(v2, v)

    def test_gray(self):
        uv = np.zeros((24, 64), dtype=np.uint8)
        native.uv_gray(uv)
        assert (uv == 128).all()


def test_ring_multiproducer_stress(rng):
    """4 producer threads hammering the ring while a consumer drains:
    no crashes, no duplicates, FIFO per producer, full accounting."""
    import threading

    ring = native.NativeRing(capacity=16, frame_bytes=FRAME)
    per_producer = 200
    n_producers = 4

    def produce(pid):
        fs = _frames(np.random.default_rng(pid), per_producer)
        for i, f in enumerate(fs):
            ring.push(f, pid * 100000 + i)

    threads = [threading.Thread(target=produce, args=(p,))
               for p in range(n_producers)]
    got = []
    out = np.zeros((8, FRAME), dtype=np.uint8)
    for t in threads:
        t.start()
    import time
    deadline = time.time() + 20
    while time.time() < deadline:
        n, seqs = ring.pop_batch(out, 8, timeout_ms=20)
        got.extend(int(s) for s in seqs)
        if all(not t.is_alive() for t in threads) and len(ring) == 0:
            break
    for t in threads:
        t.join()
    n, seqs = ring.pop_batch(out, 8, timeout_ms=20)
    got.extend(int(s) for s in seqs)
    assert len(got) == len(set(got)), "duplicate frames surfaced"
    assert len(got) + ring.dropped == n_producers * per_producer
    # FIFO per producer
    for p in range(n_producers):
        mine = [s for s in got if s // 100000 == p]
        assert mine == sorted(mine)


def test_native_tsan_stress():
    """Machine-checked thread safety: the C++ ring + resequencer under
    4-producer contention, built with -fsanitize=thread (the reference had
    no race detection at all — SURVEY §5)."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    script = os.path.join(
        os.path.dirname(native.__file__), "build_stress.sh"
    )
    res = subprocess.run(["sh", script], capture_output=True, text=True,
                         timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "no data races detected" in res.stdout
