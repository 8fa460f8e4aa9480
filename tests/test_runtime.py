"""Runtime layer: leaky queue, resequencer, double-buffered feeder."""

import threading
import time

import numpy as np
import pytest

from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
from opencv_opencl_tpu.models import Enhancer, EnhancerConfig
from opencv_opencl_tpu.runtime import Closed, FrameFeeder, LeakyQueue, Resequencer


class TestLeakyQueue:
    def test_fifo(self):
        q = LeakyQueue(max_size=4)
        for i in range(3):
            q.put(i)
        assert [q.get(0.1) for _ in range(3)] == [0, 1, 2]

    def test_drops_oldest_when_full(self):
        dropped = []
        q = LeakyQueue(max_size=2, on_drop=dropped.append)
        q.put(0), q.put(1)
        assert q.put(2) is False  # 0 dropped
        assert dropped == [0]
        assert q.dropped == 1
        assert [q.get(0.1), q.get(0.1)] == [1, 2]

    def test_get_timeout(self):
        q = LeakyQueue(max_size=2)
        with pytest.raises(TimeoutError):
            q.get(timeout=0.01)

    def test_close_drains_then_raises(self):
        q = LeakyQueue(max_size=4)
        q.put(7)
        q.close()
        assert q.get(0.1) == 7
        with pytest.raises(Closed):
            q.get(0.1)

    def test_get_batch(self):
        q = LeakyQueue(max_size=8)
        for i in range(5):
            q.put(i)
        assert q.get_batch(3, 0.1) == [0, 1, 2]
        assert q.get_batch(8, 0.1) == [3, 4]

    def test_threaded_producer(self):
        q = LeakyQueue(max_size=100)
        t = threading.Thread(target=lambda: [q.put(i) for i in range(50)])
        t.start()
        got = [q.get(1.0) for _ in range(50)]
        t.join()
        assert got == list(range(50))


class TestResequencer:
    def test_in_order_passthrough(self):
        out = []
        r = Resequencer(lambda s, f: out.append((s, f)))
        for i in range(5):
            r.push(i, f"f{i}")
        assert out == [(i, f"f{i}") for i in range(5)]

    def test_reorders(self):
        out = []
        r = Resequencer(lambda s, f: out.append(s))
        for seq in [1, 0, 3, 2, 4]:
            r.push(seq, None)
        assert out == [0, 1, 2, 3, 4]

    def test_late_drop(self):
        out = []
        r = Resequencer(lambda s, f: out.append(s), max_pending=2)
        r.push(1, None)
        r.push(2, None)
        r.push(3, None)  # exceeds max_pending -> skip gap at 0
        assert out == [1, 2, 3]
        assert r.frames_lost == 1
        r.push(0, None)  # too late: its slot was given up
        assert r.dropped_late == 1
        assert out == [1, 2, 3]

    def test_flush(self):
        out = []
        r = Resequencer(lambda s, f: out.append(s))
        r.push(0, None)
        r.push(2, None)
        r.push(5, None)
        r.flush()
        assert out == [0, 2, 5]
        assert r.frames_lost == 3  # slots 1, 3, 4


SPEC = FrameSpec(width=64, height=48, fps=30)


def _mk_feeder(batch_size=2, depth=2, **kw):
    enh = Enhancer(
        EnhancerConfig(op="histeq", chroma=ChromaPolicy.PASSTHROUGH), SPEC
    )
    results = {}
    feeder = FrameFeeder(
        enh.process_batch,
        batch_size=batch_size,
        depth=depth,
        on_output=lambda seq, frame, meta: results.__setitem__(seq, (frame, meta)),
        **kw,
    )
    return feeder, results


def test_feeder_end_to_end(rng):
    import cv2

    feeder, results = _mk_feeder()
    frames = rng.integers(0, 256, (6, SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    feeder.start()
    for i, f in enumerate(frames):
        feeder.submit(f, meta={"pts": i})
    feeder.stop(drain=True)
    assert sorted(results) == list(range(6))
    for i in range(6):
        out, meta = results[i]
        assert meta == {"pts": i}
        assert np.array_equal(out[:48], cv2.equalizeHist(frames[i, :48]))
        assert np.array_equal(out[48:], frames[i, 48:])  # chroma passthrough
    stats = feeder.stats
    assert stats["input_frames"] == 6
    assert stats["output_frames"] == 6
    assert stats["processing_errors"] == 0


def test_feeder_odd_batch_padding(rng):
    # 5 frames with batch_size=2: last dispatch is a padded single frame
    feeder, results = _mk_feeder(batch_size=2)
    frames = rng.integers(0, 256, (5, SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    feeder.start()
    for f in frames:
        feeder.submit(f)
    feeder.stop(drain=True)
    assert sorted(results) == list(range(5))


def test_feeder_overflow_drops_oldest(rng):
    # tiny queue, feeder not started: submits overflow
    feeder, _ = _mk_feeder(queue_capacity=2)
    frames = rng.integers(0, 256, (5, SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    for f in frames:
        feeder.submit(f)
    assert feeder.counters.get("dropped_overflow") == 3
    assert feeder.queue_length() == 2


def test_feeder_processing_error_counted():
    def broken(batch):
        raise RuntimeError("boom")

    feeder = FrameFeeder(broken, batch_size=1)
    feeder.start()
    feeder.submit(np.zeros((SPEC.buffer_rows, SPEC.width), np.uint8))
    feeder.stop(drain=True)
    assert feeder.stats["processing_errors"] == 1
    assert feeder.stats["output_frames"] == 0


def test_feeder_latency_idle_retire(rng):
    """With depth=2, a lone frame must still come out promptly when the
    input goes idle (the latency-first contract)."""
    feeder, results = _mk_feeder(batch_size=4, depth=2)
    feeder.start()
    feeder.submit(rng.integers(0, 256, (SPEC.buffer_rows, SPEC.width), dtype=np.uint8))
    t0 = time.monotonic()
    while not results and time.monotonic() - t0 < 5:
        time.sleep(0.01)
    feeder.stop()
    assert 0 in results


def test_feeder_native_staging(rng):
    """The C++ ring staging path: same end-to-end results as Python queue."""
    import cv2

    from opencv_opencl_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    enh = Enhancer(
        EnhancerConfig(op="histeq", chroma=ChromaPolicy.PASSTHROUGH), SPEC
    )
    results = {}
    feeder = FrameFeeder(
        enh.process_batch, batch_size=2, depth=2,
        native_staging=(SPEC.buffer_rows, SPEC.width),
        on_output=lambda seq, frame, meta: results.__setitem__(seq, (frame, meta)),
    )
    assert feeder._native is not None
    frames = rng.integers(0, 256, (6, SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    feeder.start()
    for i, f in enumerate(frames):
        feeder.submit(f, meta=i)
    feeder.stop(drain=True)
    assert sorted(results) == list(range(6))
    for i in range(6):
        out, meta = results[i]
        assert meta == i
        assert np.array_equal(out[:48], cv2.equalizeHist(frames[i, :48]))


def test_feeder_durability_under_drops(rng):
    """Sustained stream with forced overflow drops: output must stay
    strictly ordered and gapless, with exact drop accounting (regression
    for the review finding where each drop stalled output ~16 frames)."""
    import time

    from opencv_opencl_tpu import native

    enh = Enhancer(
        EnhancerConfig(op="histeq", chroma=ChromaPolicy.PASSTHROUGH), SPEC
    )
    seen = []
    feeder = FrameFeeder(
        enh.process_batch, batch_size=4, depth=2, queue_capacity=4,
        native_staging=((SPEC.buffer_rows, SPEC.width)
                        if native.available() else False),
        on_output=lambda s, f, m: seen.append(s),
    )
    feeder.warmup((SPEC.buffer_rows, SPEC.width))
    feeder.start()
    frames = rng.integers(0, 256, (200, SPEC.buffer_rows, SPEC.width),
                          dtype=np.uint8)
    for i, f in enumerate(frames):
        feeder.submit(f, meta=i)
        if i % 3 == 0:
            time.sleep(0.001)
    feeder.stop(drain=True)
    s = feeder.stats
    assert s["emitted"] + s["dropped_overflow"] == 200
    assert seen == sorted(seen)
    assert len(set(seen)) == len(seen)
    assert s["frames_lost"] == 0
    assert s["processing_errors"] == 0


def test_resequencer_property_fuzz(rng):
    """Random completion orders with random late/lost patterns: emissions
    strictly increasing, nothing duplicated."""
    for trial in range(20):
        n = int(rng.integers(5, 60))
        seqs = rng.permutation(n).tolist()
        out = []
        r = Resequencer(lambda s, f: out.append(s),
                        max_pending=int(rng.integers(2, 10)))
        for s in seqs:
            r.push(s, None)
        r.flush()
        assert out == sorted(out)
        assert len(out) == len(set(out))
        assert len(out) + r.dropped_late == n


def test_feeder_submit_after_stop_degrades_to_drop():
    """A frame racing shutdown (the appsink callback can fire after stop)
    must count as a drop, never raise in the caller — for both staging
    paths.  Also: stop(drain=True) must close the native ring (round-1
    advisor finding) so nothing silently queues forever."""
    for staging in (False, (8, 16)):
        f = FrameFeeder(lambda b: b, batch_size=2,
                        native_staging=staging)
        if staging and f._native is None:
            continue  # native lib unavailable
        f.start()
        f.submit(np.zeros((8, 16), np.uint8))
        f.stop(drain=True)
        before = f.stats["dropped_overflow"]
        f.submit(np.zeros((8, 16), np.uint8))  # must not raise
        assert f.stats["dropped_overflow"] == before + 1
        assert f.queue_length() == 0


def test_feeder_staging_reuse_no_alloc_growth():
    """Steady state uses a fixed pool of staging buffers (depth+2) and
    recycles them at retire — no per-batch np.stack allocation."""
    f = FrameFeeder(lambda b: b + 1, batch_size=4, depth=2)
    outs = []
    f.on_output = lambda seq, fr, m: outs.append((seq, fr.copy()))
    f.start()
    for i in range(40):
        f.submit(np.full((8, 16), i % 250, np.uint8))
    f.stop(drain=True)
    # pool never exceeds depth+2 buffers and frames are correct + ordered
    assert len(f._staging_free) <= f.depth + 2
    assert [s for s, _ in outs] == sorted(s for s, _ in outs)
    for seq, fr in outs:
        assert fr.min() == fr.max()  # each frame uniform: no cross-batch mix


def test_feeder_staging_odd_batch_correct():
    f = FrameFeeder(lambda b: b, batch_size=4, depth=1, pad_batches=True)
    got = []
    f.on_output = lambda seq, fr, m: got.append(fr.copy())
    f.start()
    for i in range(3):  # odd: pads with repeats, slices on retire
        f.submit(np.full((8, 16), 10 + i, np.uint8))
    f.stop(drain=True)
    assert len(got) == 3
    for i, fr in enumerate(got):
        assert (fr == 10 + i).all()


class TestPriorityLeakyQueue:
    def test_evicts_lowest_priority_oldest_first(self):
        from opencv_opencl_tpu.runtime.queues import PriorityLeakyQueue

        dropped = []
        q = PriorityLeakyQueue(max_size=3, on_drop=dropped.append,
                               priority_of=lambda it: it[0])
        q.put((1, "a"))   # prio 1
        q.put((0, "b"))   # prio 0 (oldest low)
        q.put((0, "c"))   # prio 0
        q.put((2, "d"))   # overflow: evict oldest prio-0 item -> "b"
        assert dropped == [(0, "b")]
        q.put((2, "e"))   # overflow: evict "c"
        assert dropped[-1] == (0, "c")
        # queue now [(1,a),(2,d),(2,e)]: an incoming prio-0 item ranks
        # below everything -> it is dropped itself
        assert q.put((0, "f")) is False
        assert dropped[-1] == (0, "f")
        assert [q.get(0.1) for _ in range(3)] == [(1, "a"), (2, "d"),
                                                  (2, "e")]
        assert q.dropped == 3

    def test_equal_priorities_degrade_to_drop_oldest(self):
        from opencv_opencl_tpu.runtime.queues import PriorityLeakyQueue

        q = PriorityLeakyQueue(max_size=2, priority_of=lambda it: 0)
        q.put("a"); q.put("b"); q.put("c")
        assert [q.get(0.1), q.get(0.1)] == ["b", "c"]


def test_mux_priorities_shed_best_effort_first():
    """Under overload, the premium stream's frames survive; the
    best-effort stream's are evicted."""
    import threading
    import time as timemod

    import numpy as np

    from opencv_opencl_tpu.runtime.mux import StreamMux

    gate = threading.Event()

    def slow_process(batch):
        gate.wait(5.0)  # hold the queue full until released
        return batch

    out = []
    mux = StreamMux(slow_process, 2,
                    on_output=lambda s, k, f, m: out.append(s),
                    priorities=[0, 5],  # stream 1 is premium
                    batch_size=1, depth=1, queue_capacity=2)
    mux.start()
    try:
        f = np.zeros((6, 8), np.uint8)
        # overfill: queue_capacity=2, alternate streams
        for i in range(8):
            mux.submit(i % 2, f)
            timemod.sleep(0.01)
        gate.set()
        deadline = timemod.monotonic() + 5.0
        while timemod.monotonic() < deadline and len(out) < 3:
            timemod.sleep(0.05)
    finally:
        gate.set()
        mux.stop(drain=True)
    st = mux.stats
    # the premium stream emitted at least as much as best-effort, and
    # best-effort took the eviction losses
    prem = st["per_stream"][1]["emitted"]
    be = st["per_stream"][0]["emitted"]
    assert prem >= be
    assert prem >= 2
    # per-stream drop accounting: best-effort shows the evictions
    assert st["per_stream"][0]["dropped"] >= st["per_stream"][1]["dropped"]
    assert st["per_stream"][0]["dropped"] >= 1


def test_native_ring_priority_eviction():
    """fp_ring_push_prio: overflow evicts the oldest lowest-priority
    frame (attributed by seq); an incoming frame ranking below the whole
    queue is rejected itself; uniform priorities degrade to drop-oldest."""
    import numpy as np

    from opencv_opencl_tpu import native

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native toolchain unavailable")
    ring = native.NativeRing(2, 8)
    f = np.arange(8, dtype=np.uint8)
    assert ring.push_prio(f, 10, 0) == ("ok", None)
    assert ring.push_prio(f, 11, 5) == ("ok", None)
    # full: premium push evicts the oldest LOW-priority frame (seq 10),
    # not the oldest overall once priorities differ
    assert ring.push_prio(f, 12, 5) == ("evicted", 10)
    # full with only premium queued: a best-effort frame is rejected
    assert ring.push_prio(f, 13, 0) == ("rejected", None)
    assert ring.dropped == 2
    # the queued survivors are the premium frames, in order
    out = np.zeros((2, 8), np.uint8)
    n, seqs = ring.pop_batch(out, 2)
    assert n == 2 and list(seqs) == [11, 12]
    # uniform priorities = plain drop-oldest with attribution
    assert ring.push_prio(f, 20, 0) == ("ok", None)
    assert ring.push_prio(f, 21, 0) == ("ok", None)
    assert ring.push_prio(f, 22, 0) == ("evicted", 20)
    ring.close()


def test_mux_priorities_with_native_staging():
    """--priorities composes with the GIL-free native ring: premium
    survives and per-stream drop accounting stays truthful (the ring
    reports WHICH seq it evicted)."""
    import threading
    import time as timemod

    import numpy as np

    from opencv_opencl_tpu import native
    from opencv_opencl_tpu.runtime.mux import StreamMux

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native toolchain unavailable")

    gate = threading.Event()

    def slow_process(batch):
        gate.wait(5.0)
        return batch

    out = []
    mux = StreamMux(slow_process, 2,
                    on_output=lambda s, k, f, m: out.append(s),
                    priorities=[0, 5],  # stream 1 is premium
                    batch_size=1, depth=1, queue_capacity=2,
                    native_staging=(6, 8))
    assert mux.feeder._native is not None  # really on the C++ ring
    mux.start()
    try:
        f = np.zeros((6, 8), np.uint8)
        for i in range(8):
            mux.submit(i % 2, f)
            timemod.sleep(0.01)
        gate.set()
        deadline = timemod.monotonic() + 5.0
        while timemod.monotonic() < deadline and len(out) < 3:
            timemod.sleep(0.05)
    finally:
        gate.set()
        mux.stop(drain=True)
    st = mux.stats
    prem = st["per_stream"][1]["emitted"]
    be = st["per_stream"][0]["emitted"]
    assert prem >= be
    assert prem >= 2
    # truthful per-stream attribution: best-effort shows the evictions
    assert st["per_stream"][0]["dropped"] >= st["per_stream"][1]["dropped"]
    assert st["per_stream"][0]["dropped"] >= 1
    # conservation per stream: submitted == emitted + dropped (+ any
    # frames flushed at drain time, which appear in neither)
    for s in (0, 1):
        ps = st["per_stream"][s]
        assert ps["emitted"] + ps["dropped"] <= ps["submitted"]


def test_priority_queue_concurrent_stress():
    """Threaded put/get storm on PriorityLeakyQueue: items are conserved
    (got + dropped == put), no exceptions, premium survives more often."""
    import threading

    from opencv_opencl_tpu.runtime.queues import Closed, PriorityLeakyQueue

    dropped = []
    q = PriorityLeakyQueue(max_size=8, on_drop=dropped.append,
                           priority_of=lambda it: it[0])
    got = []
    def consumer():
        # Exit ONLY on Closed (raised after drain): no timeout race under
        # full-suite load.  close() comes after all producers join, so the
        # consumer deterministically sees every surviving item.
        while True:
            try:
                got.append(q.get())
            except Closed:
                return
    ct = threading.Thread(target=consumer)
    ct.start()
    N = 2000
    def producer(prio, seed):
        for i in range(N):
            q.put((prio, seed, i))
    ps = [threading.Thread(target=producer, args=(p, s))
          for s, p in enumerate([0, 0, 5, 5])]
    [t.start() for t in ps]
    [t.join() for t in ps]
    q.close()
    ct.join()
    assert not ct.is_alive()
    total_put = 4 * N
    assert len(got) + len(dropped) == total_put
    # NOTE: "premium dropped <= best-effort dropped" is NOT an invariant
    # under concurrency — when the consumer has drained every best-effort
    # item, a full queue legitimately holds only premium frames and
    # premium evicts premium.  The eviction POLICY is asserted by the
    # deterministic single-threaded tests above; this stress test pins
    # conservation and absence of duplication/corruption under contention.
    from collections import Counter

    c = Counter((it[0], it[1]) for it in got + dropped)
    assert all(v == N for v in c.values())  # per-producer conservation
    assert q.dropped == len(dropped)        # drop counter consistent
