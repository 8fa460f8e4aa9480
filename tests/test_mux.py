"""StreamMux: N independent streams served by one feeder/chip.

Per-stream ordering, correct routing, shared-batch dispatch, and leaky
backpressure — the serving extension of the single-stream relay (see
runtime/mux.py docstring for why the reference cannot do this at all).
"""

import numpy as np

from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
from opencv_opencl_tpu.models import Enhancer, EnhancerConfig
from opencv_opencl_tpu.runtime.mux import StreamMux

SPEC = FrameSpec(width=64, height=48, fps=30)


def _mk_mux(n_streams, batch_size=4, **kw):
    enh = Enhancer(
        EnhancerConfig(op="histeq", chroma=ChromaPolicy.PASSTHROUGH), SPEC
    )
    got = {s: [] for s in range(n_streams)}

    def on_out(stream, sseq, frame, meta):
        got[stream].append((sseq, frame, meta))

    kw.setdefault("queue_capacity", 64)  # deterministic tests: no drops
    mux = StreamMux(enh.process_batch, n_streams, on_output=on_out,
                    batch_size=batch_size, **kw)
    return mux, got


def test_routing_and_per_stream_order(rng):
    import cv2

    n, per = 3, 5
    mux, got = _mk_mux(n)
    frames = rng.integers(
        0, 256, (n, per, SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    mux.start()
    # interleave submissions round-robin: frames of different streams share
    # device batches
    for k in range(per):
        for s in range(n):
            assert mux.submit(s, frames[s, k], meta={"k": k}) == k
    mux.stop(drain=True)
    for s in range(n):
        assert [k for k, _, _ in got[s]] == list(range(per))  # in order
        for k, out, meta in got[s]:
            assert meta == {"k": k}
            assert np.array_equal(out[:48],
                                  cv2.equalizeHist(frames[s, k, :48]))
            assert np.array_equal(out[48:], frames[s, k, 48:])
    stats = mux.stats
    assert stats["emitted"] == n * per
    assert all(p["submitted"] == per and p["emitted"] == per
               for p in stats["per_stream"])


def test_unbalanced_streams(rng):
    mux, got = _mk_mux(2, batch_size=3)
    f = rng.integers(0, 256, (SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    mux.start()
    for k in range(7):
        mux.submit(0, f)
        if k % 3 == 0:
            mux.submit(1, f)
    mux.stop(drain=True)
    assert len(got[0]) == 7
    assert len(got[1]) == 3
    assert [k for k, _, _ in got[1]] == [0, 1, 2]


def test_overload_stays_per_stream_ordered(rng):
    """Leaky overload drops frames but never reorders a stream."""
    mux, got = _mk_mux(2, batch_size=1, depth=1, queue_capacity=2)
    f = rng.integers(0, 256, (SPEC.buffer_rows, SPEC.width), dtype=np.uint8)
    mux.start()
    for k in range(40):
        mux.submit(k % 2, f)
    mux.stop(drain=True)
    for s in (0, 1):
        seqs = [k for k, _, _ in got[s]]
        assert seqs == sorted(seqs)          # strictly in order
        assert len(seqs) >= 1
    total = len(got[0]) + len(got[1])
    assert total <= 40


def test_bad_stream_id():
    import pytest

    mux, _ = _mk_mux(2)
    f = np.zeros((SPEC.buffer_rows, SPEC.width), np.uint8)
    with pytest.raises(ValueError):
        mux.submit(2, f)
    with pytest.raises(ValueError):
        StreamMux(lambda x: x, 0)


def test_multi_relay_app(capsys):
    from opencv_opencl_tpu.apps import multi_relay

    rc = multi_relay.run([
        "--streams=2", "--width=96", "--height=64", "--op=histeq",
        "--batch=2", "--max-frames=6", "--fps=200",
        "--status-interval=0.05",
    ])
    text = capsys.readouterr().out
    assert rc == 0
    assert "Serving 2 streams" in text
    assert "Shutdown:" in text
    assert "per-stream: #0=" in text
