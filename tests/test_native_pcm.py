"""Native (C++) H.264 I_PCM encoder vs the pure-Python oracle.

The native path (``native.pcm_encode_slices`` via
``encode_frame_pcm_slices_native``) must be BYTE-IDENTICAL to the
Python encoder — which is itself verified bit-exact through libavcodec
in test_encoder.py — across geometries (16-aligned, edge-replicated,
tiny), slice counts, and escape-pathological content (all-zero frames
maximize §7.4.1.1 emulation-prevention insertions).
"""

import numpy as np
import pytest

from opencv_opencl_tpu import native
from opencv_opencl_tpu.io.h264_pcm import (
    PcmH264Encoder,
    encode_frame_pcm_slices,
    encode_frame_pcm_slices_native,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native runtime: {native.build_error()}")


def _nv12(width, height, rng=None, fill=None):
    rows = height * 3 // 2
    if fill is not None:
        return np.full((rows, width), fill, np.uint8)
    return rng.integers(0, 256, (rows, width), dtype=np.uint8)


GEOMETRIES = [
    (64, 48),      # 16-aligned
    (48, 32),
    (34, 18),      # both axes edge-replicated
    (1918, 1078),  # near-1080p, pad 2 cols / 10 rows
    (256, 16),     # single MB row
]


@pytest.mark.parametrize("width,height", GEOMETRIES)
@pytest.mark.parametrize("slices", [1, 2, 3])
def test_native_matches_python_random(width, height, slices):
    rng = np.random.default_rng(width * 1000 + height + slices)
    frame = _nv12(width, height, rng)
    for idr in (0, 1):
        py = encode_frame_pcm_slices(frame, width, height, idr,
                                     slices=slices)
        nat = encode_frame_pcm_slices_native(frame, width, height, idr,
                                             slices=slices)
        assert [n == p for n, p in zip(nat, py)] == [True] * len(py)
        assert len(nat) == len(py)


@pytest.mark.parametrize("fill", [0, 1, 3, 128, 255])
def test_native_matches_python_constant_frames(fill):
    # fill=0 is the escape-pathological case: every MB body is a giant
    # zero run, maximizing emulation-prevention insertions; 1 and 3 sit
    # on the <=3 trigger boundary after the runs the 0x00 prefix bytes
    # create.
    w, h = 160, 96
    frame = _nv12(w, h, fill=fill)
    py = encode_frame_pcm_slices(frame, w, h, 0, slices=2)
    nat = encode_frame_pcm_slices_native(frame, w, h, 0, slices=2)
    assert nat == py


def test_native_matches_python_zero_tail_rows():
    # zero runs straddling MB prefix bytes and the band boundary
    w, h = 64, 64
    rng = np.random.default_rng(7)
    frame = _nv12(w, h, rng)
    frame[40:] = 0
    py = encode_frame_pcm_slices(frame, w, h, 1, slices=2)
    nat = encode_frame_pcm_slices_native(frame, w, h, 1, slices=2)
    assert nat == py


def test_native_threads_match_sequential():
    w, h = 256, 128
    rng = np.random.default_rng(3)
    frame = _nv12(w, h, rng)
    seq = encode_frame_pcm_slices_native(frame, w, h, 0, slices=4,
                                         threads=0)
    par = encode_frame_pcm_slices_native(frame, w, h, 0, slices=4,
                                         threads=4)
    assert par == seq


def test_encoder_class_uses_native_and_matches_oracle():
    w, h = 96, 64
    rng = np.random.default_rng(11)
    frames = [_nv12(w, h, rng) for _ in range(3)]
    enc_nat = PcmH264Encoder(w, h, slices=2, native="require")
    enc_py = PcmH264Encoder(w, h, slices=2, native="never")
    assert enc_nat._native and not enc_py._native
    for f in frames:
        assert enc_nat.encode(f) == enc_py.encode(f)


def test_native_never_falls_back():
    enc = PcmH264Encoder(32, 32, native="never")
    out = enc.encode(np.zeros((48, 32), np.uint8))
    assert len(out) == 1 and out[0].startswith(b"\x00\x00\x00\x01")


def test_fuzz_native_vs_python_small():
    rng = np.random.default_rng(42)
    for _ in range(20):
        w = int(rng.integers(1, 6)) * 2 + 14   # even, 16..24
        h = int(rng.integers(1, 6)) * 2 + 14
        # biased toward zeros to stress the escape state machine
        rows = h * 3 // 2
        frame = rng.integers(0, 6, (rows, w)).astype(np.uint8)
        frame[frame >= 4] = 0
        slices = int(rng.integers(1, 4))
        py = encode_frame_pcm_slices(frame, w, h, 0, slices=slices)
        nat = encode_frame_pcm_slices_native(frame, w, h, 0,
                                             slices=slices)
        assert nat == py
