"""Native (C++) CAVLC encoder parity: fp_cavlc_encode must produce the
EXACT bytes of the Python oracle (io.h264_cavlc.encode_frame_cavlc),
which is itself decoder-conformance-proven through libavcodec
(tests/test_cavlc.py).  Any divergence is a native-port bug by
definition."""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu import native
from opencv_opencl_tpu.io.h264_cavlc import (
    CavlcH264Encoder, encode_frame_cavlc)

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_cavlc()),
    reason=f"native runtime unavailable: {native.build_error()}")


def smooth_nv12(w, h, seed=0, noise=12.0):
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 80, h)[:, None]
    y = np.clip(gx + gy + rng.normal(0, noise, (h, w)), 0, 255)
    uv = np.clip(128 + rng.normal(0, noise, (h // 2, w)), 0, 255)
    return np.concatenate([y, uv], axis=0).astype(np.uint8)


def rand_nv12(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h * 3 // 2, w), np.uint8)


def diff_both(f, w, h, qp, idr=0):
    py = encode_frame_cavlc(f, w, h, qp, idr)
    cc = native.cavlc_encode_frame(f, w, h, qp, idr)
    assert cc == py, (
        f"{w}x{h} qp={qp}: native {len(cc)}B != oracle {len(py)}B, "
        f"first diff at {next((i for i, (a, b) in enumerate(zip(cc, py)) if a != b), 'len')}")


@pytest.mark.parametrize("qp", [0, 4, 10, 18, 26, 30, 35, 42, 51])
def test_parity_across_qp(qp):
    diff_both(smooth_nv12(64, 48, seed=qp), 64, 48, qp)


@pytest.mark.parametrize("geom", [(16, 16), (32, 16), (48, 32), (96, 64),
                                  (128, 128), (176, 144)])
def test_parity_across_geometry(geom):
    w, h = geom
    diff_both(smooth_nv12(w, h, seed=w + h), w, h, 28)


@pytest.mark.parametrize("seed", range(6))
def test_parity_random_noise(seed):
    """Dense coefficients, nC>=8 FLC contexts, suffix adaptation."""
    diff_both(rand_nv12(48, 32, seed), 48, 32, qp=4 + seed)


def test_parity_pathological_content():
    w, h = 32, 32
    # checkerboard: level-escape branches
    y = np.zeros((h, w), np.uint8)
    y[::2, ::2] = 255
    y[1::2, 1::2] = 255
    f = np.concatenate([y, np.full((h // 2, w), 128, np.uint8)])
    for qp in (0, 20, 51):
        diff_both(f, w, h, qp)
    # black frame at QP 0: the level-clamp path
    f0 = np.zeros((h * 3 // 2, w), np.uint8)
    f0[h:] = 128
    diff_both(f0, w, h, 0)
    # flat frame: all-CBP-0 chain
    diff_both(np.full((h * 3 // 2, w), 128, np.uint8), w, h, 30)
    # saturated extremes
    diff_both(np.full((h * 3 // 2, w), 255, np.uint8), w, h, 12)


def test_parity_idr_pic_id():
    f = smooth_nv12(32, 32, seed=1)
    diff_both(f, 32, 32, 28, idr=0)
    diff_both(f, 32, 32, 28, idr=1)


def test_workspace_reuse_and_independence():
    """Arena reuse across frames/geometries must not leak state."""
    ws: dict = {}
    for seed, (w, h) in [(0, (64, 48)), (1, (64, 48)), (2, (32, 32)),
                         (3, (96, 64))]:
        f = smooth_nv12(w, h, seed=seed)
        got = native.cavlc_encode_frame(f, w, h, 26, seed & 1,
                                        workspace=ws)
        assert got == encode_frame_cavlc(f, w, h, 26, seed & 1)


def test_encoder_class_native_matches_python():
    """CavlcH264Encoder(native='require') == native='never' AUs,
    including the padded/cropped geometry path."""
    for w, h in ((64, 48), (36, 28)):
        en = CavlcH264Encoder(w, h, qp=24, native="require")
        ep = CavlcH264Encoder(w, h, qp=24, native="never")
        for seed in range(3):
            f = rand_nv12(w, h, seed)
            assert en.encode(f) == ep.encode(f)


@pytest.mark.parametrize("slices,threads", [(2, 0), (3, 0), (4, 4),
                                            (6, 3)])
def test_multi_slice_parity(slices, threads):
    """Native slices (sequential AND threaded) == oracle slices."""
    from opencv_opencl_tpu.io.h264_cavlc import encode_frame_cavlc_slices

    w, h = 64, 96
    f = smooth_nv12(w, h, seed=slices * 10 + threads)
    py = encode_frame_cavlc_slices(f, w, h, qp=22, idr_pic_id=1,
                                   slices=slices)
    cc = native.cavlc_encode_slices(f, w, h, 22, 1, slices=slices,
                                    threads=threads)
    assert [bytes(n) for n in py] == cc


def test_multi_slice_threaded_equals_sequential():
    w, h = 64, 96
    f = rand_nv12(w, h, seed=5)
    seq = native.cavlc_encode_slices(f, w, h, 8, 0, slices=6, threads=1)
    par = native.cavlc_encode_slices(f, w, h, 8, 0, slices=6, threads=6)
    assert seq == par


def test_encoder_class_slices_native_matches_python():
    for slices in (2, 4):
        en = CavlcH264Encoder(64, 96, qp=24, slices=slices,
                              native="require")
        ep = CavlcH264Encoder(64, 96, qp=24, slices=slices,
                              native="never")
        f = smooth_nv12(64, 96, seed=slices)
        assert en.encode(f) == ep.encode(f)


def test_fuzz_parity_quick():
    rng = np.random.default_rng(99)
    for _ in range(10):
        w = int(rng.integers(1, 6)) * 16
        h = int(rng.integers(1, 5)) * 16
        qp = int(rng.integers(0, 52))
        kind = rng.integers(0, 3)
        if kind == 0:
            f = rand_nv12(w, h, int(rng.integers(0, 1000)))
        elif kind == 1:
            f = smooth_nv12(w, h, int(rng.integers(0, 1000)),
                            noise=float(rng.uniform(0, 40)))
        else:
            f = np.full((h * 3 // 2, w),
                        int(rng.integers(0, 256)), np.uint8)
        diff_both(f, w, h, qp)
