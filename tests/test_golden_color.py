"""Golden color conversions vs cv2.cvtColor — must be bit-exact."""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import color, frames


@pytest.fixture
def bgr(rng):
    return rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)


def test_bgr2yuv(bgr):
    assert np.array_equal(color.bgr2yuv(bgr), cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV))


def test_yuv2bgr(rng):
    yuv = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    assert np.array_equal(color.yuv2bgr(yuv), cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR))


def test_roundtrip_bgr_yuv_matches_cv2(bgr):
    # full-range YUV roundtrip is lossy (gamut clipping); the contract is
    # agreeing with OpenCV's own roundtrip bit-for-bit
    rt = color.yuv2bgr(color.bgr2yuv(bgr))
    rt_cv = cv2.cvtColor(cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV), cv2.COLOR_YUV2BGR)
    assert np.array_equal(rt, rt_cv)


def test_bgr2yuv_i420(bgr):
    assert np.array_equal(
        color.bgr2yuv_i420(bgr), cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    )


def test_nv12_to_bgr(rng):
    nv12 = rng.integers(0, 256, (96, 64), dtype=np.uint8)  # 64x64 frame
    assert np.array_equal(
        color.nv12_to_bgr(nv12), cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12)
    )


def test_bgr2nv12_matches_i420_repack(bgr):
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    assert np.array_equal(color.bgr2nv12(bgr), color.i420_to_nv12(i420))


def test_nv12_i420_roundtrip(rng):
    nv12 = rng.integers(0, 256, (96, 64), dtype=np.uint8)
    assert np.array_equal(color.i420_to_nv12(color.nv12_to_i420(nv12)), nv12)


def test_i420_decode_agrees_with_cv2(rng):
    i420 = rng.integers(0, 256, (96, 64), dtype=np.uint8)
    nv12 = color.i420_to_nv12(i420)
    assert np.array_equal(
        color.nv12_to_bgr(nv12), cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)
    )


def test_frame_spec_and_views(rng):
    spec = frames.FrameSpec(width=64, height=48, fps=30)
    assert spec.buffer_size == 64 * 48 * 3 // 2
    buf = rng.integers(0, 256, (spec.buffer_rows, spec.width), dtype=np.uint8)
    y, uv = frames.split_nv12(buf)
    assert y.shape == (48, 64) and uv.shape == (24, 64)
    assert y.base is buf and uv.base is buf  # zero-copy views
    assert np.array_equal(frames.join_nv12(y, uv), buf)
    # batched
    batch = rng.integers(0, 256, (4, spec.buffer_rows, spec.width), dtype=np.uint8)
    yb, uvb = frames.split_nv12(batch)
    assert yb.shape == (4, 48, 64) and uvb.shape == (4, 24, 64)


def test_gray_uv():
    spec = frames.FrameSpec(width=8, height=4)
    assert (frames.gray_uv(spec) == 128).all()
    assert frames.gray_uv(spec, batch=3).shape == (3, 2, 8)
