"""Jitted color ops vs cv2 / numpy golden — bit-exact."""

import cv2
import jax
import numpy as np
import pytest

from opencv_opencl_tpu.core import color as gold
from opencv_opencl_tpu.ops import color as jcolor


@pytest.fixture
def bgr(rng):
    return rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)


def test_bgr2yuv(bgr):
    out = np.asarray(jax.jit(jcolor.bgr2yuv)(bgr))
    assert np.array_equal(out, cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV))


def test_yuv2bgr(rng):
    yuv = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = np.asarray(jax.jit(jcolor.yuv2bgr)(yuv))
    assert np.array_equal(out, cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR))


def test_bgr2nv12(bgr):
    out = np.asarray(jax.jit(jcolor.bgr2nv12)(bgr))
    assert np.array_equal(out, gold.bgr2nv12(bgr))


def test_nv12_to_bgr(rng):
    nv12 = rng.integers(0, 256, (72, 64), dtype=np.uint8)
    out = np.asarray(jax.jit(jcolor.nv12_to_bgr)(nv12))
    assert np.array_equal(out, cv2.cvtColor(nv12, cv2.COLOR_YUV2BGR_NV12))


def test_batched_color(rng):
    batch = rng.integers(0, 256, (3, 48, 64, 3), dtype=np.uint8)
    out = np.asarray(jax.jit(jcolor.bgr2yuv)(batch))
    for i in range(3):
        assert np.array_equal(out[i], cv2.cvtColor(batch[i], cv2.COLOR_BGR2YUV))


def test_nv12_gray_chroma(rng):
    nv12 = rng.integers(0, 256, (2, 72, 64), dtype=np.uint8)
    out = np.asarray(jcolor.nv12_gray_chroma(nv12))
    assert np.array_equal(out[:, :48], nv12[:, :48])
    assert (out[:, 48:] == 128).all()


def test_nv12_set_y(rng):
    nv12 = rng.integers(0, 256, (72, 64), dtype=np.uint8)
    y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    out = np.asarray(jcolor.nv12_set_y(nv12, y))
    assert np.array_equal(out[:48], y)
    assert np.array_equal(out[48:], nv12[48:])
