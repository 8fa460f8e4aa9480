"""Golden equalizeHist oracle vs cv2.equalizeHist — must be bit-exact.

Reproduces the reference accuracy harness (1frameMeasure.cpp:90-100): the
bar there is absdiff <= 1 with 0%% exceedance; the numpy golden model is held
to absdiff == 0.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import golden


@pytest.mark.parametrize(
    "shape", [(8, 8), (64, 64), (135, 241), (480, 640), (1079, 1919)]
)
def test_equalize_hist_random(rng, shape):
    y = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(golden.equalize_hist(y), cv2.equalizeHist(y))


def test_equalize_hist_constant():
    y = np.full((32, 32), 7, dtype=np.uint8)
    assert np.array_equal(golden.equalize_hist(y), cv2.equalizeHist(y))
    assert golden.equalize_hist(y)[0, 0] == 7  # identity on constant images


def test_equalize_hist_extremes(rng):
    # all-black, all-white, two-level
    for y in [
        np.zeros((16, 16), np.uint8),
        np.full((16, 16), 255, np.uint8),
        np.where(rng.random((64, 64)) < 0.5, 10, 200).astype(np.uint8),
    ]:
        assert np.array_equal(golden.equalize_hist(y), cv2.equalizeHist(y))


def test_equalize_hist_sparse_histogram(rng):
    # only a few occupied bins, first non-zero bin well above 0
    y = (rng.integers(0, 4, (128, 128)) * 60 + 40).astype(np.uint8)
    assert np.array_equal(golden.equalize_hist(y), cv2.equalizeHist(y))


def test_equalize_hist_hun(hun_y):
    assert np.array_equal(golden.equalize_hist(hun_y), cv2.equalizeHist(hun_y))


def test_two_input_reference_frame(rng):
    """accel.cpp:36-40 signature: histogram from ref, mapping applied to y."""
    y = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    lut = golden.equalize_lut(golden.hist256(ref))
    assert np.array_equal(golden.equalize_hist(y, ref), lut[y])
    # same-frame ref degenerates to plain equalizeHist
    assert np.array_equal(golden.equalize_hist(y, y), cv2.equalizeHist(y))
