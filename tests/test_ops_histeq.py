"""JAX equalizeHist ops vs cv2 and the golden oracle.

Bar: the reference accuracy harness allows absdiff <= 1
(1frameMeasure.cpp:94-99); the jitted ops use OpenCV's own f32 precision so
they are expected to be exact — asserted as max diff 0, with the <=1 bar as
the hard contract.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import golden
from opencv_opencl_tpu.ops import histeq, histogram


@pytest.mark.parametrize("method", ["onehot", "scatter"])
@pytest.mark.parametrize("shape", [(8, 8), (64, 64), (135, 241), (480, 640)])
def test_hist256(rng, method, shape):
    y = rng.integers(0, 256, shape, dtype=np.uint8)
    h = np.asarray(histogram.hist256(y, method))
    assert np.array_equal(h, golden.hist256(y))


@pytest.mark.parametrize("method", ["onehot", "scatter"])
def test_equalize_hist_exact(rng, method):
    for shape in [(16, 16), (64, 64), (135, 241), (480, 640)]:
        y = rng.integers(0, 256, shape, dtype=np.uint8)
        out = np.asarray(histeq.equalize_hist(y, method=method))
        assert np.array_equal(out, cv2.equalizeHist(y)), shape


def test_equalize_hist_constant():
    y = np.full((32, 32), 9, dtype=np.uint8)
    assert np.array_equal(np.asarray(histeq.equalize_hist(y)), y)


def test_equalize_hist_sparse(rng):
    y = (rng.integers(0, 3, (64, 64)) * 100 + 30).astype(np.uint8)
    assert np.array_equal(np.asarray(histeq.equalize_hist(y)), cv2.equalizeHist(y))


def test_equalize_hist_1080p(hun_y):
    out = np.asarray(histeq.equalize_hist(hun_y))
    ref = cv2.equalizeHist(hun_y)
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1  # the hard reference bar
    assert d.max() == 0  # and we actually hit exactness


def test_equalize_hist_ref_two_input(rng):
    y = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    out = np.asarray(histeq.equalize_hist_ref(y, ref))
    assert np.array_equal(out, golden.equalize_hist(y, ref))


def test_equalize_hist_batch(rng):
    batch = rng.integers(0, 256, (4, 48, 64), dtype=np.uint8)
    out = np.asarray(histeq.equalize_hist_batch(batch))
    for i in range(4):
        assert np.array_equal(out[i], cv2.equalizeHist(batch[i]))


def test_equalize_lut_matches_golden(rng):
    y = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    h = golden.hist256(y)
    ours = np.asarray(histogram.equalize_lut(h.astype(np.int32), total=y.size))
    assert np.abs(ours.astype(int) - golden.equalize_lut(h).astype(int)).max() <= 1
