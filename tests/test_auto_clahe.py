"""Adaptive-clip CLAHE extension: estimator behavior + cv2 cross-check."""

import cv2
import numpy as np

from opencv_opencl_tpu.ops.auto_clahe import clahe_auto, estimate_clip_limit
from tests.conftest import assert_clahe_close


def test_estimator_bounds(rng):
    flat = np.full((64, 64), 100, np.uint8)
    rich = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    c_flat = float(estimate_clip_limit(flat))
    c_rich = float(estimate_clip_limit(rich))
    assert 1.0 <= c_flat < c_rich <= 4.0
    assert c_flat == 1.0  # zero entropy -> clip_min
    assert c_rich > 3.5   # near-uniform histogram -> near clip_max


def test_auto_clahe_matches_fixed_clip(rng):
    """With the clip the estimator picked, output must equal cv2 at that
    same clip (the adaptive path reuses the exact OpenCV semantics)."""
    y = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    out, clip = clahe_auto(y, (8, 8))
    # reproduce with cv2 at the chosen float clip
    ref = cv2.createCLAHE(clipLimit=float(clip), tileGridSize=(8, 8)).apply(y)
    assert_clahe_close(np.asarray(out), ref)


def test_auto_clahe_batch(rng):
    batch = rng.integers(0, 256, (3, 64, 64), dtype=np.uint8)
    out, clips = clahe_auto(batch, (4, 4))
    assert out.shape == batch.shape
    assert clips.shape == (3,)


def test_clip_varies_with_content(rng):
    lowc = np.clip(rng.normal(128, 4, (64, 64)), 0, 255).astype(np.uint8)
    highc = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    _, c1 = clahe_auto(lowc, (4, 4))
    _, c2 = clahe_auto(highc, (4, 4))
    assert float(c1) < float(c2)
