"""Golden CLAHE oracle vs cv2.createCLAHE().apply — must be bit-exact.

Covers the reference parameter points: (2.0, 8x8) video default
(CLAHECompare.cpp:296-297), (3.0, 4x4) single-frame tool default
(clahe1frame.cpp:55-56), OpenCV's own default (40, 8x8), clipLimit=0
(no clipping), non-divisible image sizes (BORDER_REFLECT_101 padding path),
and large grids.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import golden


def _check(y, clip, grid):
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=grid).apply(y)
    mine = golden.clahe(y, clip_limit=clip, tile_grid=grid)
    assert np.array_equal(mine, ref), (
        f"max diff {np.abs(mine.astype(int) - ref.astype(int)).max()}"
    )


@pytest.mark.parametrize(
    "shape,clip,grid",
    [
        ((128, 128), 40.0, (8, 8)),
        ((128, 128), 2.0, (8, 8)),
        ((135, 241), 2.0, (8, 8)),      # non-divisible -> reflect-101 padding
        ((100, 100), 3.0, (4, 4)),
        ((64, 64), 0.0, (8, 8)),        # clipLimit=0: no clipping at all
        ((720, 1280), 2.0, (8, 8)),     # file-relay default geometry
        ((480, 640), 1.5, (16, 16)),
        ((57, 31), 2.0, (8, 8)),        # tiles smaller than 8x8 pixels
        ((240, 320), 100.0, (2, 2)),
    ],
)
def test_clahe_random(rng, shape, clip, grid):
    y = rng.integers(0, 256, shape, dtype=np.uint8)
    _check(y, clip, grid)


def test_clahe_constant():
    y = np.full((64, 64), 128, dtype=np.uint8)
    _check(y, 2.0, (8, 8))


def test_clahe_structured(rng):
    # smooth gradient + noise: realistic histograms with heavy clipping
    base = np.linspace(0, 255, 256, dtype=np.float32)[None, :]
    y = np.clip(base + rng.normal(0, 10, (144, 256)), 0, 255).astype(np.uint8)
    _check(y, 2.0, (8, 8))
    _check(y, 4.0, (3, 5))  # asymmetric grid


def test_clahe_hun_1080p(hun_y):
    """The north-star parity config: 1080p frame, both reference parameter
    sets (BASELINE.md configs 1-2)."""
    _check(hun_y, 2.0, (8, 8))
    _check(hun_y, 3.0, (4, 4))


def test_clahe_luts_shape(rng):
    y = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    luts, th, tw = golden.clahe_luts(y, 2.0, (8, 4))  # tilesX=8, tilesY=4
    assert luts.shape == (4, 8, 256)
    assert th == 16 and tw == 12


def test_reflect101_border():
    src = np.arange(20, dtype=np.uint8).reshape(4, 5)
    ours = golden.copy_make_border_reflect101(src, 2, 3)
    ref = cv2.copyMakeBorder(src, 0, 2, 0, 3, cv2.BORDER_REFLECT_101)
    assert np.array_equal(ours, ref)


def test_clahe_image_smaller_than_grid(rng):
    """Degenerate: image smaller than the tile grid — multi-reflection
    border (cv::borderInterpolate wrapping)."""
    for shape in [(3, 5), (2, 2), (7, 60)]:
        y = rng.integers(0, 256, shape, dtype=np.uint8)
        _check(y, 2.0, (8, 8))


def test_reflect101_multiwrap(rng):
    src = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    ours = golden.copy_make_border_reflect101(src, 10, 9)
    ref = cv2.copyMakeBorder(src, 0, 10, 0, 9, cv2.BORDER_REFLECT_101)
    assert np.array_equal(ours, ref)


def test_clahe_4k_both_reference_configs(rng):
    """SURVEY §7 acceptance: bit-compare at (2.0, 8x8) and (3.0, 4x4) on 4K
    (1080p covered by test_clahe_hun_1080p)."""
    y = rng.integers(0, 256, (2160, 3840), dtype=np.uint8)
    _check(y, 2.0, (8, 8))
    _check(y, 3.0, (4, 4))


def test_clahe_fuzz_seeded():
    """Seeded mini-fuzz across shapes/grids/clips — catches semantic
    divergences broad parametrization misses (this found the unwrapped-
    padding rule: a divisible dim still gets a full extra tile when the
    other dim needs padding)."""
    r = np.random.default_rng(99)
    for _ in range(40):
        h = int(r.integers(2, 200))
        w = int(r.integers(2, 200))
        tx = int(r.integers(1, 17))
        ty = int(r.integers(1, 17))
        clip = float(r.choice([0.0, 0.5, 2.0, 40.0, 300.0]))
        y = r.integers(0, 256, (h, w), dtype=np.uint8)
        _check(y, clip, (tx, ty))


def test_clahe_mixed_divisibility(rng):
    """One dim divisible, the other not: OpenCV pads the divisible dim by a
    FULL extra tile (no modulo wrap), changing the tile size globally."""
    y = rng.integers(0, 256, (99, 28), dtype=np.uint8)
    _check(y, 2.0, (8, 11))  # 99 % 11 == 0 but 28 % 8 != 0
    y2 = rng.integers(0, 256, (100, 32), dtype=np.uint8)
    _check(y2, 2.0, (8, 11))  # 32 % 8 == 0 but 100 % 11 != 0


@pytest.mark.slow
def test_clahe_fuzz_extended():
    """1000-case seeded fuzz (the checked-in reproducible version of the
    round-1 exploratory run) — run explicitly with `-m slow`."""
    r = np.random.default_rng(1234)
    for _ in range(1000):
        h = int(r.integers(2, 300))
        w = int(r.integers(2, 300))
        tx = int(r.integers(1, 17))
        ty = int(r.integers(1, 17))
        clip = float(r.choice([0.0, 0.3, 1.0, 2.0, 2.5, 40.0, 300.0]))
        y = r.integers(0, 256, (h, w), dtype=np.uint8)
        _check(y, clip, (tx, ty))
