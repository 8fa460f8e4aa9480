"""Pallas LUT kernels (interpret mode on CPU) vs golden/cv2.

On TPU these compile to MXU one-hot matmuls; in CI they run through the
Pallas interpreter, which validates indexing/masking/blend logic exactly.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import golden
from opencv_opencl_tpu.ops.pallas import lut_kernels
from tests.conftest import assert_clahe_close


class TestApplyLut:
    def test_matches_gather(self, rng):
        y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        lut = rng.integers(0, 256, 256, dtype=np.uint8)
        out = np.asarray(lut_kernels.apply_lut_pallas(y, lut))
        assert np.array_equal(out, lut[y])

    def test_uneven_blocks(self, rng):
        # sizes that don't divide the block shape: masked partial blocks
        y = rng.integers(0, 256, (37, 190), dtype=np.uint8)
        lut = np.arange(256, dtype=np.uint8)[::-1].copy()
        out = np.asarray(lut_kernels.apply_lut_pallas(y, lut))
        assert np.array_equal(out, lut[y])

    def test_equalize_end_to_end(self, rng):
        from opencv_opencl_tpu.ops import histeq

        y = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        out = np.asarray(histeq.equalize_hist(y))
        assert np.array_equal(out, cv2.equalizeHist(y))


class TestInterpSpec:
    def test_divisible_geometry(self):
        spec = lut_kernels.make_interp_spec(128, 256, 2.0, (8, 8))
        assert spec is not None
        assert spec.tile_h == 16 and spec.tile_w == 32
        assert spec.tile_h % spec.rows_sub == 0
        assert spec.cell_lut_idx.shape == (9, 9, 4)

    def test_1080p_4k_geometries(self):
        for h, w in [(1080, 1920), (2160, 3840), (720, 1280)]:
            spec = lut_kernels.make_interp_spec(h, w, 2.0, (8, 8))
            assert spec is not None, (h, w)

    def test_odd_tile_geometry(self):
        # 1080/8 = 135 (odd tile height) — boundary rounding path
        spec = lut_kernels.make_interp_spec(1080, 1920, 2.0, (8, 8))
        assert spec is not None

    def test_corner_cells_clamp(self):
        spec = lut_kernels.make_interp_spec(64, 64, 2.0, (8, 8))
        # top-left cell: all four LUTs are tile (0, 0)
        assert (spec.cell_lut_idx[0, 0] == 0).all()
        # bottom-right cell: all four are the last tile
        assert (spec.cell_lut_idx[-1, -1] == 63).all()


class TestClaheInterpolate:
    @pytest.mark.parametrize("shape,grid", [
        ((96, 128), (8, 8)),
        ((64, 128), (4, 4)),
        ((80, 160), (8, 4)),   # asymmetric
    ])
    def test_matches_golden(self, rng, shape, grid):
        import jax.numpy as jnp

        y = rng.integers(0, 256, shape, dtype=np.uint8)
        luts, th, tw = golden.clahe_luts(y, 2.0, grid)
        spec = lut_kernels.make_interp_spec(shape[0], shape[1], 2.0, grid)
        assert spec is not None
        out = np.asarray(lut_kernels.clahe_interpolate_pallas(
            jnp.asarray(y), jnp.asarray(luts.reshape(-1, 256)), spec,
        ))
        ref = golden.clahe_apply_luts(y, luts, th, tw)
        d = np.abs(out.astype(int) - ref.astype(int))
        assert d.max() <= 1  # interpret-mode FMA ties, like the XLA path
        assert (d > 0).mean() < 0.01

    def test_full_clahe_pallas_backend(self, rng):
        from opencv_opencl_tpu.ops import clahe as clahe_ops

        y = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        out = np.asarray(clahe_ops.clahe(y, 2.0, (8, 8), backend="pallas"))
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(y)
        assert_clahe_close(out, ref)

    def test_pallas_backend_rejects_unsupported(self):
        from opencv_opencl_tpu.ops import clahe as clahe_ops
        import jax.numpy as jnp

        # a geometry with reflect padding has no spec only if mapping fails;
        # padding itself is fine (interpolation uses original size) — so
        # check the error path via an impossible tile width instead
        spec = lut_kernels.make_interp_spec(64, 10000, 2.0, (1, 8))
        if spec is None:
            with pytest.raises(ValueError, match="no pallas fast path"):
                plan = clahe_ops.make_clahe_plan(64, 10000, 2.0, (1, 8))
                clahe_ops.clahe_apply(
                    jnp.zeros((64, 10000), jnp.uint8), plan, backend="pallas"
                )


class TestRadixVariant:
    def test_radix_matches_standard(self, rng):
        import jax.numpy as jnp

        y = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        luts, th, tw = golden.clahe_luts(y, 2.0, (8, 8))
        spec = lut_kernels.make_interp_spec(96, 128, 2.0, (8, 8))
        ref = golden.clahe_apply_luts(y, luts, th, tw)
        for radix in (False, True):
            out = np.asarray(lut_kernels.clahe_interpolate_pallas(
                jnp.asarray(y), jnp.asarray(luts.reshape(-1, 256)), spec,
                radix=radix,
            ))
            d = np.abs(out.astype(int) - ref.astype(int))
            assert d.max() <= 1, (radix, d.max())


def test_pallas_mixed_divisibility(rng):
    """Unwrapped-padding geometries through the pallas backend."""
    from opencv_opencl_tpu.ops import clahe as clahe_ops
    from tests.conftest import assert_clahe_close

    y = rng.integers(0, 256, (99, 28), dtype=np.uint8)  # 99%11==0, 28%8!=0
    out = np.asarray(clahe_ops.clahe(y, 2.0, (8, 11), backend="pallas"))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 11)).apply(y)
    assert_clahe_close(out, ref)


def test_tile_histograms_pallas(rng):
    """Pallas per-tile histogram vs the golden per-tile bincount."""
    import jax.numpy as jnp

    from opencv_opencl_tpu.core import golden

    ext = rng.integers(0, 256, (96, 256), dtype=np.uint8)  # 4x2 tiles of 24x128
    hists = np.asarray(lut_kernels.tile_histograms_pallas(
        jnp.asarray(ext), 4, 2, 24, 128,
    ))
    for ty in range(4):
        for tx in range(2):
            tile = ext[ty * 24:(ty + 1) * 24, tx * 128:(tx + 1) * 128]
            assert np.array_equal(hists[ty * 2 + tx], golden.hist256(tile)), (ty, tx)


def test_tile_histograms_pallas_unaligned(rng):
    """Tile sizes needing (8,128) alignment slack — bin-0 correction."""
    import jax.numpy as jnp

    from opencv_opencl_tpu.core import golden

    ext = rng.integers(1, 256, (54, 90), dtype=np.uint8)  # 2x3 tiles of 27x30
    hists = np.asarray(lut_kernels.tile_histograms_pallas(
        jnp.asarray(ext), 2, 3, 27, 30,
    ))
    for ty in range(2):
        for tx in range(3):
            tile = ext[ty * 27:(ty + 1) * 27, tx * 30:(tx + 1) * 30]
            assert np.array_equal(hists[ty * 3 + tx], golden.hist256(tile)), (ty, tx)


def test_hist256_pallas_full_image(rng):
    import jax.numpy as jnp

    from opencv_opencl_tpu.core import golden
    from opencv_opencl_tpu.ops.histogram import hist256_pallas

    for shape in [(64, 256), (48, 130), (33, 512)]:
        y = rng.integers(0, 256, shape, dtype=np.uint8)
        h = np.asarray(hist256_pallas(jnp.asarray(y)))
        assert np.array_equal(h, golden.hist256(y)), shape
