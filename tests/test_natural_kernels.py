"""Natural-layout Pallas kernels (interpret mode on CPU) vs golden/cv2.

Round-2 kernels: clahe_interpolate_natural (no cell-grid embedding, works
for arbitrary geometry) and tile_histograms_radix (radix-16 MXU histogram).
The blend arithmetic is mul-then-add like OpenCV; interpret mode on CPU may
FMA-contract rare exact ties (same artifact as the cell-grid kernel), hence
assert_clahe_close; the histograms are integer-exact everywhere.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core import golden
from opencv_opencl_tpu.ops import clahe as cops
from opencv_opencl_tpu.ops.pallas import experiments, natural
from tests.conftest import assert_clahe_close

GEOMETRIES = [
    (96, 128, 2.0, (8, 8)),
    (97, 131, 2.0, (8, 8)),      # odd: reflect-padded tiles
    (64, 256, 3.0, (4, 4)),
    (120, 256, 40.0, (8, 8)),    # cv2 default clip
    (33, 47, 2.5, (3, 5)),       # asymmetric grid
    (270, 480, 2.0, (8, 8)),     # 4K tile-scaled geometry
]


class TestNaturalSpec:
    @pytest.mark.parametrize("h,w,clip,grid", GEOMETRIES)
    def test_builds_for_any_geometry(self, h, w, clip, grid):
        # no make_interp_spec-style fallback: every geometry gets a spec
        spec = natural.make_natural_spec(h, w, clip, grid)
        assert spec is not None
        assert spec.pack_rows % 8 == 0
        assert spec.m_table.shape == (spec.pack_rows, w)
        # each column selects exactly one group per j quadrant
        m = spec.m_table
        g = spec.groups
        for j in range(4):
            assert (m[j * g : (j + 1) * g].sum(axis=0) == 1.0).all()

    def test_width_budget(self):
        assert natural.make_natural_spec(64, 9000, 2.0, (8, 8)) is None

    def test_pair_ids_roundtrip(self):
        # the clip-pattern inversion is asserted inside; build a tall sweep
        for tiles in (1, 2, 3, 8, 16):
            for n in (7, 64, 255):
                plan = cops.make_clahe_plan(n, n, 2.0, (tiles, tiles))
                natural._pair_ids(plan.tx1, plan.tx2, tiles)
                natural._pair_ids(plan.ty1, plan.ty2, tiles)


class TestNaturalInterp:
    @pytest.mark.parametrize("h,w,clip,grid", GEOMETRIES)
    def test_matches_cv2(self, rng, h, w, clip, grid):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ref = cv2.createCLAHE(clip, grid).apply(y)
        out = np.asarray(cops.clahe(y, clip, grid, backend="natural"))
        assert_clahe_close(out, ref)

    def test_rs_variants_agree(self, rng):
        y = rng.integers(0, 256, (64, 128), dtype=np.uint8)
        plan = cops.make_clahe_plan(64, 128, 2.0, (8, 8))
        hists = cops._tile_histograms(np.asarray(y), plan, "onehot")
        luts = cops._luts_from_hists(hists, plan)
        outs = []
        for rs in (8, 16, 32):
            spec = natural.make_natural_spec(64, 128, 2.0, (8, 8), rs=rs)
            outs.append(np.asarray(
                natural.clahe_interpolate_natural(y, luts, spec,
                                                  interpret=True)))
        assert np.array_equal(outs[0], outs[1])
        assert np.array_equal(outs[1], outs[2])

    def test_batched(self, rng):
        y = rng.integers(0, 256, (3, 96, 128), dtype=np.uint8)
        ref = np.stack([cv2.createCLAHE(2.0, (8, 8)).apply(f) for f in y])
        out = np.asarray(cops.clahe(y, 2.0, (8, 8), backend="natural"))
        assert_clahe_close(out, ref)


class TestRadixHist:
    @pytest.mark.parametrize("h,w,clip,grid", GEOMETRIES)
    def test_exact_vs_golden(self, rng, h, w, clip, grid):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        plan = cops.make_clahe_plan(h, w, clip, grid)
        ext = np.asarray(cops._extend(np.asarray(y), plan))
        hr = np.asarray(natural.tile_histograms_radix(
            ext, plan.tiles_y, plan.tiles_x, plan.tile_h, plan.tile_w,
            interpret=True))
        hg = np.asarray(cops._tile_histograms(np.asarray(y), plan, "onehot"))
        assert np.array_equal(hr, hg)

    def test_counts_sum_to_area(self, rng):
        y = rng.integers(0, 256, (64, 128), dtype=np.uint8)
        hr = np.asarray(natural.tile_histograms_radix(
            y, 4, 4, 16, 32, interpret=True))
        assert (hr.sum(axis=1) == 16 * 32).all()
        assert hr.shape == (16, 256)

    def test_vmem_budget_raises(self):
        y = np.zeros((4096, 2048), np.uint8)
        with pytest.raises(ValueError):
            natural.tile_histograms_radix(y, 1, 1, 4096, 2048,
                                          interpret=True)


class TestFusedExperiment:
    """experiments.clahe_interp_and_hist_natural — the rejected-on-
    hardware fused streaming kernel stays exact and guarded (kept as a
    tested record in ops/pallas/experiments.py)."""

    @pytest.mark.parametrize("h,w,grid", [(96, 128, (8, 8)),
                                          (64, 256, (4, 4)),
                                          (80, 120, (5, 4))])
    def test_matches_separate_kernels(self, rng, h, w, grid):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        plan = cops.make_clahe_plan(h, w, 2.0, grid)
        luts = cops._luts_from_hists(
            cops._tile_histograms(np.asarray(y), plan, "onehot"), plan)
        spec = natural.make_natural_spec(h, w, 2.0, grid)
        out_ref = np.asarray(natural.clahe_interpolate_natural(
            y, luts, spec, interpret=True))
        out, hists = experiments.clahe_interp_and_hist_natural(
            y, luts, spec, interpret=True)
        hr = np.asarray(natural.tile_histograms_radix(
            y, plan.tiles_y, plan.tiles_x, plan.tile_h, plan.tile_w,
            interpret=True))
        assert np.array_equal(np.asarray(out), out_ref)
        assert np.array_equal(np.asarray(hists), hr)

    def test_rejects_unsafe_geometry(self, rng):
        # tile_h=6 < rs/2: an rs-block would straddle 3 tile rows
        y = rng.integers(0, 256, (48, 128), dtype=np.uint8)
        plan = cops.make_clahe_plan(48, 128, 2.0, (8, 8))
        luts = cops._luts_from_hists(
            cops._tile_histograms(np.asarray(y), plan, "onehot"), plan)
        spec = natural.make_natural_spec(48, 128, 2.0, (8, 8))
        with pytest.raises(AssertionError):
            experiments.clahe_interp_and_hist_natural(y, luts, spec,
                                                  interpret=True)


class TestLutPackFused:
    """build_lut_pack_pallas must equal _luts_from_hists + pack2 take,
    bin for bin — including the clip/redistribution edge cases."""

    @pytest.mark.parametrize("h,w,clip,grid", GEOMETRIES)
    def test_matches_xla_lut_build(self, rng, h, w, clip, grid):
        spec = natural.make_natural_spec(h, w, clip, grid)
        plan = cops.make_clahe_plan(h, w, clip, grid)
        T = plan.num_tiles
        hists = rng.integers(0, plan.tile_area // 4 + 2, (T, 256)).astype(
            np.int32)
        # make the rows sum to tile_area like real histograms
        hists[:, 0] += plan.tile_area - hists.sum(axis=1, dtype=np.int64).astype(np.int32)
        hists[:, 0] = np.maximum(hists[:, 0], 0)
        import jax.numpy as jnp

        luts = cops._luts_from_hists(jnp.asarray(hists), plan)
        want = np.asarray(luts).reshape(-1, 256)[spec.pack2_idx]
        got = np.asarray(natural.build_lut_pack_pallas(
            jnp.asarray(hists), plan.clip, plan.lut_scale, spec))
        assert got.dtype == np.dtype("bfloat16") or str(got.dtype) == "bfloat16"
        assert np.array_equal(got.astype(np.float32), want.astype(np.float32))

    def test_residual_edge_cases(self):
        """Rows engineered so the redistribution residual is 0, 1, 255 and
        the step logic hits its max(…, 1) guards."""
        import jax.numpy as jnp

        h, w, clip, grid = 96, 128, 2.0, (8, 8)
        spec = natural.make_natural_spec(h, w, clip, grid)
        plan = cops.make_clahe_plan(h, w, clip, grid)
        T = plan.num_tiles
        hists = np.zeros((T, 256), np.int32)
        c = plan.clip
        hists[0, 0] = plan.tile_area            # everything in one bin
        hists[1, :] = plan.tile_area // 256     # uniform (residual small)
        hists[1, 0] += plan.tile_area - hists[1].sum()
        hists[2, :2] = [c + 255, plan.tile_area - (c + 255)]  # residual 255
        hists[3, :2] = [c + 256, plan.tile_area - (c + 256)]  # residual 0
        hists[4, :2] = [c + 1, plan.tile_area - (c + 1)]      # residual 1
        luts = cops._luts_from_hists(jnp.asarray(hists), plan)
        want = np.asarray(luts).reshape(-1, 256)[spec.pack2_idx]
        got = np.asarray(natural.build_lut_pack_pallas(
            jnp.asarray(hists), plan.clip, plan.lut_scale, spec))
        assert np.array_equal(got.astype(np.float32), want.astype(np.float32))


class TestRadixRowBatched:
    @pytest.mark.parametrize("nb", [2, 4])
    def test_exact_vs_unbatched(self, rng, nb):
        y = rng.integers(0, 256, (96, 256), dtype=np.uint8)
        base = np.asarray(natural.tile_histograms_radix(
            y, 4, 2, 24, 128, interpret=True))
        batched = np.asarray(experiments.tile_histograms_radix_batched(
            y, 4, 2, 24, 128, interpret=True, batch_rows=nb))
        assert np.array_equal(base, batched)


def test_radix_hist_rejects_bad_batch_rows():
    import numpy as np
    import pytest

    from opencv_opencl_tpu.ops.pallas import experiments

    y = np.zeros((16, 128), np.uint8)
    with pytest.raises(ValueError, match=r"batch_rows"):
        experiments.tile_histograms_radix_batched(y, 1, 1, 16, 128,
                                                  batch_rows=3)
