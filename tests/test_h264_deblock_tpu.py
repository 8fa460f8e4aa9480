"""Device-side deblocking (ops/h264_deblock.py) vs the Python oracle.

Two bars: (1) ``deblock_planes`` is BIT-EXACT vs
``io.h264_deblock.deblock_picture`` on randomized pictures/metadata
(the oracle itself is decoder-conformance proven in
tests/test_h264_deblock.py); (2) ``TpuGopEncoder(deblock=True)`` —
whose reference chain is the on-device wavefront-filtered recon — emits
streams BYTE-IDENTICAL to ``GopCavlcEncoder(deblock=True)``.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from opencv_opencl_tpu.io.h264_deblock import DeblockInfo, deblock_picture
from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder, TpuGopEncoder
from opencv_opencl_tpu.ops.h264_deblock import deblock_planes_jit

from tests.test_h264_inter import moving_frames


def rand_case(rng, mb_h, mb_w):
    H, W = mb_h * 16, mb_w * 16
    y = rng.integers(0, 256, (H, W)).astype(np.uint8)
    # smooth stripes open the |p0-q0| < alpha activity gates
    y[:, : W // 2] = np.linspace(40, 90, W // 2)[None, :].astype(np.uint8)
    cb = np.tile(np.linspace(100, 140, W // 2)[None, :],
                 (H // 2, 1)).astype(np.uint8)
    cr = rng.integers(0, 256, (H // 2, W // 2)).astype(np.uint8)
    cr[: H // 4] = 128
    info = DeblockInfo(mb_h, mb_w)
    info.intra[:] = rng.random((mb_h, mb_w)) < 0.3
    info.nnz4[:] = rng.random((mb_h * 4, mb_w * 4)) < 0.4
    info.mv[:] = rng.integers(-20, 21, (mb_h, mb_w, 2))
    info.ref[:] = rng.integers(0, 2, (mb_h, mb_w))
    return y, cb, cr, info


def run_device(y, cb, cr, qp, info):
    return deblock_planes_jit(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        jnp.int32(qp), jnp.asarray(info.intra), jnp.asarray(info.nnz4),
        jnp.asarray(info.mv), jnp.asarray(info.ref))


class TestDeviceVsOracle:
    @pytest.mark.parametrize("seed,mb_h,mb_w,qp", [
        (0, 3, 4, 35), (1, 1, 6, 26), (2, 5, 1, 44), (3, 4, 4, 51),
        (4, 2, 7, 20), (5, 6, 3, 38),
    ])
    def test_random_metadata_bitexact(self, seed, mb_h, mb_w, qp):
        rng = np.random.default_rng(seed)
        y, cb, cr, info = rand_case(rng, mb_h, mb_w)
        fy, fcb, fcr = deblock_picture(
            y.astype(np.int64), cb.astype(np.int64),
            cr.astype(np.int64), qp, info)
        dy, dcb, dcr = run_device(y, cb, cr, qp, info)
        assert np.array_equal(np.asarray(dy, dtype=np.int64), fy)
        assert np.array_equal(np.asarray(dcb, dtype=np.int64), fcb)
        assert np.array_equal(np.asarray(dcr, dtype=np.int64), fcr)
        # the case must actually exercise the filter
        assert (fy != y).any()

    def test_all_intra_idr_picture(self):
        rng = np.random.default_rng(9)
        y, cb, cr, _ = rand_case(rng, 3, 3)
        info = DeblockInfo.for_idr(3, 3)
        fy, fcb, fcr = deblock_picture(
            y.astype(np.int64), cb.astype(np.int64),
            cr.astype(np.int64), 40, info)
        dy, dcb, dcr = run_device(y, cb, cr, 40, info)
        assert np.array_equal(np.asarray(dy, dtype=np.int64), fy)
        assert np.array_equal(np.asarray(dcb, dtype=np.int64), fcb)
        assert np.array_equal(np.asarray(dcr, dtype=np.int64), fcr)
        assert (fy != y).mean() > 0.05  # strong filter active

    def test_traced_qp_no_retrace(self):
        """qp is traced (rate control moves it every frame) — two QPs
        through one jitted program must both be exact."""
        rng = np.random.default_rng(11)
        y, cb, cr, info = rand_case(rng, 2, 3)
        for qp in (24, 42):
            fy, _, _ = deblock_picture(
                y.astype(np.int64), cb.astype(np.int64),
                cr.astype(np.int64), qp, info)
            dy, _, _ = run_device(y, cb, cr, qp, info)
            assert np.array_equal(np.asarray(dy, dtype=np.int64), fy)


class TestTpuGopDeblock:
    @pytest.mark.parametrize("search,kw,refs", [
        (0, {}, 1),
        (2, {"quarterpel": True}, 1),
        (2, {"quarterpel": True}, 2),
        (3, {"parts": True}, 1),
        (3, {"parts": True}, 2),
    ])
    def test_byte_identical_to_oracle_gop(self, search, kw, refs):
        w, h = 64, 48
        fs = moving_frames(w, h, 5, seed=search + refs)
        if kw.get("parts"):
            # shear so partitioned MBs (and quadrant bS edges) occur
            for i, f in enumerate(fs):
                f[:24] = np.roll(f[:24], 2 * i, 1)
        okw = dict(search=search, deblock=True, **kw)
        tkw = dict(okw)
        if refs > 1:
            okw["refs"] = tkw["refs"] = refs
        a = GopCavlcEncoder(w, h, qp=28, gop=3, slices=h // 16, **okw)
        b = TpuGopEncoder(w, h, qp=28, gop=3, **tkw)
        for i, f in enumerate(fs):
            assert a.encode(f) == b.encode(f), f"frame {i} differs"

    def test_overlap_pipeline_same_bytes(self):
        w, h = 64, 48
        fs = moving_frames(w, h, 5, seed=2)
        a = TpuGopEncoder(w, h, qp=30, gop=3, search=2, deblock=True)
        b = TpuGopEncoder(w, h, qp=30, gop=3, search=2, deblock=True,
                          overlap=True)
        aus_a = [au for f in fs for au in a.encode(f)] + a.flush()
        aus_b = [au for f in fs for au in b.encode(f)] + b.flush()
        assert aus_a == aus_b

    def test_rate_control_composes(self):
        """Closed-loop rate control moves qp between frames; the traced
        qp must follow it (each frame filtered with its own qp)."""
        w, h = 64, 48
        fs = moving_frames(w, h, 6, seed=4)
        a = GopCavlcEncoder(w, h, qp=34, gop=3, slices=h // 16,
                            deblock=True, bitrate_kbps=300, fps=30.0)
        b = TpuGopEncoder(w, h, qp=34, gop=3, deblock=True,
                          bitrate_kbps=300, fps=30.0)
        for i, f in enumerate(fs):
            assert a.encode(f) == b.encode(f), f"frame {i} differs"
        assert a.qp == b.qp
