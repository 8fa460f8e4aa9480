"""TPU GOP path (ops/h264_levels.encode_p_levels + TpuGopEncoder).

Contract chain: the TPU P program (per-MB skip/inter/intra decision,
device-resident reconstruction) must be BYTE-IDENTICAL to
``GopCavlcEncoder(slices=mb_h)`` — the per-MB-row oracle — which is
decoder-conformance proven in tests/test_h264_inter.py.  On CPU the jit
runs on the virtual backend; the arithmetic is integer-only, so the
platform cannot change the bytes (hardware re-validation:
scripts/tpu_r3_pframe.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder, TpuGopEncoder


def gop_frames(w, h, n, seed=0):
    """Mixed content: static background + moving insert + one scene
    cut, so skip, inter and intra MBs all occur."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        if i >= 1:
            f[5:25, 8 + 4 * i:40 + 4 * i] = rng.integers(
                0, 256, (20, 32), np.uint8)
        if i == n - 2:  # scene cut: intra MBs win
            f[:h // 2] = rng.integers(0, 256, (h // 2, w), np.uint8)
        out.append(f)
    return out


class TestTpuGopParity:
    @pytest.mark.parametrize("w,h,qp", [(96, 64, 28), (100, 56, 35)])
    def test_stream_byte_identical_to_oracle(self, w, h, qp):
        mb_h = -(-h // 16)
        frames = gop_frames(w, h, 6, seed=qp)
        tpu = TpuGopEncoder(w, h, qp=qp, gop=3)
        oracle = GopCavlcEncoder(w, h, qp=qp, gop=3, slices=mb_h)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_overlap_shifts_by_one_frame_bytes_unchanged(self):
        w, h = 96, 64
        frames = gop_frames(w, h, 5, seed=3)
        sync = TpuGopEncoder(w, h, qp=30, gop=3)
        want = [au for f in frames for au in sync.encode(f)]
        pipe = TpuGopEncoder(w, h, qp=30, gop=3, overlap=True)
        assert pipe.encode(frames[0]) == []
        got = [au for f in frames[1:] for au in pipe.encode(f)]
        got += pipe.flush()
        assert got == want
        assert pipe.flush() == []

    def test_recon_stays_on_device(self):
        """The reference picture must never round-trip to host: the
        stored recon planes are device arrays."""
        import jax

        w, h = 96, 64
        enc = TpuGopEncoder(w, h, qp=30, gop=4)
        for f in gop_frames(w, h, 2, seed=1):
            enc.encode(f)
        assert all(isinstance(p, jax.Array) for p in enc._recon)

    def test_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = gop_frames(w, h, 5, seed=7)
        enc = TpuGopEncoder(w, h, qp=26, gop=5)
        aus, recons = [], []
        for f in frames:
            aus.extend(enc.encode(f))
            recons.append(np.asarray(enc._recon[0]))
        p = tmp_path / "tpu_gop.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(5):
            ok, d = cap.read()
            assert ok, i
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_gop_validation(self):
        with pytest.raises(ValueError, match="gop"):
            TpuGopEncoder(96, 64, gop=0)


class TestEncoderBoundaryTpuGop:
    def test_make_encoder_tpu_gop(self):
        from opencv_opencl_tpu.io.encoder import make_encoder
        from opencv_opencl_tpu.io.h264_cavlc import TpuCavlcEncoder

        enc = make_encoder("tpu:qp=30:gop=5", 96, 64)
        assert isinstance(enc, TpuGopEncoder) and enc.gop == 5
        enc2 = make_encoder("tpu:gop=4:overlap", 96, 64,
                            bitrate_kbps=300)
        assert isinstance(enc2, TpuGopEncoder) and enc2._overlap
        assert enc2.bitrate_kbps == 300
        # gop=1 stays the all-IDR TPU encoder
        enc3 = make_encoder("tpu:qp=30:gop=1", 96, 64)
        assert type(enc3) is TpuCavlcEncoder
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=0", 96, 64)
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=x", 96, 64)

    def test_rate_control_windowed(self):
        w, h = 96, 64
        enc = TpuGopEncoder(w, h, gop=3, bitrate_kbps=30, fps=30.0)
        qp0 = enc.qp
        frames = gop_frames(w, h, 3, seed=2)
        enc.encode(frames[0])
        assert enc.qp == qp0            # window not full yet
        enc.encode(frames[1])
        enc.encode(frames[2])
        assert enc.qp > qp0             # noisy IDR blows the mean


class TestNativePEntropy:
    """fp_cavlc_entropy_rows_p (C++ production path) vs the Python
    oracle, with all three MB modes present."""

    def _levels_with_all_modes(self):
        import jax.numpy as jnp

        from opencv_opencl_tpu.ops.h264_levels import (
            encode_levels_recon_jit, encode_p_levels_jit)

        w, h, qp = 160, 96, 28
        rng = np.random.default_rng(31)
        f0 = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        f1 = f0.copy()
        f1[5:25, 20:80] ^= 0x11                      # inter-ish motion
        # scene cut to SMOOTH content: intra DC prediction beats the
        # inter residual against the old noise there
        f1[40:96] = (np.linspace(40, 200, w)[None, :] +
                     np.zeros((56, 1))).astype(np.uint8)
        uv0 = f0[h:].reshape(h // 2, w // 2, 2)
        uv1 = f1[h:].reshape(h // 2, w // 2, 2)
        _, ry, rcb, rcr, _ = encode_levels_recon_jit(
            jnp.asarray(f0[:h]), jnp.asarray(uv0[:, :, 0]),
            jnp.asarray(uv0[:, :, 1]), jnp.int32(qp))
        plv = encode_p_levels_jit(
            jnp.asarray(f1[:h]), jnp.asarray(uv1[:, :, 0]),
            jnp.asarray(uv1[:, :, 1]), ry, rcb, rcr, jnp.int32(qp))
        mode, zdc, acz, czdc, cacz = (np.asarray(a) for a in plv[:5])
        assert {0, 1, 2} <= set(np.unique(mode).tolist()), \
            "fixture must exercise skip, inter AND intra MBs"
        return mode, zdc, acz, czdc, cacz, qp

    def test_native_matches_oracle(self):
        from opencv_opencl_tpu import native
        from opencv_opencl_tpu.io.h264_inter import (
            encode_frame_p_from_levels)

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        mode, zdc, acz, czdc, cacz, qp = self._levels_with_all_modes()
        want = [bytes(n) for n in encode_frame_p_from_levels(
            mode, zdc, acz, czdc, cacz, qp, 3)]
        got = native.cavlc_entropy_rows_p(mode, zdc, acz, czdc, cacz,
                                          qp, 3)
        assert got == want
        ws = {}
        got_t = native.cavlc_entropy_rows_p(mode, zdc, acz, czdc, cacz,
                                            qp, 3, threads=4,
                                            workspace=ws)
        assert got_t == want
        # workspace reuse must not corrupt a second frame
        got2 = native.cavlc_entropy_rows_p(mode, zdc, acz, czdc, cacz,
                                           qp, 4, threads=2,
                                           workspace=ws)
        want2 = [bytes(n) for n in encode_frame_p_from_levels(
            mode, zdc, acz, czdc, cacz, qp, 4)]
        assert got2 == want2

    def test_tpu_gop_encoder_uses_native(self):
        """The production path through TpuGopEncoder (native entropy)
        still streams byte-identical to the Python GOP oracle."""
        from opencv_opencl_tpu import native

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        w, h = 96, 64
        frames = gop_frames(w, h, 5, seed=33)
        tpu = TpuGopEncoder(w, h, qp=30, gop=3, native="require"
                            if native.has_cavlc() else "auto")
        oracle = GopCavlcEncoder(w, h, qp=30, gop=3, slices=h // 16)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want
        assert tpu._intra._native  # the native path actually ran


class TestFullReconVariant:
    def test_intra_full_recon_matches_oracle(self):
        import jax.numpy as jnp

        from opencv_opencl_tpu.io.h264_cavlc import (
            encode_frame_cavlc_slices)
        from opencv_opencl_tpu.ops.h264_levels import (
            encode_levels_recon_jit)

        w, h, qp = 96, 64, 24
        f = gop_frames(w, h, 1, seed=9)[0]
        _, want = encode_frame_cavlc_slices(f, w, h, qp, slices=h // 16,
                                            return_recon=True)
        uv = f[h:].reshape(h // 2, w // 2, 2)
        lv, ry, rcb, rcr, _ = encode_levels_recon_jit(
            jnp.asarray(f[:h]), jnp.asarray(uv[:, :, 0]),
            jnp.asarray(uv[:, :, 1]), jnp.int32(qp))
        assert np.array_equal(np.asarray(ry, np.int64), want[0])
        assert np.array_equal(np.asarray(rcb, np.int64), want[1])
        assert np.array_equal(np.asarray(rcr, np.int64), want[2])


class TestTpuMotionSearch:
    """Device motion search (ops/h264_levels.motion_search_mc): the
    TPU GOP stream with search=R must be byte-identical to the oracle
    GopCavlcEncoder(slices=mb_h, search=R) — covering the shared SAD
    candidate order/packing, the MC planes, the mv==0 skip guard, and
    the left-only mvd rule in the entropy stage."""

    def panning(self, w, h, n, step=4, seed=0):
        rng = np.random.default_rng(seed)
        base_y = (rng.integers(0, 256, (h, w), np.uint8)
                  .astype(np.int64).reshape(h // 4, 4, w // 4, 4)
                  .mean(axis=(1, 3)).astype(np.uint8)
                  .repeat(4, 0).repeat(4, 1))
        base_uv = rng.integers(96, 160, (h // 2, w), np.uint8)
        out = []
        for i in range(n):
            y = np.roll(np.roll(base_y, i * step, 0), i * step, 1)
            uv = np.roll(np.roll(base_uv, i * step // 2, 0),
                         i * step, 1)
            out.append(np.concatenate([y, uv], 0))
        return out

    @pytest.mark.parametrize("w,h,step", [(96, 64, 4), (100, 56, -4)])
    def test_stream_byte_identical_to_oracle(self, w, h, step):
        mb_h = -(-h // 16)
        frames = self.panning(w, h, 5, step=step, seed=w)
        tpu = TpuGopEncoder(w, h, qp=28, gop=5, search=8)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=5, slices=mb_h,
                                 search=8)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_mixed_content_byte_identical(self):
        """skip + coded-inter + intra MBs with a non-trivial MV field
        in one stream (insert moves, background static, scene cut)."""
        w, h = 96, 64
        frames = gop_frames(w, h, 6, seed=9)
        tpu = TpuGopEncoder(w, h, qp=30, gop=6, search=4)
        oracle = GopCavlcEncoder(w, h, qp=30, gop=6, slices=4,
                                 search=4)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_search_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.panning(w, h, 5, step=4, seed=2)
        enc = TpuGopEncoder(w, h, qp=26, gop=5, search=8)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "ms.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(5):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), \
                f"frame {i}"
        cap.release()

    def test_search_compresses_pan_vs_zero_motion(self):
        w, h = 96, 64
        frames = self.panning(w, h, 4, step=4, seed=5)
        zm = TpuGopEncoder(w, h, qp=28, gop=10)
        ms = TpuGopEncoder(w, h, qp=28, gop=10, search=8)
        z = [len(zm.encode(f)[0]) for f in frames][1:]
        m = [len(ms.encode(f)[0]) for f in frames][1:]
        assert sum(m) * 3 < sum(z), (m, z)

    def test_search_zero_field_matches_plain(self):
        """Static content through the search program produces the same
        bytes as the zero-motion program (all MVs (0,0) by tie-break,
        native entropy still eligible)."""
        w, h = 96, 64
        base = np.random.default_rng(3).integers(
            0, 256, (h * 3 // 2, w), np.uint8)
        a = TpuGopEncoder(w, h, qp=28, gop=10)
        b = TpuGopEncoder(w, h, qp=28, gop=10, search=8)
        for _ in range(3):
            assert a.encode(base) == b.encode(base)


class TestSearchEncoderBoundary:
    def test_make_encoder_search(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        e = make_encoder("tpu:gop=4:search=8", 96, 64)
        assert isinstance(e, TpuGopEncoder) and e.search == 8
        e = make_encoder("cavlc:gop=4:search=6:slices=2", 96, 64)
        assert isinstance(e, GopCavlcEncoder) and e.search == 6

    def test_make_encoder_search_rejections(self):
        import pytest as _pytest

        from opencv_opencl_tpu.io.encoder import make_encoder

        for bad in ("tpu:search=8", "cavlc:search=8",
                    "tpu:gop=4:search=16", "cavlc:gop=4:search=32",
                    "tpu:gop=4:search=x", "tpu:gop=4:search=-2"):
            with _pytest.raises(ValueError):
                make_encoder(bad, 96, 64)
        # search=0 is "disabled", not an error
        e = make_encoder("tpu:gop=4:search=0", 96, 64)
        assert e.search == 0


class TestNativePEntropyMvd:
    def test_native_mvd_matches_oracle(self):
        """Native rows with a motion MV field must equal the Python
        oracle — skip runs, coded mvd with the left-only predictor,
        intra predictor resets, and cbp==0 inter MBs all present."""
        import jax.numpy as jnp

        from opencv_opencl_tpu import native
        from opencv_opencl_tpu.io.h264_inter import (
            encode_frame_p_from_levels)
        from opencv_opencl_tpu.ops.h264_levels import (
            encode_levels_recon_jit, encode_p_levels_jit)

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        w, h, qp = 160, 96, 28
        rng = np.random.default_rng(41)
        base_y = (rng.integers(0, 256, (h, w), np.uint8)
                  .astype(np.int64).reshape(h // 4, 4, w // 4, 4)
                  .mean(axis=(1, 3)).astype(np.uint8)
                  .repeat(4, 0).repeat(4, 1))
        base_uv = rng.integers(96, 160, (h // 2, w), np.uint8)
        f0 = np.concatenate([base_y, base_uv], 0)
        y1 = np.roll(base_y, 4, 1)
        y1[40:96] = (np.linspace(40, 200, w)[None, :] +
                     np.zeros((56, 1))).astype(np.uint8)  # intra region
        f1 = np.concatenate(
            [y1, np.roll(base_uv, 4, 1)], 0)
        uv0 = f0[h:].reshape(h // 2, w // 2, 2)
        uv1 = f1[h:].reshape(h // 2, w // 2, 2)
        _, ry, rcb, rcr, _ = encode_levels_recon_jit(
            jnp.asarray(f0[:h]), jnp.asarray(uv0[:, :, 0]),
            jnp.asarray(uv0[:, :, 1]), jnp.int32(qp))
        plv = encode_p_levels_jit(
            jnp.asarray(f1[:h]), jnp.asarray(uv1[:, :, 0]),
            jnp.asarray(uv1[:, :, 1]), ry, rcb, rcr, jnp.int32(qp), 8)
        mode, zdc, acz, czdc, cacz = (np.asarray(a) for a in plv[:5])
        mv = np.asarray(plv.mv)
        assert mv.any(), "fixture must produce non-zero MVs"
        assert (mode == 1).any() and (mode == 2).any()
        want = [bytes(n) for n in encode_frame_p_from_levels(
            mode, zdc, acz, czdc, cacz, qp, 3, mv=mv)]
        got = native.cavlc_entropy_rows_p(mode, zdc, acz, czdc, cacz,
                                          qp, 3, mv=mv)
        assert got == want
        ws = {}
        got_t = native.cavlc_entropy_rows_p(mode, zdc, acz, czdc, cacz,
                                            qp, 3, threads=4,
                                            workspace=ws, mv=mv)
        assert got_t == want

    def test_tpu_gop_search_encoder_uses_native(self):
        """TpuGopEncoder with search produces identical bytes with
        native entropy forced on and off."""
        from opencv_opencl_tpu import native

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        w, h = 96, 64
        frames = TestTpuMotionSearch().panning(w, h, 4, step=4, seed=8)
        a = TpuGopEncoder(w, h, qp=28, gop=4, search=8, native="always")
        b = TpuGopEncoder(w, h, qp=28, gop=4, search=8, native="never")
        for f in frames:
            assert a.encode(f) == b.encode(f)


class TestTpuOddPelMotion:
    def test_odd_pan_stream_byte_identical_to_oracle(self):
        """Odd full-pel MVs drive the device chroma bilinear; stream
        must equal the oracle (which is lavc-conformance proven)."""
        w, h = 96, 64
        frames = TestTpuMotionSearch().panning(w, h, 5, step=3, seed=6)
        tpu = TpuGopEncoder(w, h, qp=28, gop=5, search=5)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=5, slices=h // 16,
                                 search=5)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_device_mc_matches_oracle_planes(self):
        """motion_search_mc vs the numpy twin on random content: same
        MVs, same luma copy, same chroma bilinear, sample for sample."""
        import jax.numpy as jnp

        from opencv_opencl_tpu.io.h264_inter import (
            mc_planes, motion_search)
        from opencv_opencl_tpu.ops.h264_levels import motion_search_mc

        rng = np.random.default_rng(12)
        H, W = 64, 96
        y = rng.integers(0, 256, (H, W), np.uint8)
        ry = np.roll(y, (3, -5), (0, 1))
        rcb = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        rcr = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        mv_o = motion_search(y.astype(np.int64), ry.astype(np.int64), 7)
        pred_o = mc_planes(
            {"y": ry.astype(np.int64), "cb": rcb.astype(np.int64),
             "cr": rcr.astype(np.int64)}, mv_o)
        mv_d, py, pcb, pcr = motion_search_mc(
            jnp.asarray(y), jnp.asarray(ry), jnp.asarray(rcb),
            jnp.asarray(rcr), 7)
        assert np.array_equal(np.asarray(mv_d), mv_o)
        # quarter-pel field: odd FULL-PEL components are mv/4 odd
        assert np.abs(mv_o).max() >= 12 and ((mv_o // 4) % 2 != 0).any()
        assert np.array_equal(np.asarray(py), pred_o["y"])
        assert np.array_equal(np.asarray(pcb), pred_o["cb"])
        assert np.array_equal(np.asarray(pcr), pred_o["cr"])


class TestTpuHalfPel:
    def subpel(self, w, h, n, seed=0):
        from tests.conftest import sinusoid_pan_frames

        return sinusoid_pan_frames(w, h, n, step=0.5, seed=seed,
                                   terms=3)

    def test_device_planes_match_oracle(self):
        import jax.numpy as jnp

        from opencv_opencl_tpu.io.h264_inter import halfpel_planes
        from opencv_opencl_tpu.ops.h264_levels import halfpel_planes_jax

        rng = np.random.default_rng(4)
        ry = rng.integers(0, 256, (48, 64), np.uint8)
        want = halfpel_planes(ry.astype(np.int64), 5)
        got = np.asarray(halfpel_planes_jax(jnp.asarray(ry), 5))
        for i, name in enumerate("Gbhj"):
            assert np.array_equal(got[i], want[i]), f"plane {name}"

    def test_halfpel_stream_byte_identical_to_oracle(self):
        w, h = 96, 64
        frames = self.subpel(w, h, 5, seed=2)
        tpu = TpuGopEncoder(w, h, qp=28, gop=5, search=4, halfpel=True)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=5, slices=h // 16,
                                 search=4, halfpel=True)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_halfpel_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.subpel(w, h, 5, seed=9)
        enc = TpuGopEncoder(w, h, qp=26, gop=5, search=4, halfpel=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "hp.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(5):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_fused_halfpel_matches_unfused(self):
        import jax.numpy as jnp

        from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
        from opencv_opencl_tpu.models.enhancer import EnhancerConfig
        from opencv_opencl_tpu.models.fused_encode import (
            build_enhance_gop_fn)

        w, h, qp, gop = 96, 64, 30, 3
        spec = FrameSpec(width=w, height=h, fps=30)
        cfg = EnhancerConfig(op="none",
                             chroma=ChromaPolicy.PASSTHROUGH)
        frames = np.stack(self.subpel(w, h, 6, seed=11))
        ref_enc = TpuGopEncoder(w, h, qp=qp, gop=gop, search=4,
                                halfpel=True)
        want = [au for f in frames for au in ref_enc.encode(f)]
        fn = build_enhance_gop_fn(cfg, spec, gop, search=4,
                                  subpel=1)
        enc = TpuGopEncoder(w, h, qp=qp, gop=gop, search=4,
                            halfpel=True)
        recon = enc.initial_recon()
        idx, got = 0, []
        for lo, hi in ((0, 4), (4, 6)):
            packed, *recon = fn(frames[lo:hi], jnp.int32(qp), idx,
                                *recon)
            idx += hi - lo
            for i in range(hi - lo):
                got.extend(enc.encode_from_packed(
                    np.asarray(packed)[i]))
        assert got == want


class TestTpuQuarterPel:
    def qsub(self, w, h, n, seed=0):
        from tests.conftest import sinusoid_pan_frames

        return sinusoid_pan_frames(w, h, n, step=0.25, seed=seed,
                                   terms=3)

    def test_device_quarter_planes_match_oracle(self):
        import jax.numpy as jnp

        from opencv_opencl_tpu.io.h264_inter import quarterpel_planes
        from opencv_opencl_tpu.ops.h264_levels import (
            quarterpel_planes_jax)

        rng = np.random.default_rng(14)
        ry = rng.integers(0, 256, (48, 64), np.uint8)
        want = quarterpel_planes(ry.astype(np.int64), 4)
        got = np.asarray(quarterpel_planes_jax(jnp.asarray(ry), 4))
        assert got.shape[0] == 16
        for i in range(16):
            assert np.array_equal(got[i], want[i]), f"plane {i}"

    def test_quarterpel_stream_byte_identical_to_oracle(self):
        w, h = 96, 64
        frames = self.qsub(w, h, 5, seed=2)
        tpu = TpuGopEncoder(w, h, qp=28, gop=5, search=3,
                            quarterpel=True)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=5, slices=h // 16,
                                 search=3, quarterpel=True)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_quarterpel_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.qsub(w, h, 5, seed=9)
        enc = TpuGopEncoder(w, h, qp=26, gop=5, search=3,
                            quarterpel=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "qp.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(5):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_make_encoder_quarterpel(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        e = make_encoder("tpu:gop=4:search=3:quarterpel", 96, 64)
        assert isinstance(e, TpuGopEncoder) and e.subpel == 2
        e2 = make_encoder("cavlc:gop=4:search=3:halfpel", 96, 64)
        assert isinstance(e2, GopCavlcEncoder) and e2.subpel == 1
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=4:quarterpel", 96, 64)
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=4:search=12:quarterpel", 96, 64)


class TestTpuFastsub:
    """Hierarchical quarter-pel search (``:fastsub``): exhaustive
    full-pel stage + one 49-offset refinement around each MB's winner
    ((2R+1)^2 + 49 SAD passes instead of (8R+1)^2).  Oracle:
    io.h264_inter.motion_search_fast; device:
    ops.h264_levels.motion_search_mc_fast (one per-MB recentering
    gather, then every refinement offset is a STATIC slice)."""

    def pan(self, w, h, n, seed=0):
        from tests.conftest import sinusoid_pan_frames

        return sinusoid_pan_frames(w, h, n, step=0.3, seed=seed,
                                   terms=3)

    def test_fastsub_stream_byte_identical_to_oracle(self):
        w, h = 96, 64
        frames = self.pan(w, h, 6, seed=4)
        tpu = TpuGopEncoder(w, h, qp=28, gop=6, search=3,
                            fastsub=True)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                                 search=3, fastsub=True)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_fastsub_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.pan(w, h, 5, seed=11)
        enc = TpuGopEncoder(w, h, qp=26, gop=5, search=3,
                            fastsub=True)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "fs.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(5):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_fastsub_quality_tracks_exhaustive(self):
        """The deviation quantification the hierarchical trade
        requires: on sub-pel panning content, fastsub P frames must
        (a) beat the full-pel-only search (the refinement is real)
        and (b) stay within 30% of the exhaustive quarter-pel
        lattice's total (the coarse-to-fine bet holds)."""
        w, h = 96, 64
        frames = self.pan(w, h, 6, seed=7)

        def total(**kw):
            enc = GopCavlcEncoder(w, h, qp=28, gop=6,
                                  slices=h // 16, search=3, **kw)
            return sum(len(a) for f in frames[1:]
                       for a in enc.encode(f))

        fast = total(fastsub=True)
        full = total()
        exh = total(quarterpel=True)
        assert fast < full, (fast, full)
        assert fast <= 1.3 * exh, (fast, exh)

    def test_fastsub_refinement_moves_off_fullpel(self):
        """The winning MVs must actually use sub-pel fractions on
        sub-pel motion (otherwise the refinement is dead code)."""
        from opencv_opencl_tpu.io.h264_inter import (
            motion_search_fast)

        frames = self.pan(96, 64, 3, seed=5)
        y0 = frames[1][:64].astype(np.int64)
        y1 = frames[2][:64].astype(np.int64)
        mv = motion_search_fast(y1, y0, 3)
        assert (mv & 3).any(), "no quarter-pel fraction chosen"
        assert np.abs(mv).max() <= 4 * 3 + 3

    def test_make_encoder_fastsub(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        e = make_encoder("tpu:gop=4:search=3:fastsub", 96, 64)
        assert isinstance(e, TpuGopEncoder) and e.subpel == 3
        e2 = make_encoder("cavlc:gop=4:search=3:fastsub", 96, 64)
        assert isinstance(e2, GopCavlcEncoder) and e2.subpel == 3
        # fastsub allows R > 11 (the quarter-pel lattice bound is a
        # candidate-count bound; fastsub's stages stay small)
        e3 = make_encoder("tpu:gop=4:search=13:fastsub", 96, 64)
        assert e3.search == 13
        with pytest.raises(ValueError, match="require"):
            make_encoder("tpu:gop=4:fastsub", 96, 64)
        with pytest.raises(ValueError, match="replaces"):
            make_encoder("tpu:gop=4:search=3:fastsub:quarterpel",
                         96, 64)
        e4 = make_encoder("tpu:gop=4:search=3:fastsub:refs=2", 96, 64)
        assert e4.subpel == 3 and e4.refs == 2

    def test_fastsub_refs2_byte_identical(self):
        """fastsub + refs=2: stage 1 picks (ref, mv) over both
        references ref-major; the refinement adjusts the vector on
        the winning reference only — device == oracle byte-exact."""
        from tests.conftest import flicker_frames

        w, h = 96, 64
        frames = flicker_frames(w, h, 6, seed=8)
        tpu = TpuGopEncoder(w, h, qp=28, gop=6, search=3,
                            fastsub=True, refs=2)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                                 search=3, fastsub=True, refs=2)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want


class TestTpuMultiRef:
    def flicker(self, w, h, n, seed=0):
        from tests.conftest import flicker_frames

        return flicker_frames(w, h, n, seed=seed)

    def test_multiref_stream_byte_identical_to_oracle(self):
        w, h = 96, 64
        frames = self.flicker(w, h, 6, seed=3)
        tpu = TpuGopEncoder(w, h, qp=28, gop=6, search=4, refs=2)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=6, slices=h // 16,
                                 search=4, refs=2)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_multiref_subpel_byte_identical(self):
        w, h = 96, 64
        frames = self.flicker(w, h, 5, seed=8)
        tpu = TpuGopEncoder(w, h, qp=28, gop=5, search=3, refs=2,
                            quarterpel=True)
        oracle = GopCavlcEncoder(w, h, qp=28, gop=5, slices=h // 16,
                                 search=3, refs=2, quarterpel=True)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want

    def test_multiref_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.flicker(w, h, 6, seed=5)
        enc = TpuGopEncoder(w, h, qp=26, gop=6, search=4, refs=2)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "mr.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(6):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_multiref_compresses_flicker(self):
        w, h = 96, 64
        frames = self.flicker(w, h, 6, seed=7)
        one = TpuGopEncoder(w, h, qp=28, gop=6, search=4)
        two = TpuGopEncoder(w, h, qp=28, gop=6, search=4, refs=2)
        s1 = [len(one.encode(f)[0]) for f in frames]
        s2 = [len(two.encode(f)[0]) for f in frames]
        assert sum(s2[2:]) * 2 < sum(s1[2:]), (s2, s1)

    def test_make_encoder_refs(self):
        from opencv_opencl_tpu.io.encoder import make_encoder

        e = make_encoder("tpu:gop=4:search=4:refs=2", 96, 64)
        assert isinstance(e, TpuGopEncoder) and e.refs == 2
        e2 = make_encoder("cavlc:gop=4:search=4:refs=2:slices=4",
                          96, 64)
        assert isinstance(e2, GopCavlcEncoder) and e2.refs == 2
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=4:refs=2", 96, 64)  # needs search
        with pytest.raises(ValueError):
            make_encoder("tpu:gop=4:search=4:refs=3", 96, 64)
        with pytest.raises(ValueError):
            make_encoder("tpu:refs=2", 96, 64)  # needs gop


class TestNativeMultiRefEntropy:
    def test_native_ref_coding_matches_oracle(self):
        """Native rows with a multi-ref field (te(v) ref_idx) equal the
        Python oracle, and the TpuGopEncoder produces identical bytes
        with native entropy forced on and off."""
        from opencv_opencl_tpu import native

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        w, h = 96, 64
        frames = TestTpuMultiRef().flicker(w, h, 5, seed=4)
        a = TpuGopEncoder(w, h, qp=28, gop=5, search=4, refs=2,
                          native="always")
        b = TpuGopEncoder(w, h, qp=28, gop=5, search=4, refs=2,
                          native="never")
        for f in frames:
            assert a.encode(f) == b.encode(f)



class TestFuzzTpuParity:
    @pytest.mark.parametrize("seed", [10, 11, 12])
    def test_random_config_byte_identical(self, seed):
        """Property fuzz: random config — TPU stream == CPU oracle."""
        rng = np.random.default_rng(seed)
        w = int(rng.integers(3, 7)) * 16
        h = int(rng.integers(3, 6)) * 16
        qp = int(rng.integers(20, 40))
        gop = int(rng.integers(2, 6))
        subpel = int(rng.integers(0, 3))
        search = int(rng.integers(1, 5)) if subpel != 2 else 2
        refs = int(rng.integers(1, 3))
        n = int(rng.integers(4, 7))
        kw = dict(qp=qp, gop=gop, search=search,
                  halfpel=subpel == 1, quarterpel=subpel == 2,
                  refs=refs)
        tpu = TpuGopEncoder(w, h, **kw)
        oracle = GopCavlcEncoder(w, h, slices=h // 16, **kw)
        base = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        frames = []
        for i in range(n):
            f = np.concatenate(
                [np.roll(base[:h], (2 * i, -i), (0, 1)), base[h:]], 0)
            if i == n - 2:
                f[h // 2:h] = rng.integers(0, 256, (h - h // 2, w),
                                           np.uint8)
            frames.append(f)
        got = [au for f in frames for au in tpu.encode(f)]
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want, (w, h, qp, gop, search, subpel, refs)


class TestIntraHorizontalInP:
    def hgrad_cut(self, w, h, n, seed=0):
        """Static noise, then a scene cut to a strong HORIZONTAL
        gradient (rows constant, columns varying... i.e. each row has
        one value -> horizontal prediction from the left column is
        near-perfect, DC is poor)."""
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        base[h:] = 128  # flat chroma: luma prediction dominates sizes
        grad = np.repeat(
            np.linspace(20, 235, h).astype(np.uint8)[:, None], w, 1)
        out = [base.copy() for _ in range(n)]
        for i in range(1, n):
            out[i] = out[i].copy()
            out[i][:h] = grad  # scene cut on every P frame
        return out

    def test_mode3_chosen_and_byte_identical(self):
        w, h = 96, 64
        frames = self.hgrad_cut(w, h, 3, seed=2)
        tpu = TpuGopEncoder(w, h, qp=30, gop=10)
        oracle = GopCavlcEncoder(w, h, qp=30, gop=10, slices=h // 16)
        got, modes = [], []
        for f in frames:
            got.extend(tpu.encode(f))
        want = [au for f in frames for au in oracle.encode(f)]
        assert got == want
        # re-run the level program to inspect the mode plane
        import jax.numpy as jnp

        from opencv_opencl_tpu.ops.h264_levels import (
            encode_levels_recon_jit, encode_p_levels_jit)

        f0, f1 = frames[0], frames[1]
        uv0 = f0[h:].reshape(h // 2, w // 2, 2)
        uv1 = f1[h:].reshape(h // 2, w // 2, 2)
        _, ry, rcb, rcr, _ = encode_levels_recon_jit(
            jnp.asarray(f0[:h]), jnp.asarray(uv0[:, :, 0]),
            jnp.asarray(uv0[:, :, 1]), jnp.int32(30))
        plv = encode_p_levels_jit(
            jnp.asarray(f1[:h]), jnp.asarray(uv1[:, :, 0]),
            jnp.asarray(uv1[:, :, 1]), ry, rcb, rcr, jnp.int32(30))
        mode = np.asarray(plv.mode)
        assert (mode == 3).any(), \
            "horizontal-gradient cut must select I_16x16 HORIZONTAL"

    def test_mode3_conformance_through_libavcodec(self, tmp_path):
        import cv2

        w, h = 96, 64
        frames = self.hgrad_cut(w, h, 3, seed=5)
        enc = TpuGopEncoder(w, h, qp=26, gop=10)
        aus, recons = [], []
        for f in frames:
            aus.append(enc.encode(f)[0])
            recons.append(np.asarray(enc._recon[0]).copy())
        p = tmp_path / "ih.h264"
        p.write_bytes(b"".join(aus) + aus[-1])
        cap = cv2.VideoCapture(str(p))
        assert cap.isOpened()
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i in range(3):
            ok, d = cap.read()
            assert ok
            assert np.array_equal(d[:h, :w], recons[i][:h, :w]), i
        cap.release()

    def test_h_mode_compresses_horizontal_gradients(self):
        """The intra fallback on a gradient cut must ride the H
        candidate: the P frame stays bounded by the (equally
        H-capable) intra encoder's frame, and re-encoding the SAME
        gradient against a matching reference collapses to skips —
        i.e. the H-coded fallback reconstruction is faithful."""
        from opencv_opencl_tpu.io.h264_cavlc import CavlcH264Encoder

        w, h = 96, 64
        frames = self.hgrad_cut(w, h, 3, seed=7)
        gop = GopCavlcEncoder(w, h, qp=30, gop=10)
        gop.encode(frames[0])
        p_size = len(gop.encode(frames[1])[0])
        i_size = len(CavlcH264Encoder(w, h, qp=30).encode(frames[1])[0])
        assert p_size <= 1.05 * i_size, (p_size, i_size)
        # frame 2 repeats the gradient: near-total skip after the
        # H-mode fallback reconstructed it well
        p2_size = len(gop.encode(frames[2])[0])
        assert p2_size < 0.2 * p_size, (p2_size, p_size)

    def test_native_entropy_handles_mode3(self):
        from opencv_opencl_tpu import native

        if not (native.available()
                and hasattr(native._load(), "fp_cavlc_entropy_rows_p")):
            pytest.skip("native runtime unavailable")
        w, h = 96, 64
        frames = self.hgrad_cut(w, h, 3, seed=9)
        a = TpuGopEncoder(w, h, qp=30, gop=10, native="always")
        b = TpuGopEncoder(w, h, qp=30, gop=10, native="never")
        for f in frames:
            assert a.encode(f) == b.encode(f)
