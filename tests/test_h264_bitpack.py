"""Device CAVLC bit-packing (ops/h264_bitpack.py).

Contract: the device-packed bitstrings are BYTE-IDENTICAL to the host
entropy stage (io.h264_cavlc.encode_frame_from_levels) at every level
— block tokens, whole frames, the TpuCavlcEncoder(bitpack=True)
stream — and the ``nw_mb`` transfer-cap overflow falls back to the
host path with unchanged bytes.  (Reference analogue: the VCU's
entropy engine is part of the hardware encoder —
``OpenCVequalHist.cpp:308-332`` never touches CAVLC on the CPU.)
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.io.h264_cavlc import (TpuCavlcEncoder,
                                             _slice_head_cavlc,
                                             _write_residual_block,
                                             encode_frame_from_levels)
from opencv_opencl_tpu.io.h264_pcm import _BitWriter


def oracle_block_bits(coeffs, nc):
    w = _BitWriter()
    _write_residual_block(w, [int(c) for c in coeffs], nc)
    return list(w._bits)


def device_block_bits(batch, nc, C, cdc):
    import jax.numpy as jnp

    from opencv_opencl_tpu.ops.h264_bitpack import (block_tokens,
                                                    pack_tokens)

    v, l = block_tokens(jnp.asarray(batch), jnp.asarray(nc), C, cdc)
    words, nb = pack_tokens(v, l, 20)
    words, nb = np.asarray(words), np.asarray(nb)
    out = []
    for b in range(len(batch)):
        bits = np.unpackbits(words[b].astype(">u4").view(np.uint8))
        out.append(list(bits[: nb[b]]))
    return out


class TestBlockTokens:
    @pytest.mark.parametrize("C,cdc,ncs", [
        (16, False, (0, 1, 2, 3, 5, 8, 20)),
        (15, False, (0, 1, 2, 3, 5, 8, 20)),
        (4, True, (-1,)),
    ], ids=["lumaDC", "AC15", "chromaDC"])
    def test_random_blocks_byte_identical(self, C, cdc, ncs):
        rng = np.random.default_rng(C)
        batch, ncv, want = [], [], []
        for _ in range(200):
            n = rng.integers(0, C + 1)
            coeffs = np.zeros(C, np.int64)
            pos = rng.choice(C, size=n, replace=False)
            mag = rng.choice([1, 1, 1, 2, 3, 7, 15, 100, 2063], size=n)
            coeffs[pos] = mag * rng.choice([-1, 1], size=n)
            nc = ncs[rng.integers(0, len(ncs))]
            batch.append(coeffs)
            ncv.append(max(nc, 0))
            want.append(oracle_block_bits(coeffs, -1 if cdc else nc))
        got = device_block_bits(np.stack(batch), np.asarray(ncv), C,
                                cdc)
        assert got == want


class TestFramePack:
    def levels_of(self, w, h, qp, seed):
        import jax.numpy as jnp

        from opencv_opencl_tpu.ops.h264_levels import encode_levels

        rng = np.random.default_rng(seed)
        y = rng.integers(0, 256, (h, w), np.uint8)
        cb = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        cr = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        lv, imode = encode_levels(jnp.asarray(y), jnp.asarray(cb),
                                  jnp.asarray(cr), jnp.int32(qp))
        return ([np.asarray(a) for a in
                 (lv.zdc, lv.acz, lv.czdc, lv.cacz)],
                np.asarray(imode))

    @pytest.mark.parametrize("qp", [22, 30, 42])
    def test_frame_byte_identical_to_host_entropy(self, qp):
        import jax.numpy as jnp

        from opencv_opencl_tpu.ops.h264_bitpack import (
            assemble_slices_from_bits, pack_i_mbs)

        w, h = 96, 64
        (zdc, acz, czdc, cacz), imode = self.levels_of(w, h, qp, qp)
        want = encode_frame_from_levels(zdc, acz, czdc, cacz, qp,
                                        idr_pic_id=0, imode=imode)
        # random noise at qp 22 exceeds the default 64-word cap (the
        # overflow signal the encoder's fallback keys on — asserted in
        # TestBitpackEncoder); the raw packer test uses a roomy cap
        words, nbits = pack_i_mbs(
            jnp.asarray(zdc), jnp.asarray(acz), jnp.asarray(czdc),
            jnp.asarray(cacz), jnp.asarray(imode), nw_mb=128)
        assert int(np.asarray(nbits).max()) <= 128 * 32
        mbw = w // 16

        def header_fn(mby):
            bw = _BitWriter()
            _slice_head_cavlc(bw, 0, qp, first_mb=mby * mbw)
            return bw

        got = assemble_slices_from_bits(np.asarray(words),
                                        np.asarray(nbits), header_fn)
        assert [bytes(n) for n in got] == [bytes(n) for n in want]


class TestPFramePack:
    def test_p_frame_byte_identical_to_host_entropy(self):
        """Direct pack_p_mbs vs encode_frame_p_from_levels on a frame
        mixing skip, inter and intra-in-P MBs (eager, no jit)."""
        import jax.numpy as jnp

        from opencv_opencl_tpu.io.h264_inter import (
            _slice_head_p, encode_frame_p_from_levels)
        from opencv_opencl_tpu.ops.h264_bitpack import (
            assemble_slices_from_bits, pack_p_mbs)
        from opencv_opencl_tpu.ops.h264_levels import (encode_levels,
                                                       encode_p_levels)

        rng = np.random.default_rng(6)
        w, h, qp = 96, 64, 30
        mbw = w // 16
        y0 = rng.integers(0, 256, (h, w), np.uint8)
        cb0 = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        cr0 = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        out = encode_levels(jnp.asarray(y0), jnp.asarray(cb0),
                            jnp.asarray(cr0), jnp.int32(qp),
                            full_recon=True)
        ry, rcb, rcr = out[1], out[2], out[3]
        # static background (skips) + moved band (inter) + noise strip
        # (intra)
        y1 = np.asarray(ry).copy()
        y1[16:32] = np.roll(y1[16:32], 2, 1)
        y1[48:64] = rng.integers(0, 256, (16, w), np.uint8)
        plv = encode_p_levels(jnp.asarray(y1), rcb, rcr, ry, rcb, rcr,
                              jnp.int32(qp), 2, 0)
        mode = np.asarray(plv.mode)
        assert set(np.unique(mode)) >= {0, 1}  # skips AND coded MBs
        want = encode_frame_p_from_levels(
            mode, np.asarray(plv.zdc), np.asarray(plv.acz),
            np.asarray(plv.czdc), np.asarray(plv.cacz), qp, 1,
            mv=np.asarray(plv.mv), ref=None, active_refs=1)
        words, nbits = pack_p_mbs(plv.mode, plv.zdc, plv.acz,
                                  plv.czdc, plv.cacz, plv.mv, None,
                                  jnp.int32(1))

        def header_fn(mby):
            bw = _BitWriter()
            _slice_head_p(bw, qp, 1, first_mb=mby * mbw,
                          active_refs=1)
            return bw

        def tail_fn(mby):
            run = 0
            for mbx in range(mbw - 1, -1, -1):
                if mode[mby, mbx] == 0:
                    run += 1
                else:
                    break
            if not run:
                return None
            bw = _BitWriter()
            bw.ue(run)
            return bw

        got = assemble_slices_from_bits(np.asarray(words),
                                        np.asarray(nbits),
                                        header_fn, tail_fn)
        assert [bytes(n) for n in got] == [bytes(n) for n in want]


class TestBitpackEncoder:
    @pytest.mark.parametrize("w,h", [(96, 64), (100, 56)])
    def test_stream_byte_identical(self, w, h):
        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
                  for _ in range(3)]
        plain = TpuCavlcEncoder(w, h, qp=30)
        packed = TpuCavlcEncoder(w, h, qp=30, bitpack=True)
        want = [au for f in frames for au in plain.encode(f)]
        got = [au for f in frames for au in packed.encode(f)]
        assert got == want

    def test_overflow_falls_back_byte_identical(self):
        rng = np.random.default_rng(9)
        w, h = 96, 64
        frames = [rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
                  for _ in range(2)]
        plain = TpuCavlcEncoder(w, h, qp=24)
        # 4-word cap = 128 bits: random noise at qp 24 overflows every
        # frame, exercising the host-entropy fallback
        tiny = TpuCavlcEncoder(w, h, qp=24, bitpack=True, nw_mb=4)
        want = [au for f in frames for au in plain.encode(f)]
        got = [au for f in frames for au in tiny.encode(f)]
        assert got == want

    def test_overlap_and_deblock_compose(self):
        rng = np.random.default_rng(11)
        w, h = 96, 64
        frames = [rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
                  for _ in range(4)]
        plain = TpuCavlcEncoder(w, h, qp=32, deblock=True)
        want = [au for f in frames for au in plain.encode(f)]
        pipe = TpuCavlcEncoder(w, h, qp=32, deblock=True,
                               bitpack=True, overlap=True)
        got = [au for f in frames for au in pipe.encode(f)]
        got += pipe.flush()
        assert got == want

    def test_conformance_through_libavcodec(self, tmp_path):
        import cv2

        rng = np.random.default_rng(13)
        w, h = 96, 64
        enc = TpuCavlcEncoder(w, h, qp=28, bitpack=True)
        aus = []
        for _ in range(3):
            f = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
            aus.extend(enc.encode(f))
        p = tmp_path / "bp.h264"
        p.write_bytes(b"".join(aus))
        cap = cv2.VideoCapture(str(p))
        n = 0
        while True:
            ok, _ = cap.read()
            if not ok:
                break
            n += 1
        cap.release()
        assert n == 3

    def test_make_encoder_bitpack(self):
        from opencv_opencl_tpu.io.encoder import make_encoder
        from opencv_opencl_tpu.io.h264_inter import TpuGopEncoder

        e = make_encoder("tpu:qp=30:bitpack", 96, 64)
        assert isinstance(e, TpuCavlcEncoder) and e._bitpack
        e2 = make_encoder("tpu:qp=30:gop=4:search=2:bitpack", 96, 64)
        assert isinstance(e2, TpuGopEncoder) and e2._bitpack
        e3 = make_encoder("tpu:qp=30:gdr=3:bitpack", 96, 64)
        assert isinstance(e3, TpuGopEncoder) and e3._bitpack


class TestGopBitpack:
    """P-slice device bit-packing: the full GOP stream (skip runs,
    mvd against the left-only predictor, te(v) ref_idx, inter CBP
    me(v), intra-in-P, GDR bands, deblock headers) must be
    byte-identical with and without the device packer; an overflow
    falls back to the host rows."""

    def frames_of(self, w, h, n, seed=5):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
        out = []
        for i in range(n):
            f = np.concatenate(
                [np.roll(base[:h], 3 * i, 1),
                 np.roll(base[h:], 3 * i, 1)], 0)
            if i == n - 2:  # scene cut: intra-in-P MBs
                f = rng.integers(0, 256, (h * 3 // 2, w), np.uint8)
            out.append(f)
        return out

    @staticmethod
    def stream(enc, frames):
        out = [au for f in frames for au in enc.encode(f)]
        return out + enc.flush()

    @pytest.mark.parametrize("kw", [
        {"gop": 4, "search": 2},
        {"gdr": 3, "search": 2, "deblock": True},
        {"gop": 6, "search": 2, "refs": 2},
    ], ids=["gop-search", "gdr-deblock", "refs2"])
    def test_gop_stream_byte_identical(self, kw):
        from opencv_opencl_tpu.io.h264_inter import TpuGopEncoder

        w, h = 96, 64
        frames = self.frames_of(w, h, 6)
        want = self.stream(TpuGopEncoder(w, h, qp=30, **kw), frames)
        got = self.stream(
            TpuGopEncoder(w, h, qp=30, bitpack=True, **kw), frames)
        assert got == want

    def test_fused_bitpack_byte_identical(self):
        """enhance -> GOP encode -> CAVLC bit-packing as ONE device
        program: the bits lanes ride the fused tensor and the stream
        equals the unfused plain encoder's."""
        import jax.numpy as jnp

        from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
        from opencv_opencl_tpu.io.h264_inter import TpuGopEncoder
        from opencv_opencl_tpu.models.enhancer import (EnhancerConfig,
                                                       build_enhance_fn)
        from opencv_opencl_tpu.models.fused_encode import (
            build_enhance_gop_fn)

        w, h, qp = 96, 64, 30
        spec = FrameSpec(width=w, height=h, fps=30)
        cfg = EnhancerConfig(op="clahe",
                             chroma=ChromaPolicy.PASSTHROUGH)
        rng = np.random.default_rng(44)
        frames = rng.integers(0, 256, (6, h * 3 // 2, w), np.uint8)
        for i in range(1, 6):
            frames[i] = frames[i - 1].copy()
            frames[i][5:25, 8 + 4 * i:40 + 4 * i] ^= 0x5A
        plain = build_enhance_fn(cfg, spec, donate=False)
        enh = np.asarray(plain(frames))
        ref_enc = TpuGopEncoder(w, h, qp=qp, gop=3, search=2)
        want = [au for f in enh for au in ref_enc.encode(f)]
        enc = TpuGopEncoder(w, h, qp=qp, gop=3, search=2,
                            bitpack=True)
        fn = build_enhance_gop_fn(cfg, spec, enc.gop,
                                  search=enc.search,
                                  bitpack=enc._nw_mb)
        recon = list(enc.initial_recon())
        got, idx = [], 0
        for lo, hi in ((0, 4), (4, 6)):
            packed, *recon = fn(frames[lo:hi], jnp.int32(qp), idx,
                                *recon)
            idx += hi - lo
            for i in range(hi - lo):
                got.extend(enc.encode_from_packed(
                    np.asarray(packed)[i]))
        assert got == want

    def test_fused_intra_bitpack_and_overflow(self):
        """build_enhance_levels_fn + bitpack lanes, plus the overflow
        fallback through the fused tensor's level lanes."""
        import jax.numpy as jnp

        from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
        from opencv_opencl_tpu.models.enhancer import (EnhancerConfig,
                                                       build_enhance_fn)
        from opencv_opencl_tpu.models.fused_encode import (
            build_enhance_levels_fn)

        w, h, qp = 96, 64, 30
        spec = FrameSpec(width=w, height=h, fps=30)
        cfg = EnhancerConfig(op="histeq",
                             chroma=ChromaPolicy.PASSTHROUGH)
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (3, h * 3 // 2, w), np.uint8)
        plain = build_enhance_fn(cfg, spec, donate=False)
        enh = np.asarray(plain(frames))
        ref_enc = TpuCavlcEncoder(w, h, qp=qp)
        want = [au for f in enh for au in ref_enc.encode(f)]
        for nw in (64, 3):      # roomy cap; 3-word cap = overflow
            enc = TpuCavlcEncoder(w, h, qp=qp, bitpack=True,
                                  nw_mb=nw)
            fn = build_enhance_levels_fn(cfg, spec, bitpack=nw)
            packed = np.asarray(fn(frames, jnp.int32(qp)))
            got = [au for i in range(3)
                   for au in enc.encode_from_packed(packed[i])]
            assert got == want, nw

    def test_gop_overflow_falls_back(self):
        from opencv_opencl_tpu.io.h264_inter import TpuGopEncoder

        w, h = 96, 64
        frames = self.frames_of(w, h, 4, seed=9)
        want = self.stream(
            TpuGopEncoder(w, h, qp=24, gop=4, search=2), frames)
        got = self.stream(
            TpuGopEncoder(w, h, qp=24, gop=4, search=2, bitpack=True,
                          nw_mb=3), frames)
        assert got == want
