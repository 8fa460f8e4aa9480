"""Multi-chip fused enhance+encode (parallel/sharded_encode): the
GOP-per-device data-parallel stream must be BYTE-IDENTICAL to the
sequential single-chip encoder at equal qp — GOPs are independent
encode units (every IDR ignores the incoming recon), so sharding whole
GOPs over the mesh changes nothing in the emitted bits.

Runs on the virtual 8-device CPU mesh (tests/conftest.py), the same
mechanism the driver's dryrun_multichip uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder, TpuGopEncoder
from opencv_opencl_tpu.models.enhancer import EnhancerConfig, build_enhance_fn
from opencv_opencl_tpu.parallel.mesh import make_mesh
from opencv_opencl_tpu.parallel.sharded_encode import (
    build_mesh_gop_fn, build_mesh_levels_fn, pad_batch_for_mesh)

W, H, QP = 64, 48, 30


def _frames(n: int, w: int = W, h: int = H) -> np.ndarray:
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (h, w), np.uint8)
    base = (base.reshape(h // 4, 4, w // 4, 4).mean((1, 3))
            .astype(np.uint8).repeat(4, 0).repeat(4, 1))
    uvb = rng.integers(96, 160, (h // 2, w), np.uint8)
    return np.stack([
        np.concatenate([np.roll(base, 2 * i, 1),
                        np.roll(uvb, 2 * i, 1)], 0)
        for i in range(n)])


def _cfg() -> EnhancerConfig:
    return EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                          chroma=ChromaPolicy.PASSTHROUGH)


def _sequential_aus(frames: np.ndarray, spec: FrameSpec,
                    **enc_kw) -> list[bytes]:
    """Ground truth: plain enhance program + sequential TpuGopEncoder."""
    plain = build_enhance_fn(_cfg(), spec, donate=False)
    enh = np.asarray(plain(frames))
    enc = TpuGopEncoder(W, H, qp=QP, **enc_kw)
    return [au for f in enh for au in enc.encode(f)]


def _mesh_aus(frames: np.ndarray, spec: FrameSpec, mesh,
              **enc_kw) -> list[bytes]:
    enc = TpuGopEncoder(W, H, qp=QP, **enc_kw)
    fn, sharding, unit = build_mesh_gop_fn(
        _cfg(), spec, enc.gop, mesh, search=enc.search,
        subpel=enc.subpel, refs=enc.refs, deblock=enc.deblock,
        bitpack=(enc._nw_mb if enc._bitpack else 0),
        parts=enc.parts)
    ndev = len(mesh.devices.flat)
    padded, real = pad_batch_for_mesh(frames, ndev, unit)
    packed = np.asarray(fn(jax.device_put(padded, sharding),
                           jnp.int32(QP)))[:real]
    return [au for i in range(real)
            for au in enc.encode_from_packed(packed[i])]


@pytest.mark.parametrize("enc_kw", [
    dict(gop=3, search=2),
    dict(gop=3, search=2, fastsub=True),
    dict(gop=4, search=2, refs=2),
    dict(gop=3, deblock=True),
    dict(gop=3, search=2, bitpack=True, nw_mb=64),
    dict(gop=3, search=2, parts=True),
    dict(gop=3, search=2, refs=2, parts=True),
], ids=["search", "fastsub", "refs2", "deblock", "bitpack", "parts",
        "parts_refs2"])
def test_mesh_gop_byte_identical(enc_kw):
    spec = FrameSpec(width=W, height=H, fps=30)
    mesh = make_mesh(8)
    n = 8 * enc_kw["gop"]  # one GOP per device
    frames = _frames(n)
    want = _sequential_aus(frames, spec, **enc_kw)
    got = _mesh_aus(frames, spec, mesh, **enc_kw)
    assert got == want


def test_mesh_gop_ragged_tail_pad_and_drop():
    """A final partial batch pads with repeats and drops the padded
    outputs — byte-identical because the steps are stateless and the
    scan is causal."""
    spec = FrameSpec(width=W, height=H, fps=30)
    mesh = make_mesh(8)
    frames = _frames(8 * 3 - 5)  # 19 frames: last device gets 1/3 GOP
    want = _sequential_aus(frames, spec, gop=3, search=2)
    got = _mesh_aus(frames, spec, mesh, gop=3, search=2)
    assert got == want


def test_mesh_gop_multiple_gops_per_device():
    spec = FrameSpec(width=W, height=H, fps=30)
    mesh = make_mesh(shape=(2, 2))  # subset of the virtual devices
    frames = _frames(4 * 2 * 3)  # two 3-frame GOPs per device
    want = _sequential_aus(frames, spec, gop=3, search=2)
    got = _mesh_aus(frames, spec, mesh, gop=3, search=2)
    assert got == want


def test_mesh_gop_matches_cpu_oracle():
    """Triangulate: mesh stream == the pure-numpy CPU oracle fed the
    device-enhanced frames (not just the device encoder)."""
    spec = FrameSpec(width=W, height=H, fps=30)
    mesh = make_mesh(8)
    frames = _frames(8 * 3)
    plain = build_enhance_fn(_cfg(), spec, donate=False)
    enh = np.asarray(plain(frames))
    oracle = GopCavlcEncoder(W, H, qp=QP, gop=3, search=2,
                             slices=-(-H // 16))
    want = [au for f in enh for au in oracle.encode(f)]
    got = _mesh_aus(frames, spec, mesh, gop=3, search=2)
    assert got == want


def test_mesh_intra_byte_identical():
    """All-intra mesh path (unit=1): every frame an independent unit."""
    from opencv_opencl_tpu.io.h264_cavlc import TpuCavlcEncoder

    spec = FrameSpec(width=W, height=H, fps=30)
    mesh = make_mesh(8)
    frames = _frames(12)  # ragged: 12 % 8 != 0 exercises the pad
    plain = build_enhance_fn(_cfg(), spec, donate=False)
    enh = np.asarray(plain(frames))
    seq = TpuCavlcEncoder(W, H, qp=QP)
    want = [au for f in enh for au in seq.encode(f)]

    enc = TpuCavlcEncoder(W, H, qp=QP)
    fn, sharding, unit = build_mesh_levels_fn(_cfg(), spec, mesh)
    padded, real = pad_batch_for_mesh(frames, 8, unit)
    packed = np.asarray(fn(jax.device_put(padded, sharding),
                           jnp.int32(QP)))[:real]
    got = [au for i in range(real)
           for au in enc.encode_from_packed(packed[i])]
    assert got == want


# ---------------------------------------------------- spatial banding

def _shear_frames(n, w, h):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h, w), np.uint8)
    base = (base.reshape(h // 4, 4, w // 4, 4).mean((1, 3))
            .astype(np.uint8).repeat(4, 0).repeat(4, 1))
    uvb = rng.integers(96, 160, (h // 2, w), np.uint8)
    out = []
    for i in range(n):
        y = base.copy()
        y[:h // 2 + 8] = np.roll(base[:h // 2 + 8], 3 * i, 1)
        y[h // 2 + 8:] = np.roll(base[h // 2 + 8:], -3 * i, 1)
        out.append(np.concatenate([y, np.roll(uvb, 2 * i, 1)], 0))
    return out


@pytest.mark.parametrize("kw", [
    dict(search=4),
    dict(search=4, halfpel=True),
    dict(search=2, quarterpel=True),
    dict(search=4, parts=True),
    dict(search=4, overlap=True),
    dict(search=3, refs=2),
    dict(search=3, refs=2, parts=True),
], ids=["full", "half", "qpel", "parts", "overlap", "refs2",
        "parts_refs2"])
def test_banded_byte_identical(kw):
    """Slice-band spatial sharding (per-frame LATENCY scaling): the
    halo-windowed band program must stream byte-identical to the
    single-chip encoder — MB rows shard over all 8 virtual devices."""
    from opencv_opencl_tpu.parallel.sharded_encode import (
        BandedTpuGopEncoder)

    w, h, n = 64, 128, 6                   # mb_h = 8 = device count
    frames = _shear_frames(n, w, h)
    mesh = make_mesh(8)
    banded = BandedTpuGopEncoder(w, h, mesh, qp=QP, gop=n, **kw)
    plain = TpuGopEncoder(w, h, qp=QP, gop=n, **kw)
    got = [au for f in frames for au in banded.encode(f)]
    got += banded.flush()
    want = [au for f in frames for au in plain.encode(f)]
    want += plain.flush()
    assert got == want


def test_banded_refusals():
    from opencv_opencl_tpu.parallel.sharded_encode import (
        BandedTpuGopEncoder)

    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="search"):
        BandedTpuGopEncoder(64, 128, mesh, gop=4, search=0)
    with pytest.raises(ValueError, match="divisible"):
        BandedTpuGopEncoder(64, 48, mesh, gop=4, search=4)  # mb_h 3
