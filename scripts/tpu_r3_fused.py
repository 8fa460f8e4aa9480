"""Hardware validation of the fused enhance+encode program
(models/fused_encode.py): chained device timing at 1080p/4K (batch 4,
CLAHE 2.0 8x8) + byte-identity of the assembled AU against the pure-CPU
CAVLC oracle on a padded geometry (1918x1078).

    python scripts/tpu_r3_fused.py

Writes scripts/tpu_r3_fused.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
from opencv_opencl_tpu.models.enhancer import EnhancerConfig, build_enhance_fn
from opencv_opencl_tpu.models.fused_encode import build_enhance_levels_fn

BATCH = 4
CHAIN = 64
QP = 30


def cfg_for():
    return EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                          chroma=ChromaPolicy.PASSTHROUGH)


def measure(width: int, height: int) -> dict:
    spec = FrameSpec(width=width, height=height, fps=30)
    fused = build_enhance_levels_fn(cfg_for(), spec)
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(
        0, 256, (BATCH, height * 3 // 2, width), np.uint8))

    @jax.jit
    def chained(batch, n):
        def body(i, b):
            packed = fused(b, jnp.int32(QP))
            bump = (jnp.sum(packed[..., 0].astype(jnp.int32)) & 1
                    ).astype(jnp.uint8)
            return b + bump

        out = jax.lax.fori_loop(0, n, body, batch)
        return jnp.sum(out.astype(jnp.int32))

    t0 = time.perf_counter()
    _ = int(chained(batch, 1))
    compile_s = time.perf_counter() - t0
    print(f"{width}x{height}: compiled in {compile_s:.1f}s", flush=True)

    def one_sample() -> float:
        t0 = time.perf_counter()
        _ = int(chained(batch, 1))
        t1 = time.perf_counter()
        _ = int(chained(batch, CHAIN + 1))
        t2 = time.perf_counter()
        return max(((t2 - t1) - (t1 - t0)) / (CHAIN * BATCH), 1e-9)

    prev = one_sample()
    for _ in range(11):
        cur = one_sample()
        if abs(cur - prev) / max(cur, prev) < 0.02:
            prev = cur
            break
        prev = cur
    samples = sorted(one_sample() for _ in range(5))
    ms = samples[2] * 1e3
    spread = (samples[-1] - samples[0]) / samples[2] * 100.0
    print(f"{width}x{height}: {ms:.3f} ms/frame fused enhance+encode "
          f"({1e3 / ms:.1f} fps, spread {spread:.1f}%)", flush=True)
    return {"width": width, "height": height, "qp": QP, "batch": BATCH,
            "ms_per_frame": round(ms, 4), "fps": round(1e3 / ms, 1),
            "spread_pct": round(spread, 1), "chain": CHAIN,
            "compile_s": round(compile_s, 1)}


def parity(width: int, height: int) -> dict:
    """Fused-on-TPU AU vs enhance-on-TPU -> pure-CPU CAVLC oracle."""
    from opencv_opencl_tpu.io.h264_cavlc import (
        CavlcH264Encoder, TpuCavlcEncoder)

    spec = FrameSpec(width=width, height=height, fps=30)
    cfg = cfg_for()
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, height * 3 // 2, width), np.uint8)

    fused = build_enhance_levels_fn(cfg, spec)
    packed = np.asarray(fused(frames, jnp.int32(QP)))
    enc = TpuCavlcEncoder(width, height, qp=QP)
    got = [au for i in range(2) for au in enc.encode_from_packed(packed[i])]

    plain = build_enhance_fn(cfg, spec, donate=False)
    enh = np.asarray(plain(frames))
    mb_h = -(-height // 16)
    oracle = CavlcH264Encoder(width, height, qp=QP, slices=mb_h)
    want = [au for f in enh for au in oracle.encode(f)]
    ok = got == want
    print(f"{width}x{height}: fused AU vs CPU oracle byte-identical: {ok}",
          flush=True)
    return {"width": width, "height": height, "frames": 2,
            "byte_identical": bool(ok),
            "au_bytes": [len(a) for a in got]}


def main() -> None:
    out = {"what": "fused enhance(CLAHE 2.0 8x8)+encode device ms/frame "
                   "(chained, qp=30, batch=4) + AU parity vs CPU oracle",
           "parity": parity(1918, 1078),
           "geometries": [measure(1920, 1080), measure(3840, 2160)]}
    if not out["parity"]["byte_identical"]:
        raise SystemExit("PARITY FAILURE")
    with open("scripts/tpu_r3_fused.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
