"""Hardware timing of the fused enhance+GOP-encode program chain
(models/fused_encode.build_enhance_gop_fn): CLAHE 2.0 8x8 + low-delay-P
H.264 level computation with device-resident reconstruction, batch 4.

The chained loop feeds each batch's recon back into the next call — the
real streaming dependency — so the number is the honest steady-state
per-frame device cost of the WHOLE encoder front half (enhance +
prediction + transforms + quant + mode decisions + recon).

    python scripts/tpu_r3_fused_gop.py

Writes scripts/tpu_r3_fused_gop.json.
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
from opencv_opencl_tpu.models.enhancer import EnhancerConfig
from opencv_opencl_tpu.models.fused_encode import build_enhance_gop_fn

BATCH = 4
CHAIN = 48
QP = 30
GOP = 32


def measure(width: int, height: int) -> dict:
    spec = FrameSpec(width=width, height=height, fps=30)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)
    fused = build_enhance_gop_fn(cfg, spec, GOP)
    h16 = -(-height // 16) * 16
    w16 = -(-width // 16) * 16
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(
        0, 256, (BATCH, height * 3 // 2, width), np.uint8))
    r0 = (jnp.zeros((h16, w16), jnp.uint8),
          jnp.zeros((h16 // 2, w16 // 2), jnp.uint8),
          jnp.zeros((h16 // 2, w16 // 2), jnp.uint8))

    @jax.jit
    def chained(batch, n, ry, rcb, rcr):
        def body(i, st):
            b, ry, rcb, rcr = st
            packed, ry, rcb, rcr = fused(b, jnp.int32(QP),
                                         i * BATCH, ry, rcb, rcr)
            bump = (jnp.sum(packed[..., 409].astype(jnp.int32)) & 1
                    ).astype(jnp.uint8)
            return (b + bump, ry, rcb, rcr)

        b, ry, rcb, rcr = jax.lax.fori_loop(0, n, body,
                                            (batch, ry, rcb, rcr))
        return jnp.sum(b.astype(jnp.int32)) + jnp.sum(
            ry.astype(jnp.int32))

    t0 = time.perf_counter()
    _ = int(chained(batch, 1, *r0))
    compile_s = time.perf_counter() - t0
    print(f"{width}x{height}: compiled in {compile_s:.1f}s", flush=True)

    def one_sample() -> float:
        t0 = time.perf_counter()
        _ = int(chained(batch, 1, *r0))
        t1 = time.perf_counter()
        _ = int(chained(batch, CHAIN + 1, *r0))
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
    print(f"{width}x{height}: {ms:.3f} ms/frame fused enhance+GOP "
          f"({1e3 / ms:.1f} fps, spread {spread:.1f}%)", flush=True)
    return {"width": width, "height": height, "qp": QP, "gop": GOP,
            "batch": BATCH, "ms_per_frame": round(ms, 4),
            "fps": round(1e3 / ms, 1), "spread_pct": round(spread, 1),
            "chain": CHAIN, "compile_s": round(compile_s, 1)}


def main() -> None:
    out = {"what": "fused enhance(CLAHE)+GOP H.264 levels device "
                   "ms/frame (chained with recon feedback, qp=30, "
                   "gop=32, batch=4)",
           "geometries": [measure(1920, 1080), measure(3840, 2160)]}
    with open("scripts/tpu_r3_fused_gop.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
