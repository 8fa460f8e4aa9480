"""North-star benchmark: NV12 4K CLAHE(+histEq) frames/sec per TPU chip.

BASELINE.md: "bit-exact (+/-1 LSB) CLAHE + equalizeHist on NV12 4K frames at
>=60 FPS sustained per TPU chip, including host transfer".  The reference
hardware (ZCU106 FPGA) targeted 3840x2160@60 with its HLS kernel; the
baseline value here is that 60 FPS design target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Run on the real TPU (do NOT set JAX_PLATFORMS=cpu).  Keep this process the
only TPU user while it runs.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_stream(fn, frames, batch: int, depth: int, seconds: float) -> tuple[int, float]:
    """Sustained pipelined throughput: keep `depth` batches in flight,
    materializing results to host (the full host->HBM->host loop)."""
    n_batches = frames.shape[0] // batch
    inflight = []
    done = 0
    t0 = time.perf_counter()
    i = 0
    while True:
        x = frames[(i % n_batches) * batch : (i % n_batches) * batch + batch]
        inflight.append(fn(x))
        i += 1
        if len(inflight) >= depth:
            out = inflight.pop(0)
            np.asarray(out)  # blocks: device done + D2H
            done += batch
            if time.perf_counter() - t0 > seconds:
                break
    for out in inflight:
        np.asarray(out)
        done += batch
    dt = time.perf_counter() - t0
    return done, dt


def main() -> None:
    import jax

    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import EnhancerConfig, build_enhance_fn

    width, height = 3840, 2160
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    spec = FrameSpec(width=width, height=height, fps=60)
    cfg = EnhancerConfig(
        op="clahe", clip_limit=2.0, tile_grid=(8, 8),
        chroma=ChromaPolicy.PASSTHROUGH,
    )
    fn = build_enhance_fn(cfg, spec)

    rng = np.random.default_rng(0)
    # 2 distinct batches so the device can't cache anything frame-specific
    frames = rng.integers(
        0, 256, (batch * 2, spec.buffer_rows, width), dtype=np.uint8
    )

    # warm up / compile
    np.asarray(fn(frames[:batch]))

    done, dt = bench_stream(fn, frames, batch=batch, depth=2, seconds=seconds)
    fps = done / dt

    print(
        json.dumps(
            {
                "metric": "nv12_4k_clahe_fps_per_chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
                "detail": {
                    "config": "CLAHE clip=2.0 8x8 + chroma passthrough, "
                              "NV12 3840x2160, incl. host transfer both ways",
                    "batch": batch,
                    "frames": done,
                    "seconds": round(dt, 2),
                    "device": str(jax.devices()[0]),
                    "p50_batch_ms": round(dt / max(done // batch, 1) * 1e3, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
