"""Hardware timing of the TPU CAVLC levels program (ops/h264_levels.py).

Chained data-dependent fori_loop (bench.py discipline: axon's
block_until_ready is async, so honest device time = chained steps with a
scalar fetch), sustained-warmup + median-of-5.  Run on the real chip:

    python scripts/tpu_r3_h264_levels.py

Writes scripts/tpu_r3_h264_levels.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from opencv_opencl_tpu.ops.h264_levels import encode_levels

CHAIN = 256  # sub-ms steps need long chains on the jittery tunnel
QP = 30


def measure(width: int, height: int) -> dict:
    h16 = -(-height // 16) * 16
    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (h16, width), np.uint8))
    cb = jax.device_put(
        rng.integers(0, 256, (h16 // 2, width // 2), np.uint8))
    cr = jax.device_put(
        rng.integers(0, 256, (h16 // 2, width // 2), np.uint8))

    @jax.jit
    def chained(y, n):
        def body(i, y):
            lv, _ = encode_levels(y, cb, cr, jnp.int32(QP))
            # data-dependent feedback so step i+1 cannot start before
            # step i finishes (the axon timing rule)
            bump = (jnp.sum(lv.zdc.astype(jnp.int32)) & 1).astype(jnp.uint8)
            return y + bump

        out = jax.lax.fori_loop(0, n, body, y)
        return jnp.sum(out.astype(jnp.int32))

    t0 = time.perf_counter()
    _ = int(chained(y, 1))
    compile_s = time.perf_counter() - t0
    print(f"{width}x{height}: compiled in {compile_s:.1f}s", flush=True)

    def one_sample() -> float:
        t0 = time.perf_counter()
        _ = int(chained(y, 1))
        t1 = time.perf_counter()
        _ = int(chained(y, CHAIN + 1))
        t2 = time.perf_counter()
        return max(((t2 - t1) - (t1 - t0)) / CHAIN, 1e-9)

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
    print(f"{width}x{height}: {ms:.3f} ms/frame "
          f"({1e3 / ms:.1f} fps, spread {spread:.1f}%)", flush=True)
    return {"width": width, "height": height, "qp": QP,
            "ms_per_frame": round(ms, 4), "fps": round(1e3 / ms, 1),
            "spread_pct": round(spread, 1), "chain": CHAIN,
            "compile_s": round(compile_s, 1)}


def main() -> None:
    out = {"what": "encode_levels_jit device ms/frame (chained, qp=30)",
           "geometries": [measure(1920, 1080), measure(3840, 2160)]}
    with open("scripts/tpu_r3_h264_levels.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
