"""Sustained 4K soak on the round-3 final tree: windowed fps over ~2
minutes of continuous device-resident work (thermal stability check)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import (
        EnhancerConfig, build_enhance_fn)

    w, h, batch, chain = 3840, 2160, 4, 64
    spec = FrameSpec(width=w, height=h, fps=60)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)
    step = build_enhance_fn(cfg, spec, donate=False)
    rng = np.random.default_rng(0)
    dev = jax.device_put(
        rng.integers(0, 256, (batch, spec.buffer_rows, w), np.uint8))

    @jax.jit
    def chained(n, v):
        def body(i, v):
            return step(v)
        out = jax.lax.fori_loop(0, n, body, v)
        return jnp.sum(out.astype(jnp.int32))

    _ = int(chained(1, dev))
    print("compiled; soaking...", flush=True)
    windows = []
    t_start = time.monotonic()
    frames = 0
    while time.monotonic() - t_start < 120:
        t0 = time.perf_counter()
        _ = int(chained(chain, dev))
        dt = time.perf_counter() - t0
        fps = batch * chain / dt
        frames += batch * chain
        windows.append(round(fps, 1))
    med = sorted(windows)[len(windows) // 2]
    out = {
        "config": "4K CLAHE soak, batch 4, chain 64, ~120 s",
        "windows": len(windows),
        "frames": frames,
        "fps_median": med,
        "fps_min": min(windows),
        "fps_max": max(windows),
        "drift_pct": round((max(windows) - min(windows)) / med * 100, 1),
        "device": str(jax.devices()[0]),
    }
    with open("scripts/tpu_r3_soak.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
