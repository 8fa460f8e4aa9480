"""8K CLAHE exact vs approximate fast-histogram mode on hardware."""
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

    w, h, batch = 7680, 4320, 2
    spec = FrameSpec(width=w, height=h, fps=30)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, spec.buffer_rows, w), np.uint8)
    dev = jax.device_put(frames)
    out = {"config": f"8K CLAHE 2.0 8x8, batch {batch}",
           "device": str(jax.devices()[0])}

    def chained_ms(step, x, chain=16):
        @jax.jit
        def chained(n, v):
            def body(i, v):
                return step(v)
            o = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(o.astype(jnp.int32))

        _ = int(chained(1, x))

        def one():
            t0 = time.perf_counter()
            _ = int(chained(1, x))
            t1 = time.perf_counter()
            _ = int(chained(chain + 1, x))
            t2 = time.perf_counter()
            return max(((t2 - t1) - (t1 - t0)) / chain, 1e-9) * 1e3

        prev = one()
        for _i in range(5):
            cur = one()
            if abs(cur - prev) / max(cur, prev) < 0.02:
                break
            prev = cur
        vals = sorted(one() for _ in range(3))
        return vals[1]

    for ds in (1, 3):
        cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                             chroma=ChromaPolicy.PASSTHROUGH,
                             hist_downsample=ds)
        fn = build_enhance_fn(cfg, spec, donate=False)
        print(f"[8K ds={ds}] compiling...", flush=True)
        ms = chained_ms(fn, dev)
        out[f"ds{ds}_ms_per_frame"] = round(ms / batch, 4)
        out[f"ds{ds}_fps"] = round(batch / ms * 1e3, 1)
        print(f"[8K ds={ds}] {ms / batch:.4f} ms/frame "
              f"({batch / ms * 1e3:.1f} fps)", flush=True)

    with open("scripts/tpu_r3_approx8k.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
