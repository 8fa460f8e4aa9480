"""Quantify the sharded-path overhead on real hardware (size-1 mesh).

VERDICT round-2 item 5: the sharded (mesh) CLAHE path was
correctness-only — measure what a size-1 mesh costs per frame at 4K vs
the unsharded pipeline, with the per-device small-batch unroll now
applied inside parallel/sharded.py (_map_frames).

Timing follows bench.py: data-dependent chained fori_loop + scalar
fetch (block_until_ready is async on axon), sustained warmup, median of
3.  Writes scripts/tpu_r3_sharded.json and prints progress with flush.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def chained_ms(step, args, chain=16, samples=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(n, *xs):
        def body(i, xs):
            return step(*xs)
        out = jax.lax.fori_loop(0, n, body, xs)
        return sum(jnp.sum(o.astype(jnp.int32)) for o in out)

    _ = int(chained(1, *args))  # compile
    print("  compiled", flush=True)

    def one():
        t0 = time.perf_counter()
        _ = int(chained(1, *args))
        t1 = time.perf_counter()
        _ = int(chained(chain + 1, *args))
        t2 = time.perf_counter()
        return max(((t2 - t1) - (t1 - t0)) / chain, 1e-9) * 1e3

    prev = one()
    for _i in range(7):  # sustained warmup to steady-state clocks
        cur = one()
        if abs(cur - prev) / max(cur, prev) < 0.02:
            prev = cur
            break
        prev = cur
    vals = sorted(one() for _ in range(samples))
    return vals[samples // 2]


def main() -> None:
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
    from opencv_opencl_tpu.parallel.mesh import make_mesh
    from opencv_opencl_tpu.parallel.sharded import build_sharded_pipeline

    w, h = 3840, 2160
    batch = 4
    spec = FrameSpec(width=w, height=h, fps=60)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, spec.buffer_rows, w), np.uint8)

    out = {"config": f"4K CLAHE 2.0 8x8 passthrough, batch {batch}",
           "device": str(jax.devices()[0])}

    print("[1/2] unsharded build_enhance_fn ...", flush=True)
    step = build_enhance_fn(cfg, spec, donate=False)
    dev = jax.device_put(frames)
    ms = chained_ms(lambda x: (step(x),), (dev,))
    out["unsharded_ms_per_frame"] = round(ms / batch, 4)
    print(f"  unsharded: {ms / batch:.4f} ms/frame", flush=True)

    print("[2/2] sharded (1x1 mesh) build_sharded_pipeline ...", flush=True)
    mesh = make_mesh(shape=(1, 1))
    fn, y_sh = build_sharded_pipeline(cfg, h, w, mesh)
    y = jax.device_put(frames[:, :h, :], y_sh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    uv = jax.device_put(frames[:, h:, :],
                        NamedSharding(mesh, P("data", None, None)))
    ms_sh = chained_ms(lambda a, b: fn(a, b), (y, uv))
    out["sharded_1x1_ms_per_frame"] = round(ms_sh / batch, 4)
    out["sharding_overhead_pct"] = round((ms_sh - ms) / ms * 100.0, 1)
    print(f"  sharded 1x1: {ms_sh / batch:.4f} ms/frame "
          f"({out['sharding_overhead_pct']}% vs unsharded)", flush=True)

    with open("scripts/tpu_r3_sharded.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
