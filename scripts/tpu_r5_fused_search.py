"""Round-5 hardware timing of the fused enhance+GOP program WITH the
device motion search (VERDICT r4 item 7): the r3 fused headline
(scripts/tpu_r3_fused_gop.json — 2.47 ms 1080p / 11.68 ms 4K) is
qp=30 zero-search; search is the expensive part.  This ladder times
build_enhance_gop_fn with full-pel search and with the hierarchical
quarter-pel mode (fastsub) at 1080p and 4K, chained with the real
recon feedback, and states explicitly whether 4K60 fused-with-search
holds (ms_per_frame <= 16.67).

    python scripts/tpu_r5_fused_search.py

Writes scripts/tpu_r5_fused_search.json incrementally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:  # reuse cached executables across runs (remote compiles are slow)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

OUT = os.path.join(os.path.dirname(__file__),
                   "tpu_r5_fused_search.json")
BATCH = 4
CHAIN = 32
QP = 30
GOP = 32


def measure(width: int, height: int, search: int,
            subpel: int) -> dict:
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import EnhancerConfig
    from opencv_opencl_tpu.models.fused_encode import (
        build_enhance_gop_fn)

    spec = FrameSpec(width=width, height=height, fps=30)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)
    fused = build_enhance_gop_fn(cfg, spec, GOP, search=search,
                                 subpel=subpel)
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
    print(f"{width}x{height} search={search} subpel={subpel}: "
          f"compiled in {compile_s:.1f}s", flush=True)

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
    print(f"{width}x{height} search={search} subpel={subpel}: "
          f"{ms:.3f} ms/frame fused enhance+GOP+search "
          f"({1e3 / ms:.1f} fps, spread {spread:.1f}%)", flush=True)
    return {"width": width, "height": height, "qp": QP, "gop": GOP,
            "batch": BATCH, "search": search, "subpel": subpel,
            "ms_per_frame": round(ms, 4),
            "fps": round(1e3 / ms, 1), "spread_pct": round(spread, 1),
            "chain": CHAIN, "compile_s": round(compile_s, 1)}


def main() -> None:
    out = {"what": "fused enhance(CLAHE)+GOP+motion-search device "
                   "ms/frame (chained with recon feedback, qp=30, "
                   "gop=32, batch=4); subpel 3 = fastsub "
                   "(hierarchical quarter-pel)",
           "no_search_baseline": "scripts/tpu_r3_fused_gop.json",
           "geometries": []}

    def save() -> None:
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    save()
    for args in ((1920, 1080, 8, 0), (1920, 1080, 8, 3),
                 (3840, 2160, 8, 0), (3840, 2160, 8, 3),
                 (3840, 2160, 4, 0)):
        try:
            out["geometries"].append(measure(*args))
        except Exception as e:  # land the failure, keep the ladder
            out["geometries"].append(
                {"width": args[0], "height": args[1],
                 "search": args[2], "subpel": args[3],
                 "error": f"{type(e).__name__}: {e}"})
        save()
    four_k = [g for g in out["geometries"]
              if g.get("width") == 3840 and "ms_per_frame" in g]
    if four_k:
        best = min(g["ms_per_frame"] for g in four_k)
        out["fused_4k60_with_search"] = bool(best <= 1000.0 / 60.0)
        out["fused_4k_best_ms"] = best
    save()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
