"""Row-block-size (rs) sweep for the natural interp kernel at 4K.

rs trades grid steps against unroll length / SMEM table size.  Round 1's
cell-grid kernel gained from rs 16 -> 24/32; this probes the natural v2
kernel (whose per-row work is one wide dot) at rs in {8, 16, 32}.
Single TPU process.  Writes scripts/tpu_r2b_rs.json.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
OUT = "/root/repo/scripts/tpu_r2b_rs.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    import jax.numpy as jnp

    from opencv_opencl_tpu.ops import clahe as cops
    from opencv_opencl_tpu.ops.pallas import natural

    log("devices:", jax.devices())

    def chained_ms(fn, x, chain=32, key=None):
        @jax.jit
        def run(x, n):
            def body(i, x):
                return fn(x)
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.int32))

        t_start = time.perf_counter()
        _ = int(run(x, 1))
        log(f"  [compiled in {time.perf_counter()-t_start:.1f}s]")
        t0 = time.perf_counter(); _ = int(run(x, 1)); t1 = time.perf_counter()
        _ = int(run(x, chain + 1)); t2 = time.perf_counter()
        _ = int(run(x, chain + 1)); t3 = time.perf_counter()
        ms = max(((t3 - t2) - (t1 - t0)) / chain, 1e-9) * 1e3
        if key:
            RESULTS[key] = round(ms, 4)
            save()
        return ms

    rng = np.random.default_rng(11)
    h, w = 2160, 3840
    plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
    B = 4
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), dtype=np.uint8))
    y1 = np.asarray(yb[0])
    ref = cv2.createCLAHE(2.0, (8, 8)).apply(y1)

    for rs in (8, 16, 24, 32):
        if h % rs and rs != 16:
            # nrb padding handles it; proceed regardless
            pass
        try:
            nspec = natural.make_natural_spec(h, w, 2.0, (8, 8), rs=rs)

            def full(x, nspec=nspec):
                def one(f):
                    hists = natural.tile_histograms_radix(
                        cops._extend(f, plan), plan.tiles_y, plan.tiles_x,
                        plan.tile_h, plan.tile_w)
                    lp = natural.build_lut_pack_pallas(
                        hists, plan.clip, plan.lut_scale, nspec)
                    return natural.clahe_interpolate_natural(
                        f, None, nspec, lp=lp)
                return jax.vmap(one)(x)

            # parity once per rs
            out = np.asarray(jax.jit(full)(yb))[0]
            d = int(np.abs(out.astype(int) - ref.astype(int)).max())
            RESULTS[f"parity_rs{rs}"] = d
            save()
            ms = chained_ms(full, yb, key=f"full_rs{rs}_4k_ms_b4")
            log(f"rs={rs}: parity={d}, {ms:.3f} ms/step = "
                f"{ms/B:.3f} ms/frame")
        except Exception:
            log(f"rs={rs} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"full_rs{rs}_4k_ms_b4"] = "error"
            save()

    log("DONE", json.dumps(RESULTS))


if __name__ == "__main__":
    main()
