"""Round-2b hardware validation: fused LUT-pack kernel + row-batched radix.

Validates on the real TPU (single process!):
1. parity of the natural backend (now routed through build_lut_pack_pallas)
   vs cv2 at 4K / 1080p / 1919x1079;
2. timing: full pipeline with fused vs XLA LUT build (4K batch 4);
3. timing: radix histogram batch_rows 1 vs 2 vs 4 (the FLOP-vs-issue
   crossover probe; nb=8 was rejected in round 2);
4. 1080p single-frame CLAHE (BASELINE scenario 2 regression check).

Writes scripts/tpu_r2b_lut.json as it goes.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
OUT = "/root/repo/scripts/tpu_r2b_lut.json"


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
    from opencv_opencl_tpu.ops.pallas import experiments, natural

    log("devices:", jax.devices())

    def chained_ms(fn, x, chain=32, key=None):
        @jax.jit
        def run(x, n):
            def body(i, x):
                return fn(x)
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out[0].astype(jnp.int32) if isinstance(out, tuple)
                           else out.astype(jnp.int32))

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

    rng = np.random.default_rng(7)

    # ------------- 1. parity: fused-LUT natural backend vs cv2 ------------
    for (w, h, clip, grid) in ((3840, 2160, 2.0, (8, 8)),
                               (1920, 1080, 2.0, (8, 8)),
                               (1919, 1079, 3.0, (4, 4)),
                               (1280, 720, 40.0, (8, 8))):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ref = cv2.createCLAHE(clip, grid).apply(y)
        try:
            t0 = time.perf_counter()
            out = np.asarray(cops.clahe(y, clip, grid, backend="natural"))
            d = int(np.abs(out.astype(int) - ref.astype(int)).max())
            log(f"parity fused-lut {w}x{h} clip={clip} grid={grid}: "
                f"maxdiff={d} ({time.perf_counter()-t0:.0f}s)")
            RESULTS[f"parity_fusedlut_{w}x{h}"] = d
        except Exception:
            log(f"parity {w}x{h} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"parity_fusedlut_{w}x{h}"] = "error"
        save()

    # ------------- 2. full pipeline: fused vs XLA LUT build ---------------
    h, w = 2160, 3840
    plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
    nspec = natural.make_natural_spec(h, w, 2.0, (8, 8))
    B = 4
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), dtype=np.uint8))

    def full_fused(x):
        def one(f):
            hists = natural.tile_histograms_radix(
                _ext(f), plan.tiles_y, plan.tiles_x, plan.tile_h, plan.tile_w)
            lp = natural.build_lut_pack_pallas(
                hists, plan.clip, plan.lut_scale, nspec)
            return natural.clahe_interpolate_natural(f, None, nspec, lp=lp)
        return jax.vmap(one)(x)

    def full_xla_lut(x):
        def one(f):
            hists = natural.tile_histograms_radix(
                _ext(f), plan.tiles_y, plan.tiles_x, plan.tile_h, plan.tile_w)
            luts = cops._luts_from_hists(hists, plan)
            return natural.clahe_interpolate_natural(f, luts, nspec)
        return jax.vmap(one)(x)

    def _ext(f):
        return cops._extend(f, plan)

    for name, fn in (("fused", full_fused), ("xla_lut", full_xla_lut)):
        try:
            ms = chained_ms(fn, yb, key=f"full_{name}_4k_ms_b4")
            log(f"full {name} 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
        except Exception:
            log(f"full {name} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"full_{name}_4k_ms_b4"] = "error"
        save()

    # ------------- 3. radix hist batch_rows crossover ----------------------
    def mk_hist(nb):
        def stage(x):
            def one(f):
                hs = (natural.tile_histograms_radix(f, 8, 8, 270, 480)
                      if nb == 1 else
                      experiments.tile_histograms_radix_batched(
                          f, 8, 8, 270, 480, batch_rows=nb))
                return f ^ (jnp.sum(hs) & 1).astype(jnp.uint8)
            return jax.vmap(one)(x)
        return stage

    for nb in (1, 2, 4):
        try:
            ms = chained_ms(mk_hist(nb), yb, key=f"hist_nb{nb}_4k_ms_b4")
            log(f"hist nb={nb} 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
        except Exception:
            log(f"hist nb={nb} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"hist_nb{nb}_4k_ms_b4"] = "error"
        save()

    # ------------- 4. 1080p single-frame (BASELINE scenario 2) -------------
    y1080 = jnp.asarray(rng.integers(0, 256, (1, 1080, 1920), dtype=np.uint8))
    plan1080 = cops.make_clahe_plan(1080, 1920, 2.0, (8, 8))
    try:
        ms = chained_ms(
            lambda x: cops.clahe_apply(x, plan1080, backend="natural"),
            y1080, key="clahe_1080_single_ms")
        log(f"1080p single-frame CLAHE: {ms:.3f} ms")
    except Exception:
        log(f"1080p FAILED:\n{traceback.format_exc()}")
        RESULTS["clahe_1080_single_ms"] = "error"
    save()

    log("DONE", json.dumps(RESULTS))


if __name__ == "__main__":
    main()
