"""Round-2 kernel validation + timing on the real TPU (single process!).

Validates the natural-layout interp kernel and the radix-16 histogram
against cv2 on hardware, then chained-times every stage variant.
Writes results to scripts/tpu_r2_kernels.json as it goes.

Run with the default env (axon platform); keep it the ONLY TPU process.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
OUT = "/root/repo/scripts/tpu_r2_kernels.json"


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
    from opencv_opencl_tpu.ops.pallas import lut_kernels, natural

    log("devices:", jax.devices())

    def chained_ms(fn, x, chain=32, key=None):
        """Honest device ms per call: data-dependent chain, scalar fetch."""
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

    rng = np.random.default_rng(0)

    # ---------------- 1. parity on hardware: natural backend vs cv2 ------
    for (w, h) in ((3840, 2160), (1920, 1080), (1919, 1079)):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ref = cv2.createCLAHE(2.0, (8, 8)).apply(y)
        try:
            t0 = time.perf_counter()
            out = np.asarray(cops.clahe(y, 2.0, (8, 8), backend="natural"))
            d = int(np.abs(out.astype(int) - ref.astype(int)).max())
            log(f"parity natural {w}x{h}: maxdiff={d} "
                f"({time.perf_counter()-t0:.0f}s incl compile+fetch)")
            RESULTS[f"parity_natural_{w}x{h}"] = d
        except Exception:
            log(f"parity natural {w}x{h} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"parity_natural_{w}x{h}"] = "error"
        save()

    # radix hist parity (exact already on CPU; confirm the TPU lowering)
    h, w = 2160, 3840
    y4k = rng.integers(0, 256, (h, w), dtype=np.uint8)
    plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
    hist_ref = np.stack([
        cv2.calcHist([t], [0], None, [256], [0, 256]).ravel().astype(np.int64)
        for t in y4k.reshape(8, 270, 8, 480).transpose(0, 2, 1, 3).reshape(64, 270, 480)
    ])
    try:
        hr = np.asarray(jax.jit(
            lambda x: natural.tile_histograms_radix(x, 8, 8, 270, 480)
        )(y4k))
        ok = bool(np.array_equal(hr.astype(np.int64), hist_ref))
        log("radix hist 4K exact:", ok)
        RESULTS["radix_hist_exact_4k"] = ok
    except Exception:
        log(f"radix hist FAILED:\n{traceback.format_exc()}")
        RESULTS["radix_hist_exact_4k"] = "error"
    save()

    # ---------------- 2. stage timings at 4K (batch 4, device-resident) ---
    B = 4
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), dtype=np.uint8))

    # full pipelines
    for backend in ("pallas", "natural"):
        try:
            fn = lambda x: cops.clahe_apply(x, plan, backend=backend)
            ms = chained_ms(fn, yb, key=f"full_{backend}_4k_ms_b4")
            log(f"full {backend} 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
        except Exception:
            log(f"full {backend} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"full_{backend}_4k_ms_b4"] = "error"
        save()

    # hist stage only (chained via data-dependent xor back into the frame)
    def mk_hist_stage(kind):
        def stage(x):
            def one(f):
                if kind == "old":
                    hs = lut_kernels.tile_histograms_pallas(f, 8, 8, 270, 480)
                else:
                    hs = natural.tile_histograms_radix(f, 8, 8, 270, 480)
                return f ^ (jnp.sum(hs) & 1).astype(jnp.uint8)
            return jax.vmap(one)(x)
        return stage

    for kind in ("old", "radix"):
        try:
            ms = chained_ms(mk_hist_stage(kind), yb, key=f"hist_{kind}_4k_ms_b4")
            log(f"hist {kind} 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
        except Exception:
            log(f"hist {kind} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"hist_{kind}_4k_ms_b4"] = "error"
        save()

    # interp stage only (LUTs fixed; out feeds in)
    luts = jnp.asarray(
        rng.integers(0, 256, (64, 256), dtype=np.uint8)
    )
    ispec = lut_kernels.make_interp_spec(h, w, 2.0, (8, 8))

    def interp_old(x):
        return jax.vmap(
            lambda f: lut_kernels.clahe_interpolate_pallas(f, luts, ispec)
        )(x)

    try:
        ms = chained_ms(interp_old, yb, key="interp_cellgrid_4k_ms_b4")
        log(f"interp cellgrid 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
    except Exception:
        log(f"interp cellgrid FAILED:\n{traceback.format_exc()}")
        RESULTS["interp_cellgrid_4k_ms_b4"] = "error"
    save()

    for rs in (16, 32, 8):
        nspec = natural.make_natural_spec(h, w, 2.0, (8, 8), rs=rs)

        def interp_nat(x, nspec=nspec):
            return jax.vmap(
                lambda f: natural.clahe_interpolate_natural(f, luts, nspec)
            )(x)

        try:
            ms = chained_ms(interp_nat, yb, key=f"interp_natural_rs{rs}_4k_ms_b4")
            log(f"interp natural rs={rs} 4K b4: {ms:.3f} ms/step = "
                f"{ms/B:.3f} ms/frame")
        except Exception:
            log(f"interp natural rs={rs} FAILED:\n{traceback.format_exc()}")
            RESULTS[f"interp_natural_rs{rs}_4k_ms_b4"] = "error"
        save()

    # ---------------- 3. 1080p histeq hist stage (the round-1 inversion) --
    h2, w2 = 1080, 1920
    yb2 = jnp.asarray(rng.integers(0, 256, (B, h2, w2), dtype=np.uint8))

    def mk_hist1080(kind, ty):
        def stage(x):
            def one(f):
                if kind == "old":
                    hs = lut_kernels.tile_histograms_pallas(f, ty, 1, h2 // ty, w2)
                else:
                    hs = natural.tile_histograms_radix(f, ty, 1, h2 // ty, w2)
                return f ^ (jnp.sum(hs) & 1).astype(jnp.uint8)
            return jax.vmap(one)(x)
        return stage

    for kind in ("old", "radix"):
        for ty in (1, 8):
            try:
                ms = chained_ms(mk_hist1080(kind, ty),
                                yb2, key=f"hist1080_{kind}_ty{ty}_ms_b4")
                log(f"hist 1080p {kind} ty={ty} b4: {ms:.3f} ms/step")
            except Exception:
                log(f"hist 1080p {kind} ty={ty} FAILED:\n{traceback.format_exc()}")
                RESULTS[f"hist1080_{kind}_ty{ty}_ms_b4"] = "error"
            save()

    log("DONE")
    save()


if __name__ == "__main__":
    main()
