"""Does vmap-over-pallas tax the batch path?  4K CLAHE interp + radix
hist at batch=4: vmap vs lax.map (sequential) vs an unrolled loop.
Round-2 measured 0.94 ms/frame interp at b4 (vmap) but 0.68 single-frame
(tpu_r3_interp_diag) -- if map/unroll hits ~0.68, rewire clahe_apply.
"""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r3_batchmap.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from opencv_opencl_tpu.ops.pallas import natural

    log("devices:", jax.devices())
    h, w, B = 2160, 3840, 4
    spec = natural.make_natural_spec(h, w, 2.0, (8, 8))
    rng = np.random.default_rng(0)
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), np.uint8))
    lp = jnp.asarray(rng.integers(
        0, 256, (spec.row_pairs * spec.pack2_rows, 256),
        np.uint8)).astype(jnp.bfloat16)

    def interp1(fr):
        return natural.clahe_interpolate_natural(fr, None, spec, lp=lp)

    def hist1(fr):
        return natural.tile_histograms_radix(fr, 8, 8, 270, 480)

    def chained_ms(fn, x, chain=24, key=None):
        @jax.jit
        def run(x, n):
            def body(i, y):
                o = fn(y)
                return o if o.dtype == y.dtype and o.shape == y.shape else y
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))
        t = time.perf_counter(); _ = int(run(x, 1))
        log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        t0 = time.perf_counter(); _ = int(run(x, 1)); t1 = time.perf_counter()
        _ = int(run(x, chain + 1)); t2 = time.perf_counter()
        _ = int(run(x, chain + 1)); t3 = time.perf_counter()
        ms = max(((t3 - t2) - (t1 - t0)) / chain, 1e-9) * 1e3
        if key:
            RESULTS[key] = round(ms, 4); save()
        return ms

    variants = {
        "vmap": lambda f: (lambda x: jax.vmap(f)(x)),
        "laxmap": lambda f: (lambda x: jax.lax.map(f, x)),
        "unroll": lambda f: (lambda x: jnp.stack(
            [f(x[i]) for i in range(B)])),
    }
    for name, wrap in variants.items():
        try:
            ms = chained_ms(wrap(interp1), yb, key=f"interp_b4_{name}_ms")
            log(f"interp b4 {name}: {ms:.3f} ms/step ({ms/B:.3f}/frame)")
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"interp_b4_{name}_ms"] = "error"; save()

    # histograms return (64,16,16) int32 -> chain by re-feeding y (body
    # ignores the output shape mismatch and re-feeds x) -- time via a
    # data-dependent side sum instead
    def hist_step(wrap):
        hfn = wrap(hist1)
        def f(x):
            hs = hfn(x)
            # fold the hist sum back into the frame so the chain is
            # data-dependent (sum is invariant: total pixel count)
            delta = (jnp.sum(hs) // jnp.sum(hs)).astype(jnp.uint8) - 1
            return x + delta
        return f
    for name, wrap in variants.items():
        try:
            ms = chained_ms(hist_step(wrap), yb, key=f"hist_b4_{name}_ms")
            log(f"hist b4 {name}: {ms:.3f} ms/step ({ms/B:.3f}/frame)")
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"hist_b4_{name}_ms"] = "error"; save()

main()
