import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np
RESULTS = {}
def save(): json.dump(RESULTS, open("/root/repo/scripts/tpu_r2_stream_diag.json","w"), indent=1, default=str)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from opencv_opencl_tpu.ops import clahe as cops
    from opencv_opencl_tpu.ops.pallas import experiments, natural
    log("devices:", jax.devices())
    h, w = 2160, 3840
    plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
    spec = natural.make_natural_spec(h, w, 2.0, (8, 8))
    rng = np.random.default_rng(0)
    B = 4
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), np.uint8))
    luts = jnp.asarray(rng.integers(0, 256, (64, 256), np.uint8))

    def chained_ms(fn, x, chain=32, key=None):
        @jax.jit
        def run(x, n):
            return jnp.sum(jax.lax.fori_loop(0, n, lambda i, x: fn(x), x).astype(jnp.int32))
        t=time.perf_counter(); _=int(run(x,1)); log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        t0=time.perf_counter(); _=int(run(x,1)); t1=time.perf_counter()
        _=int(run(x,chain+1)); t2=time.perf_counter()
        _=int(run(x,chain+1)); t3=time.perf_counter()
        ms = max(((t3-t2)-(t1-t0))/chain, 1e-9)*1e3
        if key: RESULTS[key]=round(ms,4); save()
        return ms

    # (a) fused kernel alone, fixed luts, vmapped (hists output discarded
    # into the chain hash via xor to stay data-dependent)
    def fused_only(x):
        def one(f):
            out, hs = experiments.clahe_interp_and_hist_natural(f, luts, spec)
            return out ^ (jnp.sum(hs) & 1).astype(jnp.uint8)
        return jax.vmap(one)(x)
    try:
        ms = chained_ms(fused_only, yb, key="fused_kernel_only_ms_b4")
        log(f"(a) fused kernel only: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
    except Exception:
        log(traceback.format_exc()); RESULTS["fused_kernel_only_ms_b4"]="error"; save()

    # (b) two-pass scan streaming (interp + separate radix hist per frame)
    def two_pass_scan(x):
        def one(hists, frame):
            l = cops._luts_from_hists(hists, plan)
            out = natural.clahe_interpolate_natural(frame, l, spec)
            nh = natural.tile_histograms_radix(frame, 8, 8, 270, 480)
            return nh, out
        h0 = jnp.zeros((64, 256), jnp.int32) + 1
        hh, out = jax.lax.scan(one, h0, x)
        return out ^ (jnp.sum(hh) & 1).astype(jnp.uint8)
    try:
        ms = chained_ms(two_pass_scan, yb, key="two_pass_scan_ms_b4")
        log(f"(b) two-pass scan: {ms:.3f} ms/step = {ms/B:.3f} ms/frame")
    except Exception:
        log(traceback.format_exc()); RESULTS["two_pass_scan_ms_b4"]="error"; save()
    log("DONE"); save()

main()
