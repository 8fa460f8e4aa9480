"""Serving batch=16 at 1080p: does a bigger dispatch pack more
streams@30?  Compares the vmap fallback (current behavior for B>8)
against a forced 16-frame unroll."""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r3_b16.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from opencv_opencl_tpu.ops import clahe as cops

    log("devices:", jax.devices())
    h, w, B = 1080, 1920, 16
    plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
    rng = np.random.default_rng(0)
    yb = jnp.asarray(rng.integers(0, 256, (B, h, w), np.uint8))

    def vmapped(x):
        return jax.vmap(lambda f: cops.clahe_apply(f, plan))(x)

    def unrolled(x):
        return jnp.stack([cops.clahe_apply(x[i], plan) for i in range(B)])

    def chained_ms(fn, x, chain=24, key=None):
        @jax.jit
        def run(x, n):
            return jnp.sum(jax.lax.fori_loop(
                0, n, lambda i, y: fn(y), x).astype(jnp.int32))
        t = time.perf_counter(); _ = int(run(x, 1))
        log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        _ = int(run(x, chain + 1))
        samples = []
        for _i in range(3):
            t0 = time.perf_counter(); _ = int(run(x, 1))
            t1 = time.perf_counter(); _ = int(run(x, chain + 1))
            t2 = time.perf_counter()
            samples.append(max(((t2-t1)-(t1-t0))/chain, 1e-9)*1e3)
        ms = sorted(samples)[1]
        if key: RESULTS[key] = round(ms, 4); save()
        return ms

    for name, fn in (("vmap", vmapped), ("unroll", unrolled)):
        try:
            ms = chained_ms(fn, yb, key=f"clahe_1080_b16_{name}_ms")
            agg = B * 1000 / ms
            log(f"b16 {name}: {ms:.3f} ms/step = {agg:.0f} fps aggregate "
                f"= {int(agg // 30)} streams@30")
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"clahe_1080_b16_{name}_ms"] = "error"; save()
    log("DONE")

main()
