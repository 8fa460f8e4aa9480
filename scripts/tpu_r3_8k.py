import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np
RESULTS = {}
def save(): json.dump(RESULTS, open("/root/repo/scripts/tpu_r3_8k.json","w"), indent=1, default=str)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    import jax.numpy as jnp
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import EnhancerConfig, build_enhance_fn
    from opencv_opencl_tpu.ops import clahe as cops
    log("devices:", jax.devices())
    w, h = 7680, 4320
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (h, w), np.uint8)
    try:
        t0 = time.perf_counter()
        out = np.asarray(cops.clahe(y, 2.0, (8, 8)))
        ref = cv2.createCLAHE(2.0, (8, 8)).apply(y)
        d = int(np.abs(out.astype(int) - ref.astype(int)).max())
        log(f"8K parity: {d} LSB ({time.perf_counter()-t0:.0f}s)")
        RESULTS["parity_8k"] = d
    except Exception:
        log(traceback.format_exc()); RESULTS["parity_8k"] = "error"
    save()
    try:
        spec = FrameSpec(width=w, height=h, fps=60)
        cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                             chroma=ChromaPolicy.PASSTHROUGH)
        step = build_enhance_fn(cfg, spec)
        B = 2
        xb = jnp.asarray(rng.integers(0, 256, (B, spec.buffer_rows, w), np.uint8))
        @jax.jit
        def run(x, n):
            return jnp.sum(jax.lax.fori_loop(0, n, lambda i, x: step(x), x).astype(jnp.int32))
        t=time.perf_counter(); _=int(run(xb,1)); log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        t0=time.perf_counter(); _=int(run(xb,1)); t1=time.perf_counter()
        _=int(run(xb,17)); t2=time.perf_counter()
        _=int(run(xb,17)); t3=time.perf_counter()
        ms = max(((t3-t2)-(t1-t0))/16, 1e-9)*1e3
        log(f"8K NV12 CLAHE b2: {ms:.2f} ms/step = {ms/B:.2f} ms/frame = {B*1000/ms:.0f} fps/chip")
        RESULTS["full_8k_ms_b2"] = round(ms, 3)
    except Exception:
        log(traceback.format_exc()); RESULTS["full_8k_ms_b2"] = "error"
    save()
    log("DONE")

main()
