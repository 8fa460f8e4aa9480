import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np
RESULTS = {}
OUT = "/root/repo/scripts/tpu_r2b_stream.json"
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1, default=str)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    import jax.numpy as jnp
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import (
        EnhancerConfig, build_streaming_clahe_fn, initial_hists,
    )
    log("devices:", jax.devices())
    w, h = 3840, 2160
    spec = FrameSpec(width=w, height=h, fps=60)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH, use_ref_frame=True)
    fn, plan = build_streaming_clahe_fn(cfg, spec)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (spec.buffer_rows, w), np.uint8)
    batch = np.stack([frame] * 4)
    # parity: static scene steady state == cv2 (frames >= 1)
    try:
        t0 = time.perf_counter()
        out, hists = fn(jnp.asarray(batch), initial_hists(plan))
        out = np.asarray(out)
        ref = cv2.createCLAHE(2.0, (8, 8)).apply(frame[:h])
        d = max(int(np.abs(out[i, :h].astype(int) - ref.astype(int)).max())
                for i in (1, 2, 3))
        log(f"streaming parity 4K (steady frames): {d} "
            f"({time.perf_counter()-t0:.0f}s)")
        RESULTS["stream_parity_4k"] = d
    except Exception:
        log(traceback.format_exc()); RESULTS["stream_parity_4k"] = "error"
    save()
    # throughput: chained streaming steps (state threads through the chain)
    try:
        @jax.jit
        def chained(x, hists, n):
            def body(i, carry):
                x, hists = carry
                return fn(x, hists)
            out, hh = jax.lax.fori_loop(0, n, body, (x, hists))
            return jnp.sum(out.astype(jnp.int32)) + jnp.sum(hh)
        xb = jnp.asarray(batch)
        h0 = initial_hists(plan)
        t=time.perf_counter(); _=int(chained(xb, h0, 1)); log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        t0=time.perf_counter(); _=int(chained(xb, h0, 1)); t1=time.perf_counter()
        _=int(chained(xb, h0, 33)); t2=time.perf_counter()
        _=int(chained(xb, h0, 33)); t3=time.perf_counter()
        ms = max(((t3-t2)-(t1-t0))/32, 1e-9)*1e3
        log(f"streaming 4K b4: {ms:.3f} ms/step = {ms/4:.3f} ms/frame = "
            f"{4000/ms:.0f} fps/chip")
        RESULTS["stream_4k_ms_b4"] = round(ms, 4)
    except Exception:
        log(traceback.format_exc()); RESULTS["stream_4k_ms_b4"] = "error"
    save()
    log("DONE")

main()
