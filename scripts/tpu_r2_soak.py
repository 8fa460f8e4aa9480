"""Sustained serving soak: the 8x1080p multi-stream step (scenario 6
shape) dispatched continuously for ~60 s on the real chip.  Reports
per-window latency stats (drift/jitter) and end-state parity --
production serving evidence beyond a one-shot benchmark number."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r2_soak.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    import jax.numpy as jnp
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import EnhancerConfig, build_enhance_fn

    log("devices:", jax.devices())
    spec = FrameSpec(width=1920, height=1080, fps=30)
    step = build_enhance_fn(
        EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                       chroma=ChromaPolicy.PASSTHROUGH), spec)
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, (8, spec.buffer_rows, 1920), dtype=np.uint8)
    xb = jnp.asarray(batch)

    CHAIN = 64
    @jax.jit
    def run(x, k):
        out = jax.lax.fori_loop(0, k, lambda i, y: step(y), x)
        return jnp.sum(out.astype(jnp.int32))

    t = time.perf_counter(); _ = int(run(xb, 1))
    log(f"compiled in {time.perf_counter()-t:.0f}s")

    # soak: windows of CHAIN dispatches until ~60 s of device time
    windows = []
    t_soak = time.perf_counter()
    while time.perf_counter() - t_soak < 60.0:
        t0 = time.perf_counter(); _ = int(run(xb, CHAIN)); t1 = time.perf_counter()
        ms = (t1 - t0) / CHAIN * 1e3
        windows.append(ms)
        log(f"window {len(windows)}: {ms:.3f} ms/step")
    w = np.array(windows)
    RESULTS.update({
        "windows": len(windows), "chain": CHAIN,
        "ms_mean": round(float(w.mean()), 4),
        "ms_min": round(float(w.min()), 4),
        "ms_max": round(float(w.max()), 4),
        "ms_p95": round(float(np.percentile(w, 95)), 4),
        "drift_pct_last_vs_first": round(
            float((w[-3:].mean() / w[:3].mean() - 1) * 100), 3),
        "steps_total": len(windows) * CHAIN,
        "frames_total": len(windows) * CHAIN * 8,
        "soak_seconds": round(time.perf_counter() - t_soak, 1),
    })
    save()

    # end-state parity: the step applied once to a fresh frame still 0 LSB
    y = rng.integers(0, 256, (1080, 1920), np.uint8)
    uv = rng.integers(0, 256, (540, 1920), np.uint8)
    nv12 = np.concatenate([y, uv], 0)[None]
    out = np.asarray(step(jnp.asarray(nv12)))[0]
    ref = cv2.createCLAHE(2.0, (8, 8)).apply(y)
    d = int(np.abs(out[:1080].astype(int) - ref.astype(int)).max())
    RESULTS["parity_after_soak_lsb"] = d
    RESULTS["chroma_intact"] = bool(np.array_equal(out[1080:], uv))
    save()
    log("RESULTS:", json.dumps(RESULTS))

main()
