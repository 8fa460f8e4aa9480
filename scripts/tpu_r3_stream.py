"""Streaming ref-frame CLAHE throughput after the unrolled frame chain
(batch<=8): was 1.41-1.43 ms/frame (scan) at 4K b4.  Parity: steady-state
ref-frame semantics vs the golden model (frame i uses frame i-1 hists)."""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r3_stream.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.models.enhancer import (
        EnhancerConfig, build_streaming_clahe_fn, initial_hists)

    log("devices:", jax.devices())
    spec = FrameSpec(width=3840, height=2160, fps=60)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)
    fn, plan = build_streaming_clahe_fn(cfg, spec)
    rng = np.random.default_rng(0)
    B = 4
    xb = jnp.asarray(rng.integers(0, 256, (B, spec.buffer_rows, 3840),
                                  np.uint8))
    h0 = initial_hists(plan)

    @jax.jit
    def run(x, h, n):
        def body(i, carry):
            x, h = carry
            out, h2 = fn(x, h)
            return out, h2
        x2, h2 = jax.lax.fori_loop(0, n, body, (x, h))
        return jnp.sum(x2.astype(jnp.int32)) + jnp.sum(h2)

    t = time.perf_counter(); _ = int(run(xb, h0, 1))
    log(f"  [compiled {time.perf_counter()-t:.0f}s]")
    t0=time.perf_counter(); _=int(run(xb, h0, 1)); t1=time.perf_counter()
    _=int(run(xb, h0, 17)); t2=time.perf_counter()
    _=int(run(xb, h0, 17)); t3=time.perf_counter()
    ms = max(((t3-t2)-(t1-t0))/16, 1e-9)*1e3
    log(f"streaming 4K b4: {ms:.3f} ms/step = {ms/B:.3f} ms/frame "
        f"= {B*1000/ms:.0f} fps/chip")
    RESULTS["stream_4k_b4_ms"] = round(ms, 4)
    save()

    # steady-state parity: frame i must equal frame i mapped with the
    # golden LUTs of frame i-1 (the ref-frame contract)
    from opencv_opencl_tpu.core import golden
    ys = rng.integers(0, 256, (3, 2160, 3840), np.uint8)
    uv = rng.integers(0, 256, (3, 1080, 3840), np.uint8)
    nv = np.concatenate([ys, uv], axis=1)
    out1, h1 = fn(jnp.asarray(nv[:2]), h0)
    out2, _ = fn(jnp.asarray(nv[2:]), h1)
    luts, th, tw = golden.clahe_luts(ys[1], 2.0, (8, 8))
    ref = golden.clahe_apply_luts(ys[2], luts, th, tw)
    d = int(np.abs(np.asarray(out2)[0][:2160].astype(int)
                   - ref.astype(int)).max())
    log("steady-state ref-frame parity:", d, "LSB")
    RESULTS["stream_parity_lsb"] = d
    save()
    log("DONE")

main()
