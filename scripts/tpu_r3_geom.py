"""Full-pipeline hardware parity at untested geometries: portrait
(1080x1920 vertical video) and SD (640x480) -- serving shapes the round-2
suite never exercised on the chip."""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r3_geom.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    import jax.numpy as jnp
    from opencv_opencl_tpu.ops import clahe as cops
    from opencv_opencl_tpu.ops import histeq as hops

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for (h, w) in ((1920, 1080), (480, 640), (1079, 607)):
        y = rng.integers(0, 256, (h, w), np.uint8)
        try:
            out = np.asarray(cops.clahe(y, 2.0, (8, 8)))
            ref = cv2.createCLAHE(2.0, (8, 8)).apply(y)
            d = int(np.abs(out.astype(int) - ref.astype(int)).max())
            log(f"clahe {w}x{h} (WxH): {d} LSB")
            RESULTS[f"clahe_{w}x{h}_lsb"] = d
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"clahe_{w}x{h}_lsb"] = "error"
        save()
        try:
            out = np.asarray(hops.equalize_hist(jnp.asarray(y)))
            ref = cv2.equalizeHist(y)
            d = int(np.abs(out.astype(int) - ref.astype(int)).max())
            log(f"histeq {w}x{h}: {d} LSB")
            RESULTS[f"histeq_{w}x{h}_lsb"] = d
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"histeq_{w}x{h}_lsb"] = "error"
        save()
    log("DONE")

main()
