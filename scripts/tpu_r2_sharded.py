import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import cv2
    from opencv_opencl_tpu.ops import clahe as cops
    from opencv_opencl_tpu.parallel import make_mesh, sharded_clahe, sharded_histeq
    print("devices:", jax.devices(), flush=True)
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    # odd geometry through the generalized sharded path, on hardware
    for (h, w) in ((1079, 1919), (1080, 1920)):
        y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
        plan = cops.make_clahe_plan(h, w, 2.0, (8, 8))
        t0 = time.perf_counter()
        out = np.asarray(sharded_clahe(mesh, plan)(y))
        c = cv2.createCLAHE(2.0, (8, 8))
        d = max(int(np.abs(out[i].astype(int) - c.apply(y[i]).astype(int)).max()) for i in range(2))
        print(f"sharded clahe {w}x{h} size-1 mesh: maxdiff={d} ({time.perf_counter()-t0:.0f}s)", flush=True)
        fn = sharded_histeq(mesh, h, w)
        out2 = np.asarray(fn(y))
        d2 = max(int(np.abs(out2[i].astype(int) - cv2.equalizeHist(y[i]).astype(int)).max()) for i in range(2))
        print(f"sharded histeq {w}x{h} size-1 mesh: maxdiff={d2}", flush=True)
    print("DONE", flush=True)

main()
