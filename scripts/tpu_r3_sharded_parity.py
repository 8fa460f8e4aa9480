"""Hardware parity of the sharded path AFTER the _map_frames unroll:
size-1 mesh CLAHE + histeq vs cv2 on hun.png-class geometry, 0 LSB."""
import sys

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    from opencv_opencl_tpu.parallel.mesh import make_mesh
    from opencv_opencl_tpu.parallel.sharded import sharded_clahe, sharded_histeq
    from opencv_opencl_tpu.ops.clahe import make_clahe_plan

    img = cv2.imread("/root/reference/hun.png")
    if img is None:
        rng = np.random.default_rng(0)
        y = rng.integers(0, 256, (1079, 1919), np.uint8)
    else:
        y = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)[:, :, 0]
    h, w = y.shape
    mesh = make_mesh(shape=(1, 1))
    batch = np.stack([y, y[::-1].copy()])

    plan = make_clahe_plan(h, w, 2.0, (8, 8))
    fn = sharded_clahe(mesh, plan)
    out = np.asarray(fn(batch))
    ref = cv2.createCLAHE(2.0, (8, 8))
    for i, f in enumerate(batch):
        d = int(np.abs(out[i].astype(int) - ref.apply(f).astype(int)).max())
        print(f"clahe frame {i}: max diff {d} LSB", flush=True)
        assert d == 0
    fn2 = sharded_histeq(mesh, h, w)
    out2 = np.asarray(fn2(batch))
    for i, f in enumerate(batch):
        d = int(np.abs(out2[i].astype(int)
                       - cv2.equalizeHist(f).astype(int)).max())
        print(f"histeq frame {i}: max diff {d} LSB", flush=True)
        assert d == 0
    print("sharded parity post-unroll: 0 LSB on hardware", flush=True)


if __name__ == "__main__":
    main()
