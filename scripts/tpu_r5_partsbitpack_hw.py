"""parts x bitpack (and x refs=2) on real hardware: TPU streams with
the entropy bits packed ON CHIP byte-identical to the CPU oracle at
1080p.

    python scripts/tpu_r5_partsbitpack_hw.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

import numpy as np

OUT = os.path.join(os.path.dirname(__file__),
                   "tpu_r5_partsbitpack_hw.json")
RES = {"what": "parts x bitpack on hardware: device-packed entropy "
               "bits for partitioned P frames, byte-identical at "
               "1080p", "platform": None}


def save():
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)


def main():
    RES["platform"] = jax.default_backend()
    print("platform:", RES["platform"], flush=True)
    save()
    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)

    W, H = 1920, 1080
    mb_h = -(-H // 16)
    rng = np.random.default_rng(5)
    base = (rng.integers(0, 256, (H // 8 + 4, W // 8 + 4), np.uint8)
            .repeat(8, 0).repeat(8, 1))
    frames = []
    for i in range(4):
        y = np.empty((H, W), np.uint8)
        for r in range(H):
            y[r] = np.roll(base[r + 8, 8:8 + W],
                           (r * i) // H + 2 * i)
        if i % 2 == 0:
            y = np.clip(y.astype(np.int32) + 20, 0,
                        255).astype(np.uint8)
        uv = np.full((H // 2, W), 128, np.uint8)
        frames.append(np.concatenate([y, uv]).copy())

    for tag, refs in (("refs1", 1), ("refs2", 2)):
        t0 = time.perf_counter()
        want = [au for f in frames for au in GopCavlcEncoder(
            W, H, qp=30, gop=4, slices=mb_h, search=3, parts=True,
            refs=refs).encode(f)]
        got = [au for f in frames for au in TpuGopEncoder(
            W, H, qp=30, gop=4, search=3, parts=True, refs=refs,
            bitpack=True, nw_mb=64).encode(f)]
        RES[f"identity_{tag}"] = {
            "byte_identical": bool(got == want),
            "stream_bytes": sum(map(len, got)),
            "wall_s": round(time.perf_counter() - t0, 1)}
        print(f"identity {tag}: {got == want}", flush=True)
        save()
    RES["all_ok"] = all(v.get("byte_identical")
                        for k, v in RES.items()
                        if k.startswith("identity_"))
    save()
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
