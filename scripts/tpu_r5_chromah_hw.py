"""Chroma HORIZONTAL on real hardware: TPU/oracle byte-identity at
1080p (intra chromah, chromah+i4, GOP chromah+i4).

    python scripts/tpu_r5_chromah_hw.py

Writes scripts/tpu_r5_chromah_hw.json.
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
                   "tpu_r5_chromah_hw.json")
RES = {"what": "chroma HORIZONTAL on hardware: TPU/oracle "
               "byte-identity (1080p)", "platform": None}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)


def content(W, H, seed):
    rng = np.random.default_rng(seed)
    y = ((np.mgrid[0:H, 0:W][1] + np.mgrid[0:H, 0:W][0] * 2)
         * 4 % 256).astype(np.uint8)
    y = np.clip(y.astype(np.int32) + rng.integers(-4, 5, y.shape),
                0, 255).astype(np.uint8)
    cu = (np.mgrid[0:H // 2, 0:W // 2][0] * 8 % 256).astype(np.uint8)
    cv_ = ((np.mgrid[0:H // 2, 0:W // 2][0] + 40) * 8
           % 256).astype(np.uint8)
    uv = np.empty((H // 2, W), np.uint8)
    uv[:, 0::2], uv[:, 1::2] = cu, cv_
    return np.concatenate([y, uv])


def main() -> None:
    RES["platform"] = jax.default_backend()
    print("platform:", RES["platform"], flush=True)
    save()
    from opencv_opencl_tpu.io.encoder import make_encoder

    W, H = 1920, 1080
    mb_h = -(-H // 16)
    f0 = content(W, H, 3)
    f1 = np.roll(f0, 5, axis=1).copy()
    for tag, tspec, ospec, frames in (
            ("chromah", "tpu:qp=30:chromah",
             f"cavlc:qp=30:slices={mb_h}:chromah", [f0]),
            ("chromah_i4", "tpu:qp=30:chromah:i4",
             f"cavlc:qp=30:slices={mb_h}:chromah:i4", [f0]),
            ("gop", "tpu:qp=30:gop=2:search=2:chromah:i4",
             f"cavlc:qp=30:gop=2:search=2:slices={mb_h}:chromah:i4",
             [f0, f1])):
        t0 = time.perf_counter()
        et = make_encoder(tspec, W, H, 30)
        eo = make_encoder(ospec, W, H, 30)
        bt = b"".join(b"".join(et.encode(f)) for f in frames)
        bo = b"".join(b"".join(eo.encode(f)) for f in frames)
        RES[f"identity_{tag}"] = {
            "byte_identical": bool(bt == bo),
            "stream_bytes": len(bt),
            "wall_s": round(time.perf_counter() - t0, 1)}
        print(f"identity {tag}: {bt == bo} ({len(bt)} bytes)",
              flush=True)
        save()
    RES["all_ok"] = all(
        v.get("byte_identical") for k, v in RES.items()
        if k.startswith("identity_"))
    save()
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
