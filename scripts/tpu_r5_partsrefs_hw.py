"""parts x refs=2 on real hardware: TPU/oracle byte-identity at 1080p
(full-pel and quarter-pel) on flicker+shear content with mixed
per-partition references.

    python scripts/tpu_r5_partsrefs_hw.py

Writes scripts/tpu_r5_partsrefs_hw.json.
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
                   "tpu_r5_partsrefs_hw.json")
RES = {"what": "parts x refs=2 on hardware: TPU/oracle "
               "byte-identity (1080p flicker+shear)",
       "platform": None}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)


def frames(W, H, n=4):
    rng = np.random.default_rng(5)
    base = (rng.integers(0, 256, (H // 8 + 4, W // 8 + 4), np.uint8)
            .repeat(8, 0).repeat(8, 1))
    out = []
    for i in range(n):
        y = np.empty((H, W), np.uint8)
        for r in range(H):
            y[r] = np.roll(base[r + 8, 8:8 + W],
                           (r * i) // H + 2 * i)
        if i % 2 == 0:
            y = np.clip(y.astype(np.int32) + 20, 0,
                        255).astype(np.uint8)
        uv = np.full((H // 2, W), 128, np.uint8)
        out.append(np.concatenate([y, uv]).copy())
    return out


def main() -> None:
    RES["platform"] = jax.default_backend()
    print("platform:", RES["platform"], flush=True)
    save()
    from opencv_opencl_tpu.io.encoder import make_encoder

    W, H = 1920, 1080
    mb_h = -(-H // 16)
    fs = frames(W, H)
    for tag, tail in (
            ("fullpel", "gop=4:search=3:refs=2:parts"),
            ("qpel", "gop=4:search=2:refs=2:parts:quarterpel")):
        t0 = time.perf_counter()
        et = make_encoder("tpu:qp=30:" + tail, W, H, 30)
        eo = make_encoder(f"cavlc:qp=30:{tail}:slices={mb_h}",
                          W, H, 30)
        bt = b"".join(b"".join(et.encode(f)) for f in fs)
        bo = b"".join(b"".join(eo.encode(f)) for f in fs)
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
