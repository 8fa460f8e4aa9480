"""1080p hardware byte-identity spot check: TpuGopEncoder vs the CPU
oracle at the geometry where the (misconfigured) r3 soak reported a
mismatch — 1080 is not 16-divisible, so the padded frame has 68 MB
rows and the oracle must be built with slices=ceil(H/16), not H//16
(scripts/tpu_r3_enc_soak.py commit 3934f4b).  Short on purpose: the
numpy oracle is slow at 1080p; one IDR + 3 P frames with search=8
already exercise padding/cropping, the recon chain, motion and the
slice geometry on real hardware.

    python scripts/tpu_r4_1080p_parity.py

Writes scripts/tpu_r4_1080p_parity.json incrementally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

W, H = 1920, 1080
QP = 30
FRAMES = 4

OUT = os.path.join(os.path.dirname(__file__), "tpu_r4_1080p_parity.json")


def make_frames(n):
    rng = np.random.default_rng(0)
    base_y = (rng.integers(0, 256, (H, W), np.uint8)
              .astype(np.int64).reshape(H // 8, 8, W // 8, 8)
              .mean(axis=(1, 3)).astype(np.uint8)
              .repeat(8, 0).repeat(8, 1))
    base_uv = rng.integers(96, 160, (H // 2, W), np.uint8)
    for i in range(n):
        y = np.roll(base_y, (2 * i) % 64, 1)
        uv = np.roll(base_uv, (2 * i) % 64, 1)  # 2 bytes = 1 chroma px
        yield np.concatenate([y, uv], 0)


def main() -> None:
    import jax

    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)

    out = {"what": "1080p TpuGopEncoder vs CPU oracle byte-identity "
                   "on hardware (IDR + 3 P, search=8, slices=68)",
           "platform": jax.default_backend(), "frames": []}
    tpu = TpuGopEncoder(W, H, qp=QP, gop=30, search=8)
    oracle = GopCavlcEncoder(W, H, qp=QP, gop=30, slices=-(-H // 16),
                             search=8)
    all_ok = True
    for i, f in enumerate(make_frames(FRAMES)):
        t0 = time.time()
        t_au = tpu.encode(f)
        t1 = time.time()
        o_au = oracle.encode(f)
        ok = t_au == o_au
        all_ok &= ok
        rec = {"frame": i, "ok": bool(ok),
               "au_bytes": sum(len(a) for a in t_au),
               "tpu_wall_s": round(t1 - t0, 1),
               "oracle_wall_s": round(time.time() - t1, 1)}
        out["frames"].append(rec)
        out["all_ok"] = bool(all_ok)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)
        print(rec, flush=True)
    print(json.dumps({"all_ok": all_ok}), flush=True)
    if not all_ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
