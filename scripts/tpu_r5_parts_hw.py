"""Round-5 hardware parity pack for the inter partition modes
(16x8 / 8x16 / 8x8, --encoder=tpu:...:parts): byte-identity of the
device program vs the CPU oracle ON REAL TPU at small geometry, with
partition-decision evidence (pmode histogram from the chip), the
AU-size win vs P_16x16 on shear/rotation content, and libavcodec
conformance of every stream.

    python scripts/tpu_r5_parts_hw.py

Writes scripts/tpu_r5_parts_hw.json incrementally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

try:  # reuse cached executables across runs (remote compiles are slow)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

OUT = os.path.join(os.path.dirname(__file__), "tpu_r5_parts_hw.json")
W, H = 320, 192
MB_H = H // 16
QP = 30
N = 8

RESULTS = {"what": "inter partition modes on hardware: TPU/oracle "
                   "byte-identity, on-chip pmode histograms, AU-size "
                   "win vs P_16x16, libavcodec conformance",
           "stages": {}}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_frames(kind: str) -> list[np.ndarray]:
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (H, W), np.uint8)
    base = (base.reshape(H // 4, 4, W // 4, 4).mean((1, 3))
            .astype(np.uint8).repeat(4, 0).repeat(4, 1))
    uvb = rng.integers(96, 160, (H // 2, W), np.uint8)
    frames = []
    split = 88                   # mid MB row 5: MBs straddle motions
    for i in range(N):
        if kind == "shear":
            y = base.copy()
            y[:split] = np.roll(base[:split], 3 * i, 1)
            y[split:] = np.roll(base[split:], -3 * i, 1)
            uv = uvb.copy()
            uv[:split // 2] = np.roll(uvb[:split // 2], 2 * i, 1)
            uv[split // 2:] = np.roll(uvb[split // 2:], -2 * i, 1)
        else:  # rotation
            import cv2
            m = cv2.getRotationMatrix2D((W / 2, H / 2), 1.5 * i, 1.0)
            y = cv2.warpAffine(base, m, (W, H),
                               flags=cv2.INTER_NEAREST,
                               borderMode=cv2.BORDER_REPLICATE)
            uv = np.full((H // 2, W), 128, np.uint8)
        frames.append(np.concatenate([y, uv], 0))
    return frames


def stream(enc, frames) -> list[bytes]:
    aus = []
    for f in frames:
        aus.extend(enc.encode(f))
    aus.extend(enc.flush())
    return aus


def decode_ok(aus: list[bytes], expect: int) -> bool:
    import tempfile

    import cv2
    with tempfile.NamedTemporaryFile(suffix=".h264",
                                     delete=False) as tf:
        tf.write(b"".join(aus))
        path = tf.name
    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    cap.release()
    os.unlink(path)
    return n == expect


def pmode_stage(name: str, kind: str, search: int,
                subpel: int) -> None:
    """Run the device parts program on one frame pair, fetch the
    on-chip partition decision."""
    import jax.numpy as jnp

    from opencv_opencl_tpu.ops.h264_levels import encode_p_levels
    t0 = time.perf_counter()
    try:
        f0, f1 = make_frames(kind)[1:3]
        uv = f0[H:].reshape(H // 2, W // 2, 2)
        cb, cr = jnp.asarray(uv[:, :, 0]), jnp.asarray(uv[:, :, 1])
        plv = encode_p_levels(jnp.asarray(f1[:H]), cb, cr,
                              jnp.asarray(f0[:H]), cb, cr,
                              jnp.int32(QP), search, subpel, parts=1)
        pm = np.asarray(plv.pmode)
        hist = {str(k): int(v) for k, v in
                zip(*np.unique(pm, return_counts=True))}
        rec = {"ok": bool(sum(hist.get(k, 0)
                              for k in ("1", "2", "3")) > 0),
               "pmode_histogram": hist,
               "tpu_wall_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    RESULTS["stages"][name] = rec
    save()
    print(f"[{name}] {rec}", flush=True)


def parity_stage(name: str, kind: str, tpu_kw: dict) -> None:
    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)
    t0 = time.perf_counter()
    try:
        frames = make_frames(kind)
        got = stream(TpuGopEncoder(W, H, parts=True, **tpu_kw), frames)
        want = stream(GopCavlcEncoder(W, H, slices=MB_H, parts=True,
                                      **tpu_kw), frames)
        plain = stream(TpuGopEncoder(W, H, **tpu_kw), frames)
        ok = got == want
        conf = decode_ok(got, N)
        rec = {"byte_identical": bool(ok),
               "libavcodec_frames_ok": bool(conf),
               "au_bytes": [len(a) for a in got],
               "p_bytes_parts": sum(len(a) for a in got[1:]),
               "p_bytes_16x16": sum(len(a) for a in plain[1:]),
               "tpu_wall_s": round(time.perf_counter() - t0, 1)}
        rec["parts_win_pct"] = round(
            100 * (1 - rec["p_bytes_parts"] / rec["p_bytes_16x16"]), 1)
        rec["ok"] = bool(ok and conf)
    except Exception as e:
        rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    RESULTS["stages"][name] = rec
    save()
    print(f"[{name}] {rec}", flush=True)


def main() -> None:
    RESULTS["platform"] = jax.default_backend()
    RESULTS["devices"] = [str(d) for d in jax.devices()]
    print(f"platform: {RESULTS['platform']} {RESULTS['devices']}",
          flush=True)
    t0 = time.perf_counter()
    pmode_stage("pmode_shear", "shear", search=4, subpel=0)
    pmode_stage("pmode_rotation", "rotation", search=4, subpel=0)
    parity_stage("shear_fullpel", "shear",
                 dict(qp=QP, gop=N, search=4))
    parity_stage("shear_halfpel", "shear",
                 dict(qp=QP, gop=N, search=4, halfpel=True))
    parity_stage("rotation_qpel", "rotation",
                 dict(qp=QP, gop=N, search=2, quarterpel=True))
    parity_stage("rotation_fullpel", "rotation",
                 dict(qp=QP, gop=N, search=4))
    RESULTS["wall_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["all_ok"] = all(s.get("ok") for s in
                            RESULTS["stages"].values())
    save()
    print(json.dumps({"all_ok": RESULTS["all_ok"],
                      "wall_s": RESULTS["wall_s"]}), flush=True)
    if not RESULTS["all_ok"]:
        raise SystemExit("PARTS PACK FAILURE")


if __name__ == "__main__":
    main()
