"""Round-5 hardware sub-pel discrimination pack (VERDICT r4 item 6):
the r4 parity pack's pan content rolled by whole pixels, so the
half-pel stage never actually SELECTED a fractional MV on the chip
(search_half streamed byte-identical AU sizes to search_full).  This
pack pans a smoothed high-resolution source by non-integer effective
steps (roll at 4x resolution, then 4x4 box downsample), so the true
inter-frame motion is 0.75 / 1.5 px — representable only on the
quarter/half-pel lattice — and asserts:

  mv_field_*   the device-chosen MV field contains fractional
               components (mv % 4 != 0 in quarter-pel wire units)
  half_vs_full the half-pel stream differs from the full-pel stream
               (the decision path is discriminating, not vacuous)
  byte-identity of every arm vs the CPU oracle, ON HARDWARE
  libavcodec decoder conformance of every stream

    python scripts/tpu_r5_subpel.py

Writes scripts/tpu_r5_subpel.json incrementally.
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

OUT = os.path.join(os.path.dirname(__file__), "tpu_r5_subpel.json")
W, H = 320, 192
MB_H = H // 16
QP = 30
N = 8

RESULTS = {"what": "sub-pel decision paths on hardware with content "
                   "whose true motion is fractional (0.75/1.5 px per "
                   "frame): MV fields must carry fractions, half-pel "
                   "streams must differ from full-pel, all arms "
                   "byte-identical to the CPU oracle + lavc-conformant",
           "stages": {}}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_frames(qpel_step: int, n: int = N) -> list[np.ndarray]:
    """Frames whose true pan is qpel_step quarter-pels per frame:
    roll a smooth 4x-resolution base by qpel_step, then 4x4 box-mean
    downsample.  Smooth content keeps the box-downsample close to the
    spec 6-tap interpolation, so fractional candidates win on SAD."""
    rng = np.random.default_rng(5)
    base4 = (rng.integers(0, 256, (H, W), np.uint8)
             .astype(np.int64).reshape(H // 8, 8, W // 8, 8)
             .mean(axis=(1, 3)).astype(np.uint8)
             .repeat(32, 0).repeat(32, 1))       # (4H, 4W), 8-px blobs
    # soften the blob edges at 4x so quarter-pel shifts change SAD
    # smoothly (three box passes ~ a wide separable blur)
    f = base4.astype(np.float32)
    for _ in range(3):
        f = (np.roll(f, 2, 1) + np.roll(f, -2, 1)
             + np.roll(f, 2, 0) + np.roll(f, -2, 0) + f) / 5.0
    base4 = f.astype(np.uint8)
    frames = []
    for i in range(n):
        r = (qpel_step * i) % (4 * W)
        y4 = np.roll(base4, r, 1)
        y = (y4.astype(np.uint32).reshape(H, 4, W, 4)
             .mean(axis=(1, 3)).astype(np.uint8))
        uv = np.full((H // 2, W), 128, np.uint8)  # flat chroma
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


def mv_field_stage(name: str, qpel_step: int, search: int,
                   subpel: int) -> None:
    """Run the device P program on one fractional-pan frame pair and
    count fractional components in the CHOSEN MV field."""
    import jax.numpy as jnp

    from opencv_opencl_tpu.ops.h264_levels import encode_p_levels
    t0 = time.perf_counter()
    try:
        f0, f1 = make_frames(qpel_step, 2)
        y0, y1 = f0[:H], f1[:H]
        uv = f0[H:].reshape(H // 2, W // 2, 2)
        cb = jnp.asarray(uv[:, :, 0])
        cr = jnp.asarray(uv[:, :, 1])
        plv = encode_p_levels(jnp.asarray(y1), cb, cr,
                              jnp.asarray(y0), cb, cr,
                              jnp.int32(QP), search, subpel)
        mv = np.asarray(plv.mv)
        inter = np.asarray(plv.mode) == 1
        frac = (mv % 4 != 0).any(-1) & inter
        rec = {"ok": bool(frac.sum() > 0),
               "inter_mbs": int(inter.sum()),
               "fractional_mv_mbs": int(frac.sum()),
               "mv_component_histogram": {
                   str(v): int(c) for v, c in zip(
                       *np.unique(mv[inter] % 4, return_counts=True))},
               "tpu_wall_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    RESULTS["stages"][name] = rec
    save()
    print(f"[{name}] {rec}", flush=True)


def parity_stage(name: str, qpel_step: int, tpu_kw: dict,
                 oracle_kw: dict, differs_from: str | None) -> None:
    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)
    t0 = time.perf_counter()
    try:
        frames = make_frames(qpel_step)
        got = stream(TpuGopEncoder(W, H, **tpu_kw), frames)
        want = stream(GopCavlcEncoder(W, H, slices=MB_H, **oracle_kw),
                      frames)
        ok = got == want
        conf = decode_ok(got, N)
        rec = {"byte_identical": bool(ok),
               "libavcodec_frames_ok": bool(conf),
               "au_bytes": [len(a) for a in got],
               "total_bytes": sum(len(a) for a in got),
               "tpu_wall_s": round(time.perf_counter() - t0, 1)}
        rec["ok"] = bool(ok and conf)
        if differs_from is not None:
            other = RESULTS["stages"].get(differs_from, {})
            differs = rec["au_bytes"] != other.get("au_bytes")
            rec["differs_from"] = differs_from
            rec["stream_differs"] = bool(differs)
            rec["ok"] = bool(rec["ok"] and differs)
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
    # chosen-MV-field fraction checks (device program, one P frame)
    mv_field_stage("mv_field_half", qpel_step=6, search=4, subpel=1)
    mv_field_stage("mv_field_quarter", qpel_step=3, search=2, subpel=2)
    mv_field_stage("mv_field_fastsub", qpel_step=3, search=4, subpel=3)
    # full streams: half-pel must beat/differ from full-pel at the
    # same radius on 1.5 px/frame content; quarter must differ from
    # half on 0.75 px/frame content
    parity_stage("full_at_half_content", 6,
                 dict(qp=QP, gop=N, search=4),
                 dict(qp=QP, gop=N, search=4), None)
    parity_stage("half", 6,
                 dict(qp=QP, gop=N, search=4, halfpel=True),
                 dict(qp=QP, gop=N, search=4, halfpel=True),
                 "full_at_half_content")
    parity_stage("full_at_quarter_content", 3,
                 dict(qp=QP, gop=N, search=2),
                 dict(qp=QP, gop=N, search=2), None)
    parity_stage("half_at_quarter_content", 3,
                 dict(qp=QP, gop=N, search=2, halfpel=True),
                 dict(qp=QP, gop=N, search=2, halfpel=True),
                 "full_at_quarter_content")
    parity_stage("quarter", 3,
                 dict(qp=QP, gop=N, search=2, quarterpel=True),
                 dict(qp=QP, gop=N, search=2, quarterpel=True),
                 "half_at_quarter_content")
    parity_stage("full_r4_at_quarter_content", 3,
                 dict(qp=QP, gop=N, search=4),
                 dict(qp=QP, gop=N, search=4), None)
    parity_stage("fastsub", 3,
                 dict(qp=QP, gop=N, search=4, fastsub=True),
                 dict(qp=QP, gop=N, search=4, fastsub=True),
                 "full_r4_at_quarter_content")
    RESULTS["wall_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["all_ok"] = all(s.get("ok") for s in
                            RESULTS["stages"].values())
    save()
    print(json.dumps({"all_ok": RESULTS["all_ok"],
                      "wall_s": RESULTS["wall_s"]}), flush=True)
    if not RESULTS["all_ok"]:
        raise SystemExit("SUBPEL PACK FAILURE")


if __name__ == "__main__":
    main()
