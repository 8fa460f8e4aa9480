"""Round-4 hardware parity pack: every encoder device path built since
the 2026-08-17 tunnel outage, byte-checked against its CPU oracle ON
REAL TPU HARDWARE at small geometry (fast remote compiles), staged so a
mid-run outage still lands partial evidence.

Stages (each writes scripts/tpu_r4_hw.json incrementally):
  gop_basic    TpuGopEncoder(gop=6) zero-motion vs GopCavlcEncoder
  search_full  search=4 full-pel panning stream
  search_half  search=4 halfpel
  search_qpel  search=2 quarterpel
  refs2        refs=2 search=4 on flicker content
  gdr          gdr=3 marching wave (+ recovery SEI stream shape)
  gdr_search   gdr=3 + search=2 quarterpel (restricted motion)
  deblock      deblock=True recon chain (device wavefront)
  hrd          cpb=500/initdelay=250 re-encode loop (snapshot chain)
  fused_*      build_enhance_gop_fn (CLAHE fused into the GOP scan)
               vs the unfused device chain AND the CPU entropy oracle
  conformance  every stage's stream decoded through libavcodec

    python scripts/tpu_r4_hw.py          # on the real TPU (axon)

Oracles are pure numpy (no jax) — the comparison is hardware vs host
in ONE process, the same shape as tpu_r3_motion.parity().
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "tpu_r4_hw.json")
W, H = 320, 192
MB_H = H // 16
QP = 30
N = 8

RESULTS = {"what": "round-4 encoder device paths, hardware vs CPU "
                   "oracle byte-identity at 320x192 (+libavcodec "
                   "conformance)", "stages": {}}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_frames(kind: str) -> list[np.ndarray]:
    rng = np.random.default_rng(8)
    base_y = (rng.integers(0, 256, (H, W), np.uint8)
              .astype(np.int64).reshape(H // 4, 4, W // 4, 4)
              .mean(axis=(1, 3)).astype(np.uint8)
              .repeat(4, 0).repeat(4, 1))
    base_uv = rng.integers(96, 160, (H // 2, W), np.uint8)
    frames = []
    for i in range(N):
        if kind == "pan":
            y = np.roll(np.roll(base_y, 4 * i, 0), 4 * i, 1)
            uv = np.roll(np.roll(base_uv, 2 * i, 0), 4 * i, 1)
        elif kind == "flicker":
            # alternating two-phase content: refs=2 wins over refs=1
            y = np.roll(base_y, 8 * (i % 2), 1)
            uv = base_uv
        else:  # static-ish with a moving square (GDR/deblock)
            y = base_y.copy()
            x0 = (8 * i) % (W - 40)
            y[40:80, x0:x0 + 40] = 255
            uv = base_uv
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


def run_stage(name: str, tpu_kw: dict, oracle_kw: dict,
              kind: str = "pan", extra=None) -> None:
    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)
    t0 = time.perf_counter()
    try:
        frames = make_frames(kind)
        got = stream(TpuGopEncoder(W, H, **tpu_kw), frames)
        t_tpu = time.perf_counter() - t0
        want = stream(GopCavlcEncoder(W, H, **oracle_kw), frames)
        ok = got == want
        conf = decode_ok(got, N)
        rec = {"ok": bool(ok and conf), "byte_identical": bool(ok),
               "libavcodec_frames_ok": bool(conf),
               "au_bytes": [len(a) for a in got],
               "tpu_wall_s": round(t_tpu, 1)}
        if extra is not None:
            rec.update(extra(got, want) or {})
        if not ok:
            bad = next(i for i, (g, w) in enumerate(zip(got, want))
                       if g != w) if len(got) == len(want) else -1
            rec["first_mismatch_au"] = bad
    except Exception as e:  # land the failure, keep going
        rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    RESULTS["stages"][name] = rec
    save()
    print(f"[{name}] {rec}", flush=True)


def run_fused_stage(name: str, tpu_kw: dict, oracle_kw: dict,
                    kind: str = "square") -> None:
    """build_enhance_gop_fn byte-identity on hardware: the fused
    CLAHE+GOP device scan must stream byte-identical to (a) the plain
    enhance program + TpuGopEncoder device chain and (b) the CPU
    entropy oracle (GopCavlcEncoder) fed the device-enhanced frames.
    Mirrors tests/test_fused_encode.py::test_fused_gdr_matches_unfused
    but runs on the real TPU."""
    import jax.numpy as jnp
    from opencv_opencl_tpu.core.frames import ChromaPolicy, FrameSpec
    from opencv_opencl_tpu.io.h264_inter import (GopCavlcEncoder,
                                                 TpuGopEncoder)
    from opencv_opencl_tpu.models.enhancer import (EnhancerConfig,
                                                   build_enhance_fn)
    from opencv_opencl_tpu.models.fused_encode import (
        build_enhance_gop_fn)
    t0 = time.perf_counter()
    try:
        frames = np.stack(make_frames(kind))
        spec = FrameSpec(width=W, height=H, fps=30)
        cfg = EnhancerConfig(op="clahe", clip_limit=2.0,
                             tile_grid=(8, 8),
                             chroma=ChromaPolicy.PASSTHROUGH)
        plain = build_enhance_fn(cfg, spec, donate=False)
        enh = np.asarray(plain(frames))
        want_dev = stream(TpuGopEncoder(W, H, **tpu_kw), list(enh))
        want_cpu = stream(GopCavlcEncoder(W, H, **oracle_kw),
                          list(enh))
        enc = TpuGopEncoder(W, H, **tpu_kw)
        fn = build_enhance_gop_fn(
            cfg, spec, enc.gop, search=enc.search, subpel=enc.subpel,
            refs=enc.refs, deblock=enc.deblock, gdr=enc.gdr,
            bitpack=(enc._nw_mb if enc._bitpack else 0))
        recon = list(enc.initial_recon())
        got, idx = [], 0
        for lo, hi in ((0, 3), (3, 6), (6, N)):
            packed, *recon = fn(frames[lo:hi], jnp.int32(QP), idx,
                                *recon)
            idx += hi - lo
            for i in range(hi - lo):
                got.extend(enc.encode_from_packed(
                    np.asarray(packed)[i]))
        conf = decode_ok(got, N)
        rec = {"ok": bool(got == want_dev == want_cpu and conf),
               "fused_eq_device": bool(got == want_dev),
               "fused_eq_cpu_oracle": bool(got == want_cpu),
               "libavcodec_frames_ok": bool(conf),
               "au_bytes": [len(a) for a in got],
               "tpu_wall_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:  # land the failure, keep going
        rec = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    RESULTS["stages"][name] = rec
    save()
    print(f"[{name}] {rec}", flush=True)


def main() -> None:
    import jax
    RESULTS["platform"] = jax.default_backend()
    RESULTS["devices"] = [str(d) for d in jax.devices()]
    print(f"platform: {RESULTS['platform']} {RESULTS['devices']}",
          flush=True)
    t0 = time.perf_counter()
    run_stage("gop_basic",
              dict(qp=QP, gop=6),
              dict(qp=QP, gop=6, slices=MB_H))
    run_stage("search_full",
              dict(qp=QP, gop=6, search=4),
              dict(qp=QP, gop=6, slices=MB_H, search=4))
    run_stage("search_half",
              dict(qp=QP, gop=6, search=4, halfpel=True),
              dict(qp=QP, gop=6, slices=MB_H, search=4,
                   halfpel=True))
    run_stage("search_qpel",
              dict(qp=QP, gop=6, search=2, quarterpel=True),
              dict(qp=QP, gop=6, slices=MB_H, search=2,
                   quarterpel=True))
    run_stage("refs2",
              dict(qp=QP, gop=8, search=4, refs=2),
              dict(qp=QP, gop=8, slices=MB_H, search=4, refs=2),
              kind="flicker")
    run_stage("fastsub",
              dict(qp=QP, gop=6, search=4, fastsub=True),
              dict(qp=QP, gop=6, slices=MB_H, search=4,
                   fastsub=True))
    run_stage("gdr_fastsub",
              dict(qp=QP, gdr=3, search=2, fastsub=True),
              dict(qp=QP, gdr=3, slices=MB_H, search=2,
                   fastsub=True),
              kind="square")
    run_stage("fastsub_refs2",
              dict(qp=QP, gop=8, search=4, fastsub=True, refs=2),
              dict(qp=QP, gop=8, slices=MB_H, search=4,
                   fastsub=True, refs=2),
              kind="flicker")
    run_stage("bitpack_gop",
              dict(qp=QP, gop=6, search=2, bitpack=True),
              dict(qp=QP, gop=6, slices=MB_H, search=2))
    run_stage("bitpack_gdr_deblock",
              dict(qp=QP, gdr=3, search=2, deblock=True,
                   bitpack=True),
              dict(qp=QP, gdr=3, slices=MB_H, search=2,
                   deblock=True),
              kind="square")
    run_stage("gdr",
              dict(qp=QP, gdr=3),
              dict(qp=QP, gdr=3, slices=MB_H),
              kind="square")
    run_stage("gdr_search",
              dict(qp=QP, gdr=3, search=2, quarterpel=True),
              dict(qp=QP, gdr=3, slices=MB_H, search=2,
                   quarterpel=True),
              kind="square")
    run_stage("deblock",
              dict(qp=QP, gop=6, deblock=True),
              dict(qp=QP, gop=6, slices=MB_H, deblock=True),
              kind="square")
    run_stage("gdr_deblock",
              dict(qp=QP, gdr=3, deblock=True, search=2,
                   quarterpel=True),
              dict(qp=QP, gdr=3, slices=MB_H, deblock=True, search=2,
                   quarterpel=True),
              kind="square")
    run_stage("hrd",
              dict(qp=QP, gop=6, bitrate_kbps=400, fps=30.0,
                   cpb_ms=500, initial_delay_ms=250),
              dict(qp=QP, gop=6, slices=MB_H, bitrate_kbps=400,
                   fps=30.0, cpb_ms=500, initial_delay_ms=250),
              kind="square",
              extra=lambda got, want: {
                  "cpb_check": _cpb_clean(got, 400, 500, 250)})
    run_fused_stage("fused_gop_deblock",
                    dict(qp=QP, gop=6, deblock=True, search=2,
                         quarterpel=True),
                    dict(qp=QP, gop=6, slices=MB_H, deblock=True,
                         search=2, quarterpel=True))
    run_fused_stage("fused_gdr",
                    dict(qp=QP, gdr=3, deblock=True, search=2,
                         quarterpel=True),
                    dict(qp=QP, gdr=3, slices=MB_H, deblock=True,
                         search=2, quarterpel=True))
    run_fused_stage("fused_bitpack",
                    dict(qp=QP, gop=6, search=2, bitpack=True),
                    dict(qp=QP, gop=6, slices=MB_H, search=2))
    RESULTS["wall_s"] = round(time.perf_counter() - t0, 1)
    RESULTS["all_ok"] = all(s.get("ok") for s in
                            RESULTS["stages"].values())
    save()
    print(json.dumps({"all_ok": RESULTS["all_ok"],
                      "wall_s": RESULTS["wall_s"]}), flush=True)
    if not RESULTS["all_ok"]:
        raise SystemExit("PARITY FAILURE")


def _cpb_clean(aus, kbps, cpb_ms, initdelay_ms) -> dict:
    """Independent decoder-side leaky-bucket re-simulation."""
    from fractions import Fraction
    rate = Fraction(kbps * 1000)
    limit = Fraction(initdelay_ms, 1000)
    slack = Fraction(0)
    worst = Fraction(0)
    viol = 0
    for au in aus:
        slack = max(slack - Fraction(1, 30), Fraction(0)) \
            + Fraction(8 * len(au)) / rate
        worst = max(worst, slack)
        if slack > limit:
            viol += 1
    return {"violations": viol,
            "worst_delay_ms": round(float(worst) * 1e3, 2),
            "limit_ms": initdelay_ms}


if __name__ == "__main__":
    main()
