"""Sustained-throughput soak of the full TPU GOP encoder on hardware:
300 frames of 1080p panning content through TpuGopEncoder
(gop=30, search=8, native entropy), measuring steady-state fps of the
COMPLETE encoder (device dispatch + host entropy, overlap mode), with
stream-level evidence (AU sizes, skip collapse) and a byte-identity
spot check vs the CPU oracle on the first 40 frames.

    python scripts/tpu_r3_enc_soak.py

Writes scripts/tpu_r3_enc_soak.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

W, H = 1920, 1080
GOP = 30
SEARCH = 8
QP = 30
FRAMES = 300


def make_frames(n):
    rng = np.random.default_rng(0)
    base_y = (rng.integers(0, 256, (H, W), np.uint8)
              .astype(np.int64).reshape(H // 8, 8, W // 8, 8)
              .mean(axis=(1, 3)).astype(np.uint8)
              .repeat(8, 0).repeat(8, 1))
    base_uv = rng.integers(96, 160, (H // 2, W), np.uint8)
    for i in range(n):
        y = np.roll(base_y, (2 * i) % 64, 1)
        # base_uv is INTERLEAVED NV12 UV: one chroma pixel = 2 bytes,
        # so the roll must be even or U/V swap phase and chroma becomes
        # unpredictable noise (the original i%32 roll made P frames as
        # large as IDRs).  2 bytes/frame = 1 chroma px = the luma pan/2.
        uv = np.roll(base_uv, (2 * i) % 64, 1)
        yield np.concatenate([y, uv], 0)


def main() -> None:
    from opencv_opencl_tpu.io.h264_inter import (
        GopCavlcEncoder, TpuGopEncoder)

    # byte-identity spot check first (12 frames: one IDR + 11 P;
    # the exhaustive numpy oracle is slow at 1080p, keep it short)
    tpu = TpuGopEncoder(W, H, qp=QP, gop=GOP, search=SEARCH)
    # one slice per padded MB row (1080 -> 68 rows): TpuGopEncoder's
    # contract is GopCavlcEncoder(slices=mb_h), NOT H // 16 — the two
    # differ at non-16-divisible heights (verified: H=184 mismatches
    # with H//16, matches with the ceil)
    oracle = GopCavlcEncoder(W, H, qp=QP, gop=GOP, slices=-(-H // 16),
                             search=SEARCH)
    ok = True
    for i, f in enumerate(make_frames(12)):
        if tpu.encode(f) != oracle.encode(f):
            ok = False
            print(f"MISMATCH at frame {i}", flush=True)
            break
    print(f"12-frame byte-identity vs oracle: {ok}", flush=True)

    # sustained soaks, overlap mode (dispatch/entropy pipelined):
    # host-entropy arm, then the device bit-packing arm
    frames = list(make_frames(FRAMES))
    out = {"what": "TpuGopEncoder 1080p soak (gop=30, search=8, "
                   "overlap): sustained fps of the complete encoder; "
                   "arm 'bitpack' packs the CAVLC bits on device "
                   "(host = headers + concat + escape only)",
           "byte_identity_12": bool(ok), "arms": {}}

    def save() -> None:
        with open("scripts/tpu_r3_enc_soak.json", "w") as f:
            json.dump(out, f, indent=1)

    for label, kw in (("host_entropy", {}), ("bitpack",
                                            {"bitpack": True})):
        enc = TpuGopEncoder(W, H, qp=QP, gop=GOP, search=SEARCH,
                            overlap=True, **kw)
        sizes = []
        for f in frames[:3]:        # warm the compiles
            for au in enc.encode(f):
                sizes.append(len(au))
        t0 = time.perf_counter()
        done0 = len(sizes)
        for f in frames[3:]:
            for au in enc.encode(f):
                sizes.append(len(au))
        for au in enc.flush():
            sizes.append(len(au))
        dt = time.perf_counter() - t0
        n = len(sizes) - done0
        fps = n / dt
        idr = sizes[:: GOP]
        p_sizes = [s for i, s in enumerate(sizes) if i % GOP]
        out["arms"][label] = {
            "frames": len(sizes),
            "fps": round(fps, 1), "ms_per_frame": round(1e3 / fps, 3),
            "idr_bytes_mean": int(np.mean(idr)),
            "p_bytes_mean": int(np.mean(p_sizes)),
            "p_bytes_p95": int(np.percentile(p_sizes, 95)),
            "total_bytes": int(sum(sizes)),
            "total_kbits_per_s_at_30fps": round(
                sum(sizes) * 8 * 30 / len(sizes) / 1e3, 1)}
        print(f"[{label}] {out['arms'][label]}", flush=True)
        save()
    arms = out["arms"]
    out["streams_equal_bytes"] = (
        arms["host_entropy"]["total_bytes"]
        == arms["bitpack"]["total_bytes"])
    save()
    if not ok:
        raise SystemExit("PARITY FAILURE")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
