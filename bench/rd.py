"""Rate-distortion benchmark: PSNR-vs-bits across the encoder ladder.

    python -m bench.rd [--quick]

Byte-identity (the repo's correctness bar) proves the TPU encoder
emits exactly what the oracle emits — this quantifies COMPRESSION
QUALITY: encode a hun.png-derived motion clip at several QPs with each
feature rung (intra-only -> GOP -> +search -> +fastsub -> +parts) and
record (kbits/s at 30 fps, PSNR-Y of the conformance-proven
reconstruction).  The round-4 verdict's ask: does the feature work
(motion search, sub-pel, partitions) pay off in RD terms, not just in
AU-size anecdotes?

Anchors: this zero-egress container ships NO H.264 encoder (the
libavcodec build decodes H.264 but has no libx264; no ffmpeg/x264
binaries; h264_v4l2m2m needs a V4L2 device) — so the external anchors
are what cv2.VideoWriter can actually encode here: MJPG across its
quality range (JPEG, intra-only — the fair baseline for our intra
rung) and the single-operating-point mpeg4.  An x264 comparison needs
a network-connected host; the JSON marks the anchor codecs explicitly.

Streams are produced by the ORACLE (GopCavlcEncoder) — byte-identical
to the TPU encoder by the parity suites, so the RD numbers hold for
both; PSNR uses the encoder's own reconstruction, which libavcodec
conformance testing proves equals the decoder's output.
"""

from __future__ import annotations

import json
import os
import sys
import time

QPS = (24, 30, 36, 42)
W, H = 320, 192
N = 16
GOP = 16


def make_clip():
    """hun.png crop with global pan + a rotating inset: real image
    statistics, mixed motion (reference asset, SURVEY §2 #25)."""
    import cv2
    import numpy as np

    img = cv2.imread("/root/reference/hun.png")
    if img is None:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (600, 800, 3), np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3)
    yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)
    ybase = yuv[:, :, 0]
    frames = []
    for i in range(N):
        x0, y0 = 200 + 2 * i, 150 + i          # global pan
        y = ybase[y0:y0 + H, x0:x0 + W].copy()
        m = cv2.getRotationMatrix2D((W / 2, H / 2), 1.0 * i, 1.0)
        inset = cv2.warpAffine(y, m, (W, H), flags=cv2.INTER_NEAREST,
                               borderMode=cv2.BORDER_REPLICATE)
        y[48:144, 80:240] = inset[48:144, 80:240]  # rotating center
        u = cv2.resize(yuv[y0:y0 + H, x0:x0 + W, 1], (W // 2, H // 2))
        v = cv2.resize(yuv[y0:y0 + H, x0:x0 + W, 2], (W // 2, H // 2))
        uv = np.empty((H // 2, W), np.uint8)
        uv[:, 0::2], uv[:, 1::2] = u, v
        frames.append(np.concatenate([y, uv], 0))
    return frames


def psnr_y(recons, frames):
    import numpy as np

    e = 0.0
    for r, f in zip(recons, frames):
        d = r[0].astype(np.float64) - f[:H].astype(np.float64)
        e += float((d * d).mean())
    mse = e / len(recons)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def run_rung(label: str, frames, qp: int, **kw) -> dict:
    from opencv_opencl_tpu.io.h264_inter import GopCavlcEncoder

    mb_h = -(-H // 16)
    enc = GopCavlcEncoder(W, H, qp=qp, slices=mb_h, **kw)
    t0 = time.perf_counter()
    bits = 0
    recons = []
    for f in frames:
        for au in enc.encode(f):
            bits += 8 * len(au)
        recons.append(enc._recon)
    return {"rung": label, "qp": qp,
            "kbits_per_s_at_30fps": round(bits / N * 30 / 1e3, 1),
            "psnr_y_db": round(psnr_y(recons, frames), 2),
            "encode_s": round(time.perf_counter() - t0, 1)}


def run_anchor_mjpg(frames, quality: int) -> dict:
    """Motion-JPEG anchor via per-frame libjpeg (cv2.imencode) — the
    VideoWriter backend here ignores VIDEOWRITER_PROP_QUALITY, and an
    MJPG stream IS the concatenation of its JPEG frames."""
    import cv2
    import numpy as np

    bits = 0
    e = 0.0
    for f in frames:
        ok, buf = cv2.imencode(
            ".jpg", f[:H], [cv2.IMWRITE_JPEG_QUALITY, quality])
        assert ok
        bits += 8 * len(buf)
        d = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
        diff = d.astype(np.float64) - f[:H].astype(np.float64)
        e += float((diff * diff).mean())
    psnr = (99.0 if e == 0 else
            10 * np.log10(255.0 * 255.0 / (e / len(frames))))
    return {"rung": "anchor_mjpg", "quality": quality,
            "kbits_per_s_at_30fps": round(bits / N * 30 / 1e3, 1),
            "psnr_y_db": round(psnr, 2), "decoded_frames": len(frames)}


def run_anchor_mp4v(frames) -> dict:
    import cv2
    import numpy as np
    import tempfile

    p = tempfile.mktemp(suffix=".avi")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (W, H), isColor=False)
    for f in frames:
        wr.write(f[:H])
    wr.release()
    bits = 8 * os.path.getsize(p)
    cap = cv2.VideoCapture(p)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    e, n = 0.0, 0
    for f in frames:
        ok, d = cap.read()
        if not ok:
            break
        d = d.reshape(-1, W)[:H]
        diff = d.astype(np.float64) - f[:H].astype(np.float64)
        e += float((diff * diff).mean())
        n += 1
    cap.release()
    os.unlink(p)
    psnr = (99.0 if e == 0 else
            10 * np.log10(255.0 * 255.0 / (e / max(n, 1))))
    return {"rung": "anchor_mpeg4_default", "quality": None,
            "kbits_per_s_at_30fps": round(bits / N * 30 / 1e3, 1),
            "psnr_y_db": round(psnr, 2), "decoded_frames": n}


RUNGS = [
    ("intra_only", dict(gop=1)),
    ("intra_only_i4", dict(gop=1, i4=True)),
    ("gop_zero_motion", dict(gop=GOP)),
    ("gop_search8", dict(gop=GOP, search=8)),
    ("gop_fastsub8", dict(gop=GOP, search=8, fastsub=True)),
    ("gop_search8_parts", dict(gop=GOP, search=8, parts=True)),
    ("gop_search8_i4", dict(gop=GOP, search=8, i4=True)),
]


def main() -> None:
    quick = "--quick" in sys.argv
    frames = make_clip()
    qps = QPS[1:3] if quick else QPS
    out = {"what": "RD ladder (PSNR-Y vs kbits/s at 30 fps, 320x192 "
                   "hun.png pan+rotation clip, 16 frames, gop=16); "
                   "streams from the oracle = byte-identical to the "
                   "TPU encoder; PSNR from the conformance-proven "
                   "reconstruction",
           "anchor_note": "no H.264 encoder exists in this container "
                          "(decode-only libavcodec, no x264) — "
                          "anchors are cv2's MJPG quality sweep and "
                          "single-point mpeg4",
           "points": []}
    for label, kw in RUNGS:
        for qp in qps:
            pt = run_rung(label, frames, qp, **kw)
            out["points"].append(pt)
            print(json.dumps(pt), flush=True)
    for q in (25, 50, 75, 95):
        pt = run_anchor_mjpg(frames, q)
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
    pt = run_anchor_mp4v(frames)
    out["points"].append(pt)
    print(json.dumps(pt), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..",
                        "scripts", "rd_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}", flush=True)


if __name__ == "__main__":
    main()
