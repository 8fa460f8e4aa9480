"""Round-5 hardware ladder AFTER the MXU block-ones SAD landed in
every device search path (ops/h264_levels._sad_field /
_sad_quad_fields — probe: scripts/tpu_r5_mxu_sad.json, 7x/21x on the
keys loops).  Re-times the fused enhance+GOP+search ladder and the
parts programs against the VPU-reduce baselines
(scripts/tpu_r5_fused_search.json, scripts/tpu_r5_parts_timing3.log),
plus a focused on-chip byte-identity smoke (4 frames, 1080p, search=8
full-pel, 16x16 AND parts) proving the MXU SAD preserves the
TPU/oracle stream contract on real hardware.

    python scripts/tpu_r5_mxu_ladder.py

Writes scripts/tpu_r5_mxu_ladder.json incrementally.
"""
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "tpu_r5_mxu_ladder.json")
RES = {"what": "post-MXU-SAD hardware ladder: fused "
               "enhance+GOP+search ms/frame + parts timing + on-chip "
               "byte-identity smoke",
       "baseline_fused": "scripts/tpu_r5_fused_search.json (VPU SAD)",
       "baseline_parts": "scripts/tpu_r5_parts_timing3.log (VPU SAD): "
                         "1080p s8 49.1 ms, 1080p s8 halfpel 188.1 "
                         "ms, 4K s8 392.1 ms",
       "platform": None, "fused": [], "parts": [], "identity": {}}


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)


def fused_rungs() -> None:
    spec = importlib.util.spec_from_file_location(
        "fs", os.path.join(HERE, "tpu_r5_fused_search.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    for args in ((1920, 1080, 8, 0), (1920, 1080, 8, 3),
                 (3840, 2160, 8, 0), (3840, 2160, 4, 0),
                 (3840, 2160, 2, 0), (1920, 1080, 4, 0),
                 (1920, 1080, 2, 0), (3840, 2160, 8, 3)):
        try:
            RES["fused"].append(m.measure(*args))
        except Exception as e:
            RES["fused"].append(
                {"width": args[0], "height": args[1],
                 "search": args[2], "subpel": args[3],
                 "error": f"{type(e).__name__}: {e}"})
        save()
    four_k = [g for g in RES["fused"]
              if g.get("width") == 3840 and "ms_per_frame" in g]
    if four_k:
        best = min(g["ms_per_frame"] for g in four_k)
        RES["fused_4k60_with_search"] = bool(best <= 1000.0 / 60.0)
        RES["fused_4k_best_ms"] = best
        RES["fused_4k30_with_search"] = bool(best <= 1000.0 / 30.0)
    save()


def parts_rungs() -> None:
    from opencv_opencl_tpu.ops.h264_levels import encode_p_levels

    def measure(width, height, search, subpel):
        H16 = -(-height // 16) * 16
        W16 = -(-width // 16) * 16
        rng = np.random.default_rng(0)
        y = jax.device_put(
            rng.integers(0, 256, (H16, W16), np.uint8))
        cb = jax.device_put(
            rng.integers(0, 256, (H16 // 2, W16 // 2), np.uint8))
        cr = jax.device_put(
            rng.integers(0, 256, (H16 // 2, W16 // 2), np.uint8))

        @jax.jit
        def step(y, cb, cr, ry, rcb, rcr):
            out = encode_p_levels(y, cb, cr, ry, rcb, rcr,
                                  jnp.int32(30), search=search,
                                  subpel=subpel, parts=True)
            return out.recon_y, out.recon_cb, out.recon_cr

        @jax.jit
        def chained(y, cb, cr, n):
            def body(i, st):
                ry, rcb, rcr = st
                return step(y, cb, cr, ry, rcb, rcr)

            ry, rcb, rcr = jax.lax.fori_loop(
                0, n, body, (y, cb, cr))
            return (jnp.sum(ry.astype(jnp.int32))
                    + jnp.sum(rcb.astype(jnp.int32)))

        t0 = time.perf_counter()
        _ = int(chained(y, cb, cr, 1))
        compile_s = time.perf_counter() - t0
        samples = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = int(chained(y, cb, cr, 1))
            t1 = time.perf_counter()
            _ = int(chained(y, cb, cr, 9))
            t2 = time.perf_counter()
            samples.append(max(((t2 - t1) - (t1 - t0)) / 8, 1e-9)
                           * 1e3)
        ms = sorted(samples)[1]
        print(f"parts {width}x{height} search={search} "
              f"subpel={subpel}: {ms:.3f} ms/frame "
              f"(compile {compile_s:.0f}s)", flush=True)
        return {"width": width, "height": height, "search": search,
                "subpel": subpel, "ms_per_frame": round(ms, 3),
                "fps": round(1e3 / ms, 1),
                "compile_s": round(compile_s, 1)}

    for args in ((1920, 1080, 8, 0), (1920, 1080, 8, 1),
                 (3840, 2160, 8, 0)):
        try:
            RES["parts"].append(measure(*args))
        except Exception as e:
            RES["parts"].append(
                {"width": args[0], "height": args[1],
                 "search": args[2], "subpel": args[3],
                 "error": f"{type(e).__name__}: {e}"})
        save()


def identity_smoke() -> None:
    """4 frames of odd-step pan at 1080p through the real encoder on
    TPU vs the CPU oracle stream — search=8, 16x16 and parts."""
    from opencv_opencl_tpu.io.encoder import make_encoder

    rng = np.random.default_rng(7)
    W, H = 1920, 1080
    base = rng.integers(0, 256, (H + 64, W + 64), np.uint8)
    frames = []
    for i in range(4):
        dy, dx = 3 * i, 5 * i
        yp = base[32 + dy:32 + dy + H, 32 + dx:32 + dx + W]
        uv = rng.integers(0, 256, (H // 2, W), np.uint8)
        frames.append(np.concatenate([yp, uv]).copy())
    mb_h = -(-H // 16)
    for tag, spec_str in (("16x16", "tpu:gop=8:search=8"),
                          ("parts", "tpu:gop=8:search=8:parts")):
        # the TPU path's oracle twin is one slice per MB row
        oracle_spec = (spec_str.replace("tpu:", "cavlc:")
                       + f":slices={mb_h}")

        def stream(spec):
            enc = make_encoder(spec, W, H, 30)
            out = b""
            for f in frames:
                r = enc.encode(f)
                out += b"".join(r) if isinstance(r, list) else r
            fl = getattr(enc, "flush", lambda: b"")()
            return out + (b"".join(fl) if isinstance(fl, list)
                          else (fl or b""))

        t0 = time.perf_counter()
        bt = stream(spec_str)
        bo = stream(oracle_spec)
        ok = bt == bo
        RES["identity"][tag] = {
            "byte_identical": bool(ok), "stream_bytes": len(bt),
            "wall_s": round(time.perf_counter() - t0, 1)}
        print(f"identity {tag}: {ok} ({len(bt)} bytes)", flush=True)
        save()
    RES["identity"]["all_ok"] = all(
        v.get("byte_identical") for v in RES["identity"].values()
        if isinstance(v, dict))
    save()


def main() -> None:
    RES["platform"] = jax.default_backend()
    print("platform:", RES["platform"], flush=True)
    save()
    identity_smoke()
    fused_rungs()
    parts_rungs()
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
