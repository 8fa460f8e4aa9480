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

import jax
import numpy as np

try:  # reuse cached executables across runs (remote compiles are slow)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

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

    # --- device-vs-host decomposition (what a PCIe host would get) ---
    # The end-to-end fps above mostly measures the ~7 MB/s tunnel; this
    # section times each component in isolation so the artifact shows
    # the machine-limited cost: device program ms (chained fori_loop,
    # data-dependent), host entropy ms on host-resident level arrays,
    # and the remainder = tunnel + dispatch overhead.
    try:
        out["decomposition"] = decomposition(frames)
        for label, arm in out["arms"].items():
            d = out["decomposition"]["arms"].get(label)
            if d:
                arm["tunnel_overhead_ms_estimate"] = round(
                    arm["ms_per_frame"]
                    - d["pcie_projection_ms_per_frame"], 3)
    except Exception as e:  # land partial evidence
        out["decomposition"] = {"error": f"{type(e).__name__}: {e}"}
    save()
    if not ok:
        raise SystemExit("PARITY FAILURE")
    print(json.dumps(out), flush=True)


def _chain_ms(fn, y, chain=32):
    """Honest device ms/iter: data-dependent chained fori_loop + scalar
    fetch (block_until_ready is a no-op on the axon tunnel)."""
    import jax.numpy as jnp

    @jax.jit
    def run(y, n):
        out = jax.lax.fori_loop(0, n, lambda i, y: fn(y), y)
        return jnp.sum(out.astype(jnp.int32))

    t0 = time.perf_counter()
    _ = int(run(y, 1))
    compile_s = time.perf_counter() - t0
    samples = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = int(run(y, 1))
        t1 = time.perf_counter()
        _ = int(run(y, chain + 1))
        t2 = time.perf_counter()
        samples.append(max(((t2 - t1) - (t1 - t0)) / chain, 1e-9) * 1e3)
    return sorted(samples)[1], compile_s


def decomposition(frames) -> dict:
    import jax.numpy as jnp

    from opencv_opencl_tpu.io.h264_inter import TpuGopEncoder
    from opencv_opencl_tpu.ops.h264_levels import encode_p_levels
    from opencv_opencl_tpu.ops.h264_bitpack import pack_p_mbs

    h16 = -(-H // 16) * 16
    rng = np.random.default_rng(1)
    y = jax.device_put(rng.integers(0, 256, (h16, W), np.uint8))
    cb = jax.device_put(rng.integers(0, 256, (h16 // 2, W // 2),
                                     np.uint8))
    cr = jax.device_put(rng.integers(0, 256, (h16 // 2, W // 2),
                                     np.uint8))
    ry, rcb, rcr = y, cb, cr

    def dev_p(yy):
        plv = encode_p_levels(yy, cb, cr, ry, rcb, rcr, jnp.int32(QP),
                              SEARCH, 0)
        bump = (jnp.sum(plv.mode.astype(jnp.int32)) & 1
                ).astype(jnp.uint8)
        return yy + bump

    def dev_p_pack(yy):
        plv = encode_p_levels(yy, cb, cr, ry, rcb, rcr, jnp.int32(QP),
                              SEARCH, 0)
        words, nbits = pack_p_mbs(plv.mode, plv.zdc, plv.acz, plv.czdc,
                                  plv.cacz, plv.mv, plv.ref,
                                  jnp.int32(1), nw_mb=64)
        bump = (jnp.sum(nbits.astype(jnp.int32)) & 1).astype(jnp.uint8)
        return yy + bump

    dev_ms, dev_compile = _chain_ms(dev_p, y)
    print(f"[decomp] device P program: {dev_ms:.3f} ms/frame "
          f"(compile {dev_compile:.1f}s)", flush=True)
    devb_ms, devb_compile = _chain_ms(dev_p_pack, y)
    print(f"[decomp] device P+bitpack: {devb_ms:.3f} ms/frame "
          f"(compile {devb_compile:.1f}s)", flush=True)

    # host entropy ms on host-resident arrays (a steady-state P frame
    # of the real soak stream), for both arms
    rec = {}
    for label, kw in (("host_entropy", {}), ("bitpack",
                                             {"bitpack": True})):
        enc = TpuGopEncoder(W, H, qp=QP, gop=GOP, search=SEARCH, **kw)
        for f in frames[:2]:
            enc.encode(f)
        pend = enc._dispatch(frames[2])
        # force everything to host once so the timed loop never
        # touches the tunnel (np asarray on numpy is free)
        lv = tuple(np.asarray(a) for a in pend[0])
        mv = None if pend[4] is None else np.asarray(pend[4])
        ref = None if pend[5] is None else np.asarray(pend[5])
        bits = None
        d2h = sum(a.nbytes for a in lv[1:]) + lv[0].nbytes
        if mv is not None:
            d2h += mv.nbytes
        if len(pend) > 8:  # bitpack arm: device bitstrings ride down
            bits = tuple(np.asarray(a) for a in pend[8])
            # bitpack D2H = packed words + bit counts + the mode row
            # (slice-tail skip runs) — the levels stay on device
            d2h = sum(a.nbytes for a in bits) + lv[0].nbytes
        reps = []
        for _i in range(7):
            t0 = time.perf_counter()
            au = enc._assemble(lv, "p", pend[2], pend[3], mv=mv,
                               ref=ref, active_refs=pend[6],
                               prefix=b"", bits=bits)
            reps.append(time.perf_counter() - t0)
        host_ms = sorted(reps)[len(reps) // 2] * 1e3
        dev = devb_ms if label == "bitpack" else dev_ms
        rec[label] = {
            "host_entropy_ms": round(host_ms, 3),
            "d2h_bytes_per_frame": int(d2h),
            "au_bytes": len(au),
            "device_ms": round(dev, 3),
            "pcie_projection_ms_per_frame": round(dev + host_ms, 3),
            "pcie_projection_fps": round(1e3 / (dev + host_ms), 1)}
        print(f"[decomp] {label}: {rec[label]}", flush=True)
    return {
        "what": "component costs in isolation: device program ms "
                "(chained), host entropy ms (host-resident arrays), "
                "D2H payload bytes; pcie_projection = device + host "
                "(transfers overlap/are negligible at PCIe rates — "
                "the soak fps above is tunnel-bound at ~7 MB/s)",
        "device_p_ms_per_frame": round(dev_ms, 3),
        "device_p_bitpack_ms_per_frame": round(devb_ms, 3),
        "device_compile_s": [round(dev_compile, 1),
                             round(devb_compile, 1)],
        "arms": rec}


if __name__ == "__main__":
    main()
