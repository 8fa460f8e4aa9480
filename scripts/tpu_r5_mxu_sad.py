"""Probe: MXU block-ones dots as the motion-search SAD reduction.

The search's per-candidate cost is NOT bandwidth (89 us/pass at 1080p
for ~4 MB of reads) — it is the VPU window reduce.  A two-dot MXU
formulation computes the same 16x16 (or 8x8) block sums:

    colsum = ad @ CB        CB (W, mb_w) block-ones   [ad <= 255: 8b]
    sad    = RB @ colsum    RB (mb_h, H) block-ones   [colsum <= 4080:
                                                       12 bits]

Per CLAUDE.md's measured bf16-split rule, f32 MXU dots are EXACT when
every OPERAND fits <= 15 mantissa bits — both do here (the OUTPUT is
f32 accumulation, exact below 2^24).  That rule is hardware-measured
(scripts/tpu_r2b_lut.json), so this probe must run ON CHIP:

  1. exactness: MXU SAD field == VPU SAD field over random frames and
     candidate offsets, elementwise, at 16x16 AND 8x8 granularity;
  2. speed: chained per-candidate cost of both formulations.

    python scripts/tpu_r5_mxu_sad.py

Writes scripts/tpu_r5_mxu_sad.json.
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

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "tpu_r5_mxu_sad.json")
W, H, SEARCH, CHAIN = 1920, 1088, 8, 32
mb_h, mb_w = H // 16, W // 16
RES = {"what": "MXU block-ones-dot SAD vs VPU window reduce: "
              "elementwise exactness on chip + chained per-candidate "
              "cost (1080p, search=8 full-pel grid)"}


def blocks(n, b):
    m = np.zeros((n, n // b), np.float32)
    for j in range(n // b):
        m[j * b:(j + 1) * b, j] = 1.0
    return m


CB16 = jnp.asarray(blocks(W, 16))
RB16 = jnp.asarray(blocks(H, 16).T)
CB8 = jnp.asarray(blocks(W, 8))
RB8 = jnp.asarray(blocks(H, 8).T)


def sad_vpu16(ad):
    return jnp.sum(jnp.abs(ad).reshape(mb_h, 16, mb_w, 16)
                   .astype(jnp.int32), axis=(1, 3))


def sad_mxu16(ad):
    # first dot: 8-bit operands are exactly representable in bf16, so
    # the default-precision pass is exact; the 12-bit colsum operand
    # of the second dot needs the HIGHEST-precision split passes
    # (exact <= 15-bit operands per the tpu_r2b_lut measurement)
    a = jnp.abs(ad).astype(jnp.float32)
    return jnp.dot(RB16, a @ CB16,
                   precision=jax.lax.Precision.HIGHEST
                   ).astype(jnp.int32)


def sad_vpu8(ad):
    return jnp.sum(jnp.abs(ad).reshape(mb_h * 2, 8, mb_w * 2, 8)
                   .astype(jnp.int32), axis=(1, 3))


def sad_mxu8(ad):
    a = jnp.abs(ad).astype(jnp.float32)
    return jnp.dot(RB8, a @ CB8,
                   precision=jax.lax.Precision.HIGHEST
                   ).astype(jnp.int32)


def main() -> None:
    RES["platform"] = jax.default_backend()
    print("platform:", RES["platform"], flush=True)
    rng = np.random.default_rng(0)
    pad = jnp.pad(jax.device_put(
        rng.integers(0, 256, (H, W), np.uint8)), SEARCH, mode="edge")
    cur = jax.device_put(rng.integers(0, 256, (H, W), np.uint8)
                         ).astype(jnp.int16)

    # ---- exactness over every full-pel candidate offset
    @jax.jit
    def check(_):
        def body(i, bad):
            dy, dx = i // (2 * SEARCH + 1) - SEARCH, \
                i % (2 * SEARCH + 1) - SEARCH
            ref = jax.lax.dynamic_slice(
                pad, (SEARCH + dy, SEARCH + dx), (H, W))
            ad = cur - ref.astype(jnp.int16)
            b16 = jnp.sum(jnp.abs(sad_vpu16(ad) - sad_mxu16(ad)))
            b8 = jnp.sum(jnp.abs(sad_vpu8(ad) - sad_mxu8(ad)))
            return bad + b16 + b8

        return jax.lax.fori_loop(0, (2 * SEARCH + 1) ** 2, body,
                                 jnp.int32(0))

    t0 = time.perf_counter()
    bad = int(check(jnp.int32(0)))
    RES["exact_16_and_8"] = bad == 0
    RES["sum_abs_diff"] = bad
    print(f"exactness over {(2*SEARCH+1)**2} offsets: "
          f"sum|vpu-mxu| = {bad} ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    # ---- chained speed, keys-only loops (the real search shape)
    from opencv_opencl_tpu.io.h264_inter import (SEARCH_KEY_RADIX,
                                                 search_candidates_qpel)
    cands = jnp.asarray(np.asarray(
        search_candidates_qpel(SEARCH, 0), np.int32))
    n = int(cands.shape[0])

    def keys(sad_fn):
        def fn(y):
            c16 = y.astype(jnp.int16)

            def body(i, kf):
                qy, qx = cands[i, 0], cands[i, 1]
                ref = jax.lax.dynamic_slice(
                    pad, (SEARCH + (qy >> 2), SEARCH + (qx >> 2)),
                    (H, W))
                sad = sad_fn(c16 - ref.astype(jnp.int16))
                return jnp.minimum(kf, sad * SEARCH_KEY_RADIX + i)

            kf = jax.lax.fori_loop(
                0, n, body,
                jnp.full(sad_fn(c16 * 0).shape,
                         jnp.iinfo(jnp.int32).max, jnp.int32))
            return (jnp.sum(kf) & 1).astype(jnp.uint8)

        return fn

    def chain_ms(fn, label):
        y0 = jax.device_put(rng.integers(0, 256, (H, W), np.uint8))

        @jax.jit
        def run(y, k):
            out = jax.lax.fori_loop(0, k, lambda i, y: y + fn(y), y)
            return jnp.sum(out.astype(jnp.int32))

        t0 = time.perf_counter()
        _ = int(run(y0, 1))
        c = time.perf_counter() - t0
        samples = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = int(run(y0, 1))
            t1 = time.perf_counter()
            _ = int(run(y0, CHAIN + 1))
            t2 = time.perf_counter()
            samples.append(max(((t2 - t1) - (t1 - t0)) / CHAIN, 1e-9)
                           * 1e3)
        ms = sorted(samples)[1]
        print(f"{label}: {ms:.2f} ms/frame for {n} passes "
              f"(compile {c:.0f}s)", flush=True)
        return round(ms, 2)

    RES["keys16_vpu_ms"] = chain_ms(keys(sad_vpu16), "keys VPU 16x16")
    RES["keys16_mxu_ms"] = chain_ms(keys(sad_mxu16), "keys MXU 16x16")
    RES["keys8_vpu_ms"] = chain_ms(keys(sad_vpu8), "keys VPU 8x8")
    RES["keys8_mxu_ms"] = chain_ms(keys(sad_mxu8), "keys MXU 8x8")
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
