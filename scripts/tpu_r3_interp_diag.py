"""Interp-kernel cost decomposition at 4K: is the 0.94 ms/frame bound by
the (256, W) one-hot COMPARE build (VPU) or by the MXU DOT?

Three pallas variants of _natural_interp_kernel_v2, identical specs:
  full    -- the real kernel (baseline)
  nodot   -- one-hot built, dot replaced by a (Pp2, W) slice of oh
  nocmp   -- dot on a CONSTANT one-hot block (compare cost removed)
The gap tells which stage a radix-16 factorization could actually help.
Diagnostic only (outputs are wrong for nodot/nocmp).
"""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np

OUT = "/root/repo/scripts/tpu_r3_interp_diag.json"
RESULTS = {}
def save(): json.dump(RESULTS, open(OUT, "w"), indent=1)
def log(*a): print(*a, flush=True)

def main():
    import functools
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from opencv_opencl_tpu.ops.pallas import natural

    log("devices:", jax.devices())
    h, w = 2160, 3840
    spec = natural.make_natural_spec(h, w, 2.0, (8, 8))
    TX, Pp2, rs = spec.tiles_x, spec.pack2_rows, spec.rs

    def kern_variant(mode, TX, Pp2, y_ref, lp_ref, lp_big_ref, mlo_ref,
                     mhi_ref, xat_ref, rp_ref, ya_ref, out_ref):
        rs, w = y_ref.shape
        bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
        mlo = mlo_ref[:]; mhi = mhi_ref[:]; xat = xat_ref[:]
        xa1 = xat[0:1, :]; xa = xat[1:2, :]
        for r in range(rs):
            rp = rp_ref[0, 0, r]
            lp = lp_ref[pl.ds(rp * Pp2, Pp2), :]
            v = y_ref[r : r + 1, :].astype(jnp.int32)
            if mode == "mbig":
                oh = (bins == v).astype(jnp.bfloat16)
                d = jnp.dot(lp_big_ref[:], oh,
                            preferred_element_type=jnp.float32)[0:Pp2, :]
            elif mode == "nocmp":
                # constant "one-hot": compare removed, dot kept
                oh = jnp.full((256, w), jnp.bfloat16(0.00390625))
                d = jnp.dot(lp, oh, preferred_element_type=jnp.float32)
            elif mode == "nodot":
                oh = (bins == v).astype(jnp.bfloat16)
                d = oh[0:Pp2, :].astype(jnp.float32) * 255.0
            else:
                oh = (bins == v).astype(jnp.bfloat16)
                d = jnp.dot(lp, oh, preferred_element_type=jnp.float32)
            dmlo = d * mlo; dmhi = d * mhi
            l11 = jnp.sum(dmlo[0:TX, :], axis=0, keepdims=True)
            l21 = jnp.sum(dmlo[TX : 2 * TX, :], axis=0, keepdims=True)
            l12 = jnp.sum(dmhi[0:TX, :], axis=0, keepdims=True)
            l22 = jnp.sum(dmhi[TX : 2 * TX, :], axis=0, keepdims=True)
            r1 = l11 * xa1 + l12 * xa
            r2 = l21 * xa1 + l22 * xa
            ya = ya_ref[0, 0, r]
            res = r1 * (jnp.float32(1.0) - ya) + r2 * ya
            out_ref[r : r + 1, :] = (
                jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32)
                .astype(jnp.uint8))

    smem = [pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)]
    row_blk = pl.BlockSpec((rs, w), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def build(mode):
        kern = functools.partial(kern_variant, mode, TX, Pp2)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
            grid=(spec.nrb,),
            in_specs=[row_blk, const((spec.row_pairs * Pp2, 256)),
                      const((128, 256)),
                      const((Pp2, w)), const((Pp2, w)), const((8, w)),
                      *smem, *smem],
            out_specs=row_blk,
            interpret=False,
        )
        rng = np.random.default_rng(0)
        lp = jnp.asarray(rng.integers(0, 256,
            (spec.row_pairs * Pp2, 256), np.uint8)).astype(jnp.bfloat16)
        lp_big = jnp.asarray(rng.integers(0, 256, (128, 256),
                                          np.uint8)).astype(jnp.bfloat16)
        args = (lp, lp_big, jnp.asarray(spec.mlo2), jnp.asarray(spec.mhi2),
                jnp.asarray(spec.xat), jnp.asarray(spec.rp_rows),
                jnp.asarray(spec.ya_rows))
        def f(x):
            return call(x, *args)
        return f

    def chained_ms(fn, x, chain=32, key=None):
        import jax
        @jax.jit
        def run(x, n):
            return jnp.sum(jax.lax.fori_loop(
                0, n, lambda i, y: fn(y), x).astype(jnp.int32))
        t = time.perf_counter(); _ = int(run(x, 1))
        log(f"  [compiled {time.perf_counter()-t:.0f}s]")
        t0 = time.perf_counter(); _ = int(run(x, 1)); t1 = time.perf_counter()
        _ = int(run(x, chain + 1)); t2 = time.perf_counter()
        _ = int(run(x, chain + 1)); t3 = time.perf_counter()
        ms = max(((t3 - t2) - (t1 - t0)) / chain, 1e-9) * 1e3
        if key:
            RESULTS[key] = round(ms, 4); save()
        return ms

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    for mode in ("nodot", "mbig"):
        try:
            ms = chained_ms(build(mode), y, key=f"interp_{mode}_4k_ms")
            log(f"{mode}: {ms:.4f} ms/frame")
        except Exception:
            log(traceback.format_exc())
            RESULTS[f"interp_{mode}_4k_ms"] = "error"; save()

main()
