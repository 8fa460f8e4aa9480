"""Jittable 256-bin histogram + OpenCV-exact equalization LUTs (JAX).

Histogramming is the awkward primitive on a vector machine: 256-bin
scatter-add does not vectorize onto the VPU.  Two strategies are provided:

- ``hist256_onehot`` — chunked compare-against-iota + reduction (a one-hot
  sum XLA fuses into compare+add without materializing the one-hot); this is
  the TPU-friendly default, mirroring how the reference's HLS kernel streams
  pixels through a histogram stage (``accel.cpp:53-60``).
- ``hist256_scatter`` — a single scatter-add (``.at[y].add(1)``); often the
  faster choice on CPU and occasionally on TPU for small images.

LUT construction reproduces cv::equalizeHist exactly (see
``core/golden.py``): integer cumulative sums (bit-exact — no float
accumulation order issues), float32 scale ``255/(total - hist[first])`` (the
same precision OpenCV uses), round-half-to-even, and the constant-image
identity case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "hist256",
    "hist256_onehot",
    "hist256_scatter",
    "hist256_pallas",
    "equalize_lut",
]

_CHUNK = 1 << 15  # pixels per scan step for the one-hot strategy


def _flatten_px(y: jax.Array) -> jax.Array:
    return y.reshape(-1).astype(jnp.int32)


def hist256_onehot(y: jax.Array) -> jax.Array:
    """256-bin histogram via chunked compare+reduce. Returns int32[256].

    Pixels are processed in static-size chunks under ``lax.scan`` so VMEM
    pressure stays bounded at any resolution; padding pixels are set to 256
    which matches no bin.
    """
    flat = _flatten_px(y)
    n = flat.size
    # small inputs (e.g. CLAHE tiles) get a right-sized single chunk instead
    # of padding up to the full streaming chunk — 27x less work at 240p tiles
    chunk = min(_CHUNK, max(256, -(-n // 256) * 256))
    pad = (-n) % chunk
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=256)
    chunks = flat.reshape(-1, chunk)
    bins = jnp.arange(256, dtype=jnp.int32)

    def step(h, c):
        oh = (c[:, None] == bins[None, :]).astype(jnp.int32)
        return h + oh.sum(axis=0), None

    # derive the zero carry from the data so it carries the same
    # varying-manual-axes type under shard_map (a plain jnp.zeros would be
    # unvarying and fail the scan carry type check on a mesh)
    zero = jnp.zeros(256, jnp.int32) + (chunks[0, 0] * 0)
    h, _ = jax.lax.scan(step, zero, chunks)
    return h


def hist256_scatter(y: jax.Array) -> jax.Array:
    """256-bin histogram via scatter-add. Returns int32[256]."""
    flat = _flatten_px(y)
    return jnp.zeros(256, jnp.int32).at[flat].add(1)


def hist256_pallas(y: jax.Array) -> jax.Array:
    """Full-image histogram via the VMEM-resident radix-16 Pallas kernel
    (split into even strips that fit the VMEM budget, summed).

    Hardware-measured (scripts/tpu_r2_kernels.json): the radix kernel is
    ~10x faster than the 256-row compare loop at 1080p (0.045 vs 0.44
    ms/frame) — the round-1 histeq>CLAHE latency inversion was exactly this.

    Raises ValueError when no divisor keeps a strip within budget (caller
    falls back to the chunked scan)."""
    from opencv_opencl_tpu.ops.pallas.lut_kernels import HIST_TILE_PX_LIMIT
    from opencv_opencl_tpu.ops.pallas.natural import tile_histograms_radix

    h, w = y.shape
    twp = -(-w // 128) * 128
    ty = 0
    for cand in (1, 2, 4, 8, 16, 32):
        if h % cand == 0 and (-(-(h // cand) // 8) * 8) * twp <= HIST_TILE_PX_LIMIT:
            ty = cand
            break
    if ty == 0:
        raise ValueError("no strip split fits the VMEM histogram budget")
    hists = tile_histograms_radix(y, ty, 1, h // ty, w)
    return jnp.sum(hists, axis=0)


def hist256(y: jax.Array, method: str = "onehot") -> jax.Array:
    if method == "onehot":
        # full 2-D images route to the Pallas kernel on TPU (the XLA scan
        # costs ~4 ms at 4K); tiles and odd shapes keep the scan
        if (
            y.ndim == 2
            and jax.default_backend() == "tpu"
            and y.shape[0] * y.shape[1] >= 1 << 16
        ):
            try:
                return hist256_pallas(y)
            except ValueError:
                pass  # no VMEM-sized split: fall back to the chunked scan
        return hist256_onehot(y)
    if method == "scatter":
        return hist256_scatter(y)
    raise ValueError(f"unknown histogram method {method!r}")


@functools.partial(jax.jit, static_argnames=("total",))
def equalize_lut(hist: jax.Array, total: int) -> jax.Array:
    """cv::equalizeHist LUT from an int histogram — OpenCV-exact.

    ``total`` is the static pixel count (image size is static under jit).
    """
    hist = hist.astype(jnp.int32)
    first = jnp.argmax(hist > 0).astype(jnp.int32)
    hfirst = hist[first]
    cum = jnp.cumsum(hist)  # integer cumsum: exact, order-independent
    cum_excl = (cum - cum[first]).astype(jnp.float32)
    # OpenCV: float scale = 255.f/(total - hist[i]) — keep f32 like OpenCV.
    denom = jnp.maximum(total - hfirst, 1).astype(jnp.float32)
    scale = jnp.float32(255.0) / denom
    lut = jnp.clip(jnp.rint(cum_excl * scale), 0, 255).astype(jnp.uint8)
    identity = jnp.arange(256, dtype=jnp.uint8)
    # constant image (all mass in one bin) -> identity map (OpenCV copies src)
    return jnp.where(hfirst == total, identity, lut)
