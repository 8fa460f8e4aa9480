"""Jittable OpenCV-exact color conversions (JAX), single frame or batched.

JAX counterparts of ``core/color.py`` (the numpy oracles), all integer
fixed-point so results are bit-exact on any backend.  int32 is sufficient
throughout: the largest intermediate (BT.601 Y dot product + rounding bias)
stays below 2^29.

Shapes: channel-last images (..., H, W, 3); NV12/I420 buffers (..., H*3/2, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_opencl_tpu.core import color as _c

__all__ = [
    "bgr2yuv",
    "yuv2bgr",
    "bgr2nv12",
    "nv12_to_bgr",
    "nv12_gray_chroma",
    "nv12_set_y",
]


def _descale(x: jax.Array, n: int) -> jax.Array:
    return (x + (1 << (n - 1))) >> n


def _u8(x: jax.Array) -> jax.Array:
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def bgr2yuv(img: jax.Array) -> jax.Array:
    """cv::cvtColor COLOR_BGR2YUV (full range, 14-bit fixed point)."""
    i = img.astype(jnp.int32)
    b, g, r = i[..., 0], i[..., 1], i[..., 2]
    y = _descale(r * _c._R2Y + g * _c._G2Y + b * _c._B2Y, _c._SHIFT14)
    delta = 128 << _c._SHIFT14
    u = _descale((b - y) * _c._B2U + delta, _c._SHIFT14)
    v = _descale((r - y) * _c._R2V + delta, _c._SHIFT14)
    return jnp.stack([_u8(y), _u8(u), _u8(v)], axis=-1)


def yuv2bgr(img: jax.Array) -> jax.Array:
    """cv::cvtColor COLOR_YUV2BGR (full range, 14-bit fixed point)."""
    i = img.astype(jnp.int32)
    y, u, v = i[..., 0], i[..., 1] - 128, i[..., 2] - 128
    y14 = y << _c._SHIFT14
    b = _descale(y14 + u * _c._U2B, _c._SHIFT14)
    g = _descale(y14 + u * _c._U2G + v * _c._V2G, _c._SHIFT14)
    r = _descale(y14 + v * _c._V2R, _c._SHIFT14)
    return jnp.stack([_u8(b), _u8(g), _u8(r)], axis=-1)


def bgr2nv12(img: jax.Array) -> jax.Array:
    """BGR -> NV12, BT.601 studio swing (bit-exact vs the I420 family)."""
    i = img.astype(jnp.int32)
    b, g, r = i[..., 0], i[..., 1], i[..., 2]
    half = 1 << (_c._SHIFT20 - 1)
    y = _u8((r * _c._CRY + g * _c._CGY + b * _c._CBY + half + (16 << _c._SHIFT20))
            >> _c._SHIFT20)
    b2, g2, r2 = b[..., 0::2, 0::2], g[..., 0::2, 0::2], r[..., 0::2, 0::2]
    chalf = half + (128 << _c._SHIFT20)
    u = _u8((r2 * _c._CRU + g2 * _c._CGU + b2 * _c._CBU + chalf) >> _c._SHIFT20)
    v = _u8((r2 * _c._CRV + g2 * _c._CGV + b2 * _c._CBV + chalf) >> _c._SHIFT20)
    # interleave U/V into the chroma rows: (..., H/2, W/2, 2) -> (..., H/2, W)
    uv = jnp.stack([u, v], axis=-1).reshape(*u.shape[:-1], u.shape[-1] * 2)
    return jnp.concatenate([y, uv], axis=-2)


def nv12_to_bgr(nv12: jax.Array, height: int | None = None) -> jax.Array:
    """cv::cvtColor COLOR_YUV2BGR_NV12 (BT.601 studio swing)."""
    rows = nv12.shape[-2]
    h = height if height is not None else rows * 2 // 3
    y = nv12[..., :h, :].astype(jnp.int32)
    uv = nv12[..., h:, :].astype(jnp.int32)
    u = uv[..., 0::2]
    v = uv[..., 1::2]
    # 2x2 upsample (nearest)
    u = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1)
    v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)
    half = 1 << (_c._SHIFT20 - 1)
    yy = jnp.maximum(y - 16, 0) * _c._CY
    r = (yy + (v - 128) * _c._CVR + half) >> _c._SHIFT20
    g = (yy + (v - 128) * _c._CVG + (u - 128) * _c._CUG + half) >> _c._SHIFT20
    b = (yy + (u - 128) * _c._CUB + half) >> _c._SHIFT20
    return jnp.stack([_u8(b), _u8(g), _u8(r)], axis=-1)


def nv12_gray_chroma(nv12: jax.Array, height: int | None = None) -> jax.Array:
    """UV := 128, the reference's gray chroma policy
    (``OpenCVequalHist.cpp:162`` memset)."""
    rows = nv12.shape[-2]
    h = height if height is not None else rows * 2 // 3
    uv = jnp.full_like(nv12[..., h:, :], 128)
    return jnp.concatenate([nv12[..., :h, :], uv], axis=-2)


def nv12_set_y(nv12: jax.Array, y: jax.Array) -> jax.Array:
    """Replace the Y plane of an NV12 buffer (chroma passthrough,
    ``improvement.cpp:162-163``)."""
    h = y.shape[-2]
    return jnp.concatenate([y, nv12[..., h:, :]], axis=-2)
