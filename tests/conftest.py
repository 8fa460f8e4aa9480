"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on 8 virtual CPU devices (the same mechanism the driver's dry-run uses).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def hun_y():
    """The reference test asset hun.png (1919x1079) converted to a Y plane,
    as in 1frameMeasure.cpp (BGR2YUV_I420 -> Y). Falls back to a synthetic
    1919x1079 gradient+noise image if the asset is unavailable."""
    import cv2

    path = "/root/reference/hun.png"
    if os.path.exists(path):
        img = cv2.imread(path)
        yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)
        return yuv[..., 0].copy()
    r = np.random.default_rng(0)
    base = np.linspace(0, 255, 1919, dtype=np.float32)[None, :]
    y = np.clip(base + r.normal(0, 20, (1079, 1919)), 0, 255).astype(np.uint8)
    return y
