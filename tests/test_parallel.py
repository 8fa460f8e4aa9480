"""Multi-chip sharding on the 8-device virtual CPU mesh.

Validates that the sharded (data x space) pipeline is bit-identical to the
single-device ops — sharding must never change numerics.
"""

import cv2
import numpy as np
import pytest

from opencv_opencl_tpu.core.frames import ChromaPolicy
from opencv_opencl_tpu.models.enhancer import EnhancerConfig
from opencv_opencl_tpu.ops import clahe as clahe_ops
from tests.conftest import assert_clahe_close
from opencv_opencl_tpu.parallel import (
    best_mesh_shape,
    build_sharded_pipeline,
    make_mesh,
    sharded_clahe,
    sharded_histeq,
)


def test_best_mesh_shape():
    assert best_mesh_shape(8) == (4, 2)
    assert best_mesh_shape(4) == (2, 2)
    assert best_mesh_shape(2) == (2, 1)
    assert best_mesh_shape(1) == (1, 1)
    assert best_mesh_shape(6) == (3, 2)


def test_make_mesh_8():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "space": 2}


def test_sharded_histeq_matches_cv2(rng):
    mesh = make_mesh(8)  # data=4, space=2
    batch = rng.integers(0, 256, (4, 64, 128), dtype=np.uint8)
    fn = sharded_histeq(mesh, 64, 128)
    out = np.asarray(fn(batch))
    for i in range(4):
        assert np.array_equal(out[i], cv2.equalizeHist(batch[i]))


def test_sharded_clahe_matches_cv2(rng):
    mesh = make_mesh(8)
    batch = rng.integers(0, 256, (4, 64, 128), dtype=np.uint8)
    plan = clahe_ops.make_clahe_plan(64, 128, 2.0, (8, 8))
    fn = sharded_clahe(mesh, plan)
    out = np.asarray(fn(batch))
    c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    for i in range(4):
        assert_clahe_close(out[i], c.apply(batch[i]))


def test_sharded_clahe_space4(rng):
    mesh = make_mesh(8, shape=(2, 4))
    batch = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
    plan = clahe_ops.make_clahe_plan(64, 128, 2.0, (8, 8))
    out = np.asarray(sharded_clahe(mesh, plan)(batch))
    c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    for i in range(2):
        assert_clahe_close(out[i], c.apply(batch[i]))


def test_sharded_clahe_rejects_padding():
    mesh = make_mesh(8)
    plan = clahe_ops.make_clahe_plan(63, 127, 2.0, (8, 8))  # needs padding
    with pytest.raises(ValueError, match="tile-divisible"):
        sharded_clahe(mesh, plan)


def test_full_sharded_pipeline(rng):
    mesh = make_mesh(8)
    cfg = EnhancerConfig(op="clahe", clip_limit=2.0, tile_grid=(8, 8),
                         chroma=ChromaPolicy.PASSTHROUGH)
    fn, sharding = build_sharded_pipeline(cfg, 64, 128, mesh)
    y = rng.integers(0, 256, (4, 64, 128), dtype=np.uint8)
    uv = rng.integers(0, 256, (4, 32, 128), dtype=np.uint8)
    y_out, uv_out = fn(y, uv)
    y_out = np.asarray(y_out)
    c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    for i in range(4):
        assert_clahe_close(y_out[i], c.apply(y[i]))
    assert np.array_equal(np.asarray(uv_out), uv)


def test_full_sharded_pipeline_gray_histeq(rng):
    mesh = make_mesh(4, shape=(2, 2))
    cfg = EnhancerConfig(op="histeq", chroma=ChromaPolicy.GRAY)
    fn, _ = build_sharded_pipeline(cfg, 64, 128, mesh)
    y = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
    uv = rng.integers(0, 256, (2, 32, 128), dtype=np.uint8)
    y_out, uv_out = fn(y, uv)
    for i in range(2):
        assert np.array_equal(np.asarray(y_out)[i], cv2.equalizeHist(y[i]))
    assert (np.asarray(uv_out) == 128).all()


def test_sharded_clahe_pallas_band(rng):
    """The pallas band-interpolation path under shard_map (interpret mode):
    must match cv2 within the CLAHE bar for both space-axis sizes."""
    for shape, nsp in [((2, 2), None), ((2, 4), None)]:
        mesh = make_mesh(shape[0] * shape[1], shape=shape)
        batch = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
        plan = clahe_ops.make_clahe_plan(64, 128, 2.0, (8, 8))
        fn = sharded_clahe(mesh, plan, backend="pallas")
        out = np.asarray(fn(batch))
        c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        for i in range(2):
            assert_clahe_close(out[i], c.apply(batch[i]))
