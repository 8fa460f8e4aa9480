from opencv_opencl_tpu.parallel.mesh import best_mesh_shape, make_mesh
from opencv_opencl_tpu.parallel.sharded import (
    build_sharded_pipeline,
    sharded_clahe,
    sharded_histeq,
)

__all__ = [
    "best_mesh_shape",
    "make_mesh",
    "build_sharded_pipeline",
    "sharded_clahe",
    "sharded_histeq",
]
