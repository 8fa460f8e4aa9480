from opencv_opencl_tpu.ops.pallas.lut_kernels import (
    apply_lut_pallas,
    clahe_interpolate_pallas,
    make_interp_spec,
)

__all__ = [
    "apply_lut_pallas",
    "clahe_interpolate_pallas",
    "make_interp_spec",
]
