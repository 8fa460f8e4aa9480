"""Jitted JAX ops + Pallas kernels.

Note: the submodules ``ops.clahe`` / ``ops.histeq`` / ``ops.color`` /
``ops.histogram`` are the canonical import surface.  The package re-exports
the common entry points below — except the ``clahe(...)`` convenience
function, which would shadow the ``ops.clahe`` submodule; reach it as
``ops.clahe.clahe`` or via the :class:`CLAHE` wrapper.
"""

from opencv_opencl_tpu.ops.clahe import CLAHE, clahe_apply, make_clahe_plan
from opencv_opencl_tpu.ops.histeq import (
    apply_lut,
    equalize_hist,
    equalize_hist_batch,
    equalize_hist_ref,
)
from opencv_opencl_tpu.ops.histogram import equalize_lut, hist256

__all__ = [
    "CLAHE",
    "clahe_apply",
    "make_clahe_plan",
    "apply_lut",
    "equalize_hist",
    "equalize_hist_batch",
    "equalize_hist_ref",
    "equalize_lut",
    "hist256",
]
