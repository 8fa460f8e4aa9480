from opencv_opencl_tpu.utils.envinfo import env_report, print_env_report

__all__ = ["env_report", "print_env_report"]
