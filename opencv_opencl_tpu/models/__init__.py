from opencv_opencl_tpu.models.enhancer import Enhancer, EnhancerConfig, build_enhance_fn

__all__ = ["Enhancer", "EnhancerConfig", "build_enhance_fn"]
