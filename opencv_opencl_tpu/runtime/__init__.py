from opencv_opencl_tpu.runtime.feeder import FrameFeeder
from opencv_opencl_tpu.runtime.queues import Closed, LeakyQueue
from opencv_opencl_tpu.runtime.sequencer import Resequencer

__all__ = ["FrameFeeder", "Closed", "LeakyQueue", "Resequencer"]
