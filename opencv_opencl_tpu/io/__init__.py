from opencv_opencl_tpu.io.videofile import (
    FileSink,
    FileSource,
    NullSink,
    RawSink,
    TestSource,
)

__all__ = ["FileSink", "FileSource", "NullSink", "RawSink", "TestSource"]
