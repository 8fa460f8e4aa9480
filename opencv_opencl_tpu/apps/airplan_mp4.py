"""MP4 equalizeHist relay (<- reference ``AirplanMP4.cpp``).

Usage:
  python -m opencv_opencl_tpu.apps.airplan_mp4 --input=video.mp4 \\
      [--output=out.mp4] [--codec=h264|h265] [--bitrate=10000] \\
      [--max-frames=N] [--chroma=gray|passthrough]

The reference decodes an MP4 through the hardware decoder, clones the Y
plane, runs cv::equalizeHist, sets UV=128 and re-encodes to RTP
(``AirplanMP4.cpp:82-107,331-355``), preserving input timestamps
(``:125``).  This is the same pipeline as ``clahe_video`` with the histeq
op and gray chroma defaults — implemented as a thin preset over it so the
two stay behaviourally identical.
"""

from __future__ import annotations

import sys

from opencv_opencl_tpu.apps import clahe_video
from opencv_opencl_tpu.apps._cli import parse_kv_args


def run(argv: list[str]) -> int:
    opts, _ = parse_kv_args(
        argv,
        {"input": str, "output": str, "codec": str, "bitrate": int,
         "max-frames": int, "chroma": str, "resolution": str, "fps": str},
    )
    if "input" not in opts:
        print(f"Usage: {sys.argv[0]} --input=video.mp4 [--output=out.mp4] ...",
              file=sys.stderr)
        return 1
    fwd = [f"--input={opts['input']}", "--op=histeq",
           f"--chroma={opts.get('chroma', 'gray')}"]
    for k in ("output", "codec", "bitrate", "max-frames", "resolution", "fps"):
        if k in opts:
            fwd.append(f"--{k}={opts[k]}")
    return clahe_video.run(fwd)


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
