"""Stream a pre-encoded H.264/H.265 elementary stream over RTP/UDP.

Usage:
  python -m opencv_opencl_tpu.apps.h26x_stream --input=video.h264
      [--host=127.0.0.1] [--port=5004] [--codec=h264|h265] [--fps=30]
      [--loop] [--max-frames=N] [--mtu=1200]
      [--rtcp-schedule=tick|rfc3550]

The replay complement of ``rtp_receiver --kind=h264`` (which records an
Annex-B elementary file from RTP): this app plays such a file back onto
the wire with RFC 6184/7798 payloading and RTCP Sender Reports — the
native stand-in for the reference's file-fed emit pipelines
(``filesrc ! h264parse ! rtph264pay ! udpsink``,
``OpenCVequalHist.cpp:308-332`` tuning) on hosts without GStreamer.

Access-unit boundaries: an AUD NAL starts a new AU when present;
otherwise each VCL NAL begins one, with preceding parameter sets
(SPS/PPS/VPS/SEI) attached to the AU they precede — the standard
heuristic for elementary streams without explicit AU markers.
"""

from __future__ import annotations

import sys
import time

from opencv_opencl_tpu.apps._cli import parse_kv_args


def split_access_units(data: bytes, codec: str) -> list[bytes]:
    """Annex-B byte stream -> access units (4-byte start codes kept)."""
    from opencv_opencl_tpu.io.rtp_h26x import _START4, split_annexb

    nals = split_annexb(data)
    aus: list[list[bytes]] = []
    pending: list[bytes] = []  # non-VCL NALs awaiting their AU

    def is_vcl(nal: bytes) -> bool:
        if codec == "h264":
            return 1 <= (nal[0] & 0x1F) <= 5
        return ((nal[0] >> 1) & 0x3F) < 32

    def is_aud(nal: bytes) -> bool:
        if codec == "h264":
            return (nal[0] & 0x1F) == 9
        return ((nal[0] >> 1) & 0x3F) == 35

    for nal in nals:
        if is_aud(nal):
            if aus and not pending and len(aus[-1]) == 0:
                continue
            aus.append([])
            pending = aus[-1]
            pending.append(nal)
        elif is_vcl(nal):
            if aus and aus[-1] and not is_vcl(aus[-1][-1]):
                aus[-1].append(nal)  # attach to pending non-VCL group
            else:
                aus.append([nal])
            pending = []
        else:
            # parameter set / SEI: starts a new AU group it precedes
            if aus and aus[-1] and not is_vcl(aus[-1][-1]):
                aus[-1].append(nal)
            else:
                aus.append([nal])
    return [b"".join(_START4 + n for n in au) for au in aus if au]


def run(argv: list[str]) -> int:
    opts, _ = parse_kv_args(
        argv,
        {"input": str, "host": str, "port": int, "codec": str,
         "fps": float, "loop": bool, "max-frames": int, "mtu": int,
         "rtcp-schedule": str},
    )
    if "input" not in opts:
        print("--input=<annexb elementary stream> is required",
              file=sys.stderr)
        return 2
    codec = opts.get("codec", "h264")
    fps = opts.get("fps", 30.0)
    max_frames = opts.get("max-frames")

    from opencv_opencl_tpu.io.rtp_h26x import H26xRtpSink

    try:
        data = open(opts["input"], "rb").read()
    except OSError as e:
        print(f"cannot read {opts['input']}: {e}", file=sys.stderr)
        return 2
    aus = split_access_units(data, codec)
    if not aus:
        print(f"no access units found in {opts['input']}", file=sys.stderr)
        return 2

    sink = H26xRtpSink(opts.get("host", "127.0.0.1"),
                       opts.get("port", 5004), codec=codec, fps=fps,
                       mtu=opts.get("mtu", 1200),
                       rtcp_schedule=opts.get("rtcp-schedule", "tick"))
    print(f"Streaming {len(aus)} {codec} access units "
          f"({len(data)} bytes) to "
          f"rtp://{opts.get('host', '127.0.0.1')}:{opts.get('port', 5004)} "
          f"@ {fps:g} fps")
    period = 1.0 / fps if fps > 0 else 0.0
    sent = 0
    t0 = time.monotonic()
    try:
        while True:
            for au in aus:
                sink.write(au)
                sent += 1
                if max_frames is not None and sent >= max_frames:
                    raise StopIteration
                next_t = t0 + sent * period
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            if not opts.get("loop"):
                break
    except StopIteration:
        pass
    except KeyboardInterrupt:
        print("\nInterrupted.")
    wall = time.monotonic() - t0
    print(f"Sent {sent} AUs, {sink.packets} packets, {sink.bytes} bytes "
          f"in {wall:.2f}s"
          + (f" (rtt {sink.rtt_ms:.1f} ms)" if sink.rtt_ms is not None
             else ""))
    sink.close()
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
