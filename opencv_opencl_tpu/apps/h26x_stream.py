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

Access-unit boundaries follow the standard elementary-stream rules: a
new AU starts at an AUD, or at a VCL NAL whose first-slice-of-picture
flag is set (H.264 ``first_mb_in_slice == 0`` = leading ue(v) bit;
H.265 ``first_slice_segment_in_pic_flag``), so multi-slice pictures
stay one AU; prefix NALs (AUD/VPS/SPS/PPS/prefix SEI) attach to the AU
they precede, suffix NALs (end-of-seq/stream, H.265 suffix SEI) to the
AU they follow.
"""

from __future__ import annotations

import sys
import time

from opencv_opencl_tpu.apps._cli import (
    install_sigterm_handler, parse_kv_args)


def split_access_units(data: bytes, codec: str) -> list[bytes]:
    """Annex-B byte stream -> access units (4-byte start codes kept)."""
    from opencv_opencl_tpu.io.rtp_h26x import _START4, split_annexb

    def ntype(nal: bytes) -> int:
        return (nal[0] & 0x1F) if codec == "h264" else ((nal[0] >> 1) & 0x3F)

    def is_vcl(nal: bytes) -> bool:
        return (1 <= ntype(nal) <= 5) if codec == "h264" else ntype(nal) < 32

    def is_aud(nal: bytes) -> bool:
        return ntype(nal) == (9 if codec == "h264" else 35)

    def is_suffix(nal: bytes) -> bool:
        # end-of-sequence / end-of-stream / filler; H.265 suffix SEI
        if codec == "h264":
            return ntype(nal) in (10, 11, 12)
        return ntype(nal) in (36, 37, 38, 40)

    def first_slice_of_picture(nal: bytes) -> bool:
        # H.264: first_mb_in_slice is the leading ue(v) of the slice
        # header — value 0 encodes as a leading 1-bit.  Data partitions
        # B/C (types 3/4) start with slice_id instead, so only types
        # 1/2/5 are picture-start candidates.  H.265:
        # first_slice_segment_in_pic_flag is the first header bit after
        # the 2-byte NAL header.
        if codec == "h264":
            return (ntype(nal) in (1, 2, 5)
                    and len(nal) > 1 and bool(nal[1] & 0x80))
        return len(nal) > 2 and bool(nal[2] & 0x80)

    aus: list[list[bytes]] = []
    cur: list[bytes] = []       # the AU being assembled
    pending: list[bytes] = []   # prefix NALs awaiting their picture

    def flush() -> None:
        nonlocal cur
        if cur:
            aus.append(cur)
            cur = []

    for nal in split_annexb(data):
        if is_aud(nal):
            flush()
            pending.append(nal)
        elif is_vcl(nal):
            if first_slice_of_picture(nal) or not cur:
                flush()
                cur = pending + [nal]
            else:
                cur += pending + [nal]  # continuation slice, same AU
            pending = []
        elif is_suffix(nal):
            (cur if cur else pending).append(nal)
        else:
            pending.append(nal)  # VPS/SPS/PPS/prefix SEI: next AU's
    flush()
    if pending:
        # trailing prefix NALs with no picture: keep them (tail of the
        # last AU) rather than dropping bytes
        if aus:
            aus[-1].extend(pending)
        else:
            aus.append(pending)
    return [b"".join(_START4 + n for n in au) for au in aus]


def run(argv: list[str]) -> int:
    install_sigterm_handler()
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
    if codec not in ("h264", "h265"):
        print(f"--codec={codec!r} invalid: h264|h265", file=sys.stderr)
        return 2
    fps = opts.get("fps", 30.0)
    if fps <= 0:
        print("--fps must be > 0", file=sys.stderr)
        return 2
    max_frames = opts.get("max-frames")
    if max_frames is not None and max_frames < 1:
        print("--max-frames must be >= 1", file=sys.stderr)
        return 2

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

    try:
        sink = H26xRtpSink(opts.get("host", "127.0.0.1"),
                           opts.get("port", 5004), codec=codec, fps=fps,
                           mtu=opts.get("mtu", 1200),
                           rtcp_schedule=opts.get("rtcp-schedule", "tick"))
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
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
    finally:
        # always send the RTCP BYE + release the sockets, even when a
        # send error (unresolvable host, ...) aborts the stream
        wall = time.monotonic() - t0
        print(f"Sent {sent} AUs, {sink.packets} packets, "
              f"{sink.bytes} bytes in {wall:.2f}s"
              + (f" (rtt {sink.rtt_ms:.1f} ms)"
                 if sink.rtt_ms is not None else ""))
        sink.close()
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
