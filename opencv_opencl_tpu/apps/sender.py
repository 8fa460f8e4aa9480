"""WebRTC sender (<- reference ``webrtc/sender.cpp`` family +
``vad2connection.cpp`` recovery).

Usage:
  python -m opencv_opencl_tpu.apps.sender [--ws=ws://host:8080]
      [--room=default] [--width=1280] [--height=720] [--fps=30]
      [--codec=h264|h265] [--bitrate=200] [--device=/dev/video0]
      [--serve-signaling] [--signaling-only] [--duration=seconds]

Flags and defaults mirror ``webrtc/sender.cpp:37-69``.  The media plane
(webrtcbin) requires a GStreamer host; on this container the app runs the
full *control plane* — pipeline description assembly, WebSocket signaling
with join/offer/answer/ice, reconnect with 2 s backoff — and launches the
media pipeline only when GStreamer is available.  ``--serve-signaling``
starts the in-repo room-relay server (the reference assumed an external
one).  ``--signaling-only`` forces control-plane mode even with GStreamer.
"""

from __future__ import annotations

import sys
import time

from opencv_opencl_tpu.apps._cli import parse_kv_args

_FAKE_SDP = (
    "v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\ns=tpu-relay\r\nt=0 0\r\n"
    "m=video 9 UDP/TLS/RTP/SAVPF 96\r\nc=IN IP4 0.0.0.0\r\n"
    "a=rtpmap:96 H264/90000\r\na=sendonly\r\n"
)


def run(argv: list[str]) -> int:
    opts, _ = parse_kv_args(
        argv,
        {
            "ws": str, "room": str, "width": int, "height": int, "fps": int,
            "codec": str, "bitrate": int, "device": str,
            "serve-signaling": bool, "signaling-only": bool, "duration": float,
        },
    )
    ws_url = opts.get("ws", "ws://192.168.25.69:8080")
    room = opts.get("room", "default")
    width = opts.get("width", 1280)
    height = opts.get("height", 720)
    fps = opts.get("fps", 30)
    codec = opts.get("codec", "h264")
    bitrate = opts.get("bitrate", 200)
    device = opts.get("device", "/dev/video0")
    duration = opts.get("duration")

    from opencv_opencl_tpu.io import gst
    from opencv_opencl_tpu.io.signaling import SignalingClient, SignalingServer

    enc = gst.EncoderConfig(codec=codec, bitrate_kbps=bitrate)
    pipeline = gst.webrtc_pipeline(
        enc, device=device, width=width, height=height, fps=fps
    )
    print("=== TPU WebRTC sender ===")
    print(f"Signaling: {ws_url}  room={room}")
    print(f"Config: {width}x{height}@{fps} codec={codec} "
          f"bitrate={bitrate} kbps device={device}")
    print(f"Pipeline: {pipeline}")

    server = None
    if opts.get("serve-signaling"):
        import urllib.parse

        u = urllib.parse.urlparse(ws_url)
        server = SignalingServer(host=u.hostname or "127.0.0.1",
                                 port=u.port or 8080).start()
        ws_url = server.url
        print(f"Started in-process signaling server at {ws_url}")

    have_media = gst.gst_available() and not opts.get("signaling-only")
    state = {"viewers": 0, "offers": 0}

    def on_ready():
        state["viewers"] += 1
        print(f"Viewer joined (total {state['viewers']}) — sending offer")
        # with a real webrtcbin this fires on-negotiation-needed; in
        # control-plane mode we emit a descriptive placeholder offer
        client.send_offer(_FAKE_SDP)
        state["offers"] += 1

    def on_answer(sdp):
        print(f"Received answer ({len(sdp)} bytes SDP) — "
              "set-remote-description")

    def on_ice(cand, mline):
        print(f"Remote ICE candidate (mline={mline}): {cand[:60]}")

    client = SignalingClient(
        ws_url, room=room, client_type="sender",
        on_ready=on_ready, on_answer=on_answer, on_ice=on_ice,
        on_connected=lambda: print(f"Connected to signaling, joined room "
                                   f"'{room}' as sender"),
        reconnect_delay_s=2.0,
    ).start()

    if not client.wait_connected(10):
        print("ERROR: could not reach signaling server", file=sys.stderr)
        client.stop()
        if server:
            server.stop()
        return 1

    shell = None
    if have_media:
        shell = gst.GstShell(pipeline)
        shell.start()
        print("Media pipeline PLAYING")
    else:
        print("Media plane unavailable (no GStreamer) — control plane only")

    try:
        t0 = time.monotonic()
        while duration is None or time.monotonic() - t0 < duration:
            time.sleep(0.2)
    except KeyboardInterrupt:
        print("\nInterrupted.")
    finally:
        if shell:
            shell.stop()
        client.stop()
        if server:
            server.stop()
    print(f"Sender shut down: {state['viewers']} viewer(s), "
          f"{state['offers']} offer(s), reconnects={client.reconnect_count}")
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
