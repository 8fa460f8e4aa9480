"""Single-frame CLAHE tool (<- reference ``clahe1frame.cpp``).

Usage:
  python -m opencv_opencl_tpu.apps.clahe_image --input=2K.jpg \\
      [--clipLimit=3.0] [--tileGridSize=4]

Output file naming matches the reference exactly
(``clahe1frame.cpp:104-113``): ``<base><clipStr>-<t>x<t><ext>`` with
fractional clip limits spelled with 'p' (2.5 -> "2p5").  Prints
``CLAHE_apply_time_ms=`` for the timed compute-only section.
"""

from __future__ import annotations

import os
import sys
import time

from opencv_opencl_tpu.apps._cli import parse_kv_args


def clip_to_string_for_filename(clip: float) -> str:
    """clahe1frame.cpp:43-51: integers bare, fractions with '.'->'p'."""
    iv = round(clip)
    if abs(clip - iv) < 1e-9:
        return str(int(iv))
    s = f"{clip:f}".rstrip("0").rstrip(".")
    return s.replace(".", "p")


def output_name(input_path: str, clip: float, tile: int) -> str:
    base_file = os.path.basename(input_path)
    dot = base_file.rfind(".")
    base = base_file if dot < 0 else base_file[:dot]
    ext = ".jpg" if dot < 0 else base_file[dot:]
    return f"{base}{clip_to_string_for_filename(clip)}-{tile}x{tile}{ext}"


def run(argv: list[str]) -> int:
    opts, _ = parse_kv_args(
        argv,
        {"input": str, "clipLimit": float, "tileGridSize": int, "tile": int},
    )
    input_path = opts.get("input", "")
    clip_limit = opts.get("clipLimit", 3.0)
    tile = opts.get("tileGridSize", opts.get("tile", 4))

    if not input_path:
        print(
            f"Usage: {sys.argv[0]} --input=<image> [--clipLimit=3.0] "
            f"[--tileGridSize=4]",
            file=sys.stderr,
        )
        return 1
    if clip_limit <= 0.0:
        print("Error: --clipLimit must be > 0", file=sys.stderr)
        return 1
    if tile < 1:
        print("Error: --tileGridSize must be >= 1", file=sys.stderr)
        return 1

    import cv2
    import numpy as np

    import jax.numpy as jnp
    from opencv_opencl_tpu.ops import color as jcolor
    from opencv_opencl_tpu.ops.clahe import _jitted_apply

    bgr = cv2.imread(input_path, cv2.IMREAD_COLOR)
    if bgr is None:
        print(f"Error: cannot open image: {input_path}", file=sys.stderr)
        return 1

    yuv = jcolor.bgr2yuv(jnp.asarray(bgr))
    y = yuv[..., 0]

    # warm up / compile outside the timed section (the reference pre-allocates
    # its output buffer for the same reason: time only the compute)
    fn = _jitted_apply(
        y.shape[0], y.shape[1], float(clip_limit), (tile, tile), "onehot"
    )
    fn(y).block_until_ready()

    # === TIMED SECTION: CLAHE compute only ===
    t0 = time.perf_counter()
    y_eq = fn(y)
    y_eq.block_until_ready()
    clahe_ms = (time.perf_counter() - t0) * 1e3
    # =========================================

    merged = jnp.stack([y_eq, yuv[..., 1], yuv[..., 2]], axis=-1)
    out_bgr = np.asarray(jcolor.yuv2bgr(merged))

    out_name = output_name(input_path, clip_limit, tile)
    if not cv2.imwrite(out_name, out_bgr):
        print(f"Error: failed to write output: {out_name}", file=sys.stderr)
        return 1

    print(
        f"CLAHE_apply_time_ms={clahe_ms:.3f} "
        f"(clipLimit={clip_limit:g}, tileGridSize={tile}x{tile})"
    )
    print(f"Saved: {out_name}")
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
