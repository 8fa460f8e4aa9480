"""Flag-composition matrix (VERDICT r3 item 7): every combination of
the relay's orthogonal feature flags either WORKS (a real tiny run
returns 0) or REFUSES with a clear, specific error (rc 2 / ValueError)
— the compatibility rules live here as one parameterized table, not in
prose.

Axes: --fused-encode x --ref-frame x --hist-downsample x --mesh x
encoder specs (gop/gdr/deblock/cpb/overlap/search).
"""

from __future__ import annotations

import numpy as np
import pytest

from opencv_opencl_tpu.apps import relay

BASE = ["--source=test", "--width=64", "--height=48", "--fps=30",
        "--max-frames=2", "--batch=2", "--workers=1",
        "--status-interval=60"]


def run_relay(extra: list[str]) -> int:
    return relay.run(BASE + extra)


# (id, extra argv, expected rc, stderr must-contain when refused)
MATRIX = [
    # ---- working combinations (real runs)
    ("plain", ["--sink=null"], 0, None),
    ("clahe_ref_frame", ["--sink=null", "--op=clahe", "--ref-frame"],
     0, None),
    ("hist_downsample", ["--sink=null", "--op=clahe",
                         "--hist-downsample=2"], 0, None),
    ("mesh", ["--sink=null", "--mesh=2x1"], 0, None),
    ("mesh_space", ["--sink=null", "--op=clahe", "--mesh=2x2",
                    "--batch=2"], 0, None),
    ("encoded_sink_cavlc", ["--sink=rtp+h264://127.0.0.1:56470",
                            "--encoder=cavlc:qp=40"], 0, None),
    ("encoded_tpu_gop_deblock",
     ["--sink=rtp+h264://127.0.0.1:56471",
      "--encoder=tpu:qp=40:gop=4:deblock"], 0, None),
    ("encoded_tpu_gdr", ["--sink=rtp+h264://127.0.0.1:56472",
                         "--encoder=tpu:qp=40:gdr=3"], 0, None),
    ("encoded_tpu_gdr_search", ["--sink=rtp+h264://127.0.0.1:56481",
                                "--encoder=tpu:qp=40:gdr=3:search=2"],
     0, None),
    ("encoded_tpu_fastsub",
     ["--sink=rtp+h264://127.0.0.1:56482",
      "--encoder=tpu:qp=40:gop=4:search=2:fastsub"], 0, None),
    ("encoded_tpu_parts",
     ["--sink=rtp+h264://127.0.0.1:56487",
      "--encoder=tpu:qp=40:gop=4:search=2:parts"], 0, None),
    ("encoded_cpb", ["--sink=rtp+h264://127.0.0.1:56473",
                     "--bitrate=800", "--encoder=cavlc:cpb=500"],
     0, None),
    ("fused_intra", ["--sink=rtp+h264://127.0.0.1:56474",
                     "--encoder=tpu:qp=40", "--fused-encode"], 0, None),
    ("fused_gop", ["--sink=rtp+h264://127.0.0.1:56475",
                   "--encoder=tpu:qp=40:gop=4", "--fused-encode"],
     0, None),
    ("fused_gop_deblock", ["--sink=rtp+h264://127.0.0.1:56479",
                           "--encoder=tpu:qp=40:gop=4:deblock",
                           "--fused-encode"], 0, None),
    ("fused_gdr", ["--sink=rtp+h264://127.0.0.1:56480",
                   "--encoder=tpu:qp=40:gdr=3", "--fused-encode"],
     0, None),
    ("fused_bitpack", ["--sink=rtp+h264://127.0.0.1:56483",
                       "--encoder=tpu:qp=40:gop=4:bitpack",
                       "--fused-encode"], 0, None),
    # ---- refusals: approximate vs exact-only paths
    ("downsample_x_mesh", ["--sink=null", "--hist-downsample=2",
                           "--mesh=2x1"], 2, "not supported"),
    ("downsample_x_ref", ["--sink=null", "--op=clahe",
                          "--hist-downsample=2", "--ref-frame"], 2,
     "not supported"),
    # ---- refusals: fused-encode preconditions
    ("fused_x_null_sink", ["--sink=null", "--fused-encode"], 2,
     "--fused-encode requires"),
    # fused x mesh WORKS since round 5 (parallel/sharded_encode:
    # frame/GOP-per-device data parallelism, byte-identical streams)
    ("fused_mesh_intra", ["--sink=rtp+h264://127.0.0.1:56476",
                          "--encoder=tpu:qp=40", "--mesh=2x1",
                          "--fused-encode"], 0, None),
    ("fused_mesh_gop", ["--sink=rtp+h264://127.0.0.1:56484",
                        "--encoder=tpu:qp=40:gop=2:search=2",
                        "--mesh=2x2", "--batch=8", "--max-frames=8",
                        "--fused-encode"], 0, None),
    # ...but the sequential-state configurations stay single-chip
    ("fused_mesh_x_gdr", ["--sink=rtp+h264://127.0.0.1:56485",
                          "--encoder=tpu:qp=40:gdr=3", "--mesh=2x1",
                          "--fused-encode"], 2, "no gdr, no cpb"),
    ("fused_mesh_x_batch", ["--sink=rtp+h264://127.0.0.1:56486",
                            "--encoder=tpu:qp=40:gop=4", "--mesh=2x1",
                            "--fused-encode"], 2,
     "positive multiple of mesh devices"),
    # fused x parts WORKS (419-lane packing: 8 quadrant-MV lanes +
    # the pmode lane), incl. over the mesh (GOP-per-device)
    ("fused_parts", ["--sink=rtp+h264://127.0.0.1:56488",
                     "--encoder=tpu:qp=40:gop=2:search=2:parts",
                     "--fused-encode"], 0, None),
    ("fused_mesh_parts", ["--sink=rtp+h264://127.0.0.1:56489",
                          "--encoder=tpu:qp=40:gop=2:search=2:parts",
                          "--mesh=2x1", "--batch=4", "--max-frames=4",
                          "--fused-encode"], 0, None),
    ("fused_x_ref_frame", ["--sink=rtp+h264://127.0.0.1:56477",
                           "--op=clahe", "--ref-frame",
                           "--encoder=tpu:qp=40", "--fused-encode"], 2,
     "--fused-encode requires"),
    ("fused_x_cpu_encoder", ["--sink=rtp+h264://127.0.0.1:56478",
                             "--encoder=cavlc:qp=40",
                             "--fused-encode"], 2,
     "--fused-encode requires"),
]


@pytest.mark.parametrize("name,extra,rc,msg",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_flag_matrix(name, extra, rc, msg, capsys):
    got = run_relay(extra)
    err = capsys.readouterr().err
    assert got == rc, f"{name}: rc {got} != {rc}; stderr: {err[-400:]}"
    if msg is not None:
        assert msg in err, f"{name}: refusal message missing {msg!r}"


# encoder-spec-level incompatibilities (ValueError at construction) —
# the encoder classes own these rules; the matrix pins them here too
SPEC_REFUSALS = [
    ("cavlc:qp=30:gdr=3:gop=8", "replaces gop"),
    ("tpu:qp=30:gdr=3:search=2:refs=2", "refs"),
    ("tpu:qp=30:cpb=500", "bitrate"),
    ("tpu:gop=8:cpb=500:overlap", "overlap"),
    ("cavlc:initdelay=100", "initdelay requires cpb"),
    ("cavlc:qp=30:search=2", "need a gop"),
    ("tpu:qp=30:halfpel", "need a gop"),
    ("cavlc:qp=30:gop=8:halfpel", "require search"),
    ("cavlc:qp=30:gop=8:refs=2", "requires search"),
    ("tpu:qp=30:gop=8:fastsub", "require"),
    ("tpu:qp=30:gop=8:search=2:fastsub:quarterpel", "replaces"),
]


@pytest.mark.parametrize("spec,msg", SPEC_REFUSALS,
                         ids=[s[0] for s in SPEC_REFUSALS])
def test_encoder_spec_refusals(spec, msg):
    from opencv_opencl_tpu.io.encoder import make_encoder

    with pytest.raises(ValueError, match=msg):
        make_encoder(spec, 64, 48, bitrate_kbps=400)
