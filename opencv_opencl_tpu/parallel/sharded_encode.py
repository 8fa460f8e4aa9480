"""Multi-chip fused enhance+encode: GOP-per-device data parallelism.

The encoder's only sequential dependency is the in-GOP reconstruction
chain — every GOP starts with an IDR whose intra program ignores the
incoming reference planes, so GOPs are INDEPENDENT encode units.  That
makes a single stream data-parallel across chips with byte-identical
output: shard the frame axis over the whole mesh in whole-GOP blocks
and let every device run the same fused enhance+GOP scan
(models/fused_encode.build_enhance_gop_fn) over its own GOPs, starting
from zero recon planes that the IDR branch never reads.  No
collectives cross the ICI at all — the scaling shape is the
reference's worker pool (``/root/reference/OpenCVequalHist.cpp:396-402``)
lifted from threads-over-frames to chips-over-GOPs, which is the
correct granularity for a codec: frames inside a GOP are causally
chained, GOPs are not.

Properties:

- **byte-identical** to the sequential ``TpuGopEncoder`` stream at
  equal qp (asserted in tests/test_sharded_encode.py): the per-device
  program IS the single-chip fused program; the scan crossing a GOP
  boundary is exactly the sequential encoder's behavior because the
  intra branch reads no carry state.
- **stateless steps**: unlike the single-chip fused path there is no
  recon/idx state carried across dispatches, so batch padding is safe
  (pad frames are causally downstream of every real frame's output —
  ``pad_batch_for_mesh`` pads, the caller drops the padded tail).
- the all-intra encoder (``--encoder=tpu`` without gop, unit = 1
  frame) shards the same way; every frame is an independent unit.

Composition limits (refused in apps/relay.py): ``gdr`` has no IDR
boundaries to cut at, and rate control / CPB carry sequential
cross-GOP state — both stay single-chip.  ``deblock``, ``search``,
sub-pel modes, ``refs=2`` and ``bitpack`` all compose (their state is
in-GOP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opencv_opencl_tpu.core.frames import FrameSpec
from opencv_opencl_tpu.models.enhancer import EnhancerConfig
from opencv_opencl_tpu.models.fused_encode import (
    build_enhance_gop_fn, build_enhance_levels_fn)

__all__ = [
    "build_mesh_gop_fn",
    "build_mesh_levels_fn",
    "pad_batch_for_mesh",
]


def _frame_pspec(mesh: Mesh) -> P:
    """Shard the frame axis over EVERY mesh axis (data and space):
    encode units are independent, so all chips are frame workers —
    there is no spatial collective to ride a separate axis."""
    return P(tuple(mesh.axis_names))


def build_mesh_gop_fn(cfg: EnhancerConfig, spec: FrameSpec, gop: int,
                      mesh: Mesh, search: int = 0, subpel: int = 0,
                      refs: int = 1, deblock: bool = False,
                      bitpack: int = 0):
    """Returns ``(fn, sharding, unit)``: a jitted
    ``fn(nv12: uint8[N, H*3/2, W], qp: int32) -> int16[N, mbh, mbw, L]``
    where N must be ``unit * len(mesh.devices)`` whole GOPs per device
    times the device count (``unit == gop``; use
    :func:`pad_batch_for_mesh` for ragged tails), ``sharding`` the
    NamedSharding to ``device_put`` inputs with.

    Each device gets contiguous whole GOPs (frame k lives on device
    ``k // (N / ndev)``) and runs the single-chip fused program; the
    packed level tensor comes back frame-sharded and the host entropy
    stage consumes it in stream order (``TpuGopEncoder
    .encode_from_packed`` — frame_num / idr_pic_id advance host-side
    exactly as in the sequential stream)."""
    raw = build_enhance_gop_fn(cfg, spec, gop, search=search,
                               subpel=subpel, refs=refs,
                               deblock=deblock, gdr=0,
                               bitpack=bitpack, jit=False)
    h16 = -(-spec.height // 16) * 16
    w16 = -(-spec.width // 16) * 16
    pspec = _frame_pspec(mesh)

    def step(frames, qp):
        # zero recon seeds: frame 0 of every device-local block is an
        # IDR ((idx0 + i) % gop == 0 at i = 0), so the P branch never
        # reads them before the first in-GOP reconstruction exists
        r0 = (jnp.zeros((h16, w16), jnp.uint8),
              jnp.zeros((h16 // 2, w16 // 2), jnp.uint8),
              jnp.zeros((h16 // 2, w16 // 2), jnp.uint8))
        if refs > 1:
            r0 = r0 + r0
        packed, *_ = raw(frames, qp, jnp.int32(0), *r0)
        return packed

    sharded = shard_map(step, mesh=mesh, in_specs=(pspec, P()),
                        out_specs=pspec, check_vma=False)
    return (jax.jit(sharded), NamedSharding(mesh, pspec), int(gop))


def build_mesh_levels_fn(cfg: EnhancerConfig, spec: FrameSpec,
                         mesh: Mesh, bitpack: int = 0):
    """All-intra variant (``--encoder=tpu`` without gop): every frame
    is an independent unit, so ``unit == 1``.  Same return contract as
    :func:`build_mesh_gop_fn`."""
    raw = build_enhance_levels_fn(cfg, spec, bitpack=bitpack,
                                  jit=False)
    pspec = _frame_pspec(mesh)
    sharded = shard_map(lambda frames, qp: raw(frames, qp), mesh=mesh,
                        in_specs=(pspec, P()), out_specs=pspec,
                        check_vma=False)
    return (jax.jit(sharded), NamedSharding(mesh, pspec), 1)


def pad_batch_for_mesh(batch: np.ndarray, ndev: int,
                       unit: int) -> tuple[np.ndarray, int]:
    """Pad a frame batch up to a multiple of ``ndev * unit`` frames by
    repeating the last frame; returns ``(padded, real_count)`` — the
    caller emits only the first ``real_count`` packed outputs.

    Safe ONLY because mesh steps are stateless: the pad frames extend
    the final (possibly partial) GOP, and a scan is causal — appended
    frames cannot change the outputs of the real frames before them.
    The single-chip fused path must NOT pad (its recon/idx chain
    persists across dispatches)."""
    n = int(batch.shape[0])
    block = ndev * unit
    want = -(-n // block) * block
    if want == n:
        return batch, n
    pad = np.broadcast_to(batch[-1:], (want - n,) + batch.shape[1:])
    return np.concatenate([batch, pad], axis=0), n
