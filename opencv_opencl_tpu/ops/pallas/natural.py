"""Natural-layout Pallas kernels for CLAHE — round-2 redesign of the hot path.

Round-1 measurements (docs/RESULTS_R1.md) showed the cell-grid interpolation
kernel (``lut_kernels.clahe_interpolate_pallas``) is **issue-bound**: per row
it launches a tiny (4, 256)@(256, 512) MXU dot per column cell, and the
cell-grid embedding inflates the pixel count ~1.36x at 4K (border halves +
(8, 128) alignment slack) plus two full XLA relayout copies (embed + final
slice).  The radix-16 experiment confirmed the kernel is not compare-bound,
so the win is *fewer, wider issues*, not fewer compares.

This module processes the frame in its NATURAL layout instead:

- ``clahe_interpolate_natural`` — grid over row blocks only.  Per row, ONE
  wide MXU dot ``(Pp, 256) @ (256, W)`` computes the LUT values of *all*
  4 x G candidate tile LUTs at once (G = tilesX+1 column cells); a masked
  group-reduction then selects each column's own cell on the VPU.  9x more
  MXU FLOPs than strictly needed — but the MXU was idle, and per-row issue
  count drops from ~6 x G to ~10 total.  No embedding, no padded pixels, no
  final slice.  Works for ARBITRARY geometry: the row-pair / column-group
  ids are derived exactly from the CLAHE plan's clipped f32 coordinates
  (the clip pattern (p-1, p) is universal), so there is no
  ``make_interp_spec``-style fallback.
- ``tile_histograms_radix`` — per-tile 256-bin histograms via radix-16:
  ``hist[h, l] = sum_px (hi==h) & (lo==l)`` is a (16, W) x (16, W)
  lane-contraction, i.e. one small MXU dot per row, replacing the 256-row
  compare+add loop (~6x less VPU work).  Counts accumulate in f32 (exact
  below 2^24, far above any tile area) and exit as int32.

Bit-exactness: both kernels compute the same arithmetic as the golden
models — the one-hot/radix dots each select exactly one LUT entry or count
exactly one pixel (0/1 exact in bf16; single-term f32 accumulation exact),
and the bilinear blend uses the TPU's strict separate f32 rounding which
matches OpenCV's mul-then-add (verified 0 LSB on hardware in round 1).

Reference lineage: the per-pixel map stage of ``accel.cpp`` /
``OpenCLequalHist.cpp:346-365``, re-designed for MXU issue efficiency.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "NaturalSpec",
    "make_natural_spec",
    "build_lut_pack_pallas",
    "clahe_interpolate_natural",
    "clahe_interpolate_natural_band",
    "tile_histograms_radix",
]
# Rejected-experiment kernels (rows-batched radix dots, the fused
# interp+hist streaming pass) live in ops/pallas/experiments.py with
# their measurement citations.

# one-hot VMEM bound: 256 * Wp * 2 B (bf16) kept <= 4 MB -> Wp <= 8192
_MAX_WIDTH = 8192


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------------ spec ----


@dataclasses.dataclass(frozen=True)
class NaturalSpec:
    """Static config for the natural-layout interpolation kernel.

    Derived losslessly from a ``ClahePlan``: ``rp`` maps each row to its
    (ty1, ty2) pair id, ``g_of_c`` each column to its (tx1, tx2) group id,
    both satisfying the clip pattern (clip(p-1), clip(p)) — asserted at
    build time against the plan's exact per-pixel f32-derived indices.
    """

    height: int
    width: int
    tiles_x: int
    tiles_y: int
    rs: int                      # rows per kernel block
    nrb: int                     # number of row blocks
    pack_rows: int               # Pp: 4*G padded to a multiple of 8
    pack_idx: np.ndarray         # int32 (R * Pp,): flat tile id per pack row
    m_table: np.ndarray          # f32 (Pp, W): column-group select masks
    xat: np.ndarray              # f32 (8, W): rows [xa1, xa, xa1, xa, 0...]
    # pair-factored variant (v2): per row-pair only the 2*tiles_x row LUTs
    # [lut[ty_lo, 0..tx-1], lut[ty_hi, 0..tx-1]]; column selection happens
    # via tx_lo/tx_hi one-hot masks -> the per-row MXU dot shrinks 2.5x
    pack2_rows: int              # Pp2: 2*tiles_x padded to a multiple of 8
    pack2_idx: np.ndarray        # int32 (R * Pp2,)
    mlo2: np.ndarray             # f32 (Pp2, W): [mlo; mlo] stacked (pad 0)
    mhi2: np.ndarray             # f32 (Pp2, W): [mhi; mhi] stacked (pad 0)
    rp_rows: np.ndarray          # int32 (nrb, 1, rs): row-pair id per row
    ya_rows: np.ndarray          # f32 (nrb, 1, rs): row fraction per row

    @property
    def groups(self) -> int:
        return self.tiles_x + 1

    @property
    def row_pairs(self) -> int:
        return self.tiles_y + 1


def _pair_ids(lo: np.ndarray, hi: np.ndarray, tiles: int) -> np.ndarray:
    """Map per-pixel (clip(p-1), clip(p)) index pairs back to p — exact for
    the OpenCV clipped-coordinate construction (asserted by the caller)."""
    p = np.where((lo == 0) & (hi == 0), 0, lo + 1).astype(np.int32)
    # verify losslessness against the plan's own arrays
    assert np.array_equal(np.clip(p - 1, 0, tiles - 1), lo)
    assert np.array_equal(np.clip(p, 0, tiles - 1), hi)
    return p


@functools.lru_cache(maxsize=64)
def make_natural_spec(height: int, width: int, clip_limit: float,
                      tile_grid: tuple[int, int],
                      rs: int = 16,
                      rows_pad: int | None = None) -> NaturalSpec | None:
    """Build the natural-kernel spec for a CLAHE plan; None only when the
    width exceeds the one-hot VMEM budget (then use the XLA fallback).

    ``rows_pad``: extend the per-row SMEM tables to cover this many rows
    (>= height, multiple of rs) — the sharded band variant needs tables
    spanning the space-padded frame; pad rows repeat the last real row and
    their outputs are sliced away by the caller."""
    from opencv_opencl_tpu.ops.clahe import make_clahe_plan

    if -(-width // 128) * 128 > _MAX_WIDTH:
        return None
    plan = make_clahe_plan(height, width, clip_limit, tile_grid)
    tx, ty = plan.tiles_x, plan.tiles_y
    G, R = tx + 1, ty + 1
    Pp = -(-4 * G // 8) * 8

    g_of_c = _pair_ids(plan.tx1, plan.tx2, tx)          # (W,)
    rp_of_r = _pair_ids(plan.ty1, plan.ty2, ty)         # (H,)

    # pack rows: rp * Pp + j * G + g  ->  flat tile id (ty_j, tx_g)
    # j in {0: (lo,lo), 1: (lo,hi), 2: (hi,lo), 3: (hi,hi)} = l11,l12,l21,l22
    pack_idx = np.zeros((R, Pp), np.int32)
    for rp in range(R):
        ty_lo = min(max(rp - 1, 0), ty - 1)
        ty_hi = min(max(rp, 0), ty - 1)
        for g in range(G):
            tx_lo = min(max(g - 1, 0), tx - 1)
            tx_hi = min(max(g, 0), tx - 1)
            for j, (a, b) in enumerate(
                ((ty_lo, tx_lo), (ty_lo, tx_hi), (ty_hi, tx_lo), (ty_hi, tx_hi))
            ):
                pack_idx[rp, j * G + g] = a * tx + b
    pack_idx = pack_idx.reshape(-1)

    m_table = np.zeros((Pp, width), np.float32)
    cols = np.arange(width)
    for j in range(4):
        m_table[j * G + g_of_c, cols] = 1.0

    xa = plan.xa.astype(np.float32)
    xat = np.zeros((8, width), np.float32)
    xat[0] = 1.0 - xa
    xat[1] = xa
    xat[2] = 1.0 - xa
    xat[3] = xa

    # pair-factored (v2) tables
    Pp2 = -(-2 * tx // 8) * 8
    pack2_idx = np.zeros((R, Pp2), np.int32)
    for rp in range(R):
        ty_lo = min(max(rp - 1, 0), ty - 1)
        ty_hi = min(max(rp, 0), ty - 1)
        for t in range(tx):
            pack2_idx[rp, t] = ty_lo * tx + t
            pack2_idx[rp, tx + t] = ty_hi * tx + t
    pack2_idx = pack2_idx.reshape(-1)
    tx_lo = np.clip(g_of_c - 1, 0, tx - 1)
    tx_hi = np.clip(g_of_c, 0, tx - 1)
    mlo = np.zeros((Pp2, width), np.float32)
    mhi = np.zeros((Pp2, width), np.float32)
    mlo[tx_lo, cols] = 1.0
    mlo[tx + tx_lo, cols] = 1.0
    mhi[tx_hi, cols] = 1.0
    mhi[tx + tx_hi, cols] = 1.0

    nrb = -(-max(height, rows_pad or 0) // rs)
    pad_r = nrb * rs - height
    # (nrb, 1, rs) with trailing dims equal to the array dims — the only
    # SMEM block layout Mosaic accepts for per-block scalar rows
    rp_rows = np.pad(rp_of_r, (0, pad_r), mode="edge").reshape(nrb, 1, rs)
    ya_rows = np.pad(plan.ya.astype(np.float32), (0, pad_r),
                     mode="edge").reshape(nrb, 1, rs)

    return NaturalSpec(
        height=height, width=width, tiles_x=tx, tiles_y=ty,
        rs=rs, nrb=nrb, pack_rows=Pp, pack_idx=pack_idx,
        m_table=m_table, xat=xat, rp_rows=rp_rows, ya_rows=ya_rows,
        pack2_rows=Pp2, pack2_idx=pack2_idx, mlo2=mlo, mhi2=mhi,
    )


# ---------------------------------------------------------------- interp ----


def _natural_interp_kernel(G: int, Pp: int,
                           y_ref, lp_ref, m_ref, xat_ref, rp_ref, ya_ref,
                           out_ref):
    rs, w = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    m = m_ref[:]                                   # (Pp, W) f32
    xat = xat_ref[:]                               # (8, W) f32
    for r in range(rs):  # static unroll
        rp = rp_ref[0, 0, r]
        lp = lp_ref[pl.ds(rp * Pp, Pp), :]          # (Pp, 256) bf16, 8-aligned
        v = y_ref[r : r + 1, :].astype(jnp.int32)   # (1, W)
        oh = (bins == v).astype(jnp.bfloat16)       # (256, W)
        d = jnp.dot(lp, oh, preferred_element_type=jnp.float32)  # (Pp, W)
        dm = d * m                                  # column-group select
        # per-j group reduce + x-blend, then the y-blend with SMEM scalars
        f0 = jnp.sum(dm[0 * G : 1 * G, :], axis=0, keepdims=True) * xat[0:1, :]
        f1 = jnp.sum(dm[1 * G : 2 * G, :], axis=0, keepdims=True) * xat[1:2, :]
        f2 = jnp.sum(dm[2 * G : 3 * G, :], axis=0, keepdims=True) * xat[2:3, :]
        f3 = jnp.sum(dm[3 * G : 4 * G, :], axis=0, keepdims=True) * xat[3:4, :]
        ya = ya_ref[0, 0, r]
        res = (f0 + f1) * (jnp.float32(1.0) - ya) + (f2 + f3) * ya
        out_ref[r : r + 1, :] = (
            jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )




def _natural_interp_kernel_v2(TX, Pp2,
                              y_ref, lp_ref, mlo_ref, mhi_ref, xat_ref,
                              rp_ref, ya_ref, out_ref):
    """Pair-factored variant: the dot gathers only the 2*tiles_x row-LUT
    values; tx_lo/tx_hi one-hot masks select each column's pair.  Same
    f32 mul-then-add blend order as OpenCV (each select sums exactly one
    non-zero product -> exact)."""
    rs, w = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    mlo = mlo_ref[:]
    mhi = mhi_ref[:]
    xat = xat_ref[:]
    xa1 = xat[0:1, :]
    xa = xat[1:2, :]
    for r in range(rs):  # static unroll
        rp = rp_ref[0, 0, r]
        lp = lp_ref[pl.ds(rp * Pp2, Pp2), :]        # (Pp2, 256) bf16
        v = y_ref[r : r + 1, :].astype(jnp.int32)
        oh = (bins == v).astype(jnp.bfloat16)       # (256, W)
        d = jnp.dot(lp, oh, preferred_element_type=jnp.float32)  # (Pp2, W)
        dmlo = d * mlo
        dmhi = d * mhi
        l11 = jnp.sum(dmlo[0:TX, :], axis=0, keepdims=True)
        l21 = jnp.sum(dmlo[TX : 2 * TX, :], axis=0, keepdims=True)
        l12 = jnp.sum(dmhi[0:TX, :], axis=0, keepdims=True)
        l22 = jnp.sum(dmhi[TX : 2 * TX, :], axis=0, keepdims=True)
        r1 = l11 * xa1 + l12 * xa
        r2 = l21 * xa1 + l22 * xa
        ya = ya_ref[0, 0, r]
        res = r1 * (jnp.float32(1.0) - ya) + r2 * ya
        out_ref[r : r + 1, :] = (
            jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )

def clahe_interpolate_natural(y: jax.Array, luts: jax.Array | None,
                              spec: NaturalSpec,
                              interpret: bool | None = None,
                              variant: int = 2,
                              lp: jax.Array | None = None) -> jax.Array:
    """CLAHE bilinear LUT interpolation of one (H, W) uint8 frame in its
    natural layout.  ``luts`` is (T, 256) uint8 (or (tilesY, tilesX, 256)).
    ``variant``: 1 = 4G-row pack + group masks; 2 = pair-factored 2*tilesX
    pack (2.5x smaller per-row dot) — both bit-exact; v2 measured 1.25x
    faster on hardware (scripts/tpu_r2_v2.json), the default.

    ``lp``: a prebuilt (row_pairs*Pp2, 256) bf16 pack (variant 2 only),
    e.g. from :func:`build_lut_pack_pallas` — skips the take/cast here."""
    if interpret is None:
        interpret = _interpret_default()
    if variant != 2 and lp is not None:
        raise ValueError("lp (prebuilt LUT pack) requires variant=2")
    if luts is None and lp is None:
        raise ValueError("one of luts / lp must be provided")
    h, w = spec.height, spec.width
    assert y.shape == (h, w)
    rs = spec.rs
    rp = jnp.asarray(spec.rp_rows)
    ya = jnp.asarray(spec.ya_rows)
    smem = [
        pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    row_blk = pl.BlockSpec((rs, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if variant == 2:
        Pp2 = spec.pack2_rows
        if lp is not None:
            lp2 = lp
            assert lp2.shape == (spec.row_pairs * Pp2, 256)
        else:
            lp2 = jnp.take(
                luts.reshape(-1, 256), jnp.asarray(spec.pack2_idx), axis=0
            ).astype(jnp.bfloat16)
        # (a bf16-compare variant was tried and rejected: Mosaic "Target
        # does not support this comparison" -- compares stay int32)
        kern = functools.partial(_natural_interp_kernel_v2, spec.tiles_x, Pp2)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
            grid=(spec.nrb,),
            in_specs=[
                row_blk,
                const((spec.row_pairs * Pp2, 256)),
                const((Pp2, w)),
                const((Pp2, w)),
                const((8, w)),
                *smem,
            ],
            out_specs=row_blk,
            interpret=interpret,
        )(y, lp2, jnp.asarray(spec.mlo2), jnp.asarray(spec.mhi2),
          jnp.asarray(spec.xat), rp, ya)

    Pp, G = spec.pack_rows, spec.groups
    lp = jnp.take(luts.reshape(-1, 256), jnp.asarray(spec.pack_idx),
                  axis=0).astype(jnp.bfloat16)  # (R*Pp, 256)
    kern = functools.partial(_natural_interp_kernel, G, Pp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        grid=(spec.nrb,),
        in_specs=[
            row_blk,
            const((spec.row_pairs * Pp, 256)),
            const((Pp, w)),
            const((8, w)),
            *smem,
        ],
        out_specs=row_blk,
        interpret=interpret,
    )(
        y,
        lp,
        jnp.asarray(spec.m_table),
        jnp.asarray(spec.xat),
        rp,
        ya,
    )


# ---------------------------------------------------------- LUT building ----


def _lut_pack_kernel(clip: int, scale: float,
                     h_ref, pk_ref, out_ref):
    """Fused LUT build: OpenCV clip+redistribute -> CDF -> scaled LUT ->
    interp pack, all in one dispatch.

    Exactness on hardware: VPU f32 elementwise arithmetic is true f32
    (integers < 2^24 exact), but MXU "f32" dots lower as bf16-split
    passes which lose the low bits of counts wider than ~15 bits (4K
    tiles hold 480*270 = 2^17 pixels — measured 1 LSB off via a
    triangular-matrix cumsum dot, scripts/tpu_r2b_lut.json).  So the
    cumulative sum is an 8-step integer shift-add scan (int32, exact),
    and the only MXU dot is the pack 'gather' (PR, T) @ (T, 256) whose
    operands are one-hot rows and 8-bit LUT values — both exact in
    bf16.  The LUT quantization ``rint(cdf * scale)`` is the same single
    f32 multiply+rint as the golden model (``core/golden.py`` /
    ``ops/clahe._luts_from_hists``) — bit-exact.
    """
    h = h_ref[:].astype(jnp.float32)                     # (T, 256)
    if clip > 0:
        clipf = jnp.float32(clip)
        hc = jnp.minimum(h, clipf)
        excess = jnp.sum(h - hc, axis=1, keepdims=True)  # (T, 1) int-exact
        redist = jnp.floor(excess * jnp.float32(1.0 / 256.0))  # /2^8: exact
        residual = excess - redist * 256.0               # in [0, 256)
        # step = max(256 // max(residual, 1), 1): f32 floor-div is exact
        # here (the gap to the next integer is >= 1/255 >> f32 eps)
        step = jnp.maximum(
            jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
        # Mosaic rejects f32 iota ('tpu.iota' needs integer result):
        # build int32 and convert
        bins = jax.lax.broadcasted_iota(
            jnp.int32, (1, 256), 1).astype(jnp.float32)  # 0..255 as f32
        q = jnp.floor(bins / step)                       # (T, 256)
        bump = ((bins - q * step == 0.0) & (q < residual)).astype(
            jnp.float32)
        h = hc + redist + bump
    # inclusive lane prefix sum, int32-exact (log2(256) = 8 shift-adds)
    acc = h.astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    for k in range(8):
        s = 1 << k
        acc = acc + jnp.where(lane >= s, pltpu.roll(acc, s, axis=1), 0)
    lut = jnp.clip(
        jnp.rint(acc.astype(jnp.float32) * jnp.float32(scale)), 0.0, 255.0)
    packed = jnp.dot(pk_ref[:], lut.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out_ref[:] = packed.astype(jnp.bfloat16)


def build_lut_pack_pallas(hists: jax.Array, clip: int, lut_scale: float,
                          spec: "NaturalSpec",
                          interpret: bool | None = None) -> jax.Array:
    """(T, 256) int32 tile histograms -> (row_pairs*Pp2, 256) bf16 LUT
    pack, ready for the v2 interpolation kernel — the whole XLA glue
    (clip, redistribution, cumsum, scale, pack gather, bf16 cast) fused
    into one Pallas dispatch.  Bit-exact vs ``_luts_from_hists`` + take.
    """
    if interpret is None:
        interpret = _interpret_default()
    T = spec.tiles_y * spec.tiles_x
    PR = spec.row_pairs * spec.pack2_rows
    assert hists.shape == (T, 256)
    pk = np.zeros((PR, T), np.float32)
    pk[np.arange(PR), spec.pack2_idx] = 1.0
    return pl.pallas_call(
        functools.partial(_lut_pack_kernel, int(clip), float(lut_scale)),
        out_shape=jax.ShapeDtypeStruct((PR, 256), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hists, jnp.asarray(pk).astype(jnp.bfloat16))


# ------------------------------------------------------------- histogram ----


def _tile_hist_radix_kernel(y_ref, out_ref):
    """Radix-16 tile histogram: hist[h, l] = sum_px (hi==h)(lo==l) — one
    (16, W) x (16, W) lane-contraction (MXU) per row; f32 accumulator is
    exact below 2^24 counts."""
    thp, twp = y_ref.shape
    bins16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def body(r8, acc):
        base = pl.multiple_of(r8 * 8, 8)
        chunk = y_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, W)
        for k in range(8):
            v = chunk[k : k + 1, :]
            a = (bins16 == (v >> 4)).astype(jnp.bfloat16)   # (16, W)
            b = (bins16 == (v & 15)).astype(jnp.bfloat16)   # (16, W)
            acc = acc + jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(
        0, thp // 8, body, jnp.zeros((16, 16), jnp.float32)
    )
    out_ref[0, :, :] = acc.astype(jnp.int32)


def _pad_tiles(ext: jax.Array, tiles_y: int, tiles_x: int,
               tile_h: int, tile_w: int):
    """Pad each tile to the (8, 128)-aligned block layout the radix
    kernels grid over; returns (blocked, thp, twp, slack_px_per_tile).
    Raises when a tile block exceeds the VMEM histogram budget (the
    callers fall back to the chunked-scan path)."""
    from opencv_opencl_tpu.ops.pallas.lut_kernels import HIST_TILE_PX_LIMIT

    thp = -(-tile_h // 8) * 8
    twp = -(-tile_w // 128) * 128
    if thp * twp > HIST_TILE_PX_LIMIT:
        raise ValueError(
            f"tile block {thp}x{twp} exceeds the VMEM histogram budget"
        )
    blk = ext.reshape(tiles_y, tile_h, tiles_x, tile_w)
    blk = jnp.pad(blk, ((0, 0), (0, thp - tile_h), (0, 0), (0, twp - tile_w)))
    blk = blk.reshape(tiles_y * thp, tiles_x * twp)
    return blk, thp, twp, thp * twp - tile_h * tile_w


def tile_histograms_radix(ext: jax.Array, tiles_y: int, tiles_x: int,
                          tile_h: int, tile_w: int,
                          interpret: bool | None = None) -> jax.Array:
    """Per-tile histograms of a tile-divisible image, int32 (T, 256).

    Same contract as ``lut_kernels.tile_histograms_pallas`` (zero alignment
    padding subtracted from bin 0), radix-16 MXU formulation — the
    shipping kernel; the rows-batched experiment variants live in
    ``ops/pallas/experiments.tile_histograms_radix_batched``.
    """
    if interpret is None:
        interpret = _interpret_default()
    blk, thp, twp, slack = _pad_tiles(ext, tiles_y, tiles_x, tile_h, tile_w)
    out = pl.pallas_call(
        _tile_hist_radix_kernel,
        out_shape=jax.ShapeDtypeStruct((tiles_y * tiles_x, 16, 16), jnp.int32),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((thp, twp), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 16),
                               lambda ty, tx: (ty * tiles_x + tx, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blk)
    hists = out.reshape(tiles_y * tiles_x, 256)
    if slack:
        hists = hists.at[:, 0].add(-slack)
    return hists


def clahe_interpolate_natural_band(y_band: jax.Array, luts: jax.Array,
                                   spec: "NaturalSpec", row0: jax.Array,
                                   interpret: bool | None = None) -> jax.Array:
    """Band variant for spatially-sharded CLAHE (shard_map over row bands).

    ``y_band`` holds ``rows_loc`` rows whose first row sits at *traced*
    global row ``row0``; rows_loc and row0 must be multiples of ``spec.rs``
    (the sharded builder pads the frame so they are), so the band's row
    blocks coincide with global blocks and the per-block SMEM tables are a
    traced ``dynamic_slice`` of the global ones.  The pallas grid itself
    stays static.  ``spec`` must be built with ``rows_pad`` >= the padded
    sharded height so the tables cover every band row.
    """
    if interpret is None:
        interpret = _interpret_default()
    rows_loc, w = y_band.shape
    assert w == spec.width
    rs, Pp, G = spec.rs, spec.pack_rows, spec.groups
    assert rows_loc % rs == 0
    nrb_loc = rows_loc // rs
    blk0 = row0 // rs
    rp_band = jax.lax.dynamic_slice(
        jnp.asarray(spec.rp_rows), (blk0, 0, 0), (nrb_loc, 1, rs))
    ya_band = jax.lax.dynamic_slice(
        jnp.asarray(spec.ya_rows), (blk0, 0, 0), (nrb_loc, 1, rs))
    luts_flat = luts.reshape(-1, 256)
    lp = jnp.take(luts_flat, jnp.asarray(spec.pack_idx), axis=0).astype(
        jnp.bfloat16
    )
    kern = functools.partial(_natural_interp_kernel, G, Pp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows_loc, w), jnp.uint8),
        grid=(nrb_loc,),
        in_specs=[
            pl.BlockSpec((rs, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.row_pairs * Pp, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rs), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rs, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        y_band,
        lp,
        jnp.asarray(spec.m_table),
        jnp.asarray(spec.xat),
        rp_band,
        ya_band,
    )

