"""Pallas TPU kernels for LUT application — the hot path.

XLA's ``gather`` lowers disastrously on TPU for the per-pixel 256-entry LUT
lookups (~270 ms for one 4K CLAHE interpolation, 97% of frame time).  These
kernels replace every gather with a **one-hot matmul on the MXU**: for a
block of P pixels, build the (P, 256) one-hot of the pixel values in VMEM
(bfloat16: 0/1 exact) and multiply by the LUT(s) packed as a (256, N)
matrix.  Each product selects exactly one LUT entry (values <= 255, exact in
bf16; f32 accumulation of a single non-zero term is exact), so results are
bit-identical to the gather formulation.  The one-hot never touches HBM.

The kernels:

- ``apply_lut_pallas`` — global equalizeHist mapping (one LUT, N=1).
- ``tile_histograms_pallas`` — per-tile 256-bin histograms entirely in VMEM
  (8-row chunks, transposed one-hot lane-reductions, int32 accumulator);
  also serves full-image histograms via strip splits (``hist256_pallas``).
- ``clahe_interpolate_pallas`` — CLAHE bilinear interpolation.  The frame is
  embedded in a *padded uniform cell grid*: cell (cy, cx) is the region
  between tile centers where the same four tile LUTs contribute, so blocks
  get a constant (4, 256) LUT pack and per-axis weight vectors, and the
  bilinear blend runs on the VPU.  Cell boundaries follow OpenCV's exact
  float32 reciprocal-multiply coordinates — the integer cell mapping is
  *verified against the plan's exact per-pixel indices* at spec-build time
  (``make_interp_spec``), falling back to the XLA path if it ever disagrees.
  Fully-padded border row-blocks skip compute via per-block SMEM live flags.
  ``clahe_interpolate_pallas_band`` is the shard_map band variant (traced
  offsets absorbed by XLA dynamic slices); ``radix=True`` selects a radix-16
  experiment (bit-exact, no speedup measured — kept for reference).

Reference lineage: this is the TPU re-design of the FPGA offload kernel
(``accel.cpp`` / ``OpenCLequalHist.cpp:346-365``) — same role (the per-pixel
map stage), hardware-appropriate algorithm (MXU one-hot instead of the HLS
streaming LUT).
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
    "apply_lut_pallas",
    "tile_histograms_pallas",
    "InterpSpec",
    "make_interp_spec",
    "clahe_interpolate_pallas",
    "clahe_interpolate_pallas_band",
]

_PX_BUDGET = 8192  # one-hot pixels per block: 8192*256*2B = 4 MB VMEM
HIST_TILE_PX_LIMIT = 4 * 1024 * 1024  # uint8 tile block bytes kept <= 4 MB


def _interpret_default() -> bool:
    """Compile on TPU; interpret elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- histeq ----


def _apply_lut_kernel(y_ref, lut_ref, out_ref):
    # Per-row transposed one-hot: oh[k, c] = (y[r, c] == k), a broadcast
    # compare with no reshape (Mosaic cannot fold lanes into sublanes).
    bh, bw = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    # Mosaic has no u8->bf16 cast; go through int32
    lut = lut_ref[:].astype(jnp.int32).astype(jnp.bfloat16)  # (1, 256)
    for r in range(bh):  # static unroll
        v = y_ref[r : r + 1, :].astype(jnp.int32)        # (1, bw)
        oh = (bins == v).astype(jnp.bfloat16)            # (256, bw)
        res = jnp.dot(lut, oh, preferred_element_type=jnp.float32)
        # Mosaic has no f32->u8 cast; values are exact ints in [0,255]
        out_ref[r : r + 1, :] = res.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("block_h", "block_w", "interpret")
)
def apply_lut_pallas(y: jax.Array, lut: jax.Array,
                     block_h: int = 8, block_w: int = 1024,
                     interpret: bool | None = None) -> jax.Array:
    """uint8 (H, W) through a 256-entry uint8 LUT, MXU one-hot matmul."""
    if interpret is None:
        interpret = _interpret_default()
    h, w = y.shape
    bw = min(block_w, w)
    bh = max(1, min(block_h, _PX_BUDGET // bw))
    grid = (pl.cdiv(h, bh), pl.cdiv(w, bw))
    return pl.pallas_call(
        _apply_lut_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, lut.reshape(1, 256))


# ------------------------------------------------------------- histogram ----


def _tile_hist_kernel(y_ref, out_ref):
    """Per-tile 256-bin histogram: per-row transposed one-hot summed over
    lanes, accumulated across rows with a fori_loop carry.  Alignment
    padding contributes zeros to bin 0 and is subtracted statically by the
    caller."""
    thp, twp = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)

    def body(r8, acc):
        # dynamic slices in the sublane dim must be 8-aligned; grab an
        # 8-row chunk and unroll the rows as static value slices
        base = pl.multiple_of(r8 * 8, 8)
        chunk = y_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, twp)
        for k in range(8):
            acc = acc + (bins == chunk[k : k + 1, :]).astype(jnp.int32)
        return acc

    # full-width int32 accumulator (exact at any tile size; i16/i8 variants
    # measured SLOWER on v5e — Mosaic narrow-int packing overhead), with a
    # single lane-reduce per tile at the end
    acc = jax.lax.fori_loop(
        0, thp // 8, body, jnp.zeros((256, twp), jnp.int32)
    )
    out_ref[0, :, :] = jnp.sum(acc, axis=1, keepdims=True)


def tile_histograms_pallas(ext: jax.Array, tiles_y: int, tiles_x: int,
                           tile_h: int, tile_w: int,
                           interpret: bool | None = None) -> jax.Array:
    """Per-tile histograms of a tile-divisible image, int32 (T, 256).

    ``ext`` is (tiles_y*tile_h, tiles_x*tile_w) uint8 (the reflect-extended
    CLAHE image).  Tiles are re-laid out to (8, 128)-aligned slots with
    zero padding; the padded-pixel count (a static constant) is subtracted
    from bin 0.
    """
    if interpret is None:
        interpret = _interpret_default()
    thp = -(-tile_h // 8) * 8
    twp = -(-tile_w // 128) * 128
    if thp * twp > HIST_TILE_PX_LIMIT:
        # VMEM bound only: the accumulator is full int32 (exact at any tile
        # size — see _tile_hist_kernel), so there is no count-overflow limit
        raise ValueError(
            f"tile block {thp}x{twp} exceeds the VMEM histogram budget"
        )
    blk = ext.reshape(tiles_y, tile_h, tiles_x, tile_w)
    blk = jnp.pad(blk, ((0, 0), (0, thp - tile_h), (0, 0), (0, twp - tile_w)))
    blk = blk.reshape(tiles_y * thp, tiles_x * twp)
    out = pl.pallas_call(
        _tile_hist_kernel,
        out_shape=jax.ShapeDtypeStruct((tiles_y * tiles_x, 256, 1), jnp.int32),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((thp, twp), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 256, 1),
                               lambda ty, tx: (ty * tiles_x + tx, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blk)
    hists = out.reshape(tiles_y * tiles_x, 256)
    slack = thp * twp - tile_h * tile_w
    if slack:
        hists = hists.at[:, 0].add(-slack)
    return hists


# ---------------------------------------------------------------- clahe ----


@dataclasses.dataclass(frozen=True)
class InterpSpec:
    """Static config for the uniform-cell CLAHE interpolation kernel.

    Cells are padded from (tile_h, tile_w) to (th_pad, tw_pad) — multiples
    of the TPU (8, 128) block tiling — by a reshape/pad/reshape; the slack
    pixels compute garbage that never survives the final slice.
    """

    height: int
    width: int
    tiles_x: int
    tiles_y: int
    tile_h: int          # interpolation tile size (from the CLAHE plan)
    tile_w: int
    th_pad: int          # cell size in the kernel layout (mult of 8)
    tw_pad: int          # (mult of 128)
    pad_top: int         # frame origin inside the padded cell grid
    pad_left: int
    rows_sub: int        # kernel block rows (divides th_pad, mult of 8)
    row_block_live: np.ndarray  # int32 (CY*SUBS, 1, 1): 0 = block is all padding
    cell_lut_idx: np.ndarray  # int32 (CY, CX, 4): flat tile index of the 4 LUTs
    xa_pad: np.ndarray        # f32 (CX, 1, tw_pad): per-cell column weights
    ya_pad: np.ndarray        # f32 (CY*SUBS, 1, rows_sub): per-block row weights

    @property
    def cy(self) -> int:
        return self.tiles_y + 1

    @property
    def cx(self) -> int:
        return self.tiles_x + 1

    @property
    def subs(self) -> int:
        return self.th_pad // self.rows_sub


def _cell_mapping_ok(lo: np.ndarray, hi: np.ndarray, n: int, tile: int,
                     pad: int, tiles: int) -> bool:
    """Verify clip(floor((p+pad)/tile) - 1) reproduces the plan's exact
    f32-derived per-pixel tile indices."""
    c = (np.arange(n) + pad) // tile
    lo2 = np.clip(c - 1, 0, tiles - 1)
    hi2 = np.clip(c, 0, tiles - 1)
    return bool(np.array_equal(lo2, lo) and np.array_equal(hi2, hi))


@functools.lru_cache(maxsize=64)
def make_interp_spec(height: int, width: int, clip_limit: float,
                     tile_grid: tuple[int, int]) -> InterpSpec | None:
    """Build the kernel spec for a CLAHE plan, or None if the geometry does
    not admit the uniform-cell fast path (then use the XLA fallback)."""
    from opencv_opencl_tpu.ops.clahe import make_clahe_plan

    plan = make_clahe_plan(height, width, clip_limit, tile_grid)
    th, tw = plan.tile_h, plan.tile_w
    pad_top, pad_left = th // 2, tw // 2
    if not _cell_mapping_ok(plan.ty1, plan.ty2, height, th, pad_top,
                            plan.tiles_y):
        pad_top += 1  # odd tile sizes: the boundary rounds the other way
        if not _cell_mapping_ok(plan.ty1, plan.ty2, height, th, pad_top,
                                plan.tiles_y):
            return None
    if not _cell_mapping_ok(plan.tx1, plan.tx2, width, tw, pad_left,
                            plan.tiles_x):
        pad_left += 1
        if not _cell_mapping_ok(plan.tx1, plan.tx2, width, tw, pad_left,
                                plan.tiles_x):
            return None
    # TPU-aligned cell layout: cells padded to (mult of 8, mult of 128)
    tw_pad = -(-tw // 128) * 128
    th_pad = -(-th // 8) * 8
    if 256 * tw_pad * 2 > 8 * 1024 * 1024:
        return None  # per-row one-hot exceeds the VMEM budget
    # block rows: larger blocks halve grid/DMA overhead; statically
    # unrolled in the kernel, so keep them modest
    rows_sub = 8
    for d in (32, 24, 16):
        if th_pad % d == 0:
            rows_sub = d
            break
    cy, cx = plan.tiles_y + 1, plan.tiles_x + 1
    subs = th_pad // rows_sub

    # 4 contributing LUT (flat) indices per cell
    cyi = np.arange(cy)[:, None]
    cxi = np.arange(cx)[None, :]
    y1 = np.clip(cyi - 1, 0, plan.tiles_y - 1)
    y2 = np.clip(cyi, 0, plan.tiles_y - 1)
    x1 = np.clip(cxi - 1, 0, plan.tiles_x - 1)
    x2 = np.clip(cxi, 0, plan.tiles_x - 1)
    tx = plan.tiles_x
    cell_lut_idx = np.stack(
        [
            np.broadcast_to(y1 * tx + x1, (cy, cx)),
            np.broadcast_to(y1 * tx + x2, (cy, cx)),
            np.broadcast_to(y2 * tx + x1, (cy, cx)),
            np.broadcast_to(y2 * tx + x2, (cy, cx)),
        ],
        axis=-1,
    ).astype(np.int32)

    # weight arrays laid out over the aligned cell grid
    xa_pad = np.zeros((cx, 1, tw_pad), np.float32)
    cols = np.arange(width) + pad_left
    xa_pad[cols // tw, 0, cols % tw] = plan.xa
    ya_pad = np.zeros((cy, th_pad), np.float32)
    rows = np.arange(height) + pad_top
    ya_pad[rows // th, rows % th] = plan.ya
    ya_pad = ya_pad.reshape(cy * subs, 1, rows_sub)

    # mark row-blocks that contain no real frame rows (border-cell padding
    # halves + alignment slack) so the kernel can skip their compute
    live = np.zeros((cy, subs), np.int32)
    for c in range(cy):
        for sub in range(subs):
            r0, r1 = sub * rows_sub, min(sub * rows_sub + rows_sub, th)
            if r1 > r0:
                g0, g1 = c * th + r0, c * th + r1  # cell-grid rows
                if g1 > pad_top and g0 < pad_top + height:
                    live[c, sub] = 1
    row_block_live = live.reshape(cy * subs, 1, 1)

    return InterpSpec(
        height=height, width=width, tiles_x=plan.tiles_x,
        tiles_y=plan.tiles_y, tile_h=th, tile_w=tw,
        th_pad=th_pad, tw_pad=tw_pad,
        pad_top=pad_top, pad_left=pad_left, rows_sub=rows_sub,
        row_block_live=row_block_live,
        cell_lut_idx=cell_lut_idx, xa_pad=xa_pad, ya_pad=ya_pad,
    )


def _interp_kernel(y_ref, lp_ref, xa_ref, ya_ref, live_ref, out_ref):
    # Per-row transposed one-hot: oh[k, c] = (y[r, c] == k) — a broadcast
    # compare, no in-kernel reshape (Mosaic cannot fold lanes to sublanes).
    # One (4, 256) @ (256, twp) MXU dot gathers all four LUT values per
    # pixel; the bilinear blend runs on the VPU with plain mul/add (the TPU
    # does strict separate f32 rounding — verified bit-exact vs OpenCV;
    # optimization_barrier has no Pallas TPU lowering).
    rs, twp = y_ref.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    lp = lp_ref[0, 0]                    # (4, 256) bf16
    xa = xa_ref[0, 0, :][None, :]        # (1, twp)
    xa1 = jnp.float32(1.0) - xa

    @pl.when(live_ref[0, 0, 0] != 0)
    def _body():
        _interp_rows(y_ref, lp, xa, xa1, ya_ref, out_ref, rs, bins)


def _interp_rows(y_ref, lp, xa, xa1, ya_ref, out_ref, rs, bins):
    for r in range(rs):  # static unroll
        v = y_ref[r : r + 1, :].astype(jnp.int32)     # (1, twp)
        oh = (bins == v).astype(jnp.bfloat16)         # (256, twp)
        four = jnp.dot(lp, oh, preferred_element_type=jnp.float32)
        ya = ya_ref[0, 0, r]                          # scalar (SMEM)
        ya1 = jnp.float32(1.0) - ya
        r1 = four[0:1, :] * xa1 + four[1:2, :] * xa
        r2 = four[2:3, :] * xa1 + four[3:4, :] * xa
        res = r1 * ya1 + r2 * ya
        # Mosaic has no f32->u8 cast; go through int32
        out_ref[r : r + 1, :] = (
            jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )


def clahe_interpolate_pallas_band(y: jax.Array, luts: jax.Array,
                                  spec: InterpSpec, row0: jax.Array,
                                  interpret: bool | None = None) -> jax.Array:
    """Band variant for spatially-sharded CLAHE (shard_map over row bands).

    ``y`` is a horizontal band of ``rows_loc`` rows whose first row sits at
    *traced* global row ``row0`` (``axis_index * rows_loc`` inside
    shard_map); ``luts`` is the all-gathered full (T, 256) table.  Each
    output pixel depends only on its own input pixel, its cell's 4 LUTs and
    the per-axis weights, so the band is embedded into its own cell-aligned
    layout: the traced offsets are absorbed by XLA ``dynamic_update_slice``
    / ``dynamic_slice`` around the kernel, and the per-band LUT-pack and
    row-weight tables are traced ``dynamic_slice``s of the zero-padded
    global tables — the pallas grid itself stays static.
    """
    if interpret is None:
        interpret = _interpret_default()
    rows_loc, width = y.shape
    assert width == spec.width
    th, tw, rs = spec.tile_h, spec.tile_w, spec.rows_sub
    thp, twp = spec.th_pad, spec.tw_pad
    cy, cx, subs = spec.cy, spec.cx, spec.subs
    # cell rows a band can touch (static bound), first touched cell (traced)
    ncb = rows_loc // th + 2
    pr0 = row0 + spec.pad_top
    c0 = pr0 // th
    off = pr0 - c0 * th  # band start inside its first cell (traced, < th)

    luts_flat = luts.reshape(-1, 256)
    lp = jnp.take(luts_flat, jnp.asarray(spec.cell_lut_idx), axis=0).astype(
        jnp.bfloat16
    )  # (cy, cx, 4, 256)
    # zero-pad cell-row tables so the traced slice can't run off the end
    lp_padded = jnp.pad(lp, ((0, ncb), (0, 0), (0, 0), (0, 0)))
    lp_band = jax.lax.dynamic_slice(
        lp_padded, (c0, 0, 0, 0), (ncb, cx, 4, 256)
    )
    ya_full = jnp.asarray(spec.ya_pad).reshape(cy, subs, 1, rs)
    ya_padded = jnp.pad(ya_full, ((0, ncb), (0, 0), (0, 0), (0, 0)))
    ya_band = jax.lax.dynamic_slice(
        ya_padded, (c0, 0, 0, 0), (ncb, subs, 1, rs)
    ).reshape(ncb * subs, 1, rs)
    xa_pad = jnp.asarray(spec.xa_pad)

    # embed the band at its in-cell offset, columns exactly as the full frame
    y_pad = jnp.zeros((ncb * th, cx * tw), jnp.uint8)
    y_pad = jax.lax.dynamic_update_slice(y_pad, y, (off, spec.pad_left))
    y_blk = y_pad.reshape(ncb, th, cx, tw)
    y_blk = jnp.pad(y_blk, ((0, 0), (0, thp - th), (0, 0), (0, twp - tw)))
    y_blk = y_blk.reshape(ncb * thp, cx * twp)

    live = jnp.ones((ncb * subs, 1, 1), jnp.int32)  # band blocks: all live
    out_blk = pl.pallas_call(
        _interp_kernel,
        out_shape=jax.ShapeDtypeStruct((ncb * thp, cx * twp), jnp.uint8),
        grid=(ncb, subs, cx),
        in_specs=[
            pl.BlockSpec((rs, twp), lambda c, s, x: (c * subs + s, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, 256), lambda c, s, x: (c, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, twp), lambda c, s, x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rs), lambda c, s, x: (c * subs + s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda c, s, x: (c * subs + s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rs, twp), lambda c, s, x: (c * subs + s, x),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y_blk, lp_band, xa_pad, ya_band, live)
    out_pad = out_blk.reshape(ncb, thp, cx, twp)[:, :th, :, :tw].reshape(
        ncb * th, cx * tw
    )
    return jax.lax.dynamic_slice(
        out_pad, (off, spec.pad_left), (rows_loc, width)
    )


def _interp_kernel_radix(y_ref, lp_ref, xa_ref, ya_ref, live_ref, out_ref):
    # Radix-16 LUT selection: v = 16*hi + lo.  Two 16-wide one-hots replace
    # the 256-wide one (8x less compare/convert work on the VPU):
    #   W[j*16+b, c] = lut_j[hi_c, b]        (one (64,16)@(16,twp) MXU dot)
    #   four[j, c]   = sum_b W[j*16+b, c] * [lo_c == b]   (VPU mul+reduce)
    # Both stages select exactly one entry -> bit-identical to the gather.
    rs, twp = y_ref.shape
    bins16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    lp = lp_ref[0, 0]                    # (64, 16) bf16: [lut j, hi] x lo
    xa = xa_ref[0, 0, :][None, :]        # (1, twp)
    xa1 = jnp.float32(1.0) - xa

    @pl.when(live_ref[0, 0, 0] != 0)
    def _body():
        _interp_rows_radix(y_ref, lp, xa, xa1, ya_ref, out_ref, rs, bins16)


def _interp_rows_radix(y_ref, lp, xa, xa1, ya_ref, out_ref, rs, bins16):
    for r in range(rs):  # static unroll
        v = y_ref[r : r + 1, :].astype(jnp.int32)       # (1, twp)
        hi = v >> 4
        lo = v & 15
        oh_hi = (bins16 == hi).astype(jnp.bfloat16)     # (16, twp)
        w = jnp.dot(lp, oh_hi, preferred_element_type=jnp.float32)  # (64,twp)
        oh_lo = (bins16 == lo).astype(jnp.float32)      # (16, twp)
        fours = []
        for j in range(4):
            fours.append(
                jnp.sum(w[j * 16 : (j + 1) * 16, :] * oh_lo, axis=0,
                        keepdims=True)
            )
        ya = ya_ref[0, 0, r]
        ya1 = jnp.float32(1.0) - ya
        r1 = fours[0] * xa1 + fours[1] * xa
        r2 = fours[2] * xa1 + fours[3] * xa
        res = r1 * ya1 + r2 * ya
        out_ref[r : r + 1, :] = (
            jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )


def clahe_interpolate_pallas(y: jax.Array, luts: jax.Array,
                             spec: InterpSpec,
                             interpret: bool | None = None,
                             radix: bool = False) -> jax.Array:
    """CLAHE bilinear LUT interpolation of one (H, W) uint8 frame.

    ``luts`` is (tilesY*tilesX, 256) uint8 (or (tilesY, tilesX, 256)).
    ``radix=True`` selects the radix-16 kernel variant.
    """
    if interpret is None:
        interpret = _interpret_default()
    th, tw, rs = spec.tile_h, spec.tile_w, spec.rows_sub
    thp, twp = spec.th_pad, spec.tw_pad
    cy, cx, subs = spec.cy, spec.cx, spec.subs
    luts_flat = luts.reshape(-1, 256)
    # (CY, CX, 4, 256) bf16 pack — jnp.take gathers 4 LUT rows per cell
    lp = jnp.take(luts_flat, jnp.asarray(spec.cell_lut_idx), axis=0).astype(
        jnp.bfloat16
    )
    if radix:
        # -> (CY, CX, 4*16, 16): row (j*16+b), column h holds
        # lut_j[h*16 + b], so dotting with the hi one-hot (h contracted)
        # yields W[(j*16+b), px] = lut_j[hi_px*16 + b]
        lp = (
            lp.reshape(cy, cx, 4, 16, 16)
            .transpose(0, 1, 2, 4, 3)
            .reshape(cy, cx, 4 * 16, 16)
        )
    # embed the frame in the uniform cell grid, then align cells to (8, 128)
    y_pad = jnp.zeros((cy * th, cx * tw), jnp.uint8)
    y_pad = jax.lax.dynamic_update_slice(
        y_pad, y, (spec.pad_top, spec.pad_left)
    )
    y_blk = y_pad.reshape(cy, th, cx, tw)
    y_blk = jnp.pad(y_blk, ((0, 0), (0, thp - th), (0, 0), (0, twp - tw)))
    y_blk = y_blk.reshape(cy * thp, cx * twp)
    xa_pad = jnp.asarray(spec.xa_pad)
    ya_pad = jnp.asarray(spec.ya_pad)
    live = jnp.asarray(spec.row_block_live)

    lp_block = (1, 1, 4 * 16, 16) if radix else (1, 1, 4, 256)
    out_blk = pl.pallas_call(
        _interp_kernel_radix if radix else _interp_kernel,
        out_shape=jax.ShapeDtypeStruct((cy * thp, cx * twp), jnp.uint8),
        grid=(cy, subs, cx),
        in_specs=[
            pl.BlockSpec((rs, twp), lambda c, s, x: (c * subs + s, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lp_block, lambda c, s, x: (c, x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, twp), lambda c, s, x: (x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rs), lambda c, s, x: (c * subs + s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda c, s, x: (c * subs + s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rs, twp), lambda c, s, x: (c * subs + s, x),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y_blk, lp, xa_pad, ya_pad, live)
    out_pad = out_blk.reshape(cy, thp, cx, twp)[:, :th, :, :tw].reshape(
        cy * th, cx * tw
    )
    return jax.lax.dynamic_slice(
        out_pad, (spec.pad_top, spec.pad_left), (spec.height, spec.width)
    )
