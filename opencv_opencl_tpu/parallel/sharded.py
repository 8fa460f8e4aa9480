"""Multi-chip sharded enhancement: frame DP x spatial row-band sharding.

The scaling story (SURVEY §2 parallelism table -> TPU):

- **data** axis: the batch of frames is sharded across chips — each chip
  enhances its own frames end-to-end, no communication (the perfect-scaling
  analogue of the reference's worker pool).
- **space** axis: each frame's Y plane is split into horizontal row bands.
  Histogram equalization needs one *global* histogram -> ``psum`` over the
  space axis (256 int32 = 1 KB, negligible on ICI).  CLAHE's tile rows are
  band-local, but the bilinear blend needs the *neighbour* tiles' LUTs ->
  ``all_gather`` of the per-tile LUT table (tilesY*tilesX*256 uint8 = 16 KB
  at 8x8), after which interpolation is band-local.  Both collectives are
  tiny compared to the pixel data, which never moves between chips.

Constraints for the sharded path: frame height and tile rows divisible by
the space-axis size, and no reflect padding (height % tilesY == 0 and
width % tilesX == 0) — standard video geometries (1080p/4K with 8x8) all
qualify.  Use ``clahe_apply`` on a single chip otherwise.

The in-band interpolation uses the Pallas MXU kernel on TPU
(``clahe_interpolate_pallas_band``: traced band offsets absorbed by XLA
dynamic slices around a static pallas grid) and the XLA gather formulation
elsewhere; select with ``backend``.  The pallas route requires
``check_vma=False`` on the shard_map (pallas out_shapes carry no varying
-manual-axes annotation).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from opencv_opencl_tpu.core.frames import ChromaPolicy
from opencv_opencl_tpu.models.enhancer import EnhancerConfig
from opencv_opencl_tpu.ops import clahe as clahe_ops
from opencv_opencl_tpu.ops import histeq as histeq_ops
from opencv_opencl_tpu.ops import histogram as hist_ops

__all__ = [
    "sharded_histeq",
    "sharded_clahe",
    "build_sharded_pipeline",
]


def _check_divisible(plan: clahe_ops.ClahePlan, nsp: int) -> None:
    if plan.pad_bottom or plan.pad_right:
        raise ValueError(
            "sharded CLAHE requires tile-divisible geometry "
            f"({plan.height}x{plan.width} with grid "
            f"{plan.tiles_x}x{plan.tiles_y} needs padding)"
        )
    if plan.tiles_y % nsp or plan.height % nsp:
        raise ValueError(
            f"tiles_y={plan.tiles_y} and height={plan.height} must divide "
            f"by space axis size {nsp}"
        )


def _histeq_band(y_band: jax.Array, total: int, space_axis: str,
                 method: str) -> jax.Array:
    """Per-device body: band histogram -> psum -> LUT -> band map."""
    local_hist = hist_ops.hist256(y_band, method)
    global_hist = jax.lax.psum(local_hist, space_axis)
    lut = hist_ops.equalize_lut(global_hist, total=total)
    return histeq_ops.apply_lut(y_band, lut)


def _clahe_band(
    y_band: jax.Array,
    plan: clahe_ops.ClahePlan,
    space_axis: str,
    method: str,
    backend: str = "auto",
) -> jax.Array:
    """Per-device body: local tile LUTs -> all_gather -> band interpolate."""
    nsp = jax.lax.axis_size(space_axis)
    idx = jax.lax.axis_index(space_axis)
    rows_loc = y_band.shape[0]
    tiles_y_loc = plan.tiles_y // nsp
    tiles = (
        y_band.reshape(tiles_y_loc, plan.tile_h, plan.tiles_x, plan.tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y_loc * plan.tiles_x, plan.tile_area)
    )
    hists = jax.vmap(lambda t: hist_ops.hist256(t, method))(tiles)
    luts_loc = clahe_ops._luts_from_hists(hists, plan)
    luts = jax.lax.all_gather(luts_loc, space_axis, axis=0, tiled=True)
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from opencv_opencl_tpu.ops.pallas import lut_kernels

        spec = lut_kernels.make_interp_spec(
            plan.height, plan.width, plan.clip_limit,
            (plan.tiles_x, plan.tiles_y),
        )
        if spec is not None:
            return lut_kernels.clahe_interpolate_pallas_band(
                y_band, luts, spec, idx * rows_loc
            )
        if backend == "pallas":
            raise ValueError("geometry has no pallas fast path")
    return clahe_ops._interpolate_rows(y_band, luts, plan, idx * rows_loc)


def sharded_histeq(mesh: Mesh, height: int, width: int,
                   method: str = "onehot",
                   data_axis: str = "data", space_axis: str = "space"):
    """Jitted (N, H, W) -> (N, H, W) equalizeHist over a (data, space) mesh."""
    total = height * width

    def band_fn(y):  # y: (B_loc, rows_loc, W)
        return jax.vmap(
            lambda f: _histeq_band(f, total, space_axis, method)
        )(y)

    spec = P(data_axis, space_axis, None)
    # check_vma off when the LUT apply routes to pallas (TPU): pallas
    # out_shapes carry no varying-manual-axes annotation
    fn = shard_map(band_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=jax.default_backend() != "tpu")
    return jax.jit(fn)


def sharded_clahe(mesh: Mesh, plan: clahe_ops.ClahePlan,
                  method: str = "onehot",
                  data_axis: str = "data", space_axis: str = "space",
                  backend: str = "auto"):
    """Jitted (N, H, W) -> (N, H, W) CLAHE over a (data, space) mesh."""
    _check_divisible(plan, mesh.shape[space_axis])
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )

    def band_fn(y):
        return jax.vmap(
            lambda f: _clahe_band(f, plan, space_axis, method, backend)
        )(y)

    spec = P(data_axis, space_axis, None)
    fn = shard_map(band_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=not use_pallas)
    return jax.jit(fn)


def build_sharded_pipeline(cfg: EnhancerConfig, height: int, width: int,
                           mesh: Mesh,
                           data_axis: str = "data", space_axis: str = "space"):
    """The full multi-chip NV12 step: (y, uv) batches in, enhanced out.

    Y is sharded (data, space, -) and enhanced with the sharded op; UV is
    sharded (data, space, -) and either grayed or passed through.  Returns a
    jitted fn plus the NamedShardings callers should place inputs with.
    """
    total = height * width
    plan = (
        clahe_ops.make_clahe_plan(height, width, float(cfg.clip_limit),
                                  tuple(cfg.tile_grid))
        if cfg.op == "clahe"
        else None
    )
    if plan is not None:
        _check_divisible(plan, mesh.shape[space_axis])

    use_pallas = (cfg.op in ("histeq", "clahe")
                  and jax.default_backend() == "tpu")

    def band_fn(y, uv):
        if cfg.op == "histeq":
            y_out = jax.vmap(
                lambda f: _histeq_band(f, total, space_axis, cfg.hist_method)
            )(y)
        elif cfg.op == "clahe":
            y_out = jax.vmap(
                lambda f: _clahe_band(f, plan, space_axis, cfg.hist_method)
            )(y)
        else:
            y_out = y
        uv_out = jnp.full_like(uv, 128) if cfg.chroma == ChromaPolicy.GRAY else uv
        return y_out, uv_out

    spec = P(data_axis, space_axis, None)
    fn = jax.jit(
        shard_map(band_fn, mesh=mesh, in_specs=(spec, spec),
                  out_specs=(spec, spec), check_vma=not use_pallas)
    )
    sharding = NamedSharding(mesh, spec)
    return fn, sharding
