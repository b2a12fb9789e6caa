"""Public differentiable rasterizer: preprocess -> bin -> gather -> blend.

This is the TPU-native counterpart of the whole reference stack
``GaussianRasterizer`` (diff_gaussian_rasterization/__init__.py) +
``CudaRasterizer::Rasterizer::forward/backward`` (rasterizer_impl.cu).

Differentiation strategy (vs. the reference's fully hand-written backward):
  * preprocess (projection, EWA cov2d, conic, altitude feature) is pure jnp —
    autodiff reproduces computeCov2DCUDA/preprocessCUDA gradients, including
    dL/d(affine) for camera pose refinement (the reference's dL_dT path,
    backward.cu:276-325, with its indexing bug fixed by construction).
  * binning/sorting is integer work, no gradients.
  * the per-tile composite carries a hand-derived VJP (ops/blend.py); the
    per-Gaussian gradient accumulation that CUDA does with atomicAdd happens
    here through the gather VJP (XLA scatter-add over the [tiles,K] index
    matrix).

All shapes are static; capacity knobs live in RasterizeConfig and are
re-bucketed (rarely) by the host loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.binning import Binning, bin_gaussians, grid_dims, tile_pair_indices
from eogs2_tpu.ops.blend import blend_tiles
from eogs2_tpu.ops.gaussians import build_cov3d
from eogs2_tpu.ops.projection import (
    TILE,
    compute_cov2d_direct,
    preprocess_gaussians,
)

NUM_CHANNELS = 5  # RGB + altitude + constant-1 (config.h:15)


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static capacity/behavior knobs (hashable -> usable as jit static arg)."""

    pair_capacity: int = 1 << 20  # legacy knob; binning is now dense [N,T]
    tile_capacity: int = 1024  # K: max Gaussians blended per tile
    max_tiles_per_gaussian: int = 16  # T: dense pair-table width
    tile_chunk: int = 128  # tiles per blend map step (memory knob)
    antialiasing: bool = False
    use_custom_vjp: bool = True
    use_pallas: bool = False  # Pallas blend kernels (TPU only)
    # "gather" (dense pair table) | "sorted" (sort-carried payloads) |
    # "fused" (sort-carried + ragged Pallas blend, no dense pair table)
    binning_mode: str = "gather"
    # all_to_all multi-chip backend only: per-destination-chip exchange
    # window (pairs one chip can send one band owner per render)
    dest_cap: int = 1 << 16
    # fused kernels: chunk-granular early exit once every pixel of a tile
    # saturates (T < 1e-4). Exact, but each chunk pays a vector->scalar
    # sync for the loop condition — enable for opaque/converged scenes,
    # disable for translucent ones where tiles rarely die early.
    early_exit: bool = True
    # fused kernels: column-major payload layout [16, pairs] (64 B/pair of
    # HBM traffic) with pairs-on-lanes kernels, instead of one pair per
    # 128-lane row (512 B/pair). Cuts the payload materialization, kernel
    # window DMA, and gradient write-back traffic 8x; bit-identical
    # results (ops/fused_raster.py).
    payload_col: bool = True
    # fused kernels: K-chunk width override (0 = auto via _pick_k_chunk)
    k_chunk: int = 0
    # fused kernels: two-tier emission. big_k > 0 moves the top-big_k
    # widest splats into their own [big_tcap, big_k] emission tier, so the
    # bulk [max_tiles_per_gaussian, N] table is sized by TYPICAL splats
    # instead of the single widest outlier (the single-tier design grew
    # tcap 4->32 within 150 training iters from a handful of outliers —
    # 8x oversized sorts + one ~8-min recompile per grow). Sort rows become
    # N*tcap + big_k*big_tcap; the CUDA analog sizes its pair buffer by the
    # true demand (rasterizer_impl.cu:280-288).
    big_k: int = 0
    big_tcap: int = 64
    # fused kernels: features are the EOGS layout [rgb, altitude, 1]
    # (renderer.py:87-93). The sort key becomes -features[:,3] and the two
    # derivable columns (altitude, constant 1) skip the payload sorts —
    # 12/11 sort operands instead of 14/12; the constant channel's
    # gradient is returned as zeros (its cotangent is discarded upstream).
    # Safe ONLY for that layout; the trainer turns it on itself.
    eogs_features: bool = False
    # fused kernels: ellipse-exact tile culling at emission. A slot whose
    # tile provably has alpha < 1/255 (or power > 0) at EVERY pixel — the
    # exact CUDA per-pixel skip (forward.cu / backward.cu) the blend
    # kernels already replicate — emits a sentinel key instead of a pair.
    # Output-exact (image and all gradients bit-identical); kills the
    # dead-corner fraction of each AABB rect, which for anisotropic
    # splats is most of it. The CUDA reference walks those tiles' ranges.
    tile_cull: bool = False
    # fused kernels: with tile_cull, additionally size the bulk emission
    # tier by ACTIVE tiles: enumerate up to rect_cap AABB positions and
    # rank-compact survivors into max_tiles_per_gaussian slots
    # (pair_pipeline._tier_keys_compact). 0 disables (slots = AABB
    # positions). rect_cap must cover the widest non-big AABB
    # (bulk_rect_max_seen watches it).
    rect_cap: int = 0
    # same compaction for the BIG tier: big_tcap is then sized by the
    # outliers' ACTIVE tiles while big_rect_cap covers their AABB (a
    # mid-training 121-rect-tile splat has ~3x fewer live tiles; without
    # this the big tier's rows triple). 0 disables.
    big_rect_cap: int = 0

    def bucketed(self, max_tile: int, max_tiles_per_gaussian: int,
                 big_max_tiles: int = 0) -> "RasterizeConfig":
        """Next power-of-two bucket that fits the observed sizes."""

        def up(x, lo):
            c = lo
            while c < x:
                c <<= 1
            return c

        return dataclasses.replace(
            self,
            tile_capacity=up(int(max_tile) + 1, 128),
            max_tiles_per_gaussian=up(int(max_tiles_per_gaussian), 4),
            big_tcap=(up(int(big_max_tiles), 16)
                      if (self.big_k and big_max_tiles) else self.big_tcap),
        )


def _pick_k_chunk(tile_capacity: int, scan_is_matmul: bool = False,
                  col: bool = False) -> int:
    """K-chunk for the Pallas kernels.

    Measured on the target chip at K=512/1024 tiles:
      * col fused kernels (roll scans + VPU basis FMAs): kc=256 is the
        sweet spot (25.3 ms e2e vs 27.3 @128 and 26.3 @512 at bench
        scale); chunks must be >=128 — lane slices below a full 128-lane
        block fail to lower (Mosaic can't prove sub-128 alignment).
      * wide fused kernels: 128 (historical tri-matmul tuning).
      * roll-based blend_pallas: total roll steps are (K/kc)*log2(kc), so
        prefer LARGE chunks — kc=512 measured 6.2 ms fwd vs 7.9 @128.
    """
    if col:
        order = (256, 128, 384, 512)
    elif scan_is_matmul:
        order = (128, 256, 384, 512, 64)
    else:
        order = (512, 384, 256, 128, 64)
    return next(
        d for d in order + (tile_capacity,) if tile_capacity % d == 0
    )


class RasterOut(NamedTuple):
    image: jnp.ndarray  # [C,H,W]
    final_t: jnp.ndarray  # [H,W] remaining transmittance
    radii: jnp.ndarray  # [N] int32 screen radius (0 = culled)
    mean2d_ndc: jnp.ndarray  # [N,2] projected centers in NDC (for densify stats)
    num_pairs: jnp.ndarray  # [] emitted pair count (overflow detection)
    max_tile_count: jnp.ndarray  # [] densest tile
    # [] widest tile rect that the BULK emission tier must cover: the
    # overall max when big_k == 0, the widest non-big splat when the
    # two-tier emission is on (grow max_tiles_per_gaussian past it)
    max_tiles_per_gaussian_seen: jnp.ndarray = None
    # [] pairs dropped by the a2a per-destination exchange window (their
    # gradients are exactly zero); always 0 on the single-chip paths, whose
    # only capacity clip is tile_capacity (watched via max_tile_count)
    dropped_pairs: jnp.ndarray = None
    # [] pairs clipped by emission capacities (bulk tcap / big_tcap) or
    # tile_capacity on the fused path — nonzero means gradients were
    # silently zeroed for those pairs; the Trainer surfaces it as a metric
    # and warns when capacities are frozen (auto_rebucket=False)
    clipped_pairs: jnp.ndarray = None
    # [] widest splat overall (vs config.big_tcap when big_k > 0)
    big_max_tiles_seen: jnp.ndarray = None
    # [] a2a backend only: largest per-destination exchange window this
    # render (vs config.dest_cap — the capacity that can overflow); None on
    # single-chip paths
    max_dest_count: jnp.ndarray = None
    # [] widest non-big AABB rect (vs config.rect_cap when slot compaction
    # is on; grow rect_cap past it). None unless the fused path ran.
    bulk_rect_max_seen: jnp.ndarray = None


@partial(jax.jit, static_argnames=("width", "height", "config"))
def rasterize(
    means3d,
    scales,
    quats,
    opacities,
    features,
    affine,
    bg,
    width: int,
    height: int,
    config: RasterizeConfig = RasterizeConfig(),
    alive=None,
    mean2d_ndc_offset=None,
):
    """Render C-channel features through the affine camera.

    Args:
      means3d: [N,3] positions (normalized UTM frame).
      scales: [N,3] activated (positive) scales.
      quats: [N,4] raw quaternions (w,x,y,z), unnormalized (reference parity).
      opacities: [N] activated opacities in (0,1).
      features: [N,C] per-Gaussian channels (EOGS: rgb, altitude, 1).
      affine: [3,4] world->(u_ndc, v_ndc, altitude) camera matrix.
      bg: [C] background, composited as out + T_final * bg.
      alive: optional [N] bool; dead capacity slots are culled.
      mean2d_ndc_offset: optional [N,2] zeros whose gradient is the
        viewspace-point gradient in NDC units — the JAX equivalent of the
        reference's retain_grad on screenspace_points (renderer.py:31-40),
        used for densification statistics.

    Returns RasterOut. Differentiable wrt all float inputs incl. `affine`.
    """
    # fused (scale,quat)->cov2d column math: skips the [N,3,3]/[N,6]
    # intermediates whose 128-lane padding costs 42x HBM bandwidth
    cov2d = compute_cov2d_direct(scales, quats, affine, width, height)
    prep = preprocess_gaussians(
        means3d,
        None,
        opacities,
        affine,
        width,
        height,
        antialiasing=config.antialiasing,
        alive=alive,
        cov2d=cov2d,
    )
    if mean2d_ndc_offset is not None:
        px_scale = jnp.array([0.5 * width, 0.5 * height], dtype=prep.mean2d.dtype)
        prep = prep._replace(mean2d=prep.mean2d + mean2d_ndc_offset * px_scale)

    grid_x, grid_y = grid_dims(width, height)
    if config.binning_mode == "fused":
        # sort-carried binning + ragged Pallas blend with no dense pair
        # table (ops/fused_raster.py); interpret mode on CPU
        from eogs2_tpu.ops.fused_raster import rasterize_fused

        k_chunk = config.k_chunk or _pick_k_chunk(
            config.tile_capacity, scan_is_matmul=True,
            col=config.payload_col,
        )
        fo = rasterize_fused(
            prep, features, width, height,
            tcap=config.max_tiles_per_gaussian,
            tile_capacity=config.tile_capacity,
            k_chunk=k_chunk,
            interpret=jax.default_backend() == "cpu",
            early_exit=config.early_exit,
            col=config.payload_col,
            big_k=config.big_k,
            big_tcap=config.big_tcap,
            eogs_features=config.eogs_features,
            tile_cull=config.tile_cull,
            rect_cap=config.rect_cap,
            big_rect_cap=config.big_rect_cap,
        )
        out = fo.out8[:, :, :5] + fo.out8[:, :, 5:6] * bg[None, None, :]
        final_t = fo.out8[:, :, 5]
        num_pairs = fo.num_pairs
        max_tile_count = fo.max_tile_count
        ro = _assemble(prep, out, final_t, num_pairs, max_tile_count,
                       features.shape[-1], width, height, grid_x, grid_y)
        return ro._replace(
            max_tiles_per_gaussian_seen=fo.bulk_max_tiles,
            clipped_pairs=fo.clipped_pairs,
            big_max_tiles_seen=fo.big_max_tiles,
            bulk_rect_max_seen=fo.bulk_rect_max_tiles,
        )

    if config.binning_mode == "sorted":
        from eogs2_tpu.ops.pair_pipeline import densify_pairs

        pd = densify_pairs(
            prep, features, width, height,
            tcap=config.max_tiles_per_gaussian,
            tile_capacity=config.tile_capacity,
        )
        g_mean2d = pd.data[..., 0:2]
        g_conic = pd.data[..., 2:5]
        g_opac = pd.data[..., 5]
        g_feat = pd.data[..., 6:]
        mask = pd.mask
        num_pairs = pd.num_pairs
        max_tile_count = pd.max_tile_count
    else:
        binning = bin_gaussians(
            jax.lax.stop_gradient(prep),
            width,
            height,
            pair_capacity=config.pair_capacity,
            max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        )

        pair_idx, tile_mask = tile_pair_indices(binning, config.tile_capacity)
        gidx = binning.pair_gauss[pair_idx]  # [T,K]
        mask = tile_mask & binning.pair_valid[pair_idx]

        # Differentiable gathers: their VJP is the scatter-add that replaces
        # CUDA's atomicAdd gradient accumulation.
        g_mean2d = prep.mean2d[gidx]  # [T,K,2]
        g_conic = prep.conic[gidx]  # [T,K,3]
        g_opac = prep.opacity[gidx]  # [T,K]
        g_feat = features[gidx]  # [T,K,C]
        num_pairs = binning.num_pairs
        max_tile_count = binning.max_tile_count

    if config.use_pallas:
        from eogs2_tpu.ops.blend_pallas import blend_tiles_pallas, pack_tile_data

        data = pack_tile_data(g_mean2d, g_conic, g_opac, g_feat, mask)
        k_chunk = _pick_k_chunk(config.tile_capacity)
        out, final_t = blend_tiles_pallas(data, bg, grid_x, k_chunk,
                                          jax.default_backend() == "cpu")
    else:
        tx = jnp.arange(grid_x * grid_y, dtype=jnp.float32) % grid_x
        ty = jnp.arange(grid_x * grid_y, dtype=jnp.float32) // grid_x
        origins = jnp.stack([tx * TILE, ty * TILE], axis=-1)

        out, final_t = blend_tiles(
            g_mean2d,
            g_conic,
            g_opac,
            g_feat,
            mask,
            origins,
            bg,
            tile_chunk=config.tile_chunk,
            use_custom_vjp=config.use_custom_vjp,
        )

    return _assemble(prep, out, final_t, num_pairs, max_tile_count,
                     features.shape[-1], width, height, grid_x, grid_y)


def _assemble(prep, out, final_t, num_pairs, max_tile_count, c,
              width, height, grid_x, grid_y):
    """Tile-major [T, P, C] blend output -> RasterOut image/stats."""
    img = out.reshape(grid_y, grid_x, TILE, TILE, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, c)
    img = img[:height, :width]
    ft = final_t.reshape(grid_y, grid_x, TILE, TILE)
    ft = ft.transpose(0, 2, 1, 3).reshape(grid_y * TILE, grid_x * TILE)
    ft = ft[:height, :width]

    # NDC-units center for densification stats (reference accumulates the
    # norm of the viewspace grad whose chain includes ddelx_dx = 0.5*W,
    # backward.cu:630-632 + gaussian_model.py:719-723).
    scale_ndc = jnp.array([2.0 / width, 2.0 / height], dtype=prep.mean2d.dtype)
    mean2d_ndc = prep.mean2d * scale_ndc

    return RasterOut(
        image=img.transpose(2, 0, 1),
        final_t=ft,
        radii=prep.radius,
        mean2d_ndc=mean2d_ndc,
        num_pairs=num_pairs,
        max_tile_count=max_tile_count,
        max_tiles_per_gaussian_seen=jnp.max(prep.tiles_touched),
    )


def reference_rasterize(
    means3d, scales, quats, opacities, features, affine, bg, width, height,
    antialiasing=False, alive=None,
):
    """O(N * H * W) dense oracle renderer — no tiling, no capacities.

    Mathematically identical to `rasterize` (same skip rules, same early-out
    threshold); used as the correctness reference in tests and as a fallback
    for tiny scenes. Sorts ALL Gaussians by altitude and composites every
    one over every pixel.
    """
    cov3d6 = build_cov3d(scales, quats)
    prep = preprocess_gaussians(
        means3d, cov3d6, opacities, affine, width, height,
        antialiasing=antialiasing, alive=alive,
    )
    order = jnp.argsort(prep.depth)
    visible = prep.radius[order] > 0

    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    opac = prep.opacity[order]
    feat = features[order]

    ys = jnp.arange(height, dtype=means3d.dtype)
    xs = jnp.arange(width, dtype=means3d.dtype)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # [P,2]

    d = mean2d[None, :, :] - pix[:, None, :]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c3 = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a * dx * dx + c3 * dy * dy) - b * dx * dy
    alpha_raw = jnp.minimum(0.99, opac[None, :] * jnp.exp(jnp.minimum(power, 0.0)))
    # Reproduce the tile-rect cutoff: CUDA only composites a Gaussian on the
    # pixels of the tiles its 3-sigma rect overlaps (getRect), so a pixel
    # outside that rect never sees it even if alpha >= 1/255 there.
    ptile = (pix / TILE).astype(jnp.int32)  # [P,2]
    rmin = prep.rect_min[order]
    rmax = rmin + prep.rect_size[order]
    in_rect = jnp.all(
        (ptile[:, None, :] >= rmin[None, :, :]) & (ptile[:, None, :] < rmax[None, :, :]),
        axis=-1,
    )
    keep = visible[None, :] & in_rect & (power <= 0.0) & (alpha_raw >= 1.0 / 255.0)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    one_minus = 1.0 - alpha
    cp = jnp.cumprod(one_minus, axis=-1)
    live = cp >= 1e-4
    t_before = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=-1)
    w = jnp.where(live, alpha * t_before, 0.0)
    out = w @ feat
    final_t = jnp.prod(jnp.where(live, one_minus, 1.0), axis=-1)
    out = out + final_t[:, None] * bg[None, :]
    img = out.reshape(height, width, -1).transpose(2, 0, 1)
    return img, final_t.reshape(height, width), prep.radius
