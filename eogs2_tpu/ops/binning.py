"""Tile binning: duplicate Gaussians per overlapped tile and sort.

TPU-native replacement for the CUDA host orchestration
(``cuda_rasterizer/rasterizer_impl.cu:198-343``):

  CUDA                               here
  ----------------------------------------------------------------------
  cub InclusiveSum(tiles_touched)    jnp.cumsum
  duplicateWithKeys (key =           masked scatter loop over the tile
    tileID<<32 | float_bits(depth))    rect, fori over max tiles/Gaussian
  cub radix sort                     lax.sort on (tile_id, depth, id)
  identifyTileRanges                 searchsorted over the sorted tile ids

All shapes are static: the pair list has a fixed capacity ``pair_capacity``
(host code re-buckets and recompiles if the overflow counter trips — the
analog of the reference's dynamically resized BinningState buffers,
rasterizer_impl.cu:284-311). Everything is integer/sort work with no
gradients; the differentiable path flows through gathers performed later.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.projection import TILE, Preprocessed


class Binning(NamedTuple):
    pair_gauss: jnp.ndarray  # [P] int32 Gaussian index per sorted pair
    pair_tile: jnp.ndarray  # [P] int32 tile id per sorted pair (== n_tiles for pad)
    pair_valid: jnp.ndarray  # [P] bool
    tile_start: jnp.ndarray  # [n_tiles] int32 first pair index of each tile
    tile_count: jnp.ndarray  # [n_tiles] int32 pairs in each tile
    num_pairs: jnp.ndarray  # [] int32 total emitted pairs (may exceed capacity!)
    max_tile_count: jnp.ndarray  # [] int32 densest tile (for bucket sizing)


def grid_dims(width: int, height: int):
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity", "max_tiles_per_gaussian"))
def bin_gaussians(
    prep: Preprocessed,
    width: int,
    height: int,
    pair_capacity: int = 0,  # unused; kept for API compatibility
    max_tiles_per_gaussian: int = 16,
) -> Binning:
    """Build the depth-sorted per-tile pair list — scatter-free.

    TPU note: the obvious CUDA-style emission (prefix-sum offsets + scatter
    each Gaussian's tiles into a compact pair buffer) is pathologically slow
    on TPU, where scatter lowers to sort-based machinery (~88 ms for 100k
    Gaussians). Since the very next step is a full (tile, depth) sort that
    doesn't care about input order, compaction is pointless: emit the pair
    table DENSELY as [N, max_tiles_per_gaussian] with pad entries, flatten,
    and let the one lax.sort do everything. Sorting the (slightly larger)
    padded table is orders of magnitude cheaper than the scatters.

    Gaussians whose tile rect exceeds ``max_tiles_per_gaussian`` are clamped
    to their first rows of tiles; the true demand stays observable through
    tiles_touched so the host can re-bucket (the analog of the reference's
    dynamically resized BinningState, rasterizer_impl.cu:284-311).
    """
    grid_x, grid_y = grid_dims(width, height)
    n_tiles = grid_x * grid_y
    n = prep.depth.shape[0]
    tcap = max_tiles_per_gaussian

    tiles = jnp.minimum(prep.tiles_touched, tcap)
    num_pairs = jnp.sum(prep.tiles_touched)  # true demand (pre-clamp)

    pad_tile = jnp.int32(n_tiles)
    t = jnp.arange(tcap, dtype=jnp.int32)[None, :]  # [1,T]
    rw = jnp.maximum(prep.rect_size[:, 0], 1)[:, None]
    ty = t // rw
    tx = t - ty * rw
    tile_id = (prep.rect_min[:, 1][:, None] + ty) * grid_x + (
        prep.rect_min[:, 0][:, None] + tx
    )
    valid = t < tiles[:, None]
    tile_tab = jnp.where(valid, tile_id, pad_tile).reshape(-1).astype(jnp.int32)
    gid_tab = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, tcap)
    ).reshape(-1)
    depth_tab = jnp.broadcast_to(prep.depth[:, None], (n, tcap)).reshape(-1)

    sort_tile, _, sort_id = jax.lax.sort(
        (tile_tab, depth_tab, gid_tab), num_keys=2
    )
    pair_valid = sort_tile < n_tiles

    # Per-tile ranges (identifyTileRanges, rasterizer_impl.cu:116-138).
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sort_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sort_tile, tile_ids + 1, side="left").astype(jnp.int32)
    tile_count = tile_end - tile_start

    return Binning(
        pair_gauss=sort_id,
        pair_tile=sort_tile,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        max_tile_count=jnp.max(tile_count),
    )


def tile_pair_indices(binning: Binning, tile_capacity: int):
    """Dense [n_tiles, K] view of the sorted pair list.

    Returns (pair_idx, mask): pair_idx[t, k] indexes into the sorted pair
    arrays; mask marks k < tile_count[t] (clamped at K). Tiles denser than K
    drop their *back* (lowest-altitude) Gaussians — by the time a tile has K
    front-to-back contributors the transmittance is long dead; the host picks
    K from max_tile_count so this only matters transiently.
    """
    n_tiles = binning.tile_start.shape[0]
    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = binning.tile_start[:, None] + k[None, :]
    mask = k[None, :] < jnp.minimum(binning.tile_count, tile_capacity)[:, None]
    idx = jnp.where(mask, idx, 0)
    return idx, mask
