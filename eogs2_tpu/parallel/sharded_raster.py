"""Multi-chip rasterization: Gaussian-sharded preprocess, tile-sharded blend,
all_to_all pair exchange — the scalable path (SURVEY.md section 7, all-new
relative to the single-GPU reference).

Data flow per chip (shard_map over mesh axis "g"):

  1. preprocess its N/n Gaussians (pure jnp, local)
  2. emit the dense local pair table [Nl, Tcap] with *materialized* payload
     (mean2d, conic, opacity, features) — 16 floats per pair. Carrying the
     payload through the exchange avoids any cross-chip gather afterwards;
     the gradient of the payload materialization flows back to the owning
     chip through the transposed all_to_all automatically.
  3. route each pair to the chip owning its tile ROW BAND (image rows are
     split contiguously so SSIM/conv halos stay local): bucket-compact the
     local pairs per destination into a [n, cap, F] buffer (one local sort
     by destination), then jax.lax.all_to_all over "g".
  4. locally sort the received pairs by (tile, depth) — every pair of a tile
     lands on its owner, so the per-tile order is globally correct.
  5. dense [T_band, K] view + blend -> the chip's image band.

Losses can then be computed bandwise + psum, or the bands all-gathered.
Per-destination capacity is static; overflow is observable via counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from eogs2_tpu.ops.binning import grid_dims
from eogs2_tpu.ops.blend import blend_tiles
from eogs2_tpu.ops.gaussians import build_cov3d
from eogs2_tpu.ops.projection import TILE, compute_cov2d_direct, preprocess_gaussians

NF = 16  # payload floats per pair: mx,my,ca,cb,cc,op,f0..f4,mask,pad


def _emit_local_pairs(prep, feat, width, height, tcap):
    """Dense [Nl*tcap] pair table with tile ids and packed payload."""
    grid_x, grid_y = grid_dims(width, height)
    n_tiles = grid_x * grid_y
    nl = prep.depth.shape[0]

    tiles = jnp.minimum(prep.tiles_touched, tcap)
    t = jnp.arange(tcap, dtype=jnp.int32)[None, :]
    rw = jnp.maximum(prep.rect_size[:, 0], 1)[:, None]
    ty = t // rw
    tx = t - ty * rw
    tile_id = (prep.rect_min[:, 1][:, None] + ty) * grid_x + (
        prep.rect_min[:, 0][:, None] + tx
    )
    valid = t < tiles[:, None]
    tile_tab = jnp.where(valid, tile_id, n_tiles).reshape(-1)
    depth_tab = jnp.broadcast_to(prep.depth[:, None], (nl, tcap)).reshape(-1)

    payload = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic,
            prep.opacity[:, None],
            feat,
            jnp.ones((nl, 1), feat.dtype),
            jnp.zeros((nl, NF - 12), feat.dtype),
        ],
        axis=1,
    )  # [Nl, NF]
    payload_tab = jnp.broadcast_to(
        payload[:, None, :], (nl, tcap, NF)
    ).reshape(-1, NF)
    payload_tab = payload_tab * valid.reshape(-1, 1)
    return tile_tab, depth_tab, payload_tab


def sharded_render(
    mesh: Mesh,
    means3d, scales, quats, opacities, feat, alive, affine, bg,
    width: int, height: int,
    tcap: int = 8,
    dest_cap: int = 1 << 15,
    tile_capacity: int = 512,
    tile_chunk: int = 64,
    axis: str = "g",
):
    """Render the full image with Gaussians sharded over mesh axis `axis`.

    Inputs: means3d [N,3] etc. (N divisible by the axis size), affine [3,4],
    bg [C]. The padded image height must give a tile-row count divisible by
    the axis size. Returns (image [C,Hp,Wp], max_tile_count, max_dest_count).
    """
    from jax import shard_map

    grid_x, grid_y = grid_dims(width, height)
    n_shards = mesh.shape[axis]
    assert grid_y % n_shards == 0, (
        f"tile rows {grid_y} not divisible by mesh axis {n_shards}"
    )
    rows_per = grid_y // n_shards
    tiles_per_band = rows_per * grid_x
    n_tiles = grid_x * grid_y

    def shard_fn(means3d, scales, quats, opacities, feat, alive, affine, bg):
        cov2d = compute_cov2d_direct(scales, quats, affine, width, height)
        prep = preprocess_gaussians(
            means3d, None, opacities, affine, width, height, alive=alive,
            cov2d=cov2d,
        )
        tile_tab, depth_tab, payload_tab = _emit_local_pairs(
            prep, feat, width, height, tcap
        )

        dest = jnp.minimum(tile_tab // tiles_per_band, n_shards - 1)
        dest = jnp.where(tile_tab >= n_tiles, n_shards, dest)

        order1 = jax.lax.sort(
            (dest, jnp.arange(dest.shape[0], dtype=jnp.int32)), num_keys=1
        )[1]
        dest_s = dest[order1]
        tile_s = tile_tab[order1]
        depth_s = depth_tab[order1]
        pay_s = payload_tab[order1]

        starts = jnp.searchsorted(dest_s, jnp.arange(n_shards)).astype(jnp.int32)
        counts = (
            jnp.searchsorted(dest_s, jnp.arange(n_shards) + 1).astype(jnp.int32)
            - starts
        )
        slot = jnp.arange(dest_cap, dtype=jnp.int32)
        src_idx = jnp.clip(starts[:, None] + slot[None, :], 0, dest_s.shape[0] - 1)
        ok = slot[None, :] < jnp.minimum(counts, dest_cap)[:, None]
        send_tile = jnp.where(ok, tile_s[src_idx], n_tiles)
        send_depth = jnp.where(ok, depth_s[src_idx], jnp.inf)
        send_pay = pay_s[src_idx] * ok[:, :, None]

        recv_tile = jax.lax.all_to_all(send_tile, axis, 0, 0, tiled=True)
        recv_depth = jax.lax.all_to_all(send_depth, axis, 0, 0, tiled=True)
        recv_pay = jax.lax.all_to_all(send_pay, axis, 0, 0, tiled=True)

        flat_tile = recv_tile.reshape(-1)
        flat_depth = recv_depth.reshape(-1)
        flat_pay = recv_pay.reshape(-1, NF)

        sort_tile, _, order2 = jax.lax.sort(
            (flat_tile, flat_depth,
             jnp.arange(flat_tile.shape[0], dtype=jnp.int32)),
            num_keys=2,
        )
        pay_sorted = flat_pay[order2]

        band = jax.lax.axis_index(axis)
        tids = band * tiles_per_band + jnp.arange(tiles_per_band, dtype=jnp.int32)
        tstart = jnp.searchsorted(sort_tile, tids).astype(jnp.int32)
        tend = jnp.searchsorted(sort_tile, tids + 1).astype(jnp.int32)
        k = jnp.arange(tile_capacity, dtype=jnp.int32)
        pidx = tstart[:, None] + k[None, :]
        mask = k[None, :] < jnp.minimum(tend - tstart, tile_capacity)[:, None]
        pidx = jnp.where(mask, pidx, 0)
        tile_pay = pay_sorted[pidx]

        mean2d = tile_pay[..., 0:2]
        conic = tile_pay[..., 2:5]
        opac = tile_pay[..., 5]
        feats = tile_pay[..., 6:11]
        msk = mask & (tile_pay[..., 11] > 0.5)

        tx = (tids % grid_x).astype(jnp.float32) * TILE
        ty = (tids // grid_x).astype(jnp.float32) * TILE
        origins = jnp.stack([tx, ty], axis=-1)

        out, _ = blend_tiles(
            mean2d, conic, opac, feats, msk, origins, bg, tile_chunk=tile_chunk
        )
        c = feats.shape[-1]
        img = out.reshape(rows_per, grid_x, TILE, TILE, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(rows_per * TILE, grid_x * TILE, c)
        stats = jnp.stack([jnp.max(tend - tstart), jnp.max(counts)])
        return img, stats

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    img_bands, stats = fn(
        means3d, scales, quats, opacities, feat, alive, affine, bg
    )
    # bands concatenate along rows -> [Hp, Wp, C]; transpose to CHW
    image = img_bands.transpose(2, 0, 1)
    return image, stats
