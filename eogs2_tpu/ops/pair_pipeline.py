"""Sort-carried pair pipeline: binning + densification with NO random
gathers and NO scatters in either direction.

Motivation (measured on the target chip): XLA's random gather of the
[tiles, K] pair data costs ~14 ms and its scatter-add transpose ~30 ms,
while lax.sort carrying float payload columns moves the same bytes in
~3-12 ms. So both directions are expressed as payload-carrying sorts:

  forward
    1. pack per-Gaussian data -> [N, F] (elementwise)
    2. broadcast to the dense pair table [N*Tcap, F] with (tile, depth) keys
    3. ONE lax.sort by (tile, depth) carrying the F payload columns AND the
       emission index iota
    4. the dense [T, K, F] view gathers CONTIGUOUS ranges (tstart[t]+k)

  backward (custom VJP)
    5. dense [T, K, F] cotangents flatten keyed by each slot's saved
       emission index (pads -> big key)
    6. ONE lax.sort by that key returns every cotangent to its emission
       position (ranges are disjoint, so positions are unique); when no
       pair was dropped the sorted keys are exactly 0..P-1 and a reshape
       suffices; a rare tile-overflow drop falls back to one scatter
    7. reshape-sum [N, Tcap, F] -> [N, F] — per-Gaussian accumulation with
       no scatter

Requires tile_capacity >= the densest tile (the same condition the dense
view already needs for correctness).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.binning import grid_dims
from eogs2_tpu.ops.projection import Preprocessed


class PairDense(NamedTuple):
    data: jnp.ndarray  # [T, K, F] densified pair payload
    mask: jnp.ndarray  # [T, K] valid
    tile_count: jnp.ndarray  # [n_tiles]
    num_pairs: jnp.ndarray  # [] true demand
    max_tile_count: jnp.ndarray  # []


def _tile_qmin(a, b, c, lx, ux, ly, uy):
    """Exact min over the box dx in [lx,ux], dy in [ly,uy] of the
    Mahalanobis quadratic q(d) = a dx^2 + 2 b dx dy + c dy^2 (the blend's
    power is -q/2, blend.py:60-64).

    For the PSD conic this is exact (interior -> 0, else the min sits at
    a clamped per-edge critical point); the 4 corners are included so a
    numerically indefinite conic still yields an UNDER-estimate — the
    cull built on this can only ever be conservative."""
    inside = (lx <= 0) & (0 <= ux) & (ly <= 0) & (0 <= uy)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    def edge_x(e):  # dx fixed at e, minimize over dy
        t = jnp.clip(-b * e / jnp.where(c > 0, c, 1e-12), ly, uy)
        return q(e, t)

    def edge_y(e):  # dy fixed at e, minimize over dx
        t = jnp.clip(-b * e / jnp.where(a > 0, a, 1e-12), lx, ux)
        return q(t, e)

    qm = jnp.minimum(
        jnp.minimum(jnp.minimum(edge_x(lx), edge_x(ux)),
                    jnp.minimum(edge_y(ly), edge_y(uy))),
        jnp.minimum(jnp.minimum(q(lx, ly), q(lx, uy)),
                    jnp.minimum(q(ux, ly), q(ux, uy))),
    )
    return jnp.where(inside, 0.0, qm)


# conservative slack on the cull threshold, covering f32 rounding drift
# between the closed-form box minimum here and the kernels' per-pixel
# exp/compare path (both are ~1-ulp; 1e-3 in q units is ~5e7 ulps at the
# thresholds involved)
_CULL_MARGIN = 1e-3


def _slot_cull_mask(rect_min, tx, ty, cull):
    """[slots, M] True where the slot's TILE is provably dead: every pixel
    of the tile has alpha < 1/255 or power > 0, the exact CUDA skip pair
    (forward.cu + backward.cu apply the same test), so dropping the pair
    at emission is output-exact for the image AND all gradients."""
    from eogs2_tpu.ops.projection import TILE

    mean2d, conic, tau = cull
    x0 = (rect_min[:, 0][None, :] + tx).astype(jnp.float32) * TILE
    y0 = (rect_min[:, 1][None, :] + ty).astype(jnp.float32) * TILE
    mx, my = mean2d[:, 0][None, :], mean2d[:, 1][None, :]
    qmin = _tile_qmin(
        conic[:, 0][None, :], conic[:, 1][None, :], conic[:, 2][None, :],
        mx - (x0 + TILE - 1.0), mx - x0,
        my - (y0 + TILE - 1.0), my - y0,
    )
    dead = qmin > tau[None, :] + _CULL_MARGIN
    return jnp.where(jnp.isfinite(qmin), dead, False)


def cull_tau(opacity):
    """Per-gaussian cull threshold: alpha = opac*exp(-q/2) >= 1/255
    iff q <= 2 ln(255*opac)."""
    return 2.0 * jnp.log(jnp.maximum(opacity, 1e-30) * 255.0)


def _tier_keys(rect_min, rect_size, depth, tiles, tcap, grid_x, n_tiles,
               cull=None):
    """(tile, depth) sort keys for ONE [tcap, M] emission tier (tcap-major).

    Emission order is tcap-MAJOR (copy j of every gaussian, then copy j+1):
    the [tcap, N] layout pads only the sublane dim (tcap -> 8), while the
    gaussian-major [N, tcap] form padded N x tcap minor dims to 128 lanes —
    a measured ~42x HBM write amplification at tcap=4 (3.5 ms -> sub-ms).
    Order only affects sort tie-breaking of identical (tile, f32 depth)
    keys, which lax.sort resolves arbitrarily anyway.
    """
    n = depth.shape[0]
    tiles = jnp.minimum(tiles, tcap)
    t = jnp.arange(tcap, dtype=jnp.int32)[:, None]  # [tcap, 1]
    rw = jnp.maximum(rect_size[:, 0], 1)[None, :]  # [1, N]
    # floor(t / rw) via f32 division: the VPU has no integer divider (XLA
    # expands integer div into a long bit-serial sequence — measured ~3 ms
    # at [4, 100k]); f32 division of exact small ints (< 2^24) is correctly
    # rounded, and floor of it is exact (q*rw == t gives exactly q, else
    # the quotient is strictly between integers).
    ty = jnp.floor(
        t.astype(jnp.float32) / rw.astype(jnp.float32)
    ).astype(jnp.int32)
    tx = t - ty * rw
    tile_id = (rect_min[:, 1][None, :] + ty) * grid_x + (
        rect_min[:, 0][None, :] + tx
    )
    valid = t < tiles[None, :]
    if cull is not None:
        # ellipse-exact tile cull (round 5): slots whose tile is provably
        # below the CUDA 1/255 alpha threshold for EVERY pixel emit a
        # sentinel key — the kernels would have skipped every pair-pixel
        # slot anyway (blend.py keep test), so the output is exact while
        # n_live per tile shrinks by the dead-corner fraction of the AABB
        # rect (the anisotropy win the CUDA reference leaves on the
        # table: forward.cu walks every rect tile's range).
        valid = valid & ~_slot_cull_mask(rect_min, tx, ty, cull)
    # float32 keys: tile ids are far below 2^24, exact in f32
    tile_tab = jnp.where(valid, tile_id, n_tiles).reshape(-1).astype(jnp.float32)
    depth_tab = jnp.broadcast_to(depth[None, :], (tcap, n)).reshape(-1)
    active = jnp.sum(valid.astype(jnp.int32), axis=0)
    return tile_tab, depth_tab, active


def _tier_keys_compact(rect_min, rect_size, depth, tiles, tcap, rcap,
                       grid_x, n_tiles, cull):
    """Compacting variant of _tier_keys: enumerate up to `rcap` rect
    positions, drop culled tiles, and pack the surviving (active) tiles
    into the first slots — so the emission table height `tcap` is sized by
    ACTIVE tiles per gaussian instead of AABB rect tiles. The pack is a
    per-column masked selection (prefix-sum ranks + tcap masked reduces,
    one fused pass over the [rcap, M] enumeration — no gather/scatter).

    Returns (tile_tab [tcap*M] f32, depth_tab [tcap*M], active_count [M]).
    Pair order within a gaussian stays rect row-major, so downstream sort
    tie-breaking sees the same relative order as the uncompacted form."""
    m = depth.shape[0]
    r = jnp.arange(rcap, dtype=jnp.int32)[:, None]  # [rcap, 1]
    rw = jnp.maximum(rect_size[:, 0], 1)[None, :]
    ry = jnp.floor(
        r.astype(jnp.float32) / rw.astype(jnp.float32)
    ).astype(jnp.int32)
    rx = r - ry * rw
    tile_id = (rect_min[:, 1][None, :] + ry) * grid_x + (
        rect_min[:, 0][None, :] + rx
    )
    active = r < jnp.minimum(tiles, rcap)[None, :]
    if cull is not None:
        active = active & ~_slot_cull_mask(rect_min, rx, ry, cull)
    active_count = jnp.sum(active.astype(jnp.int32), axis=0)
    # per-column compaction as ONE small-axis sort: key = slot index with
    # inactive slots pushed past rcap, so each column's surviving tiles
    # pack into the first slots in rect row-major order. (A rank-select
    # loop here — tcap masked reduces over [rcap, M] — was O(tcap*rcap*M)
    # with XLA materializing every pass: measured ~40 s/step at the
    # mid-training big tier, vs ~log^2(rcap) vectorized compare-exchange
    # passes for the sort.)
    key = jnp.where(active, r, rcap)
    _, tile_sel = jax.lax.sort(
        (key.astype(jnp.int32), tile_id), dimension=0, num_keys=1
    )
    tile_sel = tile_sel[:tcap]
    valid = jnp.arange(tcap, dtype=jnp.int32)[:, None] < jnp.minimum(
        active_count, tcap
    )[None, :]
    tile_tab = jnp.where(valid, tile_sel, n_tiles).reshape(-1).astype(
        jnp.float32
    )
    depth_tab = jnp.broadcast_to(depth[None, :], (tcap, m)).reshape(-1)
    return tile_tab, depth_tab, active_count


def _emission_keys(prep: Preprocessed, width, height, tcap,
                   tile_cull: bool = False):
    """Single-tier emission keys (see _tier_keys) for the [tcap, N] table.

    tile_cull: drop slots whose tile is provably below the 1/255 alpha
    threshold at every pixel (_slot_cull_mask) — output-exact."""
    grid_x, grid_y = grid_dims(width, height)
    n_tiles = grid_x * grid_y
    cull = None
    if tile_cull:
        cull = (prep.mean2d, prep.conic, cull_tau(prep.opacity))
    tile_tab, depth_tab, _ = _tier_keys(
        prep.rect_min, prep.rect_size, prep.depth, prep.tiles_touched,
        tcap, grid_x, n_tiles, cull=cull,
    )
    return tile_tab, depth_tab, n_tiles


def emission_broadcast(col, tcap):
    """Broadcast a per-gaussian [N] column to the [tcap*N] emission table
    (tcap-major, matching _emission_keys)."""
    n = col.shape[0]
    return jnp.broadcast_to(col[None, :], (tcap, n)).reshape(-1)


def emission_reduce(col_p, n, tcap):
    """Fold a [tcap*N] emission-order column back per gaussian (transpose of
    emission_broadcast)."""
    return col_p.reshape(tcap, n).sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sorted_dense(pay, tile_tab, depth_tab, shape_info, tcap):
    out, _ = _fwd_impl(pay, tile_tab, depth_tab, shape_info, tcap)
    return out


def _fwd_impl(pay, tile_tab, depth_tab, shape_info, tcap):
    n_tiles, k_cap = shape_info
    p = tile_tab.shape[0]
    n, f = pay.shape
    iota = jnp.arange(p, dtype=jnp.int32)
    ops = (tile_tab, depth_tab, iota) + tuple(
        emission_broadcast(pay[:, j], tcap) for j in range(f)
    )
    sorted_ops = jax.lax.sort(ops, num_keys=2)
    sort_tile = sorted_ops[0]
    src_idx = sorted_ops[2]
    pay_sorted = jnp.stack(sorted_ops[3:], axis=-1)  # [P, F]

    tids = jnp.arange(n_tiles, dtype=jnp.float32)
    tstart = jnp.searchsorted(sort_tile, tids).astype(jnp.int32)
    tend = jnp.searchsorted(sort_tile, tids + 1.0).astype(jnp.int32)
    count = tend - tstart
    k = jnp.arange(k_cap, dtype=jnp.int32)
    pidx = tstart[:, None] + k[None, :]
    mask = k[None, :] < jnp.minimum(count, k_cap)[:, None]
    pidx_c = jnp.where(mask, pidx, p - 1)
    dense = pay_sorted[pidx_c] * mask[:, :, None]
    return (dense, mask, count), (src_idx, sort_tile, tstart, n)


def _fwd(pay, tile_tab, depth_tab, shape_info, tcap):
    out, res = _fwd_impl(pay, tile_tab, depth_tab, shape_info, tcap)
    return out, res


def _bwd_full(shape_info, tcap, res, cots):
    """Inverse of sort+densify with no scatter and no payload-carrying sort
    (both measured expensive on the target chip — DESIGN.md: scatter-set
    ~30 ms, an F-column payload sort ~15-25 ms at these sizes):
      1. integer-only: each *sorted* position p belongs to tile
         sort_tile[p] at slot k = p - tstart[tile] -> its dense-table row
         id, or -1 where the forward dropped the pair (beyond k_cap /
         invalid). Slots the dense view never read contribute nothing.
      2. invert the emission->sorted permutation with ONE 2-int-column sort
         (src_idx is a permutation of 0..P-1, so sorting (src_idx, iota)
         yields inv[e] = sorted position of emission e).
      3. compose the two index maps and do ONE row gather of the dense
         cotangents straight into emission (gaussian-major) order.
      4. reshape-sum folds the Tcap copies into per-Gaussian cotangents.
    """
    n_tiles, k_cap = shape_info
    src_idx, sort_tile, tstart, n = res
    g_dense, _, _ = cots
    f = g_dense.shape[-1]
    p = n * tcap
    pos = jnp.arange(p, dtype=jnp.int32)
    tile = sort_tile.astype(jnp.int32)  # exact: tile ids < 2^24
    in_range = tile < n_tiles
    tile_c = jnp.where(in_range, tile, 0)
    k = pos - jnp.take(tstart, tile_c)
    ok = in_range & (k < k_cap)
    flat_p = jnp.where(ok, tile_c * k_cap + jnp.clip(k, 0, k_cap - 1), -1)
    _, inv = jax.lax.sort((src_idx, pos), num_keys=1)
    flat_e = jnp.take(flat_p, inv)  # [P] dense row per emission, -1 dropped
    rows = g_dense.reshape(-1, f)
    g_emission = jnp.take(rows, jnp.maximum(flat_e, 0), axis=0)
    g_emission = g_emission * (flat_e >= 0)[:, None]
    g_pay = g_emission.reshape(tcap, n, f).sum(axis=0)
    zeros_keys = jnp.zeros((p,), jnp.float32)
    return (g_pay, zeros_keys, zeros_keys)


_sorted_dense.defvjp(_fwd, _bwd_full)


def densify_pairs(prep: Preprocessed, features, width: int, height: int,
                  tcap: int, tile_capacity: int) -> PairDense:
    """Differentiable dense [T,K,F] pair table via the sort-carried pipeline.

    F layout: mx, my, ca, cb, cc, opacity, feat[C].
    """
    tile_tab, depth_tab, n_tiles = _emission_keys(
        jax.tree.map(jax.lax.stop_gradient, prep), width, height, tcap
    )
    pay = jnp.concatenate(
        [prep.mean2d, prep.conic, prep.opacity[:, None], features], axis=-1
    )
    dense, mask, count = _sorted_dense(
        pay, tile_tab, depth_tab, (n_tiles, tile_capacity), tcap
    )
    return PairDense(
        data=dense,
        mask=mask,
        tile_count=count,
        num_pairs=jnp.sum(prep.tiles_touched),
        max_tile_count=jnp.max(count),
    )
