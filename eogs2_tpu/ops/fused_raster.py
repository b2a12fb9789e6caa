"""Fused ragged rasterization: sort-carried binning + Pallas blend with NO
dense [T, K, F] pair table.

The sort-carried pipeline (ops/pair_pipeline.py) materializes a dense
[tiles, K, F] view of the sorted pair table (a ~0.5M-row gather), packs it
[T, NF, K], and blends all K capacity slots of every tile. This module fuses
those steps: after the ONE payload-carrying sort, each tile's pairs are a
*contiguous* row range [tstart[t], tstart[t]+cnt[t]) of the sorted table, so
the blend kernel DMAs its rows directly from HBM at a scalar-prefetched
dynamic offset and composites only ceil(cnt/chunk) chunks (ragged loop)
instead of K/chunk. The backward kernel writes per-pair gradients straight
back to the sorted row positions (tile windows overlap only in their tails;
the TPU grid is sequential, so each later tile overwrites the stale tail of
the previous one, and rows no window owns are masked out by the emission
mapping). Gradients return to per-Gaussian (emission) order with the same
inverse-permutation trick as pair_pipeline._bwd_full: one 2-int-column sort
+ one row gather + reshape-sum — no scatter anywhere.

Reference parity: this is the TPU replacement for the whole CUDA
duplicate/sort/identifyTileRanges/renderCUDA chain (rasterizer_impl.cu:
286-338, forward.cu:288-411, backward.cu:457-643) with identical math
(ALPHA_MAX clamp without clamp-gradient, T_EPS early-out, background
composite via final_t).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eogs2_tpu.ops.binning import grid_dims
from eogs2_tpu.ops.blend import ALPHA_EPS, ALPHA_MAX, T_EPS
from eogs2_tpu.ops.pair_pipeline import _emission_keys
from eogs2_tpu.ops.projection import TILE, Preprocessed

P = TILE * TILE  # 256 pixels per tile
# Payload row width: mx,my,ca,cb,cc,op,f0..f4 (11) + pad to a full 128-lane
# tile. Mosaic requires HBM memref_slice shapes aligned to the (1,128)
# tiling, and XLA already pads the minor dim of a [rows,16] f32 array to 128
# lanes in HBM — so the full-tile row width costs no extra memory, only DMA
# bytes (and the hardware fetches whole tiles regardless).
NFF = 128
HI = jax.lax.Precision.HIGHEST


def _scan_incl_sub(x, interpret: bool):
    """Inclusive prefix sum along SUBLANES (axis 0) of a [Kc, P] block.

    Same log-depth roll+add strategy as blend_pallas._scan_incl (exact f32
    VPU adds, ~5x cheaper than the Precision.HIGHEST triangular matmul it
    replaced); interpret mode (CPU tests) uses jnp.cumsum."""
    if interpret:
        return jnp.cumsum(x, axis=0)
    kc = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < kc:
        shifted = pltpu.roll(x, s, 0)
        x = jnp.where(row >= s, x + shifted, x)
        s *= 2
    return x


def _chunk_fields(scratch, c, k_chunk, cnt, ox, oy):
    """Alpha and geometry for chunk c from the [K, NFF] scratch block.

    Returns [Kc, P]-shaped alpha/g/dx/dy/keep (K on sublanes, pixels on
    lanes) plus the raw field vectors."""
    sl = pl.ds(c * k_chunk, k_chunk)
    blk = scratch[sl, :]  # [Kc, NFF]
    mx, my = blk[:, 0], blk[:, 1]
    ca, cb, cc = blk[:, 2], blk[:, 3], blk[:, 4]
    op = blk[:, 5]
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pid % TILE).astype(jnp.float32) + ox
    py = (pid // TILE).astype(jnp.float32) + oy
    dx = mx[:, None] - px  # [Kc, P]
    dy = my[:, None] - py
    power = (
        -0.5 * (ca[:, None] * dx * dx + cc[:, None] * dy * dy)
        - cb[:, None] * dx * dy
    )
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_MAX, op[:, None] * g)
    kidx = c * k_chunk + jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
    keep = (kidx < cnt) & (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    feat = blk[:, 6:11]  # [Kc, 5]
    return alpha, g, dx, dy, keep, (ca, cb, cc, op), feat


def _origin(grid_x):
    i = pl.program_id(0)
    ox = ((i % grid_x) * TILE).astype(jnp.float32)
    oy = ((i // grid_x) * TILE).astype(jnp.float32)
    return ox, oy


def _fwd_kernel(tstart_ref, cnt_ref, pay_hbm, out_ref, scratch, sem,
                *, k_cap, k_chunk, grid_x, interpret):
    t = pl.program_id(0)
    start = tstart_ref[t]
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    dma = pltpu.make_async_copy(
        pay_hbm.at[pl.ds(start, k_cap), :], scratch, sem
    )
    dma.start()
    dma.wait()
    # zero the window tail: rows beyond cnt hold neighboring tiles' (or
    # uninitialized) payload whose NaN/Inf would leak through masked math
    rowid = jax.lax.broadcasted_iota(jnp.int32, (k_cap, 1), 0)
    scratch[:, :] = jnp.where(rowid < cnt, scratch[:, :], 0.0)
    ox, oy = _origin(grid_x)
    n_chunks = jax.lax.div(cnt + (k_chunk - 1), k_chunk)

    def body(c, carry):
        acc, carry_raw, carry_live = carry
        alpha, _, _, _, _, _, feat = _chunk_fields(
            scratch, c, k_chunk, cnt, ox, oy
        )
        logs = jnp.log1p(-alpha)  # [Kc, P]
        s_incl = carry_raw + _scan_incl_sub(logs, interpret)
        cp = jnp.exp(s_incl)
        live = cp >= T_EPS
        t_before = cp / (1.0 - alpha)
        w = jnp.where(live, alpha * t_before, 0.0)  # [Kc, P]
        acc = acc + jax.lax.dot_general(
            w, feat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [P, 5]
        carry_live = carry_live + jnp.sum(
            jnp.where(live, logs, 0.0), axis=0, keepdims=True
        )
        return acc, s_incl[-1:, :], carry_live

    acc, _, carry_live = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((P, 5), jnp.float32), jnp.zeros((1, P), jnp.float32),
         jnp.zeros((1, P), jnp.float32)),
    )
    out_ref[0] = jnp.concatenate(
        [acc, jnp.exp(carry_live).T, jnp.zeros((P, 2), jnp.float32)], axis=1
    )


def _bwd_kernel(tstart_ref, cnt_ref, pay_hbm, gout_ref, gpay_hbm,
                scratch, gscratch, sem, gsem, *, k_cap, k_chunk, grid_x,
                interpret):
    t = pl.program_id(0)
    start = tstart_ref[t]
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    dma = pltpu.make_async_copy(
        pay_hbm.at[pl.ds(start, k_cap), :], scratch, sem
    )
    dma.start()
    dma.wait()
    rowid = jax.lax.broadcasted_iota(jnp.int32, (k_cap, 1), 0)
    scratch[:, :] = jnp.where(rowid < cnt, scratch[:, :], 0.0)
    ox, oy = _origin(grid_x)
    n_chunks = jax.lax.div(cnt + (k_chunk - 1), k_chunk)
    g_pix = gout_ref[0, :, :5]  # [P, 5]
    g_ft = gout_ref[0, :, 5:6].T  # [1, P]

    # pass 1: total foreground contribution + final_t
    def body1(c, carry):
        carry_raw, carry_live, total = carry
        alpha, _, _, _, _, _, feat = _chunk_fields(
            scratch, c, k_chunk, cnt, ox, oy
        )
        logs = jnp.log1p(-alpha)
        s_incl = carry_raw + _scan_incl_sub(logs, interpret)
        cp = jnp.exp(s_incl)
        live = cp >= T_EPS
        w = jnp.where(live, alpha * cp / (1.0 - alpha), 0.0)
        fdot = jax.lax.dot_general(
            feat, g_pix, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [Kc, P]
        total = total + jnp.sum(w * fdot, axis=0, keepdims=True)
        carry_live = carry_live + jnp.sum(
            jnp.where(live, logs, 0.0), axis=0, keepdims=True
        )
        return s_incl[-1:, :], carry_live, total

    _, carry_live, total = jax.lax.fori_loop(
        0, n_chunks, body1,
        (jnp.zeros((1, P), jnp.float32), jnp.zeros((1, P), jnp.float32),
         jnp.zeros((1, P), jnp.float32)),
    )
    final_t = jnp.exp(carry_live)  # [1, P]

    gscratch[:, :] = jnp.zeros((k_cap, NFF), jnp.float32)

    # pass 2: per-pair gradients, written back at the chunk's rows
    def body2(c, carry):
        carry_raw, prefix = carry
        alpha, g, dx, dy, keep, (ca, cb, cc, op), feat = _chunk_fields(
            scratch, c, k_chunk, cnt, ox, oy
        )
        one_minus = 1.0 - alpha
        logs = jnp.log1p(-alpha)
        s_incl = carry_raw + _scan_incl_sub(logs, interpret)
        cp = jnp.exp(s_incl)
        live = cp >= T_EPS
        t_before = cp / one_minus
        w = jnp.where(live, alpha * t_before, 0.0)
        fdot = jax.lax.dot_general(
            feat, g_pix, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [Kc, P]
        contrib = w * fdot
        prefix_inc = prefix + _scan_incl_sub(contrib, interpret)
        suffix = total - prefix_inc
        g_alpha = fdot * t_before - (suffix + final_t * g_ft) / one_minus
        g_alpha = jnp.where(live & keep, g_alpha, 0.0)  # [Kc, P]

        g_opac = jnp.sum(g_alpha * g, axis=1)  # [Kc]
        gG = g_alpha * op[:, None] * g
        g_mx = jnp.sum(gG * (-(ca[:, None] * dx) - cb[:, None] * dy), axis=1)
        g_my = jnp.sum(gG * (-(cc[:, None] * dy) - cb[:, None] * dx), axis=1)
        g_ca = jnp.sum(gG * (-0.5 * dx * dx), axis=1)
        g_cb = jnp.sum(gG * (-dx * dy), axis=1)
        g_cc = jnp.sum(gG * (-0.5 * dy * dy), axis=1)
        g_feat = jnp.dot(
            w, g_pix, preferred_element_type=jnp.float32, precision=HI
        )  # [Kc, 5]
        gchunk = jnp.concatenate(
            [
                jnp.stack([g_mx, g_my, g_ca, g_cb, g_cc, g_opac], axis=1),
                g_feat,
                jnp.zeros((k_chunk, NFF - 11), jnp.float32),
            ],
            axis=1,
        )  # [Kc, NFF]
        gscratch[pl.ds(c * k_chunk, k_chunk), :] = gchunk
        return s_incl[-1:, :], prefix_inc[-1:, :]

    jax.lax.fori_loop(
        0, n_chunks, body2,
        (jnp.zeros((1, P), jnp.float32), jnp.zeros((1, P), jnp.float32)),
    )
    gdma = pltpu.make_async_copy(
        gscratch, gpay_hbm.at[pl.ds(start, k_cap), :], gsem
    )
    gdma.start()
    gdma.wait()


def _fused_fwd_call(pay_pad, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x,
                    interpret):
    kernel = functools.partial(
        _fwd_kernel, k_cap=k_cap, k_chunk=k_chunk, grid_x=grid_x,
        interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, P, 8), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((k_cap, NFF), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), jnp.float32),
        interpret=interpret,
    )(tstart, cnt, pay_pad)


def _fused_bwd_call(pay_pad, gout, tstart, cnt, n_tiles, k_cap, k_chunk,
                    grid_x, interpret):
    kernel = functools.partial(
        _bwd_kernel, k_cap=k_cap, k_chunk=k_chunk, grid_x=grid_x,
        interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, P, 8), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((k_cap, NFF), jnp.float32),
            pltpu.VMEM((k_cap, NFF), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pay_pad.shape, jnp.float32),
        interpret=interpret,
    )(tstart, cnt, pay_pad, gout)


class FusedOut(NamedTuple):
    out8: jnp.ndarray  # [T, P, 8]: 5 channels, final_t at 5, padding
    tile_count: jnp.ndarray  # [T]
    num_pairs: jnp.ndarray  # []
    max_tile_count: jnp.ndarray  # []


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _fused_sorted_blend(pay, tile_tab, depth_tab, shape_info, tcap, k_chunk,
                        interpret):
    out, _ = _fused_fwd(pay, tile_tab, depth_tab, shape_info, tcap, k_chunk,
                        interpret)
    return out


def _sort_and_range(pay, tile_tab, depth_tab, n_tiles, tcap):
    p = tile_tab.shape[0]
    n, f = pay.shape
    pay_tab = jnp.broadcast_to(pay[:, None, :], (n, tcap, f)).reshape(p, f)
    iota = jnp.arange(p, dtype=jnp.int32)
    ops = (tile_tab, depth_tab, iota) + tuple(pay_tab[:, j] for j in range(f))
    sorted_ops = jax.lax.sort(ops, num_keys=2)
    sort_tile = sorted_ops[0]
    src_idx = sorted_ops[2]
    pay_sorted = jnp.stack(sorted_ops[3:], axis=-1)  # [P, F]
    tids = jnp.arange(n_tiles, dtype=jnp.float32)
    tstart = jnp.searchsorted(sort_tile, tids).astype(jnp.int32)
    tend = jnp.searchsorted(sort_tile, tids + 1.0).astype(jnp.int32)
    return pay_sorted, sort_tile, src_idx, tstart, tend - tstart


def _fused_fwd(pay, tile_tab, depth_tab, shape_info, tcap, k_chunk,
               interpret):
    n_tiles, k_cap, grid_x = shape_info
    n, f = pay.shape
    pay_sorted, sort_tile, src_idx, tstart, cnt = _sort_and_range(
        pay, tile_tab, depth_tab, n_tiles, tcap
    )
    # pad rows so every [start, start+k_cap) window is in bounds, and pad
    # the 11 payload columns to the NFF row width
    pay_pad = jnp.pad(pay_sorted, ((0, k_cap), (0, NFF - f)))
    out8 = _fused_fwd_call(
        pay_pad, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x, interpret
    )
    out = FusedOut(
        out8=out8,
        tile_count=cnt,
        num_pairs=jnp.sum(jnp.where(tile_tab < n_tiles, 1, 0)),
        max_tile_count=jnp.max(cnt),
    )
    res = (pay_pad, sort_tile, src_idx, tstart, cnt, n)
    return out, res


def _fused_bwd(shape_info, tcap, k_chunk, interpret, res, cots):
    n_tiles, k_cap, grid_x = shape_info
    pay_pad, sort_tile, src_idx, tstart, cnt, n = res
    g_out8 = cots.out8
    gpay_pad = _fused_bwd_call(
        pay_pad, g_out8, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x,
        interpret,
    )
    # back to emission order: the kernel wrote gradient rows at SORTED
    # positions, and src_idx is the emission index of each sorted row, so
    # ONE payload-carrying sort keyed by src_idx returns every row to its
    # emission position (measured 3.9 ms vs 5.3 ms for the inverse-
    # permutation 2-int-col sort + row gather it replaces, 400k rows).
    p = n * tcap
    pos = jnp.arange(p, dtype=jnp.int32)
    tile = sort_tile.astype(jnp.int32)
    in_range = tile < n_tiles
    tile_c = jnp.where(in_range, tile, 0)
    k = pos - jnp.take(tstart, tile_c)
    ok = in_range & (k < k_cap)
    # compact to the 16 used columns BEFORE the sort — moving the full
    # 128-lane padded rows costs 8x the bytes; where(), not multiply: rows
    # no tile window wrote are uninitialized and may hold NaN, which a
    # 0-multiply would propagate
    rows = jnp.where(ok[:, None], gpay_pad[:p, :16], 0.0)
    sorted_out = jax.lax.sort(
        (src_idx,) + tuple(rows[:, j] for j in range(16)), num_keys=1
    )
    g_emission = jnp.stack(sorted_out[1:], axis=-1)
    g_pay = g_emission.reshape(n, tcap, 16).sum(axis=1)
    zeros_keys = jnp.zeros((p,), jnp.float32)
    return (g_pay[:, :11], zeros_keys, zeros_keys)


_fused_sorted_blend.defvjp(
    lambda *a: _fused_fwd(*a), _fused_bwd
)


def rasterize_fused(
    prep: Preprocessed,
    features,
    width: int,
    height: int,
    tcap: int,
    tile_capacity: int,
    k_chunk: int,
    interpret: bool = False,
):
    """Differentiable fused path. Returns FusedOut (out8 pre-background)."""
    grid_x, grid_y = grid_dims(width, height)
    tile_tab, depth_tab, n_tiles = _emission_keys(
        jax.tree.map(jax.lax.stop_gradient, prep), width, height, tcap
    )
    pay = jnp.concatenate(
        [prep.mean2d, prep.conic, prep.opacity[:, None], features], axis=-1
    )
    shape_info = (n_tiles, tile_capacity, grid_x)
    out = _fused_sorted_blend(
        pay, tile_tab, depth_tab, shape_info, tcap, k_chunk, interpret
    )
    num_pairs = jnp.sum(prep.tiles_touched)
    return out._replace(num_pairs=num_pairs)
