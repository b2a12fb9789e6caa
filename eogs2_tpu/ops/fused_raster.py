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


def _bwd_kernel(tstart_ref, cnt_ref, pay_hbm, gout_ref, fwd_ref, gpay_hbm,
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

    # The old pass 1 recomputed total = sum_i w_i * (feat_i . g_pix) and
    # final_t with a full extra walk over the pairs. Both come for free from
    # the SAVED forward output: by linearity total = acc . g_pix (acc is the
    # forward's pre-background 5-channel accumulation, fwd_ref[..., :5]),
    # and final_t was stored at channel 5.
    final_t = fwd_ref[0, :, 5:6].T  # [1, P]
    total = jnp.sum(
        fwd_ref[0, :, :5] * g_pix, axis=1, keepdims=True
    ).T  # [1, P]

    gscratch[:, :] = jnp.zeros((k_cap, NFF), jnp.float32)

    # single pass: per-pair gradients, written back at the chunk's rows
    # (suffix sums via total - inclusive prefix; liveness recomputed from
    # the front-to-back transmittance scan this pass already performs)
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
        # `total` was reduced in the forward with a different order
        # (dot_general(w, feat) then dot with g_pix), so the last live
        # pair's suffix cancels only to within fp rounding: g_alpha picks up
        # O(eps * total) noise. Within gradient-parity tolerance in f32; if
        # the feature dots ever move to bf16, re-evaluate this cancellation.
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


def _fused_bwd_call(pay_pad, gout, out8, tstart, cnt, n_tiles, k_cap,
                    k_chunk, grid_x, interpret):
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
    )(tstart, cnt, pay_pad, gout, out8)


class FusedOut(NamedTuple):
    out8: jnp.ndarray  # [T, P, 8]: 5 channels, final_t at 5, padding
    tile_count: jnp.ndarray  # [T]
    num_pairs: jnp.ndarray  # []
    max_tile_count: jnp.ndarray  # []


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _fused_sorted_blend(pay_cols, tile_tab, depth_tab, shape_info, tcap,
                        k_chunk, interpret):
    out, _ = _fused_fwd(pay_cols, tile_tab, depth_tab, shape_info, tcap,
                        k_chunk, interpret)
    return out


def _sort_and_range(pay_cols, tile_tab, depth_tab, n_tiles, tcap):
    """Column-oriented emission sort.

    pay_cols is a tuple of [N] 1-D payload columns. Everything stays 1-D
    through the sort: [N,k] (k<128) arrays on TPU pad their minor dim to the
    128-lane tile in HBM, so the old row-form pipeline (concat [N,11] ->
    broadcast [P,11] -> sort -> stack [P,11]) moved ~8x the bytes of the
    payload it carried. Only the kernel's [rows, NFF] DMA source is ever
    materialized in padded form, once, in _fused_fwd."""
    p = tile_tab.shape[0]
    n = pay_cols[0].shape[0]
    assert p == n * tcap, (p, n, tcap)  # dense [N, tcap] emission layout
    tcap_b = p // n
    em_cols = tuple(
        jnp.broadcast_to(c[:, None], (n, tcap_b)).reshape(-1)
        for c in pay_cols
    )
    iota = jnp.arange(p, dtype=jnp.int32)
    ops = (tile_tab, depth_tab, iota) + em_cols
    sorted_ops = jax.lax.sort(ops, num_keys=2)
    sort_tile = sorted_ops[0]
    src_idx = sorted_ops[2]
    sorted_cols = sorted_ops[3:]
    tids = jnp.arange(n_tiles, dtype=jnp.float32)
    tstart = jnp.searchsorted(sort_tile, tids).astype(jnp.int32)
    tend = jnp.searchsorted(sort_tile, tids + 1.0).astype(jnp.int32)
    return sorted_cols, sort_tile, src_idx, tstart, tend - tstart


def _fused_fwd(pay_cols, tile_tab, depth_tab, shape_info, tcap, k_chunk,
               interpret):
    n_tiles, k_cap, grid_x = shape_info
    n = pay_cols[0].shape[0]
    f = len(pay_cols)
    sorted_cols, sort_tile, src_idx, tstart, cnt = _sort_and_range(
        pay_cols, tile_tab, depth_tab, n_tiles, tcap
    )
    p = tile_tab.shape[0]
    # the ONE padded materialization: [rows, NFF] DMA source for the kernel
    # (rows padded so every [start, start+k_cap) window is in bounds)
    pay_pad = jnp.zeros((p + k_cap, NFF), jnp.float32)
    pay_pad = pay_pad.at[:p, :f].set(jnp.stack(sorted_cols, axis=-1))
    out8 = _fused_fwd_call(
        pay_pad, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x, interpret
    )
    out = FusedOut(
        out8=out8,
        tile_count=cnt,
        num_pairs=jnp.sum(jnp.where(tile_tab < n_tiles, 1, 0)),
        max_tile_count=jnp.max(cnt),
    )
    res = (pay_pad, out8, sort_tile, src_idx, tstart, cnt, n, f)
    return out, res


def _fused_bwd(shape_info, tcap, k_chunk, interpret, res, cots):
    n_tiles, k_cap, grid_x = shape_info
    pay_pad, out8, sort_tile, src_idx, tstart, cnt, n, f = res
    g_out8 = cots.out8
    gpay_pad = _fused_bwd_call(
        pay_pad, g_out8, out8, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x,
        interpret,
    )
    # back to emission order: the kernel wrote gradient rows at SORTED
    # positions, and src_idx is the emission index of each sorted row, so
    # ONE payload-carrying sort keyed by src_idx returns every row to its
    # emission position (measured 3.9 ms vs 5.3 ms for the inverse-
    # permutation 2-int-col sort + row gather it replaces, 400k rows).
    p = sort_tile.shape[0]
    tcap_b = p // n
    pos = jnp.arange(p, dtype=jnp.int32)
    tile = sort_tile.astype(jnp.int32)
    in_range = tile < n_tiles
    tile_c = jnp.where(in_range, tile, 0)
    k = pos - jnp.take(tstart, tile_c)
    ok = in_range & (k < k_cap)
    # per-column 1-D extraction BEFORE the sort (column form: the padded
    # [rows, NFF] gradient array is read once, fused with the where; each
    # sort operand is an unpadded [p] array); where(), not multiply: rows
    # no tile window wrote are uninitialized and may hold NaN, which a
    # 0-multiply would propagate
    gcols = tuple(
        jnp.where(ok, gpay_pad[:p, j], 0.0) for j in range(f)
    )
    sorted_out = jax.lax.sort((src_idx,) + gcols, num_keys=1)
    g_cols = tuple(
        c.reshape(n, tcap_b).sum(axis=1) for c in sorted_out[1:]
    )
    zeros_keys = jnp.zeros((p,), jnp.float32)
    return (g_cols, zeros_keys, zeros_keys)


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
    pay_cols = (
        prep.mean2d[:, 0], prep.mean2d[:, 1],
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.opacity,
    ) + tuple(features[:, j] for j in range(features.shape[1]))
    shape_info = (n_tiles, tile_capacity, grid_x)
    out = _fused_sorted_blend(
        pay_cols, tile_tab, depth_tab, shape_info, tcap, k_chunk, interpret
    )
    num_pairs = jnp.sum(prep.tiles_touched)
    return out._replace(num_pairs=num_pairs)
