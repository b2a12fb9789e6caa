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
back to the sorted positions (tile windows overlap only in their tails;
the TPU grid is sequential, so each later tile overwrites the stale tail of
the previous one, and rows no window owns are masked out by the emission
mapping). Gradients return to per-Gaussian (emission) order with ONE
payload-carrying sort keyed by the saved emission index + a reshape-sum —
no scatter anywhere.

Two payload layouts (RasterizeConfig.payload_col):

  * col (default, round 3): the sorted payload lives as a [NF=16, L]
    column-major array — 64 B/pair in HBM instead of the wide layout's
    512 B/pair (narrow [rows, k<128] f32 arrays lane-pad to 128). The
    kernels run in pairs-on-LANES orientation ([P, Kc] blocks, scans along
    lanes, per-pair fields as [1, Kc] rows) so no transpose or relayout
    appears anywhere; windows DMA at 128-aligned lane offsets and the
    leading start%128 pairs are masked exactly like tail garbage. The
    backward's ordered tail-overwrite gains one new piece: consecutive
    tiles can share a boundary 128-lane block, so each grid step merges the
    previous tile's boundary-pair gradients (still live in the other
    double-buffer slot of the sequential grid) into its first block before
    the ordered write-back.
  * wide: one pair per 128-lane row ([rows, NFF=128]), pairs on SUBLANES
    ([Kc, P] blocks). Kept as a fallback and for A/B measurement.

Reference parity: this is the TPU replacement for the whole CUDA
duplicate/sort/identifyTileRanges/renderCUDA chain (rasterizer_impl.cu:
286-338, forward.cu:288-411, backward.cu:457-643) with identical math
(ALPHA_MAX clamp without clamp-gradient, T_EPS early-out, background
composite via final_t).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eogs2_tpu.ops.binning import grid_dims
from eogs2_tpu.ops.blend import ALPHA_EPS, ALPHA_MAX, T_EPS
from eogs2_tpu.ops.pair_pipeline import (
    _emission_keys,
    _tier_keys,
    _tier_keys_compact,
    cull_tau,
    emission_broadcast,
    emission_reduce,
)
from eogs2_tpu.ops.projection import TILE, Preprocessed

P = TILE * TILE  # 256 pixels per tile
# wide payload row width: mx,my,ca,cb,cc,op,f0..f4 (11) + pad to a full
# 128-lane tile (the hardware lane-pads narrow f32 rows to 128 anyway)
NFF = 128
# col layout: NF=16 payload fields (11 real + 5 pad) on sublanes, pairs on
# lanes — 64 B/pair of real HBM traffic
NF = 16
LANE = 128  # lane-block granularity of col windows
HI = jax.lax.Precision.HIGHEST
# emission-sort strategy (see _sort_and_range): the 14-operand payload-
# carrying sort is the default; EOGS2_SORT_GATHER=1 opts into the 4-operand
# sort + payload gathers (chip A/B recorded in ROUND4 notes).
_SORT_GATHER = os.environ.get("EOGS2_SORT_GATHER", "0") != "0"


def _scan_incl(x, interpret: bool, axis: int):
    """Inclusive prefix sum along `axis` (log-depth roll+add — exact f32
    VPU adds, ~5x cheaper than the Precision.HIGHEST triangular matmul it
    replaced); interpret mode (CPU tests) uses jnp.cumsum."""
    if interpret:
        return jnp.cumsum(x, axis=axis)
    kc = x.shape[axis]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < kc:
        shifted = pltpu.roll(x, s, axis)
        x = jnp.where(row >= s, x + shifted, x)
        s *= 2
    return x


def _scan_prod(x, interpret: bool, axis: int):
    """Inclusive prefix PRODUCT along `axis`.

    Direct multiplicative Hillis-Steele rolls. Replaces the round-1
    log1p -> cumsum -> exp pipeline: the transmittance T is a running
    product in the CUDA reference (forward.cu:371), and computing it as a
    product skips TWO transcendentals per pair-pixel (measured: the blend
    kernels are VPU-bound). Underflow to 0 below ~1e-38 is harmless: the
    live threshold is T_EPS=1e-4."""
    if interpret:
        return jnp.cumprod(x, axis=axis)
    kc = x.shape[axis]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < kc:
        shifted = pltpu.roll(x, s, axis)
        x = jnp.where(row >= s, x * shifted, x)
        s *= 2
    return x


def _shift_one(p_incl, interpret: bool, axis: int):
    """Exclusive product from an inclusive one: shift by 1 along `axis`,
    shifting 1.0 into position 0 (T *before* each pair = the exclusive
    prefix; one roll+select instead of a divide by one_minus)."""
    if interpret:
        pad = [(0, 0)] * p_incl.ndim
        pad[axis] = (1, 0)
        sl = [slice(None)] * p_incl.ndim
        sl[axis] = slice(0, -1)
        return jnp.pad(p_incl[tuple(sl)], pad, constant_values=1.0)
    row = jax.lax.broadcasted_iota(jnp.int32, p_incl.shape, axis)
    return jnp.where(row == 0, 1.0, pltpu.roll(p_incl, 1, axis))


def _pixel_basis(transposed: bool = False):
    """TILE-LOCAL pixel-polynomial basis [6, P] (or [P, 6]):
    rows = (1, px, py, px^2, py^2, px*py) with px,py in [0, TILE). The
    per-pair quadratic power(px,py) then becomes ONE MXU matmul per chunk
    instead of ~10 [Kc,P]-wide VPU ops (the kernels are VPU-bound). LOCAL
    coordinates are load-bearing: with global pixel coords the expansion's
    mx^2-scale coefficients (up to canvas^2) cancel against the pixel terms
    down to the O(1..100) true power, losing ~eps*canvas^2 absolute —
    catastrophic at 2048px. Locally both the means (shifted by the tile
    origin) and the pixels are O(TILE+radius), and dx = mx - px is
    shift-invariant, so the math is unchanged."""
    if transposed:
        pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = (pid % TILE).astype(jnp.float32)  # [P, 1]
        py = (pid // TILE).astype(jnp.float32)
        one = jnp.ones((P, 1), jnp.float32)
        return jnp.concatenate([one, px, py, px * px, py * py, px * py], 1)
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pid % TILE).astype(jnp.float32)  # [1, P]
    py = (pid // TILE).astype(jnp.float32)
    one = jnp.ones((1, P), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py], axis=0)


def _origin(grid_x, tile0):
    """Pixel origin of this grid step's tile. `tile0` (scalar-prefetched)
    offsets local tile indices to GLOBAL tile ids — 0 on a single chip; the
    band's first tile id under the sharded row-band rasterizer."""
    i = pl.program_id(0) + tile0
    ox = ((i % grid_x) * TILE).astype(jnp.float32)
    oy = ((i // grid_x) * TILE).astype(jnp.float32)
    return ox, oy


# --------------------------------------------------------------------------
# WIDE layout kernels: pairs on sublanes, [Kc, P] compute blocks
# --------------------------------------------------------------------------


def _chunk_fields(blk, c, k_chunk, lo, hi, basis, ox, oy):
    """Alpha for chunk c from its [Kc, F] block (pairs on sublanes).

    Returns [Kc, P]-shaped alpha/g/keep plus the raw field vectors. Rows
    outside [lo, hi) belong to neighboring tiles' windows (or are
    uninitialized DMA garbage, possibly NaN/Inf): every extracted field is
    sanitized with a [Kc,1]-cheap select here, so no full-window zero-fill
    is needed and no NaN can propagate through 0*NaN downstream.

    power = -0.5*ca*dx^2 - 0.5*cc*dy^2 - cb*dx*dy with dx = mx - px is
    expanded in the pixel-polynomial basis: coefficients are per-PAIR [Kc]
    expressions (cheap), the [Kc,P] evaluation is one MXU matmul."""
    kidx = c * k_chunk + jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
    rowok = (kidx >= lo) & (kidx < hi)  # [Kc, 1]
    rv = rowok[:, 0]

    def col(j):
        return jnp.where(rv, blk[:, j], 0.0)

    # tile-local means (see _pixel_basis: local coords keep the basis
    # expansion well-conditioned; dx = mx - px is shift-invariant)
    mx, my = col(0) - ox, col(1) - oy
    ca, cb, cc = col(2), col(3), col(4)
    op = col(5)
    coef = jnp.stack(
        [
            -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my,  # 1
            ca * mx + cb * my,  # px
            cc * my + cb * mx,  # py
            -0.5 * ca,  # px^2
            -0.5 * cc,  # py^2
            -cb,  # px*py
        ],
        axis=1,
    )  # [Kc, 6]
    power = jax.lax.dot_general(
        coef, basis, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )  # [Kc, P]
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_MAX, op[:, None] * g)
    # power is mathematically <= 0 for any PSD conic; the reference's
    # power>0 skip (forward.cu:358) only rejects degenerate conics. The
    # basis-matmul evaluates power by cancellation of O(100)-sized terms,
    # so splat-center pixels (true power ~ 0) land at +-2e-5 — a strict
    # <=0 test would drop the FRONTMOST contribution of nearly every splat
    # at its center pixel. The small positive tolerance keeps them (g is
    # clamped to exp(0)=1, matching the reference's exp(-~0)), while
    # degenerate conics still produce power >> tolerance and are skipped.
    keep = rowok & (power <= 1e-4) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    feat = jnp.where(rowok, blk[:, 6:11], 0.0)  # [Kc, 5]
    return alpha, g, keep, (mx, my, ca, cb, cc, op), feat


def _window_dma(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap):
    """Descriptor for tile t's payload window into double-buffer `slot`.
    Rebuilt identically at start() and wait() sites (the Pallas cross-grid-
    step manual-pipelining pattern)."""
    return pltpu.make_async_copy(
        pay_hbm.at[pl.ds(tstart_ref[t], k_cap), :],
        scratch.at[slot], sem.at[slot],
    )


def _fwd_kernel(meta_ref, tstart_ref, cnt_ref, pay_hbm, out_ref, scratch, sem,
                *, k_cap, k_chunk, grid_x, n_tiles, early_exit, interpret):
    t = pl.program_id(0)
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    slot = jax.lax.rem(t, 2)

    # double-buffered prefetch: tile t's window was started at step t-1
    # (tile 0's at step 0); start tile t+1's now so the next grid step's
    # compute overlaps this DMA instead of stalling on it
    @pl.when(t == 0)
    def _():
        _window_dma(pay_hbm, tstart_ref, scratch, sem, 0, t, k_cap).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        _window_dma(
            pay_hbm, tstart_ref, scratch, sem, 1 - slot, t + 1, k_cap
        ).start()

    _window_dma(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap).wait()
    # tail rows (>= cnt) hold garbage from neighboring windows; every field
    # read is sanitized inside _chunk_fields (no full-window zero-fill)
    ox, oy = _origin(grid_x, meta_ref[0])
    basis = _pixel_basis()
    n_chunks = jax.lax.div(cnt + (k_chunk - 1), k_chunk)

    def body(carry):
        c, acc, carry_t, t_live, nlive = carry
        blk = scratch[slot, pl.ds(c * k_chunk, k_chunk), :]
        alpha, _, _, _, feat = _chunk_fields(blk, c, k_chunk, 0, cnt,
                                             basis, ox, oy)
        one_minus = 1.0 - alpha  # [Kc, P]
        p_incl = _scan_prod(one_minus, interpret, 0)
        t_before = carry_t * _shift_one(p_incl, interpret, 0)
        cp = carry_t * p_incl  # T inclusive of this pair
        live = cp >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)  # [Kc, P]
        acc = acc + jax.lax.dot_general(
            w, feat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [P, 5]
        # final_t advances only while live — the CUDA per-pixel `done`
        # freeze (forward.cu:371-377). cp decreases monotonically and live
        # is a prefix property, so the frozen T (product of one_minus over
        # live pairs) is exactly the running MIN of live-masked cp — a
        # reduce_min, which Mosaic lowers (reduce_prod does not).
        t_live = jnp.minimum(
            t_live, jnp.min(jnp.where(live, cp, 1.0), axis=0, keepdims=True)
        )
        # n_contrib chunks for the backward walk bound (see col kernel)
        dead = jnp.max(cp[-1:, :]) < T_EPS
        nlive = jnp.minimum(
            nlive, jnp.where(dead, (c + 1).astype(jnp.float32), nlive)
        )
        return c + 1, acc, cp[-1:, :], t_live, nlive

    init = (jnp.int32(0), jnp.zeros((P, 5), jnp.float32),
            jnp.ones((1, P), jnp.float32), jnp.ones((1, P), jnp.float32),
            jnp.float32(1e9))
    if early_exit:
        # chunk-granular early out, exact: once every pixel's T is already
        # below T_EPS, live==False for every remaining pair. Costs one
        # vector->scalar sync per chunk (the while cond), so it is a static
        # toggle: ON for saturating scenes (opaque ground coverage), OFF
        # when tiles rarely die before their count runs out.
        def cond(carry):
            c, _, carry_t, _, _ = carry
            return (c < n_chunks) & (jnp.max(carry_t) >= T_EPS)

        _, acc, _, t_live, nlive = jax.lax.while_loop(cond, body, init)
    else:
        _, acc, _, t_live, nlive = jax.lax.fori_loop(
            0, n_chunks, lambda i, carry: body(carry), init
        )
    nlive = jnp.minimum(nlive, n_chunks.astype(jnp.float32))
    out_ref[0] = jnp.concatenate(
        [acc, t_live.T, jnp.full((P, 1), 1.0, jnp.float32) * nlive,
         jnp.zeros((P, 1), jnp.float32)], axis=1
    )


def _bwd_kernel(meta_ref, tstart_ref, cnt_ref, pay_hbm, gout_ref, fwd_ref,
                gpay_hbm, scratch, gscratch, sem, gsem, *, k_cap, k_chunk,
                grid_x, n_tiles, early_exit, interpret):
    t = pl.program_id(0)
    start = tstart_ref[t]
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    slot = jax.lax.rem(t, 2)

    # double-buffered payload prefetch (same schedule as _fwd_kernel)
    @pl.when(t == 0)
    def _():
        _window_dma(pay_hbm, tstart_ref, scratch, sem, 0, t, k_cap).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        _window_dma(
            pay_hbm, tstart_ref, scratch, sem, 1 - slot, t + 1, k_cap
        ).start()

    _window_dma(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap).wait()
    gbuf = gscratch.at[slot]
    ox, oy = _origin(grid_x, meta_ref[0])
    basis = _pixel_basis()
    n_chunks = jax.lax.div(cnt + (k_chunk - 1), k_chunk)
    # forward-recorded n_contrib chunk bound (see col kernel)
    nlive = fwd_ref[0, 0, 6].astype(jnp.int32)
    n_chunks = jnp.minimum(n_chunks, nlive)
    g_pix = gout_ref[0, :, :5]  # [P, 5]
    g_ft = gout_ref[0, :, 5:6].T  # [1, P]

    # By linearity total = acc . g_pix (acc is the forward's pre-background
    # 5-channel accumulation, fwd_ref[..., :5]) and final_t was stored at
    # channel 5 — no extra forward walk needed.
    final_t = fwd_ref[0, :, 5:6].T  # [1, P]
    total = jnp.sum(
        fwd_ref[0, :, :5] * g_pix, axis=1, keepdims=True
    ).T  # [1, P]

    # single pass: per-pair gradients, written back at the chunk's rows
    # (suffix sums via total - inclusive prefix; liveness recomputed from
    # the front-to-back transmittance scan this pass already performs)
    def body2(carry):
        c, carry_t, prefix = carry
        blk = scratch[slot, pl.ds(c * k_chunk, k_chunk), :]
        alpha, g, keep, (mx, my, ca, cb, cc, op), feat = _chunk_fields(
            blk, c, k_chunk, 0, cnt, basis, ox, oy
        )
        one_minus = 1.0 - alpha
        p_incl = _scan_prod(one_minus, interpret, 0)
        t_before = carry_t * _shift_one(p_incl, interpret, 0)
        cp = carry_t * p_incl
        live = cp >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)
        fdot = jax.lax.dot_general(
            feat, g_pix, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [Kc, P]
        contrib = w * fdot
        prefix_inc = prefix + _scan_incl(contrib, interpret, 0)
        # `total` was reduced in the forward with a different order, so the
        # last live pair's suffix cancels only to within fp rounding:
        # g_alpha picks up O(eps * total) noise. Within gradient-parity
        # tolerance in f32.
        suffix = total - prefix_inc
        g_alpha = fdot * t_before - (suffix + final_t * g_ft) / one_minus
        g_alpha = jnp.where(live & keep, g_alpha, 0.0)  # [Kc, P]

        # All six per-pair gradient reductions over the pixels collapse to
        # ONE [Kc,P]@[P,6] matmul against the same pixel basis:
        #   S = gG @ (1, px, py, px^2, py^2, px*py)^T
        # then dL/d{mean2d, conic} are per-pair [Kc] combinations of S and
        # (mx, my, ca, cb, cc) — the dx/dy expansions evaluated on the MXU.
        gG = g_alpha * (op[:, None] * g)
        S = jax.lax.dot_general(
            gG, basis, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [Kc, 6]: S0, Sx, Sy, Sxx, Syy, Sxy
        s0, sx, sy = S[:, 0], S[:, 1], S[:, 2]
        sxx, syy, sxy = S[:, 3], S[:, 4], S[:, 5]
        gdx = mx * s0 - sx  # sum gG*dx
        gdy = my * s0 - sy
        gdxx = mx * mx * s0 - 2.0 * mx * sx + sxx  # sum gG*dx^2
        gdyy = my * my * s0 - 2.0 * my * sy + syy
        gdxy = mx * my * s0 - mx * sy - my * sx + sxy
        g_mx = -(ca * gdx + cb * gdy)
        g_my = -(cc * gdy + cb * gdx)
        g_ca = -0.5 * gdxx
        g_cb = -gdxy
        g_cc = -0.5 * gdyy
        # sum g_alpha*g = S0 / op (gG = g_alpha*g*op, op constant per pair;
        # op == 0 only on sanitized garbage rows, whose gG is exactly 0)
        g_opac = jnp.where(op > 0.0, s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
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
        gbuf[pl.ds(c * k_chunk, k_chunk), :] = gchunk
        return c + 1, cp[-1:, :], prefix_inc[-1:, :]

    def cond2(carry):
        c, carry_t, _ = carry
        return (c < n_chunks) & (jnp.max(carry_t) >= T_EPS)

    init2 = (jnp.int32(0), jnp.ones((1, P), jnp.float32),
             jnp.zeros((1, P), jnp.float32))
    if early_exit:
        walked, _, _ = jax.lax.while_loop(cond2, body2, init2)
    else:
        walked, _, _ = jax.lax.fori_loop(
            0, n_chunks, lambda i, carry: body2(carry), init2
        )

    # the full k_cap window is DMA'd back, so chunks the loop did NOT walk
    # (past cnt, or early-exited) must hold zeros — zero exactly those
    # instead of pre-zeroing the whole [k_cap, NFF] buffer (the pre-zero
    # cost was comparable to a chunk walk itself)
    def zero_chunk(z, _):
        gbuf[pl.ds(z * k_chunk, k_chunk), :] = jnp.zeros(
            (k_chunk, NFF), jnp.float32
        )
        return _

    jax.lax.fori_loop(walked, k_cap // k_chunk, zero_chunk, 0)
    # Gradient write-back. Consecutive tiles' windows OVERLAP in their tails
    # (window t+1 starts at start_t + cnt_t), and correctness of the tail
    # overwrite (see module docstring) requires later tiles' writes to land
    # AFTER earlier ones. So writes are ORDERED — wait for write t-1 before
    # issuing write t — while staying async w.r.t. the next step's compute:
    # write t-1 had all of step t's compute to drain, so this wait is ~free.
    def _gwrite(s, tt):
        return pltpu.make_async_copy(
            gscratch.at[s],
            gpay_hbm.at[pl.ds(tstart_ref[tt], k_cap), :],
            gsem.at[s],
        )

    @pl.when(t >= 1)
    def _():
        _gwrite(1 - slot, t - 1).wait()

    _gwrite(slot, t).start()

    @pl.when(t == n_tiles - 1)
    def _():
        _gwrite(slot, t).wait()


# --------------------------------------------------------------------------
# COL layout kernels: pairs on lanes, [P, Kc] compute blocks
# --------------------------------------------------------------------------


def _win_lanes(k_cap, k_chunk):
    """Lanes per col window: k_cap pairs + one LANE block so any sub-block
    start offset still covers k_cap pairs, rounded to the chunk grid."""
    w = k_cap + LANE
    return -(-w // k_chunk) * k_chunk


def _window_dma_col(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap,
                    k_chunk):
    wl = k_cap + LANE  # DMA'd lanes (scratch may be chunk-padded wider)
    base = pl.multiple_of((tstart_ref[t] // LANE) * LANE, LANE)
    return pltpu.make_async_copy(
        pay_hbm.at[:, pl.ds(base, wl)],
        scratch.at[slot, :, pl.ds(0, wl)],
        sem.at[slot],
    )


def _chunk_fields_col(blk, c, k_chunk, lo, hi, basis_t, ox, oy):
    """Col-layout twin of _chunk_fields: blk is [NF, Kc] (fields on
    sublanes, pairs on lanes); all per-pair vectors are [1, Kc] rows and
    the alpha/weight blocks are [P, Kc]."""
    kidx = c * k_chunk + jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)
    rowok = (kidx >= lo) & (kidx < hi)  # [1, Kc]

    def col(j):
        return jnp.where(rowok, blk[j:j + 1, :], 0.0)  # [1, Kc]

    mx, my = col(0) - ox, col(1) - oy
    ca, cb, cc = col(2), col(3), col(4)
    op = col(5)
    coef = jnp.concatenate(
        [
            -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my,  # 1
            ca * mx + cb * my,  # px
            cc * my + cb * mx,  # py
            -0.5 * ca,  # px^2
            -0.5 * cc,  # py^2
            -cb,  # px*py
        ],
        axis=0,
    )  # [6, Kc]
    # power[P,Kc] = sum_j basis_t[:,j] (x) coef[j,:] — 6 exact-f32 outer
    # FMAs on the VPU; an MXU matmul here pads the 6-dim contraction to 128
    # and needs 6 passes for f32 precision (~10x the work)
    power = coef[0:1, :] * basis_t[:, 0:1]
    for _j in range(1, 6):
        power = power + basis_t[:, _j:_j + 1] * coef[_j:_j + 1, :]
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_MAX, op * g)
    keep = rowok & (power <= 1e-4) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    feat = jnp.where(rowok, blk[6:11, :], 0.0)  # [5, Kc]
    return alpha, g, keep, (mx, my, ca, cb, cc, op), feat


def _fwd_kernel_col(meta_ref, tstart_ref, cnt_ref, pay_hbm, out_ref, scratch,
                    sem, *, k_cap, k_chunk, grid_x, n_tiles, early_exit,
                    interpret):
    t = pl.program_id(0)
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    shift = tstart_ref[t] % LANE
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _window_dma_col(pay_hbm, tstart_ref, scratch, sem, 0, t, k_cap,
                        k_chunk).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        _window_dma_col(pay_hbm, tstart_ref, scratch, sem, 1 - slot, t + 1,
                        k_cap, k_chunk).start()

    _window_dma_col(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap,
                    k_chunk).wait()
    ox, oy = _origin(grid_x, meta_ref[0])
    basis_t = _pixel_basis(transposed=True)  # [P, 6]
    n_chunks = jax.lax.div(shift + cnt + (k_chunk - 1), k_chunk)

    def body(carry):
        c, acc, carry_t, t_live, nlive = carry
        blk = scratch[slot, :, pl.ds(c * k_chunk, k_chunk)]  # [NF, Kc]
        alpha, _, _, _, feat = _chunk_fields_col(
            blk, c, k_chunk, shift, shift + cnt, basis_t, ox, oy
        )
        one_minus = 1.0 - alpha  # [P, Kc]
        p_incl = _scan_prod(one_minus, interpret, 1)
        t_before = carry_t * _shift_one(p_incl, interpret, 1)
        cp = carry_t * p_incl
        live = cp >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)  # [P, Kc]
        # per-chunk lane reductions: MEASURED cheaper than carrying
        # deferred [P, Kc] accumulators across chunks (round 4 A/B on
        # chip: the deferral regressed the fwd kernel 31.7 -> 42.0 ms at
        # scale — six extra [P,Kc] read-modify-writes per chunk cost more
        # than Mosaic's lane reductions)
        acc = acc + jnp.concatenate(
            [jnp.sum(w * feat[_j:_j + 1, :], axis=1, keepdims=True)
             for _j in range(5)],
            axis=1,
        )  # [P, 5]
        t_live = jnp.minimum(
            t_live, jnp.min(jnp.where(live, cp, 1.0), axis=1, keepdims=True)
        )  # [P, 1]
        # n_contrib chunks (CUDA forward.cu:371-377 n_contrib analog, at
        # chunk granularity): the first chunk after which EVERY pixel's T
        # fell below T_EPS. A pure dataflow min — no scalar sync — that
        # the backward reads to bound its walk (chunks past it carry
        # exactly-zero gradients).
        dead = jnp.max(cp[:, -1:]) < T_EPS
        nlive = jnp.minimum(
            nlive,
            jnp.where(dead, (c + 1).astype(jnp.float32), nlive),
        )
        return c + 1, acc, cp[:, -1:], t_live, nlive

    big_f = jnp.float32(1e9)
    init = (jnp.int32(0), jnp.zeros((P, 5), jnp.float32),
            jnp.ones((P, 1), jnp.float32), jnp.ones((P, 1), jnp.float32),
            big_f)
    if early_exit:
        def cond(carry):
            c, _, carry_t, _, _ = carry
            return (c < n_chunks) & (jnp.max(carry_t) >= T_EPS)

        _, acc, _, t_live, nlive = jax.lax.while_loop(cond, body, init)
    else:
        _, acc, _, t_live, nlive = jax.lax.fori_loop(
            0, n_chunks, lambda i, carry: body(carry), init
        )
    nlive = jnp.minimum(nlive, n_chunks.astype(jnp.float32))
    out_ref[0] = jnp.concatenate(
        [acc, t_live, jnp.full((P, 1), 1.0, jnp.float32) * nlive,
         jnp.zeros((P, 1), jnp.float32)], axis=1
    )


def _bwd_kernel_col(meta_ref, tstart_ref, cnt_ref, pay_hbm, gout_ref,
                    fwd_ref, gpay_hbm, scratch, gscratch, sem, gsem, *,
                    k_cap, k_chunk, grid_x, n_tiles, early_exit, interpret):
    t = pl.program_id(0)
    start = tstart_ref[t]
    cnt = jnp.minimum(cnt_ref[t], k_cap)
    shift = start % LANE
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _window_dma_col(pay_hbm, tstart_ref, scratch, sem, 0, t, k_cap,
                        k_chunk).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        _window_dma_col(pay_hbm, tstart_ref, scratch, sem, 1 - slot, t + 1,
                        k_cap, k_chunk).start()

    _window_dma_col(pay_hbm, tstart_ref, scratch, sem, slot, t, k_cap,
                    k_chunk).wait()
    gbuf = gscratch.at[slot]
    ox, oy = _origin(grid_x, meta_ref[0])
    basis_t = _pixel_basis(transposed=True)  # [P, 6]
    n_chunks = jax.lax.div(shift + cnt + (k_chunk - 1), k_chunk)
    # bound the walk by the forward's recorded n_contrib chunks (channel 6):
    # chunks past the point where every pixel died carry exactly-zero
    # gradients, so skipping them is exact — and unlike the early-exit
    # while_loop this costs no per-chunk scalar sync (CUDA n_contrib,
    # backward.cu:457-475 analog)
    nlive = fwd_ref[0, 0, 6].astype(jnp.int32)
    n_chunks = jnp.minimum(n_chunks, nlive)
    g_pix = gout_ref[0, :, :5]  # [P, 5]
    g_ft = gout_ref[0, :, 5:6]  # [P, 1]
    final_t = fwd_ref[0, :, 5:6]  # [P, 1]
    total = jnp.sum(
        fwd_ref[0, :, :5] * g_pix, axis=1, keepdims=True
    )  # [P, 1]

    def body2(carry):
        c, carry_t, prefix = carry
        blk = scratch[slot, :, pl.ds(c * k_chunk, k_chunk)]
        alpha, g, keep, (mx, my, ca, cb, cc, op), feat = _chunk_fields_col(
            blk, c, k_chunk, shift, shift + cnt, basis_t, ox, oy
        )
        one_minus = 1.0 - alpha
        p_incl = _scan_prod(one_minus, interpret, 1)
        t_before = carry_t * _shift_one(p_incl, interpret, 1)
        cp = carry_t * p_incl
        live = cp >= T_EPS
        w = jnp.where(live, alpha * t_before, 0.0)  # [P, Kc]
        fdot = g_pix[:, 0:1] * feat[0:1, :]
        for _j in range(1, 5):
            fdot = fdot + g_pix[:, _j:_j + 1] * feat[_j:_j + 1, :]
        contrib = w * fdot
        prefix_inc = prefix + _scan_incl(contrib, interpret, 1)
        suffix = total - prefix_inc
        g_alpha = fdot * t_before - (suffix + final_t * g_ft) / one_minus
        g_alpha = jnp.where(live & keep, g_alpha, 0.0)  # [P, Kc]

        gG = g_alpha * (op * g)
        # S[6,Kc] rows = sublane-reductions of gG against the basis
        # columns (row 0 of the basis is all-ones). An MXU dot_general
        # (HIGHEST 6-pass) was A/B'd on chip in round 4 and measured
        # NEUTRAL-to-worse (52.5 vs 51.3 ms bwd kernel at scale); the
        # VPU sublane reductions stay.
        S = jnp.concatenate(
            [jnp.sum(gG, axis=0, keepdims=True)]
            + [jnp.sum(gG * basis_t[:, _j:_j + 1], axis=0, keepdims=True)
               for _j in range(1, 6)],
            axis=0,
        )  # [6, Kc]
        s0, sx, sy = S[0:1, :], S[1:2, :], S[2:3, :]
        sxx, syy, sxy = S[3:4, :], S[4:5, :], S[5:6, :]
        gdx = mx * s0 - sx
        gdy = my * s0 - sy
        gdxx = mx * mx * s0 - 2.0 * mx * sx + sxx
        gdyy = my * my * s0 - 2.0 * my * sy + syy
        gdxy = mx * my * s0 - mx * sy - my * sx + sxy
        g_mx = -(ca * gdx + cb * gdy)
        g_my = -(cc * gdy + cb * gdx)
        g_ca = -0.5 * gdxx
        g_cb = -gdxy
        g_cc = -0.5 * gdyy
        g_opac = jnp.where(op > 0.0, s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
        g_feat = jnp.concatenate(
            [jnp.sum(w * g_pix[:, _j:_j + 1], axis=0, keepdims=True)
             for _j in range(5)],
            axis=0,
        )  # [5, Kc]
        gchunk = jnp.concatenate(
            [g_mx, g_my, g_ca, g_cb, g_cc, g_opac, g_feat,
             jnp.zeros((NF - 11, k_chunk), jnp.float32)],
            axis=0,
        )  # [NF, Kc]
        gbuf[:, pl.ds(c * k_chunk, k_chunk)] = gchunk
        return c + 1, cp[:, -1:], prefix_inc[:, -1:]

    def cond2(carry):
        c, carry_t, _ = carry
        return (c < n_chunks) & (jnp.max(carry_t) >= T_EPS)

    init2 = (jnp.int32(0), jnp.ones((P, 1), jnp.float32),
             jnp.zeros((P, 1), jnp.float32))
    if early_exit:
        walked, _, _ = jax.lax.while_loop(cond2, body2, init2)
    else:
        walked, _, _ = jax.lax.fori_loop(
            0, n_chunks, lambda i, carry: body2(carry), init2
        )

    # zero the lanes the walk did not reach (chunk-granular)
    wl_alloc = _win_lanes(k_cap, k_chunk)

    def zero_chunk(z, _):
        gbuf[:, pl.ds(z * k_chunk, k_chunk)] = jnp.zeros(
            (NF, k_chunk), jnp.float32
        )
        return _

    jax.lax.fori_loop(walked, wl_alloc // k_chunk, zero_chunk, 0)

    # Boundary-block merge: this window's first LANE block also holds the
    # previous tile's last (shift) pairs; their gradients are still live in
    # the other double-buffer slot of the sequential grid. Without this the
    # ordered write-back (later windows overwrite earlier tails) would wipe
    # them. Chains across many tiny tiles sharing one block: each tile's
    # first block is merged before ITS write, so the immediate predecessor
    # always carries the accumulated values. Skipped when the previous tile
    # overflowed past this boundary (off > k_cap): those pairs are beyond
    # k_cap and carry exact-zero gradients by the clipping contract.
    prev_base = (tstart_ref[jnp.maximum(t - 1, 0)] // LANE) * LANE
    base = (start // LANE) * LANE
    off = base - prev_base

    @pl.when((t >= 1) & (shift > 0) & (off <= k_cap))
    def _():
        off_al = pl.multiple_of(off, LANE)
        prev_blk = gscratch[1 - slot, :, pl.ds(off_al, LANE)]  # [NF, LANE]
        lane = jax.lax.broadcasted_iota(jnp.int32, (NF, LANE), 1)
        cur = gbuf[:, pl.ds(0, LANE)]
        gbuf[:, pl.ds(0, LANE)] = jnp.where(lane < shift, prev_blk, cur)

    # ordered write-back of the k_cap + LANE window lanes
    def _gwrite(s, tt):
        wl = k_cap + LANE
        b = pl.multiple_of((tstart_ref[tt] // LANE) * LANE, LANE)
        return pltpu.make_async_copy(
            gscratch.at[s, :, pl.ds(0, wl)],
            gpay_hbm.at[:, pl.ds(b, wl)],
            gsem.at[s],
        )

    @pl.when(t >= 1)
    def _():
        _gwrite(1 - slot, t - 1).wait()

    _gwrite(slot, t).start()

    @pl.when(t == n_tiles - 1)
    def _():
        _gwrite(slot, t).wait()


# --------------------------------------------------------------------------
# pallas_call builders
# --------------------------------------------------------------------------


def _fused_fwd_call(pay_pad, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x,
                    interpret, tile0=None, early_exit=True, col=False):
    kernel = functools.partial(
        _fwd_kernel_col if col else _fwd_kernel,
        k_cap=k_cap, k_chunk=k_chunk, grid_x=grid_x,
        n_tiles=n_tiles, early_exit=early_exit, interpret=interpret,
    )
    scratch_shape = (
        (2, NF, _win_lanes(k_cap, k_chunk)) if col else (2, k_cap, NFF)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, P, 8), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(scratch_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if tile0 is None:
        tile0 = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), jnp.float32),
        interpret=interpret,
    )(tile0, tstart, cnt, pay_pad)


def _fused_bwd_call(pay_pad, gout, out8, tstart, cnt, n_tiles, k_cap,
                    k_chunk, grid_x, interpret, tile0=None, early_exit=True,
                    col=False):
    kernel = functools.partial(
        _bwd_kernel_col if col else _bwd_kernel,
        k_cap=k_cap, k_chunk=k_chunk, grid_x=grid_x,
        n_tiles=n_tiles, early_exit=early_exit, interpret=interpret,
    )
    scratch_shape = (
        (2, NF, _win_lanes(k_cap, k_chunk)) if col else (2, k_cap, NFF)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
            pltpu.VMEM(scratch_shape, jnp.float32),
            pltpu.VMEM(scratch_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if tile0 is None:
        tile0 = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pay_pad.shape, jnp.float32),
        interpret=interpret,
    )(tile0, tstart, cnt, pay_pad, gout, out8)


class FusedOut(NamedTuple):
    out8: jnp.ndarray  # [T, P, 8]: 5 channels, final_t at 5, padding
    tile_count: jnp.ndarray  # [T]
    num_pairs: jnp.ndarray  # []
    max_tile_count: jnp.ndarray  # []
    # [] pairs dropped by emission clipping (tcap on the bulk tier,
    # big_tcap on the big tier) — the fused-path analog of the CUDA dynamic
    # pair buffer never being too small (rasterizer_impl.cu:280-288)
    clipped_pairs: jnp.ndarray = None
    # [] widest NON-big gaussian (what the bulk tcap must cover); equals
    # the overall max when big_k == 0
    bulk_max_tiles: jnp.ndarray = None
    # [] widest gaussian overall (what big_tcap must cover)
    big_max_tiles: jnp.ndarray = None
    # [] widest NON-big AABB rect in tiles (what rect_cap must cover when
    # compacting slots; equals bulk_max_tiles otherwise)
    bulk_rect_max_tiles: jnp.ndarray = None


def _emission_tabs(prep, width, height, tcap, big_k, big_tcap,
                   tile_cull=False, rect_cap=0, big_rect_cap=0):
    """Two-tier emission tables.

    The dense single-tier [tcap, N] emission sizes EVERY gaussian's row
    count by the single widest splat: measured at reference-scale training,
    a handful of outlier splats grow tcap 4->32, i.e. 32M sort rows for
    ~2-3M real pairs (ROUND3_NOTES "train_scale"). The CUDA reference
    instead sizes its pair buffer by the true Sum(tiles_touched)
    (rasterizer_impl.cu:280-288). The TPU equivalent, keeping static
    shapes: a bulk [tcap, N] tier for everyone EXCEPT the top-big_k widest
    splats (selected by lax.top_k on tiles_touched), plus a compact
    [big_tcap, big_k] tier holding those outliers (their per-gaussian rows
    gathered at big_idx). Both tiers concatenate into ONE key table feeding
    the same sort, so sort rows are N*tcap + big_k*big_tcap instead of
    N*max_tiles.

    tile_cull (round 5): slots whose tile is provably below the 1/255
    alpha threshold for every pixel (exact box minimum of the Mahalanobis
    quadratic, pair_pipeline._slot_cull_mask) emit sentinels — output-
    exact vs the kernels' own skip test, fewer live pairs per tile.
    rect_cap > tcap additionally COMPACTS the bulk tier: up to rect_cap
    AABB positions are enumerated and the surviving tiles packed into the
    first tcap slots, so tcap is sized by active tiles (post-cull) while
    rect_cap covers the AABB — at an anisotropic reference-scale init the
    active count is ~2x smaller than the rect count, and sort rows shrink
    with it. The big tier stays rect-enumerated (its 80+ slot heights
    make the rank-select pass quadratic in big_tcap).

    Returns (tile_tab, depth_tab, big_idx_f32, n_tiles, clipped, bulk_max,
    big_max, bulk_rect_max): clipped counts emission rows dropped by
    either tier's cap, bulk_max is the widest non-big splat in the units
    tcap must cover (ACTIVE tiles when compacting, rect tiles otherwise),
    big_max the widest overall (rect tiles, vs big_tcap), bulk_rect_max
    the widest non-big AABB (vs rect_cap when compacting).
    """
    grid_x, grid_y = grid_dims(width, height)
    n_tiles = grid_x * grid_y
    n = prep.depth.shape[0]
    tiles = prep.tiles_touched
    cull = None
    if tile_cull:
        cull = (prep.mean2d, prep.conic, cull_tau(prep.opacity))
    rcap = max(rect_cap, tcap)
    compact = rcap > tcap

    def bulk_keys(rmin, rsz, depth, tl, cl):
        if compact:
            return _tier_keys_compact(rmin, rsz, depth, tl, tcap, rcap,
                                      grid_x, n_tiles, cl)
        return _tier_keys(rmin, rsz, depth, tl, tcap, grid_x, n_tiles,
                          cull=cl)

    if not big_k:
        tile_tab, depth_tab, active = bulk_keys(
            prep.rect_min, prep.rect_size, prep.depth, tiles, cull,
        )
        mx = jnp.max(tiles)
        demand = active if (compact or tile_cull) else tiles
        clipped = jnp.sum(jnp.maximum(demand - tcap, 0))
        if compact:
            clipped = clipped + jnp.sum(jnp.maximum(tiles - rcap, 0))
        bulk_max = jnp.max(demand)
        return (tile_tab, depth_tab, jnp.zeros((0,), jnp.float32), n_tiles,
                clipped, bulk_max, mx, mx)
    # big_i rides the custom_vjp as f32 (nondiff int operands would split
    # the vjp signature); the f32 round-trip is exact only below 2^24, so
    # refuse loudly instead of silently corrupting the big-tier gather at
    # >16.7M gaussians per chip (ADVICE r4).
    if n >= 1 << 24:
        raise ValueError(
            f"two-tier emission carries big-splat indices as float32, "
            f"exact only for N < 2^24; got N={n}. Shard the gaussians "
            f"(parallel.sharded_raster) or disable big_k."
        )
    big_tiles, big_i = jax.lax.top_k(tiles, big_k)
    is_big = jnp.zeros((n,), jnp.bool_).at[big_i].set(True)
    bulk_tiles = jnp.where(is_big, 0, tiles)
    big_cull = None
    if tile_cull:
        big_cull = (prep.mean2d[big_i], prep.conic[big_i],
                    cull_tau(prep.opacity[big_i]))
    b_tile, b_depth, b_active = bulk_keys(
        prep.rect_min, prep.rect_size, prep.depth, bulk_tiles, cull,
    )
    big_rcap = max(big_rect_cap, big_tcap)
    if big_rcap > big_tcap:
        # big-tier compaction: big_tcap sized by the outliers' ACTIVE
        # tiles, big_rect_cap over their AABB (the rank-select pass is
        # big_tcap x big_rcap x big_k ops — fine at these shapes)
        g_tile, g_depth, g_active = _tier_keys_compact(
            prep.rect_min[big_i], prep.rect_size[big_i], prep.depth[big_i],
            big_tiles, big_tcap, big_rcap, grid_x, n_tiles, big_cull,
        )
        big_demand = g_active
        big_overflow = (jnp.sum(jnp.maximum(g_active - big_tcap, 0))
                        + jnp.sum(jnp.maximum(big_tiles - big_rcap, 0)))
    else:
        g_tile, g_depth, _ = _tier_keys(
            prep.rect_min[big_i], prep.rect_size[big_i], prep.depth[big_i],
            big_tiles, big_tcap, grid_x, n_tiles, cull=big_cull,
        )
        # uncompacted big slots enumerate RECT positions, so the cap's
        # demand is the rect width even under culling
        big_demand = big_tiles
        big_overflow = jnp.sum(jnp.maximum(big_tiles - big_tcap, 0))
    tile_tab = jnp.concatenate([b_tile, g_tile])
    depth_tab = jnp.concatenate([b_depth, g_depth])
    bulk_demand = b_active if (compact or tile_cull) else bulk_tiles
    clipped = (jnp.sum(jnp.maximum(bulk_demand - tcap, 0)) + big_overflow)
    if compact:
        clipped = clipped + jnp.sum(jnp.maximum(bulk_tiles - rcap, 0))
    return (tile_tab, depth_tab, big_i.astype(jnp.float32), n_tiles,
            clipped, jnp.max(bulk_demand), jnp.max(big_demand),
            jnp.max(bulk_tiles))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10)
)
def _fused_sorted_blend(pay_cols, tile_tab, depth_tab, big_idx, shape_info,
                        tiers, k_chunk, interpret, early_exit=True,
                        col=False, eogs=False):
    out, _ = _fused_fwd(pay_cols, tile_tab, depth_tab, big_idx, shape_info,
                        tiers, k_chunk, interpret, early_exit, col, eogs)
    return out


def _sort_and_range(pay_cols, tile_tab, depth_tab, n_tiles, tiers,
                    big_idx=None):
    """Column-oriented emission sort, optionally two-tier.

    pay_cols is a tuple of [N] 1-D payload columns. Everything stays 1-D
    through the sort: [N,k] (k<128) arrays on TPU pad their minor dim to the
    128-lane tile in HBM, so the old row-form pipeline (concat [N,11] ->
    broadcast [P,11] -> sort -> stack [P,11]) moved ~8x the bytes of the
    payload it carried.

    tiers = (tcap, big_k, big_tcap) (an int means single-tier): rows are
    the bulk [tcap, N] emission followed by the [big_tcap, big_k] big-splat
    tier whose gaussian rows are gathered at big_idx (_emission_tabs)."""
    p = tile_tab.shape[0]
    n = pay_cols[0].shape[0]
    if isinstance(tiers, int):
        tiers = (tiers, 0, 0)
    tcap, big_k, big_tcap = tiers
    assert p == n * tcap + big_k * big_tcap, (p, n, tiers)
    if big_idx is not None and big_idx.dtype != jnp.int32:
        big_idx = big_idx.astype(jnp.int32)
    iota = jnp.arange(p, dtype=jnp.int32)
    if _SORT_GATHER:
        # 4-operand sort (keys + iota + gaussian id) + 11 payload gathers at
        # the sorted gid: lax.sort cost grows with operand count, so trading
        # the 11 carried columns for 11 linear-write gathers (and skipping
        # the 11-column emission broadcast entirely) wins at scale. The sort
        # is stable, so ties keep emission order and the gathered columns
        # are bit-identical to the carried ones. gid is NOT redundant with
        # iota: decoding gid from the emission position would need an
        # integer mod (the VPU has no integer divider, and p exceeds 2^24
        # at scale so the exact-f32 division trick does not apply), and the
        # big tier's rows decode through big_idx anyway.
        gid = emission_broadcast(jnp.arange(n, dtype=jnp.int32), tcap)
        if big_k:
            gid = jnp.concatenate(
                [gid, emission_broadcast(big_idx, big_tcap)]
            )
        sorted_ops = jax.lax.sort((tile_tab, depth_tab, iota, gid),
                                  num_keys=2)
        sort_tile = sorted_ops[0]
        src_idx = sorted_ops[2]
        sgid = sorted_ops[3]
        sorted_cols = tuple(jnp.take(c, sgid) for c in pay_cols)
    else:
        def em(c):
            x = emission_broadcast(c, tcap)
            if big_k:
                x = jnp.concatenate(
                    [x, emission_broadcast(jnp.take(c, big_idx), big_tcap)]
                )
            return x

        em_cols = tuple(em(c) for c in pay_cols)
        ops = (tile_tab, depth_tab, iota) + em_cols
        sorted_ops = jax.lax.sort(ops, num_keys=2)
        sort_tile = sorted_ops[0]
        src_idx = sorted_ops[2]
        sorted_cols = sorted_ops[3:]
    tids = jnp.arange(n_tiles, dtype=jnp.float32)
    tstart = jnp.searchsorted(sort_tile, tids).astype(jnp.int32)
    tend = jnp.searchsorted(sort_tile, tids + 1.0).astype(jnp.int32)
    return (sorted_cols, sorted_ops[1], sort_tile, src_idx, tstart,
            tend - tstart)


def _pack_col(sorted_cols, p, k_cap):
    """Stack sorted [p] columns into the col-layout [NF, L] payload (NF=16
    sublanes: no lane padding anywhere, 64 B/pair). L covers the largest
    window: base <= ceil(p/LANE)*LANE, + k_cap + LANE lanes."""
    f = len(sorted_cols)
    L = -(-p // LANE) * LANE + k_cap + LANE
    x = jnp.zeros((NF, L), jnp.float32)
    return x.at[:f, :p].set(jnp.stack(sorted_cols, axis=0))


def _fused_fwd(pay_cols, tile_tab, depth_tab, big_idx, shape_info, tiers,
               k_chunk, interpret, early_exit=True, col=False, eogs=False):
    n_tiles, k_cap, grid_x = shape_info
    n = pay_cols[0].shape[0]
    f = len(pay_cols)
    # eogs feature layout [rgb, altitude, 1] (renderer.py:87-93): the
    # altitude column equals -depth (the caller builds the depth key from
    # it, so bit-exact BY CONSTRUCTION) and the last column is the
    # constant 1 — neither rides the sort. 12 operands instead of 14.
    carry_cols = pay_cols[:9] if eogs else pay_cols
    sorted_cols, sorted_depth, sort_tile, src_idx, tstart, cnt = (
        _sort_and_range(carry_cols, tile_tab, depth_tab, n_tiles, tiers,
                        big_idx)
    )
    if eogs:
        sorted_cols = sorted_cols + (-sorted_depth,
                                     jnp.ones_like(sorted_depth))
    p = tile_tab.shape[0]
    # the ONE materialization: the kernels' DMA source. col: 64 B/pair;
    # wide: 512 B/pair (rows padded so every window is in bounds).
    if col:
        pay_pad = _pack_col(sorted_cols, p, k_cap)
    else:
        pay_pad = jnp.zeros((p + k_cap, NFF), jnp.float32)
        pay_pad = pay_pad.at[:p, :f].set(jnp.stack(sorted_cols, axis=-1))
    out8 = _fused_fwd_call(
        pay_pad, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x, interpret,
        early_exit=early_exit, col=col,
    )
    out = FusedOut(
        out8=out8,
        tile_count=cnt,
        num_pairs=jnp.sum(jnp.where(tile_tab < n_tiles, 1, 0)),
        max_tile_count=jnp.max(cnt),
    )
    res = (pay_pad, out8, sort_tile, src_idx, tstart, cnt, big_idx, n, f)
    return out, res


def _fused_bwd(shape_info, tiers, k_chunk, interpret, early_exit, col, eogs,
               res, cots):
    n_tiles, k_cap, grid_x = shape_info
    pay_pad, out8, sort_tile, src_idx, tstart, cnt, big_idx, n, f = res
    if isinstance(tiers, int):
        tiers = (tiers, 0, 0)
    tcap, big_k, big_tcap = tiers
    # eogs layout: the constant-1 channel's gradient is returned as zeros
    # (the caller constructs that column with jnp.ones, whose cotangent is
    # discarded upstream), so it skips the return sort — 11 operands
    # instead of 12. The altitude gradient (column 9) IS carried: it
    # drives means/affine through the altitude feature.
    f_ret = f - 1 if eogs else f
    g_out8 = cots.out8
    gpay_pad = _fused_bwd_call(
        pay_pad, g_out8, out8, tstart, cnt, n_tiles, k_cap, k_chunk, grid_x,
        interpret, early_exit=early_exit, col=col,
    )
    # back to emission order: the kernel wrote gradient rows at SORTED
    # positions, and src_idx is the emission index of each sorted row, so
    # ONE payload-carrying sort keyed by src_idx returns every row to its
    # emission position (measured 3.9 ms vs 5.3 ms for the inverse-
    # permutation 2-int-col sort + row gather it replaces, 400k rows).
    p = sort_tile.shape[0]
    pos = jnp.arange(p, dtype=jnp.int32)
    tile = sort_tile.astype(jnp.int32)
    in_range = tile < n_tiles
    tile_c = jnp.where(in_range, tile, 0)
    k = pos - jnp.take(tstart, tile_c)
    ok = in_range & (k < k_cap)
    # per-column 1-D extraction BEFORE the sort; col layout: column j is
    # ROW j of the [NF, L] gradient array — a contiguous unpadded slice.
    # where(), not multiply: positions no tile window wrote are
    # uninitialized and may hold NaN, which a 0-multiply would propagate
    if col:
        gcols = tuple(
            jnp.where(ok, gpay_pad[j, :p], 0.0) for j in range(f_ret)
        )
    else:
        gcols = tuple(
            jnp.where(ok, gpay_pad[:p, j], 0.0) for j in range(f_ret)
        )
    sorted_out = jax.lax.sort((src_idx,) + gcols, num_keys=1)
    if big_k:
        # two-segment emission reduce: fold the bulk tier per gaussian,
        # fold the big tier per top-K row, then ONE K-row scatter-add back
        # into the per-gaussian gradient (top_k indices are distinct; K is
        # a few thousand, so the scatter is negligible next to the sort)
        bi = big_idx.astype(jnp.int32)
        n_bulk = n * tcap

        def _reduce2(c):
            g_bulk = emission_reduce(c[:n_bulk], n, tcap)
            g_big = c[n_bulk:].reshape(big_tcap, big_k).sum(axis=0)
            return g_bulk.at[bi].add(g_big)

        g_cols = tuple(_reduce2(c) for c in sorted_out[1:])
    else:
        g_cols = tuple(
            emission_reduce(c, n, tcap) for c in sorted_out[1:]
        )
    if eogs:
        g_cols = g_cols + (jnp.zeros((n,), jnp.float32),)
    zeros_keys = jnp.zeros((p,), jnp.float32)
    return (g_cols, zeros_keys, zeros_keys,
            jnp.zeros_like(big_idx))


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
    early_exit: bool = True,
    col: bool = False,
    big_k: int = 0,
    big_tcap: int = 64,
    eogs_features: bool = False,
    tile_cull: bool = False,
    rect_cap: int = 0,
    big_rect_cap: int = 0,
):
    """Differentiable fused path. Returns FusedOut (out8 pre-background).

    big_k > 0 enables the two-tier emission (_emission_tabs): the bulk
    [tcap, N] table plus a [big_tcap, big_k] top-K big-splat table, so the
    sort is sized by typical splats while outliers get big_tcap rows.

    eogs_features: features are [rgb, altitude, 1] (the EOGS channel
    layout, renderer.py:87-93). The sort key depth is then DEFINED as
    -features[:, 3], so the altitude column is reconstructed bit-exactly
    from the sorted key instead of riding the sort, and the constant-1
    column is rebuilt post-sort — the two payload sorts shrink from
    14/12 operands to 12/11 (they are ~48% of the e2e render cost)."""
    grid_x, grid_y = grid_dims(width, height)
    big_k = min(big_k, prep.depth.shape[0])
    eogs = bool(eogs_features) and features.shape[1] == 5
    prep_keys = jax.tree.map(jax.lax.stop_gradient, prep)
    if eogs:
        prep_keys = prep_keys._replace(
            depth=jax.lax.stop_gradient(-features[:, 3])
        )
    (tile_tab, depth_tab, big_idx, n_tiles, clipped, bulk_max,
     big_max, bulk_rect_max) = _emission_tabs(
        prep_keys, width, height, tcap, big_k, big_tcap,
        tile_cull=tile_cull, rect_cap=rect_cap, big_rect_cap=big_rect_cap,
    )
    pay_cols = (
        prep.mean2d[:, 0], prep.mean2d[:, 1],
        prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
        prep.opacity,
    ) + tuple(features[:, j] for j in range(features.shape[1]))
    shape_info = (n_tiles, tile_capacity, grid_x)
    out = _fused_sorted_blend(
        pay_cols, tile_tab, depth_tab, big_idx, shape_info,
        (tcap, big_k, big_tcap), k_chunk, interpret, early_exit, col,
        eogs,
    )
    # demand: rect tiles without culling; with culling the demand is the
    # LIVE pair count (emitted valid keys, already counted by _fused_fwd)
    # plus whatever the caps clipped — dead tiles are not demand.
    num_pairs = (out.num_pairs + clipped if tile_cull
                 else jnp.sum(prep.tiles_touched))
    # tile_capacity clips pairs beyond k_cap in a tile (kernel windows walk
    # min(cnt, k_cap)); count them into the same loud-overflow metric
    tile_clipped = jnp.sum(
        jnp.maximum(out.tile_count - tile_capacity, 0)
    )
    return out._replace(
        num_pairs=num_pairs,
        clipped_pairs=clipped + tile_clipped,
        bulk_max_tiles=bulk_max,
        big_max_tiles=big_max,
        bulk_rect_max_tiles=bulk_rect_max,
    )
