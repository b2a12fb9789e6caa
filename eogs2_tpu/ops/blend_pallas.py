"""Pallas TPU kernels for the tile compositing hot loop.

Same math as ops/blend.py (which remains the interpretable reference and the
CPU path), but fused into single kernels so the [tiles, P, K] intermediates
(alpha, transmittance, suffix sums) never touch HBM:

  * prefix/suffix scans run as log-depth roll+add (Hillis-Steele) on the
    VPU (_scan_incl) — exact f32, ~5x cheaper than the Precision.HIGHEST
    triangular matmuls they replaced — chunked along K with running
    carries; chunks iterate via lax.fori_loop so Mosaic reuses one chunk's
    worth of VMEM (a python-unrolled loop kept every chunk's intermediates
    live and OOM'd VMEM at K=1536);
  * the per-pair data arrives packed as one [T, 16, K] array (lane dim = K,
    128-aligned) and is sliced per chunk directly from the ref;
  * tile origins derive from program_id (grid_x static) — no side inputs;
  * outputs are [T, P, 8] (5 channels + final_t in channel 5) and, in the
    backward, [T, 16, K] packed gradients that flow into the caller's
    gather/sort VJP exactly like the jnp path.

Forward residuals are the packed inputs plus the per-pixel final
transmittance and live-contributor count (channels 5 and 6 of the output).
The backward is a SINGLE back-to-front pass, mirroring CUDA's
save-final_T-and-n_contrib-then-rewalk strategy (backward.cu:457-643):
because transmittance is monotone decreasing, the live set is a prefix, so
`n_contrib` fully determines it without re-walking forward; per-pair
transmittance is reconstructed from final_t by dividing out later pairs'
(1-alpha) (as suffix log-sums via reversed triangular matmuls), and the
color suffix accumulates in the same reverse walk.
The remaining dots (feature compositing) run at Precision.HIGHEST: bf16
matmul quantization measurably corrupts training (DESIGN.md #6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eogs2_tpu.ops.blend import ALPHA_EPS, ALPHA_MAX, T_EPS
from eogs2_tpu.ops.projection import TILE

P = TILE * TILE  # 256 pixels per tile
NF = 16  # packed rows (12 used, padded for sublane alignment)
# rows: 0 mx, 1 my, 2 ca, 3 cb, 4 cc, 5 opacity, 6..10 feat, 11 mask

HI = jax.lax.Precision.HIGHEST


def pack_tile_data(mean2d, conic, opacity, feat, mask):
    """[T,K,2],[T,K,3],[T,K],[T,K,5],[T,K] -> [T,NF,K] packed."""
    t, k, c = feat.shape
    assert c == 5, c
    rows = [
        mean2d[..., 0], mean2d[..., 1],
        conic[..., 0], conic[..., 1], conic[..., 2],
        opacity,
    ] + [feat[..., i] for i in range(c)] + [mask.astype(mean2d.dtype)]
    data = jnp.stack(rows, axis=1)  # [T,12,K]
    return jnp.pad(data, ((0, 0), (0, NF - data.shape[1]), (0, 0)))


def unpack_grads(gdata):
    """[T,NF,K] -> (g_mean2d [T,K,2], g_conic [T,K,3], g_opac [T,K],
    g_feat [T,K,5])."""
    g = jnp.moveaxis(gdata, 1, 2)  # [T,K,NF]
    return g[..., 0:2], g[..., 2:5], g[..., 5], g[..., 6:11]


def _alpha_chunk(data_ref, c, k_chunk, ox, oy):
    """[P, Kc] effective alpha for chunk c of a tile's packed data ref."""
    sl = pl.ds(c * k_chunk, k_chunk)
    mx = data_ref[0, 0, sl]
    my = data_ref[0, 1, sl]
    ca = data_ref[0, 2, sl]
    cb = data_ref[0, 3, sl]
    cc = data_ref[0, 4, sl]
    op = data_ref[0, 5, sl]
    msk = data_ref[0, 11, sl]
    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pid % TILE).astype(jnp.float32) + ox
    py = (pid // TILE).astype(jnp.float32) + oy
    dx = mx[None, :] - px  # [P,Kc]
    dy = my[None, :] - py
    power = -0.5 * (ca[None, :] * dx * dx + cc[None, :] * dy * dy) - cb[None, :] * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_MAX, op[None, :] * g)
    keep = (msk[None, :] > 0.5) & (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    return alpha, g, dx, dy, keep


def _feat_chunk(data_ref, c, k_chunk):
    return data_ref[0, 6:11, pl.ds(c * k_chunk, k_chunk)]  # [5,Kc]


def _tri(kc):
    r = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 1)
    return (r <= c).astype(jnp.float32)


def _scan_incl(x, interpret: bool):
    """Inclusive prefix sum along lanes (last axis).

    TPU: log-depth Hillis-Steele via pltpu.roll — exact f32 adds on the VPU.
    Measured vs the [P,kc]@[kc,kc] triangular matmul it replaces: the matmul
    runs at Precision.HIGHEST (bf16 passes corrupt log-transmittance sums,
    DESIGN.md #6) and costs ~2-4 ms per pass at K=512/1024 tiles, while the
    roll scan is ~0.5 ms and needs no precision workaround. Interpret mode
    (CPU tests) uses jnp.cumsum (pltpu.roll has no interpret lowering).
    """
    if interpret:
        return jnp.cumsum(x, axis=-1)
    kc = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < kc:
        shifted = pltpu.roll(x, s, x.ndim - 1)
        x = jnp.where(lane >= s, x + shifted, x)
        s *= 2
    return x


def _origin(grid_x):
    i = pl.program_id(0)
    ox = ((i % grid_x) * TILE).astype(jnp.float32)
    oy = ((i // grid_x) * TILE).astype(jnp.float32)
    return ox, oy


def _fwd_kernel(data_ref, out_ref, *, k_chunk, n_chunks, grid_x, interpret):
    ox, oy = _origin(grid_x)

    def body(c, carry):
        acc, carry_raw, carry_live, carry_n = carry
        alpha, _, _, _, _ = _alpha_chunk(data_ref, c, k_chunk, ox, oy)
        logs = jnp.log1p(-alpha)
        s_incl = carry_raw + _scan_incl(logs, interpret)
        cp = jnp.exp(s_incl)
        live = cp >= T_EPS
        t_before = cp / (1.0 - alpha)
        w = jnp.where(live, alpha * t_before, 0.0)
        featc = _feat_chunk(data_ref, c, k_chunk)
        acc = acc + jax.lax.dot_general(
            w, featc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        carry_live = carry_live + jnp.sum(
            jnp.where(live, logs, 0.0), axis=-1, keepdims=True
        )
        # contributor count: live is a prefix of the pair sequence (cp is
        # monotone decreasing), so the count IS the cutoff index
        carry_n = carry_n + jnp.sum(live.astype(jnp.float32), axis=-1,
                                    keepdims=True)
        return acc, s_incl[:, -1:], carry_live, carry_n

    acc, _, carry_live, carry_n = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((P, 5), jnp.float32), jnp.zeros((P, 1), jnp.float32),
         jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32)),
    )
    out_ref[0] = jnp.concatenate(
        [acc, jnp.exp(carry_live), carry_n, jnp.zeros((P, 1), jnp.float32)],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("k_chunk", "grid_x", "interpret"))
def blend_forward_pallas(data, grid_x: int, k_chunk: int = 512,
                         interpret: bool = False):
    """data: [T,NF,K] packed. Returns out [T,P,8] (final_t in channel 5)."""
    t, nf, k = data.shape
    assert nf == NF and k % k_chunk == 0, (nf, k, k_chunk)
    kernel = functools.partial(
        _fwd_kernel, k_chunk=k_chunk, n_chunks=k // k_chunk, grid_x=grid_x,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, NF, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, P, 8), jnp.float32),
        interpret=interpret,
    )(data)


def _bwd_kernel(data_ref, gout_ref, gdata_ref, *, k_chunk, n_chunks, grid_x,
                interpret):
    """Single back-to-front pass (CUDA backward.cu:457-643 strategy).

    gout channels: 0..4 pixel grads, 5 dL/dfinal_t (background term folded
    in), 6 final_t, 7 n_contrib. Per-pair transmittance is reconstructed
    from final_t by dividing out the (1-alpha) of every LATER live pair
    (suffix log-sum); the live set is exactly {pair index < n_contrib}.
    Strict-after suffix sums are (chunk total − inclusive scan), with the
    scans running as roll-based VPU prefix sums (_scan_incl).
    """
    ox, oy = _origin(grid_x)
    g_pix = gout_ref[0, :, :5]
    g_ft = gout_ref[0, :, 5:6]
    final_t = gout_ref[0, :, 6:7]
    n_contrib = gout_ref[0, :, 7:8]
    log_ft = jnp.log(final_t)  # final_t >= T_EPS*(1-ALPHA_MAX) > 0

    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, k_chunk), 1)

    def body(cr, carry):
        carry_s, carry_suffix = carry
        c = n_chunks - 1 - cr
        alpha, g, dx, dy, keep = _alpha_chunk(data_ref, c, k_chunk, ox, oy)
        one_minus = 1.0 - alpha
        livem = (c * k_chunk + kidx).astype(jnp.float32) < n_contrib  # [P,Kc]
        logs = jnp.where(livem, jnp.log1p(-alpha), 0.0)
        # sum of live logs strictly after j (this chunk) + later chunks
        incl_logs = _scan_incl(logs, interpret)
        logs_total = incl_logs[:, -1:]
        s_after = carry_s + (logs_total - incl_logs)
        cp = jnp.exp(log_ft - s_after)  # inclusive transmittance at j
        t_before = cp / one_minus
        w = jnp.where(livem, alpha * t_before, 0.0)
        featc = _feat_chunk(data_ref, c, k_chunk)
        fdot = jnp.dot(g_pix, featc, preferred_element_type=jnp.float32,
                       precision=HI)
        contrib = w * fdot
        incl_contrib = _scan_incl(contrib, interpret)
        contrib_total = incl_contrib[:, -1:]
        suffix = carry_suffix + (contrib_total - incl_contrib)
        g_alpha = fdot * t_before - (suffix + final_t * g_ft) / one_minus
        g_alpha = jnp.where(livem & keep, g_alpha, 0.0)

        sl = pl.ds(c * k_chunk, k_chunk)
        ca = data_ref[0, 2, sl]
        cb = data_ref[0, 3, sl]
        cc = data_ref[0, 4, sl]
        op = data_ref[0, 5, sl]
        g_opac = jnp.sum(g_alpha * g, axis=0)
        gG = g_alpha * op[None, :] * g
        g_mx = jnp.sum(gG * (-(ca[None, :] * dx) - cb[None, :] * dy), axis=0)
        g_my = jnp.sum(gG * (-(cc[None, :] * dy) - cb[None, :] * dx), axis=0)
        g_ca = jnp.sum(gG * (-0.5 * dx * dx), axis=0)
        g_cb = jnp.sum(gG * (-dx * dy), axis=0)
        g_cc = jnp.sum(gG * (-0.5 * dy * dy), axis=0)
        g_feat = jax.lax.dot_general(
            w, g_pix, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [Kc,5]
        gchunk = jnp.concatenate(
            [
                jnp.stack([g_mx, g_my, g_ca, g_cb, g_cc, g_opac], axis=0),
                g_feat.T,
                jnp.zeros((NF - 11, k_chunk), jnp.float32),
            ],
            axis=0,
        )  # [NF,Kc]
        gdata_ref[0, :, sl] = gchunk
        carry_s = carry_s + logs_total
        carry_suffix = carry_suffix + contrib_total
        return carry_s, carry_suffix

    jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32)),
    )


@functools.partial(jax.jit, static_argnames=("k_chunk", "interpret", "grid_x"))
def blend_backward_pallas(data, gout, grid_x: int, k_chunk: int = 512,
                          interpret: bool = False):
    t, nf, k = data.shape
    kernel = functools.partial(
        _bwd_kernel, k_chunk=k_chunk, n_chunks=k // k_chunk, grid_x=grid_x,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, NF, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NF, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, NF, k), jnp.float32),
        interpret=interpret,
    )(data, gout)


# ---- custom-vjp wrapper ----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blend_tiles_pallas(data, bg, grid_x, k_chunk, interpret):
    """data [T,NF,K] packed, bg [5]. Returns (img [T,P,5], final_t [T,P])."""
    out = blend_forward_pallas(data, grid_x, k_chunk=k_chunk, interpret=interpret)
    img = out[:, :, :5] + out[:, :, 5:6] * bg[None, None, :]
    return img, out[:, :, 5]


def _fwd(data, bg, grid_x, k_chunk, interpret):
    out = blend_forward_pallas(data, grid_x, k_chunk=k_chunk, interpret=interpret)
    img = out[:, :, :5] + out[:, :, 5:6] * bg[None, None, :]
    return (img, out[:, :, 5]), (data, bg, out[:, :, 5], out[:, :, 6])


def _bwd(grid_x, k_chunk, interpret, res, grads):
    data, bg, final_t, n_contrib = res
    g_img, g_ft = grads
    g_ft_total = g_ft + jnp.einsum("tpc,c->tp", g_img, bg)
    # [T,P,8]: channel grads 0..4, dL/dfinal_t at 5, then the residuals the
    # single-pass backward reconstructs transmittance from: final_t at 6,
    # n_contrib at 7
    gout = jnp.stack(
        [g_img[..., 0], g_img[..., 1], g_img[..., 2], g_img[..., 3],
         g_img[..., 4], g_ft_total, final_t, n_contrib], axis=-1
    )
    gdata = blend_backward_pallas(data, gout, grid_x, k_chunk=k_chunk,
                                  interpret=interpret)
    g_bg = jnp.einsum("tp,tpc->c", final_t, g_img)
    return gdata, g_bg


blend_tiles_pallas.defvjp(_fwd, _bwd)
