"""Tile-local alpha compositing — the rasterizer hot loop, TPU style.

Parity target: ``renderCUDA`` forward (cuda_rasterizer/forward.cu:288-411) and
its hand-written backward (backward.cu:457-643).

The CUDA kernel walks each pixel's sorted Gaussian list sequentially with an
early-exit when transmittance T drops below 1e-4. On TPU we restructure the
whole thing as vectorized scans, with no sequential pixel loop at all:

  alpha_k  = clamp(opacity_k * exp(power_k), max=0.99), zeroed when
             power>0 or alpha<1/255 (exactly the CUDA skip conditions —
             a skipped Gaussian leaves T untouched, and (1-0)=1 leaves the
             cumulative product untouched, so the algebra is identical)
  cp_k     = prod_{j<=k} (1-alpha_j)          (inclusive cumprod)
  live_k   = cp_k >= 1e-4
             -- the CUDA early-exit test is T*(1-alpha) < 1e-4 *before*
             -- applying the Gaussian; because cp is monotonically
             -- non-increasing, the per-pixel "done" predicate reduces to
             -- this single threshold on the inclusive cumprod.
  T_k      = exclusive cumprod = cp_{k-1}     (transmittance before k)
  out_ch   = sum_k feat_{k,ch} * alpha_k * live_k * T_k  +  T_final * bg_ch

The channel accumulation is an [P,K]x[K,C] matmul -> MXU. The backward pass
(suffix sums instead of the CUDA back-to-front recurrence + atomics) is
hand-derived in closed form below and exposed via jax.custom_vjp; per-Gaussian
gradient accumulation happens in the caller through the gather VJP
(scatter-add), replacing CUDA's atomicAdd loop.

The custom VJP reproduces the reference's exact gradient quirk: the
min(0.99, .) clamp on alpha is ignored in the backward (backward.cu:574,624
recompute dL_dG = opacity * dL_dalpha with no clamp derivative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.projection import TILE

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pixel_grid(origin, dtype):
    """[TILE*TILE, 2] pixel-center coordinates for a tile at `origin` (x,y)."""
    xs = origin[0] + jnp.arange(TILE, dtype=dtype)
    ys = origin[1] + jnp.arange(TILE, dtype=dtype)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # [TILE(y), TILE(x)]
    return jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)


def _alphas(mean2d, conic, opacity, mask, origin):
    """Effective alpha matrix [P=TILE*TILE, K] with all CUDA skip rules."""
    dtype = mean2d.dtype
    pix = _pixel_grid(origin, dtype)  # [P,2]
    d = mean2d[None, :, :] - pix[:, None, :]  # [P,K,2]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a[None, :] * dx * dx + c[None, :] * dy * dy) - b[None, :] * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_MAX, opacity[None, :] * g)
    keep = mask[None, :] & (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    return alpha, g, d, keep


def _tri_incl(k, dtype=jnp.float32):
    """[K,K] upper-triangular ones incl. diagonal: x @ tri == inclusive
    cumsum along the last axis — the prefix scan as an MXU matmul.

    TPU note: jnp.cumprod/cumsum lower to O(log K) shifted elementwise
    passes, each round-tripping the [tiles,P,K] tensor through HBM; the
    triangular matmul does the same reduction inside the MXU with one read.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r <= c).astype(dtype)


def _cumsum_mxu(x):
    """Inclusive cumsum along the last axis via triangular matmul."""
    k = x.shape[-1]
    return jnp.dot(x, _tri_incl(k, x.dtype), preferred_element_type=jnp.float32)


def blend_tile(mean2d, conic, opacity, feat, mask, origin, bg):
    """Composite one 16x16 tile.

    Args:
      mean2d: [K,2] pixel-space centers (front-to-back sorted).
      conic: [K,3], opacity: [K], feat: [K,C], mask: [K] bool.
      origin: [2] pixel coordinates of the tile's top-left corner.
      bg: [C] background composited as out + T_final * bg (forward.cu:401-410).

    Returns:
      out: [TILE*TILE, C], final_t: [TILE*TILE]
    """
    alpha, _, _, _ = _alphas(mean2d, conic, opacity, mask, origin)
    one_minus = 1.0 - alpha  # [P,K]
    # inclusive log-prefix-product on the MXU; alpha <= 0.99 keeps
    # log1p(-alpha) finite and the exp round-trip well conditioned
    logs = jnp.log1p(-alpha)
    cp = jnp.exp(_cumsum_mxu(logs))
    live = cp >= T_EPS
    t_before = cp / one_minus  # exclusive prefix product (one_minus >= 0.01)
    w = jnp.where(live, alpha * t_before, 0.0)  # [P,K]
    out = w @ feat  # [P,C]  (MXU)
    final_t = jnp.exp(jnp.sum(jnp.where(live, logs, 0.0), axis=-1))
    out = out + final_t[:, None] * bg[None, :]
    return out, final_t


# ---------------------------------------------------------------------------
# custom-VJP version (CUDA-exact gradient semantics, no clamp derivative)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def blend_tile_cvjp(mean2d, conic, opacity, feat, mask, origin, bg):
    return blend_tile(mean2d, conic, opacity, feat, mask, origin, bg)


def _blend_fwd(mean2d, conic, opacity, feat, mask, origin, bg):
    out, final_t = blend_tile(mean2d, conic, opacity, feat, mask, origin, bg)
    # Residuals are the *inputs* only — the backward re-rasterizes, exactly
    # like the CUDA backward re-walks the sorted list from the saved final_T.
    return (out, final_t), (mean2d, conic, opacity, feat, mask, origin, bg, final_t)


def _blend_bwd(res, grads):
    mean2d, conic, opacity, feat, mask, origin, bg, final_t = res
    g_out, g_final_t = grads
    # d final_t / d alpha_k = -final_t / (1-alpha_k); fold into the bg-style
    # term below (bg . g_out has the same -T_final/(1-alpha) structure).
    alpha, g, d, keep = _alphas(mean2d, conic, opacity, mask, origin)
    one_minus = 1.0 - alpha
    logs = jnp.log1p(-alpha)
    cp = jnp.exp(_cumsum_mxu(logs))
    live = cp >= T_EPS
    t_before = cp / one_minus
    a_eff = jnp.where(live, alpha, 0.0)
    w = a_eff * t_before  # [P,K]

    # dL/dfeat: w^T @ g_out  -> [K,C]  (MXU)
    g_feat = w.T @ g_out

    # dL/dalpha_k (only where live & keep):
    #   sum_ch g_out_ch * ( feat_k_ch * T_k - (suffix_k_ch + T_final*bg_ch)/(1-a_k) )
    #   + g_final_t * ( -T_final/(1-a_k) )
    # suffix_k_ch = sum_{j>k} feat_j_ch a_j T_j  (per pixel)
    fdot = g_out @ feat.T  # [P,K] : sum_ch g_out_ch feat_k_ch
    contrib = w * fdot  # [P,K] : g_out . (feat_k a_k T_k)
    total = jnp.sum(contrib, axis=-1, keepdims=True)
    prefix_inc = _cumsum_mxu(contrib)  # includes k (MXU)
    suffix = total - prefix_inc  # sum_{j>k}
    bg_dot = g_out @ bg + g_final_t  # [P]
    inv_1ma = 1.0 / one_minus  # alpha <= 0.99 so 1-alpha >= 0.01
    g_alpha = fdot * t_before - (suffix + final_t[:, None] * bg_dot[:, None]) * inv_1ma
    g_alpha = jnp.where(live & keep, g_alpha, 0.0)

    # CUDA-exact chain (no min-clamp derivative): dalpha/dG = opacity,
    # dalpha/dopacity = G.
    g_opacity = jnp.sum(g_alpha * g, axis=0)  # [K]
    g_G = g_alpha * opacity[None, :]  # [P,K]

    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    gG = g_G * g  # common factor G * dL/dG
    # dG/ddelx = G * (-a dx - b dy); d(del)/d(mean2d.x) = +1
    g_mx = jnp.sum(gG * (-(a[None, :] * dx) - b[None, :] * dy), axis=0)
    g_my = jnp.sum(gG * (-(c[None, :] * dy) - b[None, :] * dx), axis=0)
    g_mean2d = jnp.stack([g_mx, g_my], axis=-1)

    # dG/dconic: power = -0.5(a dx^2 + c dy^2) - b dx dy
    g_ca = jnp.sum(gG * (-0.5 * dx * dx), axis=0)
    g_cb = jnp.sum(gG * (-dx * dy), axis=0)
    g_cc = jnp.sum(gG * (-0.5 * dy * dy), axis=0)
    g_conic = jnp.stack([g_ca, g_cb, g_cc], axis=-1)

    # background gradient: sum_p T_final_p * g_out_p
    g_bg = final_t @ g_out

    return (g_mean2d, g_conic, g_opacity, g_feat, None, None, g_bg)


blend_tile_cvjp.defvjp(_blend_fwd, _blend_bwd)


def blend_tiles(mean2d, conic, opacity, feat, mask, origins, bg, tile_chunk=64,
                use_custom_vjp=True):
    """Composite a batch of tiles with bounded memory.

    Args:
      mean2d: [T,K,2], conic: [T,K,3], opacity: [T,K], feat: [T,K,C],
      mask: [T,K] bool, origins: [T,2] pixel origin per tile, bg: [C].
      tile_chunk: tiles processed per map step (memory knob).
      use_custom_vjp: use the hand-derived backward (CUDA-exact gradient
        semantics, input-only residuals). Otherwise plain autodiff through
        a checkpointed forward.

    Returns:
      out: [T, TILE*TILE, C], final_t: [T, TILE*TILE]
    """
    fn = blend_tile_cvjp if use_custom_vjp else blend_tile
    single = lambda m2, co, op, ft, mk, og: fn(m2, co, op, ft, mk, og, bg)
    batched = jax.vmap(single)
    if not use_custom_vjp:
        batched = jax.checkpoint(batched)

    t = mean2d.shape[0]
    if tile_chunk >= t:
        return batched(mean2d, conic, opacity, feat, mask, origins)

    # Process tiles in chunks via lax.map to bound the [chunk,K,P] working set.
    pad = (-t) % tile_chunk
    def padt(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x
    args = [padt(x) for x in (mean2d, conic, opacity, feat, mask, origins)]
    n_chunks = (t + pad) // tile_chunk
    args = [x.reshape((n_chunks, tile_chunk) + x.shape[1:]) for x in args]
    out, final_t = jax.lax.map(lambda xs: batched(*xs), tuple(args))
    out = out.reshape((-1,) + out.shape[2:])[:t]
    final_t = final_t.reshape((-1,) + final_t.shape[2:])[:t]
    return out, final_t
