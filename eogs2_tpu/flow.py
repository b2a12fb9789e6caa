"""Optical-flow camera refinement (internal camera refinement).

Parity target: ``flowmatching/`` in the reference, which wraps torchvision
RAFT (flow_matching.py:76-86). Pretrained RAFT weights are neither available
offline nor TPU-idiomatic; the *useful* signal in the EOGS++ recipe is much
narrower than general optical flow:

  * the default mode (raft_small.yaml) is **constant displacement**: only the
    MEAN flow between the GT image and the render is kept
    (flow_matching.py:67-74), then either used to warp the pair during the
    loss (perform_flow_matching) or baked into the camera affine's intercept
    once (flow_matching_toaffine.py:11-25). A global translation estimate is
    exactly what FFT phase correlation computes, so that is the TPU-native
    estimator here (jittable, exact to sub-pixel via quadratic peak fit).
  * the dense mode (raft_large) is replaced by coarse-to-fine iterative
    Lucas-Kanade flow — jittable, no learned weights.

Warp convention matches apply_flow (flow_matching.py:225-253): flow maps
gt -> render; the render (and gt) are sampled at grid + flow with border
padding, align_corners=True.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.resample import grid_sample


def _to_gray(img):
    if img.ndim == 3:
        return jnp.mean(img, axis=0)
    return img


def _hann2d(h, w):
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(h) / (h - 1))
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(w) / (w - 1))
    return wy[:, None] * wx[None, :]


@jax.jit
def phase_correlation_shift(img_ref, img_mov):
    """Estimate the translation (dx, dy) such that img_mov(x+dx, y+dy) ~
    img_ref(x, y) — i.e. the flow from img_ref to img_mov, constant over the
    image. Sub-pixel via 3-point parabola around the correlation peak."""
    a = _to_gray(img_ref)
    b = _to_gray(img_mov)
    h, w = a.shape
    win = _hann2d(h, w)
    fa = jnp.fft.rfft2((a - jnp.mean(a)) * win)
    fb = jnp.fft.rfft2((b - jnp.mean(b)) * win)
    cross = fa * jnp.conj(fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = jnp.fft.irfft2(cross, s=(h, w))
    peak = jnp.argmax(corr)
    py, px = peak // w, peak % w

    def parabola(c_m, c_0, c_p):
        denom = c_m - 2 * c_0 + c_p
        return jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (c_m - c_p) / denom, 0.0)

    cy = corr[py, px]
    sub_y = parabola(corr[(py - 1) % h, px], cy, corr[(py + 1) % h, px])
    sub_x = parabola(corr[py, (px - 1) % w], cy, corr[py, (px + 1) % w])
    dy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32) + sub_y
    dx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32) + sub_x
    # corr peak at (dy,dx) means b shifted by (dy,dx) aligns with a:
    # a(x) ~ b(x - d) => flow a->b is -d
    return -dx, -dy


def _warp_by_flow(img, flow_x, flow_y):
    """apply_flow parity: sample img at (grid + flow), border padding,
    align_corners=True. flow_* may be scalars or [H,W]."""
    c, h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    gx = xx + flow_x
    gy = yy + flow_y
    # border padding == clamp coordinates to the frame
    gx = jnp.clip(gx, 0.0, w - 1.0)
    gy = jnp.clip(gy, 0.0, h - 1.0)
    u = 2.0 * gx / (w - 1) - 1.0
    v = 2.0 * gy / (h - 1) - 1.0
    return grid_sample(img, jnp.stack([u, v], axis=-1), align_corners=True)


@partial(jax.jit, static_argnames=("levels", "iters"))
def lucas_kanade_flow(img_ref, img_mov, levels: int = 3, iters: int = 10):
    """Coarse-to-fine dense LK flow from img_ref to img_mov.

    Returns (flow_x, flow_y) [H,W]. Window = 2-pixel Gaussian smoothing of
    the normal equations (structure tensor)."""
    a0 = _to_gray(img_ref)
    b0 = _to_gray(img_mov)

    def smooth(x):
        k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0])
        k = k / k.sum()
        x = jax.vmap(lambda r: jnp.convolve(r, k, mode="same"))(x)
        x = jax.vmap(lambda c: jnp.convolve(c, k, mode="same"))(x.T).T
        return x

    def down2(x):
        h, w = x.shape
        return smooth(x)[: h - h % 2 : 2, : w - w % 2 : 2]

    pyr_a = [a0]
    pyr_b = [b0]
    for _ in range(levels - 1):
        pyr_a.append(down2(pyr_a[-1]))
        pyr_b.append(down2(pyr_b[-1]))

    fx = jnp.zeros_like(pyr_a[-1])
    fy = jnp.zeros_like(pyr_a[-1])
    for lvl in reversed(range(levels)):
        a = pyr_a[lvl]
        b = pyr_b[lvl]
        h, w = a.shape
        if fx.shape != a.shape:
            fx = 2.0 * jax.image.resize(fx, (h, w), "bilinear")
            fy = 2.0 * jax.image.resize(fy, (h, w), "bilinear")

        def body(_, f):
            fx, fy = f
            bw = _warp_by_flow(b[None], fx, fy)[0]
            ix = jnp.gradient(bw, axis=1)
            iy = jnp.gradient(bw, axis=0)
            it = bw - a
            a11 = smooth(ix * ix) + 1e-4
            a12 = smooth(ix * iy)
            a22 = smooth(iy * iy) + 1e-4
            b1 = smooth(ix * it)
            b2 = smooth(iy * it)
            det = a11 * a22 - a12 * a12
            dx = (-a22 * b1 + a12 * b2) / det
            dy = (a12 * b1 - a11 * b2) / det
            return fx + dx, fy + dy

        fx, fy = jax.lax.fori_loop(0, iters, body, (fx, fy))
    return fx, fy


def estimate_flow(gt_image, render, perform_cst_displacement: bool = True):
    """Unified entry mirroring performOpticalmatching.get_flow: flow from
    gt to render; constant mode collapses to the phase-correlation shift.

    Returns (flow_x, flow_y) broadcastable to [H,W]."""
    if perform_cst_displacement:
        dx, dy = phase_correlation_shift(gt_image, render)
        return dx, dy
    return lucas_kanade_flow(gt_image, render)


def apply_flow_to_image(img, flow_x, flow_y):
    """Warp `img` (the render) by the gt->render flow (apply_flow parity)."""
    return _warp_by_flow(img, flow_x, flow_y)


def flow_accept(criteria: str, flow_mag, image, warped, gt_image, valid,
                max_value_flow: float):
    """Warp acceptance test — perform_flow_matching parity
    (flow_matching.py:305-329). `criteria` is static; returns a traced bool.

      * max_value_flow: accept when mean |flow| is below the threshold.
      * always: accept unconditionally.
      * psnr: accept when the warp improves PSNR vs GT (equivalently lowers
        the masked MSE).
      * l_photom: accept when the warp lowers (1-l)L1 + l(1-SSIM) with the
        reference's hardcoded lambda_dssim=0.2.
    """
    from eogs2_tpu import losses as L

    if criteria == "max_value_flow":
        return flow_mag < max_value_flow
    if criteria == "always":
        return jnp.bool_(True)
    if criteria == "psnr":
        mse_b = L.masked_mean((image - gt_image) ** 2, valid)
        mse_a = L.masked_mean((warped - gt_image) ** 2, valid)
        return mse_a < mse_b
    if criteria == "l_photom":
        lp_b, _ = L.photometric_loss(image, gt_image, 0.2, mask=valid)
        lp_a, _ = L.photometric_loss(warped, gt_image, 0.2, mask=valid)
        return lp_a < lp_b
    raise ValueError(f"unknown flowmatching criteria {criteria!r}")


def adjust_affine(affine, img_w: int, img_h: int, mean_flow_x, mean_flow_y):
    """Bake the mean gt->render flow into the camera intercept
    (flow_matching_toaffine.py:11-25): b[0] -= dx * 2/W, b[1] -= dy * 2/H.

    `affine` is [3,4] math orientation; returns the corrected matrix."""
    return affine.at[0, 3].add(-mean_flow_x * 2.0 / img_w).at[1, 3].add(
        -mean_flow_y * 2.0 / img_h
    )
