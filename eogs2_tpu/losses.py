"""Loss library — pure functions over arrays.

Parity targets (reference ``loss/`` package):
  * photometric: (1-l)L1 + l(1-SSIM)                  (shadow.py:20-28)
  * opacity: sum(opacity)/N_init                      (opacity.py:8-21)
  * radii opacity: visible-only variant               (opacity.py:24-36)
  * accumulated opacity: mean(1 - acc)                (opacity.py:39-45)
  * translucent shadows: binary entropy of shadowmap  (shadow.py:7-17)
  * sun-camera consistency                            (shadow.py:31-52)
  * random-camera consistency w/ occlusion mask       (main_loss.py:56-233)
  * total variation on altitude                       (main_loss.py:40-53)
  * erank anti-needle regularizer                     (main_loss.py:21-37)
  * flow-match |mean flow|                            (flowmatch.py:5-16)
  * PAN L2 + gradient losses                          (PAN_loss.py)

Masked variants accept a pixel-validity mask so padded images train
correctly (padding is how we keep one static shape across views).
"""

from __future__ import annotations

import jax.numpy as jnp

from eogs2_tpu.ops.ssim import ssim


def masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    m = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(pred, gt, mask=None):
    return masked_mean(jnp.abs(pred - gt), mask)


def photometric_loss(pred, gt, lambda_dssim: float = 0.2, mask=None):
    """(1-l)*L1 + l*(1-SSIM). With a mask, both inputs are zeroed outside
    it and BOTH terms average over valid pixels only (the SSIM map is
    masked-averaged, so canvas padding neither dilutes nor shifts the
    loss — a padded duplicate of a scene produces the identical value)."""
    ll1 = l1_loss(pred, gt, mask)
    if mask is not None:
        pred = pred * mask
        gt = gt * mask
    s = ssim(pred, gt, mask=mask)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - s), ll1


def opacity_loss(opacity, alive, init_count):
    """sum(alive opacities) / N_init (opacity.py:8-21)."""
    return jnp.sum(jnp.where(alive, opacity, 0.0)) / init_count


def radii_opacity_loss(opacity, radii, init_count):
    return jnp.sum(jnp.where(radii > 0, opacity, 0.0)) / init_count


def accumulated_opacity_loss(acc_render, mask=None):
    return masked_mean(1.0 - acc_render, mask)


def translucent_shadows_loss(shadowmap, mask=None):
    """Binary entropy pushing the shadow map to {0,1} (shadow.py:7-17)."""
    a = shadowmap
    b = jnp.clip(shadowmap, 0.05, 0.95)
    ent = -(a * jnp.log2(b) + (1.0 - a) * jnp.log2(1.0 - b))
    return masked_mean(ent, mask)


def tv_altitude_loss(altitude):
    d1 = jnp.abs(altitude[..., 1:, :] - altitude[..., :-1, :])
    d2 = jnp.abs(altitude[..., :, 1:] - altitude[..., :, :-1])
    return 0.5 * (jnp.mean(d1) + jnp.mean(d2))


def erank_loss(scaling, alive):
    """Effective-rank anti-needle regularizer (main_loss.py:21-37)."""
    s2 = scaling**2 + 1e-5
    total = jnp.sum(s2, axis=1, keepdims=True)
    q = s2 / total
    erankm1 = jnp.expm1(-jnp.sum(q * jnp.log(q + 1e-6), axis=1))
    per = jnp.clip(-jnp.log(erankm1 + 1e-5), 0.0) + jnp.sqrt(jnp.min(s2, axis=1))
    return masked_mean(per, alive)


def suncamera_loss(raw_render, sun_rgb_sample, sun_altitude_diff, sun_uv):
    """Altitude/RGB consistency where the sun sees the surface
    (shadow.py:31-52). Returns (alt_term, rgb_term); zero when the
    visibility mask is empty (the reference returns None there — we return
    zeros, which is what the training sum needs)."""
    vis = (sun_altitude_diff > -1e-2) & jnp.all(jnp.abs(sun_uv) < 1, axis=-1)
    vis = vis.astype(raw_render.dtype)
    denom = jnp.maximum(jnp.sum(vis), 1.0)
    alt = jnp.sum(jnp.abs(sun_altitude_diff) * vis) / denom
    rgb = jnp.sum(jnp.abs(raw_render - sun_rgb_sample) * vis[None]) / denom
    any_vis = jnp.sum(vis) > 0
    return jnp.where(any_vis, alt, 0.0), jnp.where(any_vis, rgb, 0.0)


def randomcam_loss(altitude_render, new_altitude_sample, rgb_render,
                   new_rgb_sample, new_uv, occlusion_threshold: float = 0.30):
    """Virtual-camera consistency with |d_alt|<0.3 occlusion mask
    (main_loss.py:142-160). Masks are stop-gradiented like the reference's
    .detach()."""
    import jax

    alt_diff = altitude_render - new_altitude_sample
    occ = (jnp.abs(alt_diff) < occlusion_threshold) & jnp.all(
        jnp.abs(new_uv) < 1, axis=-1
    )
    occ = jax.lax.stop_gradient(occ.astype(altitude_render.dtype))
    denom = jnp.maximum(jnp.sum(occ), 1.0)
    alt = jnp.sum(jnp.abs(alt_diff) * occ) / denom
    rgb = jnp.sum(jnp.abs(rgb_render - new_rgb_sample) * occ[None]) / denom
    any_occ = jnp.sum(occ) > 0
    return jnp.where(any_occ, alt, 0.0), jnp.where(any_occ, rgb, 0.0)


def flowmatch_loss(flow):
    return jnp.abs(jnp.mean(flow))


def gaussian_nll_loss(pred, target, var, eps: float = 1e-6, mask=None):
    """torch.nn.functional.gaussian_nll_loss parity (full=False):
    0.5 * (log(max(var, eps)) + (pred-target)^2 / max(var, eps))."""
    v = jnp.maximum(var, eps)
    nll = 0.5 * (jnp.log(v) + (pred - target) ** 2 / v)
    return masked_mean(nll, mask)


def transient_nll_loss(image, gt_image, transient_mask, mask=None):
    """Transient-material NLL (train_pan.py:433-449): variance from the
    learnable per-pixel transient mask, betaprime = (clip(m,0,1)+1e-3)^2."""
    betaprime = (jnp.clip(transient_mask, 0.0, 1.0) + 1e-3) ** 2
    var = jnp.broadcast_to(betaprime[None], image.shape)
    return gaussian_nll_loss(image, gt_image, var, mask=mask)


def pan_l2_loss(pan, gt_pan):
    return jnp.mean((pan - gt_pan) ** 2)


def pansharp_loss(syn_image, gt_pan, gt_msi, method: str = "brovey"):
    """L2 between a synthesized image and the pansharpened ground truth
    (loss/pansharp_loss.py:7-23).

    Note: the reference defines this loss but never instantiates it
    (train_pan.py:300 pins L_pansharp = 0); it is provided here as a library
    function for parity of capability. `syn_image` must be at PAN resolution
    (pansharpening outputs at the PAN grid).
    """
    from eogs2_tpu.pansharpen import load_pansharp

    sharp = load_pansharp(method)(img_pan=gt_pan, img_msi=gt_msi)
    return jnp.mean((syn_image - sharp) ** 2)


def pan_gradient_loss(pan, gt_pan):
    """L2 on central-difference gradients (PAN_loss.py:20-31)."""

    def grads(x):
        gy = jnp.gradient(x, axis=-2)
        gx = jnp.gradient(x, axis=-1)
        return gy, gx

    gy1, gx1 = grads(pan)
    gy2, gx2 = grads(gt_pan)
    return jnp.mean((gy1 - gy2) ** 2) + jnp.mean((gx1 - gx2) ** 2)
