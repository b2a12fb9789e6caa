"""SSIM with the 11x11 sigma-1.5 Gaussian window.

Parity target: ``utils/loss_utils.py:43-85`` (the standard 3DGS SSIM):
per-channel depthwise convolution with zero ('same') padding, C1=0.01^2,
C2=0.03^2, mean over everything.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_window(window_size: int, sigma: float):
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]  # [W,W]


def _depthwise_same(img, window):
    """img: [C,H,W], window: [K,K] -> same-padded depthwise conv (zero pad)."""
    c = img.shape[0]
    k = window.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (c, 1, k, k))
    return jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )[0]


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5, mask=None):
    """Mean SSIM over [C,H,W] images (values expected in [0,1]).

    mask (broadcastable to [C,H,W]): average the SSIM map over valid
    pixels only. Padded canvases contribute SSIM=1 on the all-zero pad
    (both inputs zero there), which DILUTES the unmasked mean by the pad
    fraction (up to ~6% at 512^2 + 15 px pad); the masked mean makes a
    padded duplicate of a scene produce the identical loss. The SSIM map
    itself is unchanged — inside the valid region it is identical whether
    the zeros come from the conv's own zero 'SAME' padding (unpadded
    input) or from explicit canvas padding."""
    window = _gaussian_window(window_size, sigma).astype(img1.dtype)
    mu1 = _depthwise_same(img1, window)
    mu2 = _depthwise_same(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_same(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_same(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if mask is None:
        return jnp.mean(ssim_map)
    m = jnp.broadcast_to(mask, ssim_map.shape).astype(ssim_map.dtype)
    return jnp.sum(ssim_map * m) / jnp.maximum(jnp.sum(m), 1.0)


def psnr(img1, img2):
    """Per-image PSNR, matching utils/image_utils.py:19-21."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))
