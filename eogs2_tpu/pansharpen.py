"""Pansharpening algorithms (numpy/jax, image-prep time).

Parity target: ``pansharpening/`` — Brovey (brovey.py:33-49), simple Brovey
(brovey.py:5-30), IHS (ihs.py:6-34), bilinear/bicubic resize helpers, and
the factory (load_pansharp.py:4-18). Applied once to PAN GT when
``opt.apply_pansharp`` (train_pan.py:338-345).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_chw(img, out_hw, method="bilinear"):
    """[C,h,w] -> [C,H,W]."""
    c = img.shape[0]
    return jax.image.resize(img, (c,) + tuple(out_hw), method)


def brovey(img_pan, img_msi, w: float = 0.1):
    """Brovey: pansharped = pan / (w * sum_c msi_up) * msi_up.

    img_pan: [1,H,W] or [H,W]; img_msi: [C,h,w]. Returns [C,H,W]."""
    pan = img_pan if img_pan.ndim == 2 else img_pan[0]
    msi_up = resize_chw(img_msi, pan.shape)
    denom = jnp.clip(w * jnp.sum(msi_up, axis=0, keepdims=True), 1e-8)
    return (pan[None] / denom) * msi_up


def simple_brovey(img_pan, img_msi):
    """simple Brovey: ratio = pan / sum(msi_up)."""
    pan = img_pan if img_pan.ndim == 2 else img_pan[0]
    msi_up = resize_chw(img_msi, pan.shape)
    ratio = pan[None] / (jnp.sum(msi_up, axis=0, keepdims=True) + 1e-8)
    return msi_up * ratio


def ihs(img_pan, img_msi):
    """IHS: add the intensity delta to the upsampled MSI, clamp [0,1]."""
    pan = img_pan if img_pan.ndim == 2 else img_pan[0]
    msi_up = resize_chw(img_msi, pan.shape)
    i0 = jnp.mean(msi_up, axis=0)
    return jnp.clip(msi_up + (pan - i0)[None], 0.0, 1.0)


def load_pansharp(method: str):
    return {
        "brovey": brovey,
        "simple_brovey": simple_brovey,
        "ihs": ihs,
    }[method]
