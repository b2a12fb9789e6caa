"""Bilinear grid sampling (torch.nn.functional.grid_sample parity).

Used by the virtual-camera consistency losses and sun-shadow resampling
(gaussian_renderer/renderer_cc_shadow.py:37-41): align_corners=True, zero
padding outside (the callers overwrite out-of-FOV altitude with -100
themselves, matching renderer_cc_shadow.py:46).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(img, grid, align_corners: bool = True):
    """Sample img at NDC grid positions.

    Args:
      img: [C,H,W].
      grid: [Ho,Wo,2] with (x, y) a.k.a. (u, v) in [-1, 1].

    Returns:
      [C,Ho,Wo] bilinearly sampled, zeros outside the image.
    """
    c, h, w = img.shape
    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[:, yi_c, xi_c]  # [C,Ho,Wo]
        return vals * (wgt * inb)[None]

    out = (
        tap(x0, y0, (1 - tx) * (1 - ty))
        + tap(x0 + 1, y0, tx * (1 - ty))
        + tap(x0, y0 + 1, (1 - tx) * ty)
        + tap(x0 + 1, y0 + 1, tx * ty)
    )
    return out
