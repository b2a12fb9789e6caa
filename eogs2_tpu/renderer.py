"""EOGS-level rendering: feature assembly, sun/virtual-camera resampling.

Parity targets:
  * ``gaussian_renderer/renderer.py``: colors_precomp = [SH2RGB(f_dc),
    altitude = ECEF_to_UVA(xyz).z, 1.0] (renderer.py:87-93); learnable
    last-row pose residual added to the view matrix (renderer.py:47-53).
  * ``gaussian_renderer/renderer_cc_shadow.py``: render from a virtual
    (sun/random/nadir) camera, reproject the main camera's (u,v,alt) grid
    through the 3x3 cam2virt map, grid_sample the virtual render, and mark
    out-of-FOV altitude as -100 (renderer_cc_shadow.py:6-54).

The render background convention follows train_pan.py:272-277: RGB random
(or fixed), bg[3] = min altitude bound, bg[4] = 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from eogs2_tpu.cameras import AffineCamera
from eogs2_tpu.model import GaussianModel
from eogs2_tpu.ops.resample import grid_sample
from eogs2_tpu.rasterizer import RasterizeConfig, rasterize


def gaussian_features(model: GaussianModel, camera: AffineCamera):
    """[N,5] = rgb, altitude under this camera, constant 1."""
    rgb = model.get_rgb()
    alt = camera.ecef_to_uva(model.params.xyz)[:, 2:3]
    ones = jnp.ones_like(alt)
    return jnp.concatenate([rgb, alt, ones], axis=-1)


def render(
    model: GaussianModel,
    camera: AffineCamera,
    bg,
    config: RasterizeConfig,
    width: int | None = None,
    height: int | None = None,
):
    """Render the 5-channel EOGS image from one camera.

    Returns the RasterOut plus the split channels the training loop uses.
    """
    w = width or camera.width
    h = height or camera.height
    feats = gaussian_features(model, camera)
    out = rasterize(
        model.params.xyz,
        model.get_scaling(),
        model.get_rotation_raw(),
        model.get_opacity(),
        feats,
        camera.affine,
        bg,
        width=w,
        height=h,
        config=config,
        alive=model.aux.alive,
    )
    return {
        "out": out,
        "raw_render": out.image[:3],
        "altitude": out.image[3],
        "acc_opacity": out.image[4],
    }


def render_resample_virtual_camera(
    model: GaussianModel,
    virtual_camera: AffineCamera,
    cam2virt,
    rendered_uva,
    bg,
    config: RasterizeConfig,
):
    """Render from `virtual_camera` and resample onto the true camera's grid.

    Args:
      cam2virt: [3,3] UVA->UVA map from the true camera into the virtual one.
      rendered_uva: [H,W,3] (u, v, altitude) of the true camera's render.

    Returns (virtual_rgb_sample [3,H,W], virtual_altitude_sample [H,W],
    virtual_uv [H,W,2], virtual_render [5,Hv,Wv]).
    """
    vr = render(model, virtual_camera, bg, config)
    virtual_render = vr["out"].image
    virtual_uv = jnp.einsum("ij,hwj->hwi", cam2virt, rendered_uva)[..., :2]
    sample = grid_sample(virtual_render, virtual_uv, align_corners=True)
    rgb_sample = sample[:3]
    alt_sample = sample[3]
    out_of_fov = jnp.any(jnp.abs(virtual_uv) > 1.0, axis=-1)
    alt_sample = jnp.where(out_of_fov, -100.0, alt_sample)
    return rgb_sample, alt_sample, virtual_uv, virtual_render


def rendered_uva_grid(camera: AffineCamera, altitude, width=None, height=None):
    """[H,W,3] stack of the camera UV grid with the rendered altitude
    (train_pan.py:282). When rendering at a padded canvas size, pass the
    padded width/height so the grid matches the rendered resolution."""
    if width is None:
        uv = camera.uv_grid()
    else:
        u = jnp.linspace(-1.0, 1.0, width)
        v = jnp.linspace(-1.0, 1.0, height)
        uu, vv = jnp.meshgrid(u, v, indexing="xy")
        uv = jnp.stack([uu, vv], axis=-1)
    return jnp.concatenate([uv, altitude[..., None]], axis=-1)
