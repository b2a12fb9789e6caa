"""Inference-time pipeline: full per-view rendering and DSM evaluation.

Parity targets:
  * ``render_all_views`` (renderer_cc_shadow.py:148-193): no-grad render of
    raw/shaded/cc/shadow/altitude per view.
  * the test-iteration DSM hook (train_pan.py:738-797): render the Nadir test
    camera, build the DSM, register against GT, report MAE.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eogs2_tpu.cameras import AffineCamera
from eogs2_tpu.eval.dsm import compute_dsm_from_view
from eogs2_tpu.eval.mae import MaeComputer
from eogs2_tpu.model import GaussianModel
from eogs2_tpu.ops.projection import TILE
from eogs2_tpu.ops.resample import grid_sample
from eogs2_tpu.ops.sh import SH2RGB
from eogs2_tpu.rasterizer import RasterizeConfig, rasterize
from eogs2_tpu.scene import SceneData
from eogs2_tpu.shading import CameraShadingParams, render_pipeline


def _pad16(x):
    return ((x + TILE - 1) // TILE) * TILE


def render_view_full(
    model: GaussianModel,
    camera: AffineCamera,
    raster_cfg: RasterizeConfig,
    shading: Optional[CameraShadingParams] = None,
    view_idx: int = 0,
    bg: Optional[np.ndarray] = None,
    with_sun: bool = True,
    use_cc: bool = True,
    use_shadow: bool = True,
    pan_mode: Optional[str] = None,
    weird_pan_setup: bool = False,
):
    """Full no-grad pipeline for one view. Returns dict of numpy arrays
    cropped to the camera's native size."""
    wn, hn = camera.width, camera.height
    wp, hp = _pad16(wn), _pad16(hn)
    if bg is None:
        bg = np.array([1.0, 0.0, 1.0, float(camera.altitude_bounds[0]), 0.0], np.float32)
    bg = jnp.asarray(bg)

    gp = model.params
    rgb = SH2RGB(gp.features_dc[:, 0, :])
    scaling = jnp.exp(gp.scaling)
    opacity = jax.nn.sigmoid(gp.opacity[:, 0])

    def raster(cam, vw, vh):
        alt = cam.ecef_to_uva(gp.xyz)[:, 2:3]
        feats = jnp.concatenate([rgb, alt, jnp.ones_like(alt)], axis=-1)
        return rasterize(
            gp.xyz, scaling, gp.rotation, opacity, feats,
            cam.resize_canvas(vw, vh).affine, bg, vw, vh, raster_cfg,
            alive=model.aux.alive,
        )

    out = raster(camera, wp, hp)
    raw = out.image[:3]
    altitude = out.image[3]
    acc = out.image[4]

    # native-convention UV grid extended over padding (train.py convention)
    u = (2.0 * jnp.arange(wp) / (wn - 1)) - 1.0
    v = (2.0 * jnp.arange(hp) / (hn - 1)) - 1.0
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    rendered_uva = jnp.stack([uu, vv, altitude], axis=-1)

    sun_altitude_diff = None
    if with_sun and camera.has_sun:
        sun_cam, cam2sun = camera.sun_camera(f=2)
        sw, sh = _pad16(sun_cam.width), _pad16(sun_cam.height)
        sout = raster(sun_cam, sw, sh)
        v_uv = jnp.einsum("ij,hwj->hwi", cam2sun, rendered_uva)[..., :2]
        samp = grid_sample(sout.image[3:4], v_uv, align_corners=True)[0]
        samp = jnp.where(jnp.any(jnp.abs(v_uv) > 1.0, axis=-1), -100.0, samp)
        sun_altitude_diff = altitude - samp

    if shading is not None:
        shaded_out = render_pipeline(
            raw,
            sun_altitude_diff,
            shading.cc_weight[view_idx],
            shading.cc_bias[view_idx],
            shading.inshadow[view_idx],
            use_cc=use_cc,
            use_shadow=use_shadow,
            exposure=shading.exposure[view_idx],
            pan_mode=pan_mode,
            pan_weight=shading.msi_to_pan_weight[view_idx],
            pan_bias=shading.msi_to_pan_bias[view_idx],
            weird_pan_setup=weird_pan_setup,
        )
    else:
        shaded_out = {"shadowmap": None, "cc": raw, "shaded": raw, "final": raw}

    def crop(x):
        x = np.asarray(x)
        if x is None:
            return None
        if x.ndim == 3:
            return x[:, :hn, :wn]
        return x[:hn, :wn]

    return {
        "raw_render": crop(raw),
        "altitude": crop(altitude),
        "acc_opacity": crop(acc),
        "cc": crop(shaded_out["cc"]),
        "shaded": crop(shaded_out["shaded"]),
        "final": crop(shaded_out["final"]),
        "shadowmap": crop(shaded_out["shadowmap"]) if shaded_out["shadowmap"] is not None else None,
        "rendered_uva": np.asarray(rendered_uva)[:hn, :wn],
    }


def nadir_dsm(
    model: GaussianModel,
    scene: SceneData,
    raster_cfg: RasterizeConfig,
    resolution: Optional[float] = None,
    scene_name: str = "",
):
    """Render the Nadir test camera and build the DSM (train_pan.py:738-786)."""
    nadir = [v for v in scene.test_views if "Nadir" in v.name]
    assert nadir, "scene has no Nadir test camera"
    cam = nadir[0].camera
    out = render_view_full(model, cam, raster_cfg, with_sun=False)
    profile, dsm = compute_dsm_from_view(
        cam,
        out["rendered_uva"],
        scene.scene_shift,
        scene.scene_scale,
        scene_name=scene_name,
        resolution=resolution,
    )
    return profile, dsm, out


def evaluate_dsm_mae(
    model: GaussianModel,
    scene: SceneData,
    mae_computer: MaeComputer,
    raster_cfg: RasterizeConfig,
    resolution: Optional[float] = None,
    scene_name: str = "",
):
    profile, dsm, _ = nadir_dsm(model, scene, raster_cfg, resolution, scene_name)
    mae, diff, rdsm = mae_computer.compute_mae(dsm[:, :, 0], profile["transform"])
    return mae, dsm, diff, rdsm
