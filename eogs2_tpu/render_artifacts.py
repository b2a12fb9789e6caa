"""Render-stage artifact writer.

Parity target: ``render_pan.py``: reload the saved model + camera params,
render every train/test view through the full pipeline, and write the
artifact set the downstream eval/TSDF stages consume — raw/shaded/cc/final
renders, altitude maps (the TSDF inputs), accumulated opacity, shadow maps,
sun/nadir resamples, and the per-view DSM of the Nadir camera
(render_pan.py:122-147, 311-411).

Artifacts are written as .tif (float) + .png (preview) into the reference's
directory layout: <model_path>/{train,test}_opNone/ours_<iter>/<kind>/.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _save_float(path, arr):
    from eogs2_tpu.io.geotiff import write_geotiff

    write_geotiff(path, np.asarray(arr, np.float32))


def _save_png(path, arr):
    import imageio.v2 as iio

    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[0] in (1, 3):  # CHW -> HWC
        a = a.transpose(1, 2, 0)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    lo, hi = np.nanmin(a), np.nanmax(a)
    if hi > lo:
        a = (a - lo) / (hi - lo)
    iio.imwrite(path, (np.clip(a, 0, 1) * 255).astype(np.uint8))


def load_model(model_path: str, iteration: int = -1, sh_degree: int = 0,
               capacity_headroom: float = 1.25):
    """searchForMaxIteration + load PLY (render_pan.py:150-165 analog)."""
    import jax.numpy as jnp

    from eogs2_tpu.io import ply as plyio
    from eogs2_tpu.model import GaussianAux, GaussianModel, GaussianParams

    pc_root = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[-1]) for d in os.listdir(pc_root)]
    it = max(iters) if iteration == -1 else iteration
    raw = plyio.load_gaussians_ply(
        os.path.join(pc_root, f"iteration_{it}", "point_cloud.ply"), sh_degree
    )
    n = raw["xyz"].shape[0]
    cap = ((int(n * capacity_headroom) + 127) // 128) * 128

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        xyz=pad(raw["xyz"]),
        features_dc=pad(raw["features_dc"]),
        features_rest=pad(raw["features_rest"]),
        scaling=pad(raw["scaling"], fill=-10.0),
        rotation=pad(raw["rotation"]).at[n:, 0].set(1.0),
        opacity=pad(raw["opacity"], fill=-10.0),
    )
    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
    )
    return GaussianModel(params=params, aux=aux, sh_degree=sh_degree), it


def load_shading(model_path: str, iteration: int, which: str = "shading"):
    import orbax.checkpoint as ocp
    import jax.numpy as jnp

    from eogs2_tpu.shading import CameraShadingParams

    path = os.path.abspath(
        os.path.join(model_path, "camera_params", f"iteration_{iteration}", which)
    )
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    d = ckptr.restore(path)
    return CameraShadingParams(**{k: jnp.asarray(v) for k, v in d.items()})


def render_sets(args):
    """Render all artifacts for the saved run (render_pan.py:479-557)."""
    from eogs2_tpu.pipeline import render_view_full, nadir_dsm
    from eogs2_tpu.rasterizer import RasterizeConfig
    from eogs2_tpu.scene import load_scene
    from eogs2_tpu.io.geotiff import write_geotiff

    model, it = load_model(args.model_path, args.iteration)
    shading = load_shading(args.model_path, it)
    shading_test = load_shading(args.model_path, it, which="shading_test") or shading
    scene = load_scene(
        args.scene_dir,
        images_msi_path=args.images_msi or os.path.join(args.scene_dir, "images"),
        images_pan_path=args.images_pan or os.path.join(args.scene_dir, "images"),
        eval_split=True,
        need_rescale=args.need_rescale,
        load_pan=False,
    )
    rcfg = RasterizeConfig(
        pair_capacity=1 << args.log2_pair_capacity,
        tile_capacity=args.tile_capacity,
        tile_chunk=args.tile_chunk,
    )

    from eogs2_tpu.flow import phase_correlation_shift, apply_flow_to_image
    import jax.numpy as jnp

    for split, views in (("train", scene.train_views), ("test", scene.test_views)):
        base = os.path.join(args.model_path, f"{split}_opNone", f"ours_{it}")
        for kind in ("final", "raw_render", "cc", "altitude", "acc_opacity",
                     "shadowmap", "gt", "flowmatched_altitude", "nadir_pov",
                     "sun_pov", "nadirpovsampled", "nadiraltitudesampled",
                     "nadir_altitude_diff", "sunpovsampled",
                     "flow_matched_image", "gt_flowmatch", "dsm"):
            os.makedirs(os.path.join(base, kind), exist_ok=True)
        for vi, view in enumerate(views):
            if view.is_virtual:
                continue
            out = render_view_full(
                model, view.camera, rcfg,
                shading=shading if split == "train" else shading_test,
                view_idx=vi if split == "train" else 0,
                with_sun=view.camera.has_sun,
            )
            name = view.name
            for kind in ("final", "raw_render", "cc"):
                _save_png(os.path.join(base, kind, name + ".png"), out[kind])
            _save_float(os.path.join(base, "altitude", name + ".tif"),
                        out["altitude"])
            _save_float(os.path.join(base, "acc_opacity", name + ".tif"),
                        out["acc_opacity"])
            if out["shadowmap"] is not None:
                _save_png(os.path.join(base, "shadowmap", name + ".png"),
                          out["shadowmap"])
            if view.image is not None:
                _save_png(os.path.join(base, "gt", name + ".png"), view.image)

            # per-view DSM (reference writes dsm/<name>.iio for EVERY
            # rendered view, render_pan.py:401-411, not just Nadir)
            from eogs2_tpu.eval.dsm import compute_dsm_from_view

            vprofile, vdsm = compute_dsm_from_view(
                view.camera, jnp.asarray(out["rendered_uva"]),
                scene.scene_shift, scene.scene_scale,
            )
            write_geotiff(
                os.path.join(base, "dsm", name + ".tif"),
                np.asarray(vdsm)[:, :, 0].astype(np.float32),
                transform=vprofile["transform"],
            )

            # nadir-POV render + resample of this view onto the nadir grid
            # (render_pan.py "nadirpov"/"nadirpovsampled"/
            # "nadiraltitudesampled"/"nadir_altitude_diff" artifacts)
            if split == "train":
                from eogs2_tpu.renderer import render_resample_virtual_camera

                hn, wn = out["altitude"].shape[:2]
                uva = jnp.asarray(out["rendered_uva"])
                bgv = jnp.asarray(
                    [1.0, 0.0, 1.0, float(view.camera.altitude_bounds[0]), 0.0],
                    jnp.float32,
                )
                nadir_cam, cam2nadir = view.camera.nadir_camera()
                nout = render_view_full(model, nadir_cam, rcfg, with_sun=False)
                _save_png(os.path.join(base, "nadir_pov", name + ".png"),
                          nout["raw_render"])
                n_rgb, n_alt, _, _ = render_resample_virtual_camera(
                    model, nadir_cam, jnp.asarray(cam2nadir), uva, bgv, rcfg
                )
                _save_png(os.path.join(base, "nadirpovsampled", name + ".png"),
                          np.asarray(n_rgb)[:, :hn, :wn])
                n_alt = np.asarray(n_alt)[:hn, :wn]
                _save_float(
                    os.path.join(base, "nadiraltitudesampled", name + ".tif"),
                    n_alt,
                )
                alt2d = np.asarray(out["altitude"])
                if alt2d.ndim == 3:
                    alt2d = alt2d[..., 0]
                _save_float(
                    os.path.join(base, "nadir_altitude_diff", name + ".tif"),
                    alt2d - n_alt,
                )
                if view.camera.has_sun:
                    sun_cam, cam2sun = view.camera.sun_camera(f=1)
                    sout = render_view_full(model, sun_cam, rcfg, with_sun=False)
                    _save_png(os.path.join(base, "sun_pov", name + ".png"),
                              sout["raw_render"])
                    s_rgb, _, _, _ = render_resample_virtual_camera(
                        model, sun_cam, jnp.asarray(cam2sun), uva, bgv, rcfg
                    )
                    _save_png(
                        os.path.join(base, "sunpovsampled", name + ".png"),
                        np.asarray(s_rgb)[:, :hn, :wn],
                    )

                # random-camera resample (render_pan.py:241-272; the
                # reference computes these but comments its writes out —
                # here they are opt-in artifacts)
                if getattr(args, "random_pov", False):
                    import jax

                    rkey = jax.random.PRNGKey(1000 + vi)
                    rand_cam, cam2rand = view.camera.random_camera(
                        rkey, getattr(args, "random_pov_extent", 0.2)
                    )
                    r_rgb, r_alt, r_uv, _ = render_resample_virtual_camera(
                        model, rand_cam, jnp.asarray(cam2rand), uva, bgv, rcfg
                    )
                    r_alt = np.asarray(r_alt)[:hn, :wn]
                    r_diff = alt2d - r_alt
                    occl = (np.abs(r_diff) < 0.30) & np.all(
                        np.abs(np.asarray(r_uv))[:hn, :wn] < 1.0, axis=-1
                    )
                    for kind in ("randompovsampled", "random_altitude_diff",
                                 "random_occlusion_map"):
                        os.makedirs(os.path.join(base, kind), exist_ok=True)
                    _save_png(
                        os.path.join(base, "randompovsampled", name + ".png"),
                        np.asarray(r_rgb)[:, :hn, :wn] * occl[None],
                    )
                    _save_float(
                        os.path.join(base, "random_altitude_diff",
                                     name + ".tif"), r_diff,
                    )
                    _save_float(
                        os.path.join(base, "random_occlusion_map",
                                     name + ".tif"), occl.astype(np.float32),
                    )

            # flow-matched altitude for the TSDF stage (render_pan.py:285-306):
            # shift the altitude map by the gt->render flow so TSDF fuses
            # registered depth
            if split == "train" and view.image is not None:
                gt = view.image
                final = out["final"][: gt.shape[0]]
                dx, dy = phase_correlation_shift(jnp.asarray(gt), jnp.asarray(final))
                warped_alt = apply_flow_to_image(
                    jnp.asarray(out["altitude"])[None], dx, dy
                )[0]
                _save_float(
                    os.path.join(base, "flowmatched_altitude", name + ".tif"),
                    warped_alt,
                )
                # render warped by the same flow + the (unwarped) gt pair
                # (render_pan.py "flow_matched_image"/"gt_flowmatch")
                warped_final = apply_flow_to_image(
                    jnp.asarray(final).transpose(2, 0, 1)
                    if np.asarray(final).ndim == 3 and final.shape[-1] <= 4
                    else jnp.asarray(final),
                    dx, dy,
                )
                _save_png(
                    os.path.join(base, "flow_matched_image", name + ".png"),
                    np.asarray(warped_final),
                )
                _save_png(os.path.join(base, "gt_flowmatch", name + ".png"),
                          np.asarray(gt))

    # Nadir DSM (render_pan.py:401-411)
    dsm_dir = os.path.join(args.model_path, "test_opNone", f"ours_{it}", "dsm")
    os.makedirs(dsm_dir, exist_ok=True)
    profile, dsm, _ = nadir_dsm(model, scene, rcfg)
    write_geotiff(
        os.path.join(dsm_dir, "Nadir.tif"),
        dsm[:, :, 0].astype(np.float32),
        transform=profile["transform"],
    )
    with open(os.path.join(dsm_dir, "profile.json"), "w") as f:
        t = profile["transform"]
        json.dump({"xoff": t.c, "yoff": t.f, "res": t.a,
                   "height": profile["height"], "width": profile["width"]}, f)
    # png preview of the DSM (render_pan.py:422-423 matplotlib analog)
    png_dir = os.path.join(args.model_path, "test_opNone", f"ours_{it}", "png")
    os.makedirs(png_dir, exist_ok=True)
    _save_png(os.path.join(png_dir, "Nadir_dsm.png"), dsm[:, :, 0])
    print(f"rendered artifacts for iteration {it} -> {args.model_path}")
    return 0
