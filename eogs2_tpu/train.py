"""Training: one pure jitted step + a thin host loop.

Parity target: ``train_pan.py:97-811`` (the per-iteration recipe: main render
-> sun-camera shadow resample -> shading pipeline -> random-camera
consistency -> weighted loss sum -> Adam steps -> pruning / densification /
opacity reset), re-architected TPU-first:

  * ONE jitted step serves every camera: per-view data (affine matrices,
    GT images, shading params) are stacked arrays indexed by a traced
    view id — no per-camera nn.Modules, no retracing.
  * iteration-gated loss terms stay compiled: gates enter as 0/1 float
    scalars that multiply the loss weights. Only the *structurally*
    different phases (sun/random renders on, pose learning on) are static
    flags — at most a handful of compiled variants per run.
  * densify/prune/opacity-reset are masked fixed-capacity updates
    (densify.py) applied between steps, surgically editing Adam moments in
    the optax state — the functional equivalent of the reference's
    optimizer-state surgery (gaussian_model.py:451-539).
  * the densification statistic (viewspace-gradient norm,
    gaussian_model.py:719-723) is obtained by differentiating wrt a zero
    NDC-offset input — the JAX equivalent of retain_grad on
    screenspace_points (renderer.py:31-40).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from eogs2_tpu import losses as L
from eogs2_tpu.cameras import AffineCamera
from eogs2_tpu.config import TrainConfig
from eogs2_tpu.densify import (
    densify_clone,
    densify_split,
    prune_mask,
    apply_prune,
    prune_transparent,
    reset_densification_stats,
    reset_opacity_with_moments,
)
from eogs2_tpu.model import GaussianAux, GaussianModel, GaussianParams, add_densification_stats, init_from_points
from eogs2_tpu.ops.projection import TILE
from eogs2_tpu.ops.resample import grid_sample
from eogs2_tpu.rasterizer import RasterizeConfig, rasterize
from eogs2_tpu.scene import SceneData
from eogs2_tpu.shading import CameraShadingParams, init_shading_params, render_pipeline
from eogs2_tpu.ops.sh import SH2RGB

import optax


@struct.dataclass
class SceneTensors:
    """Per-view constants stacked on device ([V, ...])."""

    affines: jnp.ndarray  # [V,3,4]
    sun_affines: jnp.ndarray  # [V,3,4]
    cam2sun: jnp.ndarray  # [V,3,3]
    alt_bounds: jnp.ndarray  # [V,2]
    images: jnp.ndarray  # [V,C,Hp,Wp] zero-padded GT
    image_valid: jnp.ndarray  # [V,1,Hp,Wp]
    centerofscene: jnp.ndarray  # [3]
    native_wh: tuple = struct.field(pytree_node=False, default=(0, 0))


@struct.dataclass
class TrainState:
    params: GaussianParams
    aux: GaussianAux
    shading: CameraShadingParams
    g_opt: Any  # optax state for Gaussian params
    c_opt: Any  # optax state for shading params
    step: jnp.ndarray


class Phase(NamedTuple):
    """Static structure flags -> one compiled step variant each."""

    enable_sun: bool = False
    enable_random: bool = False
    learn_pose: bool = False
    enable_flowmatch: bool = False


def _pad_to_tile(img, valid_shape):
    c, h, w = img.shape
    hp = ((h + TILE - 1) // TILE) * TILE
    wp = ((w + TILE - 1) // TILE) * TILE
    out = np.zeros((c, hp, wp), img.dtype)
    out[:, :h, :w] = img
    mask = np.zeros((1, hp, wp), np.float32)
    mask[:, :h, :w] = 1.0
    return out, mask


def build_scene_tensors(scene: SceneData, repeat_gt: bool = False) -> SceneTensors:
    return build_scene_tensors_from_views(list(scene.train_views), repeat_gt)


def build_scene_tensors_from_views(views, repeat_gt: bool = False) -> SceneTensors:
    w0, h0 = views[0].camera.width, views[0].camera.height
    affines, suns, c2s, bounds, imgs, masks = [], [], [], [], [], []
    for v in views:
        assert (v.camera.width, v.camera.height) == (w0, h0), (
            "all train views must share a size (pad offline otherwise)"
        )
        img = v.image
        assert img is not None, f"train view {v.name} has no image"
        if img.shape[0] == 1 and repeat_gt:
            img = np.repeat(img, 3, axis=0)
        pimg, pmask = _pad_to_tile(img.astype(np.float32), None)
        imgs.append(pimg)
        masks.append(pmask)
        affines.append(np.asarray(v.camera.affine))
        suns.append(np.asarray(v.camera.sun_affine))
        c2s.append(np.asarray(v.camera.camera_to_sun))
        bounds.append(np.asarray(v.camera.altitude_bounds))
    return SceneTensors(
        affines=jnp.asarray(np.stack(affines)),
        sun_affines=jnp.asarray(np.stack(suns)),
        cam2sun=jnp.asarray(np.stack(c2s)),
        alt_bounds=jnp.asarray(np.stack(bounds)),
        images=jnp.asarray(np.stack(imgs)),
        image_valid=jnp.asarray(np.stack(masks)),
        centerofscene=jnp.asarray(
            np.asarray(views[0].camera.centerofscene, np.float32)
        ),
        native_wh=(w0, h0),
    )


def native_uv_grid(width_native, height_native, width_padded, height_padded):
    """UV grid in the reference's linspace(-1,1,native) convention, extended
    over the padded canvas (affine_cameras.py:139-143)."""
    u = (2.0 * jnp.arange(width_padded) / (width_native - 1)) - 1.0
    v = (2.0 * jnp.arange(height_padded) / (height_native - 1)) - 1.0
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)  # [Hp,Wp,2]


def make_train_step(
    modalities,  # tuple of (name, SceneTensors, pan_mode | None, shading_idx_off)
    cfg: TrainConfig,
    raster_cfg: RasterizeConfig,
    phase: Phase,
    gauss_tx,
    cam_tx,
    spatial_lr_scale: float,
    mesh=None,
    raster_backend: str = "gspmd",
):
    """Build the jitted step for one Phase. Returns step(state, view_idx,
    key, gates) -> (state, metrics).

    `modalities` lists the cameras processed per iteration — one entry for
    the single-modality modes, {msi, pan} pairs for the dual MS mode
    (get_list_cam parity, utils/camera_utils.py:22-31): losses from all
    entries are summed before the single optimizer step, equivalent to the
    reference's per-camera backward accumulation (train_pan.py:268-469).
    """
    o = cfg.optimization
    use_cc = cfg.model.camera_params.use_cc
    use_exposure = cfg.model.camera_params.use_exposure
    use_shadow = cfg.model.camera_params.use_shadow

    # the trainer always renders the EOGS channel layout [rgb, alt, 1]
    # (feats built below), so the fused sorts can skip the two derivable
    # payload columns (fused_raster.rasterize_fused eogs_features)
    raster_cfg = dataclasses.replace(raster_cfg, eogs_features=True)

    if raster_backend == "a2a":
        # the scalable multi-chip path: Gaussian-sharded preprocess,
        # all_to_all pair exchange, tile-band-sharded fused Pallas blend
        # (SURVEY §7 step 7) — same RasterOut contract as `rasterize`
        assert mesh is not None, "raster_backend='a2a' needs a mesh"
        from eogs2_tpu.parallel.sharded_raster import rasterize_a2a

        def _raster(xyz, scaling, quats, opacity, feats, affine, bg, w, h,
                    alive, mean2d_ndc_offset=None):
            return rasterize_a2a(
                mesh, xyz, scaling, quats, opacity, feats, affine, bg,
                w, h, raster_cfg, alive=alive,
                mean2d_ndc_offset=mean2d_ndc_offset,
            )
    else:
        assert raster_backend == "gspmd", raster_backend

        def _raster(xyz, scaling, quats, opacity, feats, affine, bg, w, h,
                    alive, mean2d_ndc_offset=None):
            return rasterize(
                xyz, scaling, quats, opacity, feats, affine, bg, w, h,
                raster_cfg, alive=alive,
                mean2d_ndc_offset=mean2d_ndc_offset,
            )

    lr_tree = GaussianParams(
        xyz=o.position_lr_init * spatial_lr_scale,
        features_dc=o.feature_lr,
        features_rest=o.feature_lr / 20.0,
        scaling=o.scaling_lr,
        rotation=o.rotation_lr,
        opacity=o.opacity_lr,
    )

    def build_modality_loss(consts: SceneTensors, pan_mode, idx_off: int):
        wn, hn = consts.native_wh
        wp = consts.images.shape[-1]
        hp = consts.images.shape[-2]
        uv_grid = native_uv_grid(wn, hn, wp, hp)

        def build_camera(affine, view_idx):
            return AffineCamera(
                affine=affine,
                sun_affine=consts.sun_affines[view_idx],
                camera_to_sun=consts.cam2sun[view_idx],
                altitude_bounds=consts.alt_bounds[view_idx],
                centerofscene=consts.centerofscene,
                width=wn,
                height=hn,
            )

        def camera_loss(gparams, sparams, m2d_off, aux, raw_view_idx, key, gates):
            view_idx = raw_view_idx + idx_off
            model = GaussianModel(params=gparams, aux=aux, sh_degree=cfg.model.sh_degree)
            k_bg, k_rand = jax.random.split(key)

            affine = consts.affines[raw_view_idx]
            if phase.learn_pose:
                affine = affine.at[:, 3].add(sparams.last_row[view_idx, :3])
            cam = build_camera(affine, raw_view_idx)

            if o.random_background:
                bg = jax.random.uniform(k_bg, (5,))
            else:
                bg = jnp.zeros((5,)) + (1.0 if cfg.model.white_background else 0.0)
            if o.copy_background_firschan:
                bg = bg.at[1:3].set(bg[0])
            bg = bg.at[3].set(cam.altitude_bounds[0])
            bg = bg.at[4].set(0.0)

            # ---- main render (at the padded canvas) ----
            rgb = SH2RGB(gparams.features_dc[:, 0, :])
            alt = cam.ecef_to_uva(gparams.xyz)[:, 2:3]
            feats = jnp.concatenate([rgb, alt, jnp.ones_like(alt)], axis=-1)
            scaling = jnp.exp(gparams.scaling)
            opacity = jax.nn.sigmoid(gparams.opacity[:, 0])
            cam_r = cam.resize_canvas(wp, hp)
            out = _raster(
                gparams.xyz, scaling, gparams.rotation, opacity, feats,
                cam_r.affine, bg, wp, hp, aux.alive,
                mean2d_ndc_offset=m2d_off,
            )
            raw_render = out.image[:3]
            altitude = out.image[3]
            acc_opacity = out.image[4]
            rendered_uva = jnp.concatenate([uv_grid, altitude[..., None]], axis=-1)

            def render_virtual(vcam, cam2virt, vw, vh):
                vfeats = jnp.concatenate(
                    [rgb, vcam.ecef_to_uva(gparams.xyz)[:, 2:3], jnp.ones_like(alt)],
                    axis=-1,
                )
                vout = _raster(
                    gparams.xyz, scaling, gparams.rotation, opacity, vfeats,
                    vcam.affine, bg, vw, vh, aux.alive,
                )
                v_uv = jnp.einsum("ij,hwj->hwi", cam2virt, rendered_uva)[..., :2]
                samp = grid_sample(vout.image[:4], v_uv, align_corners=True)
                alt_s = jnp.where(
                    jnp.any(jnp.abs(v_uv) > 1.0, axis=-1), -100.0, samp[3]
                )
                return samp[:3], alt_s, v_uv

            terms = {}
            sun_altitude_diff = None
            if phase.enable_sun:
                sun_cam, cam2sun = cam.sun_camera(f=2)
                # pad the 2x canvas to tile multiples via resize_canvas
                sw = ((sun_cam.width + TILE - 1) // TILE) * TILE
                sh_ = ((sun_cam.height + TILE - 1) // TILE) * TILE
                sun_rgb, sun_alt, sun_uv = render_virtual(
                    sun_cam.resize_canvas(sw, sh_), cam2sun, sw, sh_
                )
                sun_altitude_diff = altitude - sun_alt
                alt_t, rgb_t = L.suncamera_loss(raw_render, sun_rgb, sun_altitude_diff, sun_uv)
                terms["L_sun_altitude_resample"] = gates["sun_resample"] * alt_t
                terms["L_sun_rgb_resample"] = gates["sun_resample"] * rgb_t

            # ---- shading pipeline ----
            shaded_out = render_pipeline(
                raw_render,
                sun_altitude_diff,
                sparams.cc_weight[view_idx],
                sparams.cc_bias[view_idx],
                sparams.inshadow[view_idx],
                use_cc=use_cc,
                use_shadow=use_shadow,
                exposure=sparams.exposure[view_idx],
                use_exposure=use_exposure,
                pan_mode=pan_mode,
                pan_weight=sparams.msi_to_pan_weight[view_idx],
                pan_bias=sparams.msi_to_pan_bias[view_idx],
                weird_pan_setup=cfg.model.weird_pan_setup,
            )
            image = shaded_out["final"]
            gt_image = consts.images[raw_view_idx]
            valid = consts.image_valid[raw_view_idx]

            # ---- flow matching (internal camera refinement) ----
            # perform_flow_matching parity (flow_matching.py:293-329): estimate
            # the gt->render flow, warp the render into the gt frame, then
            # accept or discard the warp by the configured criteria
            # (max_value_flow / psnr / l_photom / always — flow_matching.py:
            # 305-329). The constant-displacement default (raft_small recipe)
            # uses the FFT phase-correlation estimator; the dense mode
            # (perform_cst_displacement=False) uses pyramidal Lucas-Kanade.
            # Flow coordinates are stop-gradiented like the reference's
            # detached grid (flow_matching.py:249).
            flow_mag = jnp.float32(0.0)
            if phase.enable_flowmatch:
                from eogs2_tpu.flow import (
                    apply_flow_to_image,
                    estimate_flow,
                    flow_accept,
                )

                fdx, fdy = estimate_flow(
                    jax.lax.stop_gradient(gt_image),
                    jax.lax.stop_gradient(image),
                    o.flowmatching.perform_cst_displacement,
                )
                # abs(predicted_flows).mean() over both channels
                flow_mag = 0.5 * (
                    jnp.mean(jnp.abs(fdx)) + jnp.mean(jnp.abs(fdy))
                )
                warped = apply_flow_to_image(image, fdx, fdy)
                accept = flow_accept(
                    o.flowmatching.criteria, flow_mag, image, warped,
                    gt_image, valid, o.flowmatching.max_value_flow,
                ) & (gates["flowmatch"] > 0.5)
                image = jnp.where(accept, warped, image)

            # ---- random virtual camera consistency ----
            if phase.enable_random:
                new_cam, cam2new = cam.random_camera(k_rand, o.virtual_camera_extent)
                new_rgb, new_alt, new_uv = render_virtual(
                    new_cam.resize_canvas(wp, hp), cam2new, wp, hp
                )
                rgb_ref = raw_render  # 'rawrender' render type (train.yaml default)
                alt_t, rgb_t = L.randomcam_loss(altitude, new_alt, rgb_ref, new_rgb, new_uv)
                terms["L_new_altitude_resample"] = gates["new_resample"] * alt_t
                terms["L_new_rgb_resample"] = gates["new_resample"] * rgb_t

            # ---- scalar regularizers ----
            terms["L_opacity"] = gates["opacity"] * L.opacity_loss(
                opacity, aux.alive, gates["init_count"]
            )
            terms["L_opacity_radii"] = gates["opacity_radii"] * L.radii_opacity_loss(
                opacity, out.radii, gates["init_count"]
            )
            terms["L_erank"] = gates["erank"] * L.erank_loss(scaling, aux.alive)
            terms["L_TV_altitude"] = gates["tv"] * L.tv_altitude_loss(altitude)
            terms["L_accumulated_opacity"] = gates["acc_opacity"] * (
                L.accumulated_opacity_loss(acc_opacity, valid[0])
            )
            if shaded_out["shadowmap"] is not None:
                terms["L_translucentshadows"] = L.translucent_shadows_loss(
                    shaded_out["shadowmap"], valid[0]
                )
            else:
                terms["L_translucentshadows"] = jnp.float32(0.0)

            # transient-material NLL (train_pan.py:433-449; gated off by default)
            terms["L_nll"] = gates["nll"] * L.transient_nll_loss(
                image, gt_image, sparams.transient_mask[view_idx], mask=valid
            )

            photometric, ll1 = L.photometric_loss(
                image, gt_image, o.lambda_dssim, mask=valid
            )
            terms["Lphotometric"] = photometric

            total = (
                o.w_L_photometric * terms["Lphotometric"]
                + o.w_L_opacity * terms["L_opacity"]
                + o.w_L_opacity_radii * terms["L_opacity_radii"]
                + o.w_L_sun_altitude_resample * terms.get("L_sun_altitude_resample", 0.0)
                + o.w_L_sun_rgb_resample * terms.get("L_sun_rgb_resample", 0.0)
                + o.w_L_new_altitude_resample * terms.get("L_new_altitude_resample", 0.0)
                + o.w_L_new_rgb_resample * terms.get("L_new_rgb_resample", 0.0)
                + o.w_L_TV_altitude * terms["L_TV_altitude"]
                + o.w_L_erank * terms["L_erank"]
                + o.w_L_translucentshadows * terms["L_translucentshadows"]
                + o.w_L_accumulated_opacity * terms["L_accumulated_opacity"]
                + getattr(o, "w_L_nll", 0.0) * terms["L_nll"]
            )
            metrics = {
                "loss": total,
                "flow_mag": flow_mag,
                "L1": ll1,
                "photometric": photometric,
                "psnr": -10.0
                * jnp.log10(
                    L.masked_mean((image - gt_image) ** 2, valid) + 1e-12
                ),
                "num_pairs": out.num_pairs,
                "max_tile": out.max_tile_count,
                "max_tiles_per_gaussian": out.max_tiles_per_gaussian_seen,
                # fraction of pixels whose transmittance saturated: drives
                # the Trainer's early_exit auto-pick (the chunk early exit
                # only pays when tiles actually die before their count)
                "sat_frac": L.masked_mean(
                    (out.final_t < 1e-2).astype(jnp.float32), valid[0]
                ),
                # a2a: max_dest_count is the largest per-destination
                # exchange window (vs raster_cfg.dest_cap) and
                # dropped_pairs counts clipped sends; both 0-risk on the
                # single-chip backends
                "max_dest_count": (
                    out.max_dest_count
                    if out.max_dest_count is not None
                    else jnp.int32(0)
                ),
                "dropped_pairs": (
                    out.dropped_pairs
                    if out.dropped_pairs is not None
                    else jnp.int32(0)
                ),
                # pairs whose gradients were zeroed by emission/tile
                # capacity clipping (fused path): nonzero under frozen
                # capacities means quality numbers are suspect — the
                # Trainer warns loudly (VERDICT r3 item 5)
                "clipped_pairs": (
                    out.clipped_pairs
                    if out.clipped_pairs is not None
                    else jnp.int32(0)
                ),
                "big_max_tiles": (
                    out.big_max_tiles_seen
                    if out.big_max_tiles_seen is not None
                    else jnp.int32(0)
                ),
                # widest non-big AABB rect (vs raster_cfg.rect_cap when
                # slot compaction is on)
                "bulk_rect_max": (
                    out.bulk_rect_max_seen
                    if out.bulk_rect_max_seen is not None
                    else jnp.int32(0)
                ),
                **{k: v for k, v in terms.items()},
            }
            return total, (metrics, out.radii)

        return camera_loss

    mod_losses = [
        (name, build_modality_loss(consts, pan_mode, idx_off))
        for (name, consts, pan_mode, idx_off) in modalities
    ]

    def loss_fn(gparams, sparams, m2d_off, aux, view_idx, key, gates):
        total = jnp.float32(0.0)
        metrics = {}
        radii = None
        keys = jax.random.split(key, len(mod_losses))
        batched = getattr(view_idx, "ndim", 0) > 0
        for (name, closs), k in zip(mod_losses, list(keys)):
            if batched:
                # views_per_step > 1: vmap the whole camera loss over the
                # view batch (a TPU-first extension — the reference renders
                # one camera per iteration; batching amortizes the fixed
                # per-step overheads, gradients sum over the batch)
                bkeys = jax.random.split(k, view_idx.shape[0])
                ts, (ms, rs) = jax.vmap(
                    closs, in_axes=(None, None, None, None, 0, 0, None)
                )(gparams, sparams, m2d_off, aux, view_idx, bkeys, gates)
                t = jnp.sum(ts)
                m = jax.tree.map(jnp.mean, ms)
                r = jnp.max(rs, axis=0)
            else:
                t, (m, r) = closs(gparams, sparams, m2d_off, aux, view_idx, k, gates)
            total = total + t
            prefix = "" if len(mod_losses) == 1 else f"{name}_"
            for mk, mv in m.items():
                metrics[prefix + mk] = mv
            radii = r if radii is None else jnp.maximum(radii, r)
        if len(mod_losses) > 1:
            metrics["loss"] = total
            metrics["photometric"] = sum(
                metrics[f"{n}_photometric"] for n, _ in mod_losses
            ) / len(mod_losses)
            metrics["psnr"] = sum(
                metrics[f"{n}_psnr"] for n, _ in mod_losses
            ) / len(mod_losses)
            metrics["L1"] = sum(metrics[f"{n}_L1"] for n, _ in mod_losses) / len(
                mod_losses
            )
        return total, (metrics, radii)

    def _step_impl(state: TrainState, view_idx, key, gates):
        m2d_off = jnp.zeros((state.params.xyz.shape[0], 2), jnp.float32)
        (loss, (metrics, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, state.shading, m2d_off, state.aux, view_idx, key, gates)
        g_g, g_s, g_m2d = grads

        # freeze gates for camera params (msi_to_pan unfreeze at iteration
        # gate, last_row unfreeze at iterstart_learn_wv_transform)
        g_s = g_s.replace(
            msi_to_pan_weight=g_s.msi_to_pan_weight * gates["learn_msitopan"],
            msi_to_pan_bias=g_s.msi_to_pan_bias * gates["learn_msitopan"],
            last_row=g_s.last_row * gates["learn_pose"],
        )

        g_updates, g_opt = gauss_tx.update(g_g, state.g_opt, state.params)
        g_updates = jax.tree.map(lambda u, lr: -lr * u, g_updates, lr_tree)
        if o.optimizer_type == "sparse_adam":
            # SparseGaussianAdam analog: only Gaussians visible this step
            # receive parameter updates (the reference's optional sparse
            # optimizer, gaussian_model.py:263-268); moments still advance.
            vis = (radii > 0).astype(jnp.float32)
            g_updates = jax.tree.map(
                lambda u: u * vis.reshape((-1,) + (1,) * (u.ndim - 1)),
                g_updates,
            )
        new_gparams = jax.tree.map(jnp.add, state.params, g_updates)

        c_updates, c_opt = cam_tx.update(g_s, state.c_opt, state.shading)
        new_sparams = jax.tree.map(
            lambda p, u: p - o.camera_lr * u, state.shading, c_updates
        )

        model = GaussianModel(params=new_gparams, aux=state.aux)
        model = add_densification_stats(model, g_m2d, radii)

        new_state = state.replace(
            params=new_gparams,
            aux=model.aux,
            shading=new_sparams,
            g_opt=g_opt,
            c_opt=c_opt,
            step=state.step + 1,
        )
        metrics["grad_m2d_max"] = jnp.max(jnp.abs(g_m2d))
        return new_state, metrics

    step_jit = jax.jit(_step_impl, donate_argnums=(0,))

    def _chunk_impl(state, view_idxs, keys, gates_stack, prune_gates):
        """S consecutive iterations in ONE dispatch (lax.scan): amortizes the
        per-dispatch host round trip (~25 ms on the tunnelled chip,
        DESIGN.md) over S steps. The host loop's per-iteration transparent
        pruning (train_pan.py:674-677 analog) is folded in-graph, gated per
        iteration; all other maintenance stays at chunk boundaries."""

        def body(st, xs):
            vi, k, g, pg = xs
            st, metrics = _step_impl(st, vi, k, g)
            kill = st.params.opacity[:, 0] < o.min_opacity
            alive = st.aux.alive & ~(kill & (pg > 0.5))
            st = st.replace(aux=st.aux.replace(alive=alive))
            return st, metrics

        return jax.lax.scan(
            body, state, (view_idxs, keys, gates_stack, prune_gates)
        )

    chunk_jit = jax.jit(_chunk_impl, donate_argnums=(0,))

    class CompiledTrainStep:
        """Callable single jitted step; `.chunk(...)` runs S steps per
        dispatch."""

        def __call__(self, *args):
            return step_jit(*args)

        def chunk(self, *args):
            return chunk_jit(*args)

        def lower(self, *args):
            # AOT access for bucket pre-warming (Trainer.prewarm_bucket_
            # ladder): compile into the persistent cache without running
            return step_jit.lower(*args)

    return CompiledTrainStep()


def _next_bucket(x: int, lo: int = 128) -> int:
    c = max(lo, 1)
    while c <= x:
        c <<= 1
    return c


def _upm(x, m: int) -> int:
    """Round up to a multiple of m (capacity sizing without pow2 slack)."""
    return max(m, ((int(x) + m - 1) // m) * m)


def _active_tiles_np(rmin, rsz, tiles, mean2d, conic, opacity, grid_x,
                     chunk: int = 1 << 17):
    """Per-gaussian count of ACTIVE rect tiles under the ellipse-exact
    cull (numpy mirror of pair_pipeline._slot_cull_mask, f64, used by
    probe_capacities to size tcap when tile_cull is on). Chunked over
    gaussians so the [rect_max, chunk] enumeration stays ~100 MB."""
    from eogs2_tpu.ops.pair_pipeline import _CULL_MARGIN
    from eogs2_tpu.ops.projection import TILE

    n = tiles.shape[0]
    out = np.zeros((n,), np.int64)
    rmax = int(tiles.max()) if n else 0
    if rmax == 0:
        return out
    tau = 2.0 * np.log(np.maximum(opacity.astype(np.float64), 1e-30)
                       * 255.0)
    t = np.arange(rmax, dtype=np.int64)[:, None]
    for lo_ in range(0, n, chunk):
        hi_ = min(lo_ + chunk, n)
        sl = slice(lo_, hi_)
        rw = np.maximum(rsz[sl, 0], 1)[None, :]
        ty = t // rw
        tx = t - ty * rw
        x0 = (rmin[sl, 0][None, :] + tx).astype(np.float64) * TILE
        y0 = (rmin[sl, 1][None, :] + ty).astype(np.float64) * TILE
        mx = mean2d[sl, 0][None, :].astype(np.float64)
        my = mean2d[sl, 1][None, :].astype(np.float64)
        a = conic[sl, 0][None, :].astype(np.float64)
        b = conic[sl, 1][None, :].astype(np.float64)
        c = conic[sl, 2][None, :].astype(np.float64)
        lx, ux = mx - (x0 + TILE - 1.0), mx - x0
        ly, uy = my - (y0 + TILE - 1.0), my - y0
        inside = (lx <= 0) & (0 <= ux) & (ly <= 0) & (0 <= uy)

        def q(dx, dy):
            return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

        qm = np.minimum(
            np.minimum(
                np.minimum(q(lx, np.clip(-b * lx / np.where(c > 0, c, 1e-12), ly, uy)),
                           q(ux, np.clip(-b * ux / np.where(c > 0, c, 1e-12), ly, uy))),
                np.minimum(q(np.clip(-b * ly / np.where(a > 0, a, 1e-12), lx, ux), ly),
                           q(np.clip(-b * uy / np.where(a > 0, a, 1e-12), lx, ux), uy)),
            ),
            np.minimum(np.minimum(q(lx, ly), q(lx, uy)),
                       np.minimum(q(ux, ly), q(ux, uy))),
        )
        qmin = np.where(inside, 0.0, qm)
        dead = np.where(np.isfinite(qmin),
                        qmin > tau[sl][None, :] + _CULL_MARGIN,
                        False)
        active = (t < tiles[sl][None, :]) & ~dead
        out[sl] = active.sum(axis=0)
    return out


def make_gates(cfg: TrainConfig, iteration: int, init_count: int) -> Dict[str, jnp.ndarray]:
    o = cfg.optimization

    def gate(start, end=None):
        # np scalars (same f32[] aval as jnp, no per-gate device transfer;
        # cheap to build per-iteration when stacking scan chunks)
        on = iteration > start and (end is None or iteration < end)
        return np.float32(1.0 if on else 0.0)

    return {
        "opacity": gate(o.iterstart_L_opacity, o.iterend_L_opacity),
        "opacity_radii": gate(o.iterstart_L_opacity_radii, o.iterend_L_opacity_radii),
        "sun_resample": gate(o.iterstart_L_sun_resample),
        "new_resample": gate(o.iterstart_L_new_resample),
        "tv": gate(o.iterstart_L_TV_altitude),
        "erank": gate(o.iterstart_L_erank),
        "acc_opacity": gate(o.iterstart_L_accumulated_opacity),
        "learn_msitopan": np.float32(
            0.0
            if (cfg.optimization.freeze_start_msitopan_params
                and iteration < o.iterstart_learn_msitopan_params)
            else 1.0
        ),
        "learn_pose": gate(o.iterstart_learn_wv_transform - 1),
        "flowmatch": gate(
            o.iterstart_flowmatching, o.flowmatching.iterend_flowmatching
        ),
        "nll": gate(getattr(o, "iterstart_L_nll", 9_999_999_999)),
        "init_count": np.float32(init_count),
    }


def phase_for_iteration(cfg: TrainConfig, iteration: int) -> Phase:
    o = cfg.optimization
    return Phase(
        enable_sun=iteration > o.iterstart_shadowmapping,
        enable_random=iteration > o.iterstart_L_new_resample,
        learn_pose=cfg.model.camera_params.learn_wv_transform,
        enable_flowmatch=(
            o.flowmatching.apply_flowmatching
            and iteration > o.iterstart_flowmatching
            and iteration < o.flowmatching.iterend_flowmatching
        ),
    )


@dataclasses.dataclass
class Trainer:
    """Host-side orchestration: camera sampling, phase scheduling,
    densify/prune/reset cadence, early stopping, eval hooks."""

    cfg: TrainConfig
    scene: SceneData
    raster_cfg: RasterizeConfig = RasterizeConfig()
    eval_hook: Optional[Callable] = None  # fn(trainer, state, iteration) -> dict
    log_hook: Optional[Callable] = None
    report_logger: Optional[object] = None  # MetricsLogger for training_report
    mae_computer: Optional[object] = None  # RDSM figure in training_report
    # Multi-chip training (all-new vs the single-GPU reference, SURVEY §2.3):
    # a jax.sharding.Mesh with a "g" axis shards the Gaussian SoA + Adam
    # moments over chips; GSPMD partitions the jitted step (preprocess and
    # parameter updates stay local, the rasterizer's sort gathers, shading
    # grads are psum'd by the partitioner). Maintenance/densify are jitted
    # masked updates over the same sharded arrays, so they stay sharded too.
    mesh: Optional[object] = None
    # "gspmd": GSPMD partitions the single-chip step over the mesh (sorts
    # become cross-chip gathers — simple, works at small scale).
    # "a2a": the explicit scalable path — Gaussian-sharded preprocess,
    # ONE all_to_all pair exchange to tile-band owners, tile-sharded fused
    # Pallas blend; requires mesh with a "g" axis, views_per_step == 1.
    raster_backend: str = "gspmd"
    # >1: run up to this many iterations per dispatch (lax.scan inside one
    # jit) to amortize the per-dispatch host round trip; chunks break at
    # host events (logging, densify/reset cadence, eval, phase changes) so
    # semantics match the per-iteration loop.
    steps_per_dispatch: int = 1
    # False: freeze rasterizer capacities (no grow/shrink rebucketing) —
    # for throughput benchmarking, where a mid-run recompile destroys the
    # measurement. Overflow under frozen caps clips pairs (zero gradients)
    # but is LOUD: the clipped_pairs metric is surfaced every interval and
    # the loop warns on the first nonzero clip. Production keeps True.
    auto_rebucket: bool = True
    # on a rebucket grow trigger, re-run probe_capacities against the live
    # state (demand-sized, min-row) instead of stepping one pow2 bucket —
    # pow2 doubling of a populous big tier walks the emission table toward
    # OOM during early-training splat widening. False = plain bucket steps
    # (the prewarm ladder then predicts the exact next configs).
    reprobe_on_grow: bool = True
    # hard emission-row ceiling for probe_capacities (OOM guard: an
    # 86M-row table exceeded the 16 GB HBM at compile); beyond it the big
    # tier's cap is clamped and the overflow clips LOUDLY instead
    probe_row_budget: int = 64_000_000
    # auto-pick the fused kernels' chunk-granular early exit from the
    # observed pixel saturation (sat_frac metric): ON when most pixels'
    # transmittance dies (opaque converged scenes — the exit skips real
    # work), OFF otherwise (the per-chunk vector->scalar sync is pure cost
    # on translucent scenes, DESIGN.md section 8c). False = respect
    # raster_cfg.early_exit as given.
    early_exit_auto: bool = True

    def _place(self, state):
        if self.mesh is None:
            return state
        from eogs2_tpu.parallel.mesh import shard_gaussian_state

        return shard_gaussian_state(state, self.mesh)

    def setup(self):
        cfg = self.cfg
        scene = self.scene
        # group views by modality (MS scenes pair msi+pan per view index)
        msi_views = [v for v in scene.train_views if v.image_type == "msi"]
        pan_views = [v for v in scene.train_views if v.image_type == "pan"]

        # one-time pansharpening of the PAN ground truth
        # (train_pan.py:338-345: gt <- pansharp(pan, msi) when apply_pansharp)
        if cfg.optimization.apply_pansharp and cfg.model.load_pan and pan_views:
            from eogs2_tpu.pansharpen import load_pansharp

            method = load_pansharp(cfg.optimization.pansharp_method)
            msi_by_name = {v.name: v for v in msi_views}
            for pv in pan_views:
                mv = msi_by_name.get(pv.name)
                if mv is not None and pv.image is not None and mv.image is not None:
                    pv.image = np.asarray(
                        method(jnp.asarray(pv.image), jnp.asarray(mv.image))
                    )
        self.modal_views = []
        if cfg.model.load_msi and msi_views:
            self.modal_views.append(("msi", msi_views))
        if cfg.model.load_pan and pan_views:
            self.modal_views.append(("pan", pan_views))
        assert self.modal_views, "no views selected by load_msi/load_pan"
        if len(self.modal_views) == 2:
            assert len(msi_views) == len(pan_views), "unpaired MS views"
        self.consts_by_modality = {
            name: build_scene_tensors_from_views(
                views, repeat_gt=cfg.model.repeat_gt and name == "pan"
            )
            for name, views in self.modal_views
        }
        self.consts = self.consts_by_modality[self.modal_views[0][0]]
        n_init = len(scene.init_xyz)
        capacity = int(n_init * cfg.model.capacity_headroom)
        capacity = ((capacity + 127) // 128) * 128
        model = init_from_points(
            scene.init_xyz,
            scene.init_rgb,
            capacity=capacity,
            sh_degree=cfg.model.sh_degree,
            opacity_init_value=cfg.model.opacity_init_value,
        )
        self.init_count = n_init
        num_views = len(self.modal_views[0][1])
        share_cc = cfg.model.share_color_correction
        num_shading = num_views * (1 if share_cc or len(self.modal_views) == 1
                                   else len(self.modal_views))
        transient_hw = (
            (self.consts.images.shape[-2], self.consts.images.shape[-1])
            if cfg.model.use_transient
            else None
        )
        shading = init_shading_params(
            num_shading, transient_hw=transient_hw,
            transient_init=cfg.model.transient_init_value,
        )
        self._share_cc = share_cc
        self.gauss_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)
        self.cam_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self.state = self._place(TrainState(
            params=model.params,
            aux=model.aux,
            shading=shading,
            g_opt=self.gauss_tx.init(model.params),
            c_opt=self.cam_tx.init(shading),
            step=jnp.int32(0),
        ))
        mode = cfg.model.msi_to_pan_name
        # pan conversion applies only to pan-type cameras; in the single-
        # modality modes every view shares the type.
        any_pan = any(v.image_type == "pan" for v in scene.train_views)
        self.pan_mode = None
        if any_pan and cfg.model.load_pan:
            self.pan_mode = {"fixed": "fixed", "identity": "identity",
                             "average": "average",
                             "only_one_channel": "only_one_channel",
                             "learned": "learned",
                             "fixedandtranslate": "fixedandtranslate"}[mode]
        if self.pan_mode == "fixedandtranslate":
            # residual conv starts at zero so output == fixed WV3 path
            # (transf_msi_to_pan.py:134-178; see shading.msi_to_pan)
            sh0 = self.state.shading
            self.state = self.state.replace(shading=sh0.replace(
                msi_to_pan_weight=jnp.zeros_like(sh0.msi_to_pan_weight),
                msi_to_pan_bias=jnp.zeros_like(sh0.msi_to_pan_bias),
            ))
        self._steps = {}
        self._low_occupancy_checks = 0
        self._ee_flip_checks = 0
        self._clip_warned = False
        # [(iteration, seconds)] trace+compile+first-call wall time of each
        # freshly built step — the prewarm cache-hit telemetry
        self.step_build_times = []
        if self.early_exit_auto and self.raster_cfg.early_exit:
            # fresh scenes are translucent (opacity init ~0.05-0.2): start
            # with the exit off; the sat_frac auto-pick turns it on once
            # the scene converges to opaque coverage
            self.raster_cfg = dataclasses.replace(
                self.raster_cfg, early_exit=False
            )
        self.rng = np.random.RandomState(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.metrics_history = []
        return self

    def _modalities(self):
        num_views = len(self.modal_views[0][1])
        mods = []
        for i, (name, _) in enumerate(self.modal_views):
            pan_mode = self.pan_mode if name == "pan" else None
            idx_off = 0 if (self._share_cc or i == 0) else i * num_views
            mods.append((name, self.consts_by_modality[name], pan_mode, idx_off))
        return tuple(mods)

    def _get_step(self, phase: Phase):
        if phase not in self._steps:
            if self.raster_backend == "a2a":
                assert self.mesh is not None, "a2a backend needs a mesh"
                assert self.cfg.optimization.views_per_step <= 1, (
                    "a2a backend: vmap over views would nest shard_map"
                )
            self._steps[phase] = make_train_step(
                self._modalities(),
                self.cfg,
                self.raster_cfg,
                phase,
                self.gauss_tx,
                self.cam_tx,
                spatial_lr_scale=self.scene.cameras_extent,
                mesh=self.mesh,
                raster_backend=self.raster_backend,
            )
        return self._steps[phase]

    def probe_capacities(self, big_k: int = 0, slack: float = 1.2,
                         sample_views: int = 0) -> "RasterizeConfig":
        """Size the rasterizer capacities from the CURRENT state's
        preprocess — no rasterization, no big compiles (preprocess is a
        few ms): per-camera tiles_touched histograms pick the JOINT
        (tcap, big_k, big_tcap) minimizing total emission-table rows
        (N*tcap + big_k*big_tcap) with zero clipping, and tile_capacity
        (densest tile via a 2-D difference-array rect count). The
        frozen-caps analog of the CUDA dynamic buffer resize
        (rasterizer_impl.cu:280-288) — round 4 learned the hard way that
        guessing caps from a previous run's trajectory silently clips
        millions of pairs at iter 50, and a FIXED big_k guess fails the
        other way: a dense init (mean ~13 tiles/splat at reference scale)
        pushes bulk tcap to 64 and the 86M-row table out of HBM. big_k=0
        (default) searches; a nonzero value pins the big tier size.
        Returns the updated config (also installed on self)."""
        from eogs2_tpu.ops.binning import grid_dims
        from eogs2_tpu.ops.projection import (
            compute_cov2d_direct, preprocess_gaussians)

        p = self.state.params
        scaling = jnp.exp(p.scaling)
        opacity = jax.nn.sigmoid(p.opacity[:, 0])
        alive = self.state.aux.alive
        views = self.scene.train_views
        if sample_views:
            views = views[:sample_views]
        cull = self.raster_cfg.tile_cull
        max_tile = 0
        max_dest = 0
        max_tiles_g = np.zeros((p.xyz.shape[0],), np.int64)
        max_active_g = np.zeros((p.xyz.shape[0],), np.int64)
        for v in views:
            cam = v.camera
            w, h = cam.width, cam.height
            cov2d = compute_cov2d_direct(scaling, p.rotation, cam.affine,
                                         w, h)
            prep = preprocess_gaussians(p.xyz, None, opacity, cam.affine,
                                        w, h, alive=alive, cov2d=cov2d)
            gx, gy = grid_dims(w, h)
            rmin = np.asarray(prep.rect_min)
            rsz = np.asarray(prep.rect_size)
            tiles = np.asarray(prep.tiles_touched)
            max_tiles_g = np.maximum(max_tiles_g, tiles)
            if cull:
                act = _active_tiles_np(
                    rmin, rsz, tiles, np.asarray(prep.mean2d),
                    np.asarray(prep.conic), np.asarray(prep.opacity), gx,
                )
                max_active_g = np.maximum(max_active_g, act)
            # densest tile via 2-D difference array + cumsum (O(N + T))
            diff = np.zeros((gy + 1, gx + 1), np.int64)
            x0 = np.clip(rmin[:, 0], 0, gx)
            y0 = np.clip(rmin[:, 1], 0, gy)
            x1 = np.clip(rmin[:, 0] + rsz[:, 0], 0, gx)
            y1 = np.clip(rmin[:, 1] + rsz[:, 1], 0, gy)
            ok = tiles > 0
            np.add.at(diff, (y0[ok], x0[ok]), 1)
            np.add.at(diff, (y0[ok], x1[ok]), -1)
            np.add.at(diff, (y1[ok], x0[ok]), -1)
            np.add.at(diff, (y1[ok], x1[ok]), 1)
            counts = diff.cumsum(0).cumsum(1)[:gy, :gx]
            max_tile = max(max_tile, int(counts.max()))
            if self.raster_backend == "a2a" and self.mesh is not None:
                # per-(source chip, destination band) exchange-window
                # demand (VERDICT r4 weak #5: pow2 dest_cap slack is the
                # 8-device scaling cliff — the a2a recv buffer and band
                # sort are n_shards*dest_cap rows, so every wasted slot
                # is sorted). Conservative: rect rows unclamped by tcap.
                ms = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
                ns = int(ms.get("g", self.mesh.size))
                from eogs2_tpu.ops.projection import TILE as _TILE
                row_q = _TILE * ns
                hp = ((h + row_q - 1) // row_q) * row_q
                rows_pb = hp // _TILE // ns
                yl = np.clip(rmin[:, 1], 0, gy)
                yh = yl + np.clip(rsz[:, 1], 0, None)
                w_ok = np.where(ok, rsz[:, 0], 0)
                npad = (-len(tiles)) % ns
                for b in range(ns):
                    rows_in = np.clip(
                        np.minimum(yh, (b + 1) * rows_pb)
                        - np.maximum(yl, b * rows_pb), 0, None
                    )
                    pb = rows_in * w_ok
                    if npad:
                        pb = np.concatenate([pb, np.zeros(npad, pb.dtype)])
                    max_dest = max(
                        max_dest, int(pb.reshape(ns, -1).sum(1).max())
                    )

        def up(x, lo):
            c = lo
            while c < x:
                c <<= 1
            return c

        def upm(x, m):
            return max(m, ((int(x) + m - 1) // m) * m)

        # demand: what the bulk tcap must cover — ACTIVE tiles (post-cull)
        # when tile_cull is on (rect_cap then covers the AABB), rect tiles
        # otherwise. The big-tier SELECTION is always by rect tiles
        # (matching _emission_tabs's top_k), so sort by rect and track the
        # suffix maximum of the demand to know what any candidate bulk
        # set's tcap must be.
        demand_g = max_active_g if cull else max_tiles_g
        order = np.argsort(-max_tiles_g, kind="stable")
        srt = max_tiles_g[order]
        dem_sorted = demand_g[order]
        n = len(srt)
        suffix_dem = np.maximum.accumulate(dem_sorted[::-1])[::-1]
        # big_tcap: widest splat anywhere, multiple of 16 (not pow2 — at
        # 131k big-tier rows the pow2 jump 80->128 alone costs 6M table
        # rows); rebucket growth still doubles from here. Under culling
        # the big tier compacts too (big_rect_cap covers the AABB), so
        # its cap is sized by the widest ACTIVE count — a mid-training
        # 121-rect-tile outlier has ~3x fewer live tiles.
        big_rect = int(upm(np.ceil(srt[0] * slack), 16))
        if cull:
            big_tcap = int(upm(np.ceil(max(int(max_active_g.max()), 1)
                                       * slack), 16))
            big_tcap = min(big_tcap, big_rect)
        else:
            big_tcap = big_rect
        if big_k:
            big_k = min(big_k, n)
            tcap = up(int(np.ceil(suffix_dem[big_k] * slack))
                      if big_k < n else int(dem_sorted[-1]), 4)
        else:
            # joint search: for each candidate bulk tcap, the big tier
            # must hold every splat whose DEMAND would overflow it (with
            # slack applied, so early-training growth has headroom);
            # minimize total emission rows = sort cost, the dominant
            # stage (DESIGN section 10).
            best = None
            need = np.ceil(suffix_dem * slack)
            for tc in (4, 8, 12, 16, 24, 32, 48, 64, 96, 128):
                if tc >= big_tcap:
                    k_need = 0
                else:
                    # smallest k with suffix demand (slacked) <= tc:
                    # need is non-increasing, searchsorted on its negation
                    k_need = int(np.searchsorted(-need, -tc, side="left"))
                bk = 0 if k_need == 0 else min(up(k_need, 1024), n)
                rows = n * tc + bk * (big_tcap if bk else 0)
                if best is None or rows < best[0]:
                    best = (rows, tc, bk)
            _, tcap, big_k = best
            if not big_k:
                big_tcap = 0
        # hard row budget (OOM guard): an 86M-row table exceeded HBM at
        # compile (round 5); clamp the big tier's cap before that happens
        # and let the loud clip metric + reprobe catch the consequences.
        budget = self.probe_row_budget
        if n * tcap > budget:
            tcap = max(4, int(budget // n) // 4 * 4)
            print(f"probe: row budget {budget / 1e6:.0f}M clamps bulk "
                  f"tcap to {tcap} — expect clipping")
        if big_k and n * tcap + big_k * big_tcap > budget:
            fit = max(16, int((budget - n * tcap) // big_k) // 16 * 16)
            if fit < big_tcap:
                print(f"probe: row budget {budget / 1e6:.0f}M clamps "
                      f"big_tcap {big_tcap}->{fit} — the widest splats' "
                      f"tails will clip (counted in clipped_pairs)")
                big_tcap = fit
        kcap = upm(np.ceil(max_tile * slack), 512)
        rect_cap = 0
        if cull:
            if not big_k:
                bulk_rect = int(srt[0])  # bulk tier holds everyone
            elif big_k < n:
                bulk_rect = int(srt[big_k])  # widest splat outside top-k
            else:
                bulk_rect = 0  # every splat is in the big tier
            rc_need = int(np.ceil(bulk_rect * slack))
            if rc_need > tcap:
                rect_cap = upm(rc_need, 8)
        updates = dict(
            tile_capacity=kcap, max_tiles_per_gaussian=tcap, big_k=big_k,
            big_tcap=big_tcap, rect_cap=rect_cap,
            big_rect_cap=(big_rect if (cull and big_k
                                       and big_rect > big_tcap) else 0),
        )
        if max_dest:
            # tight multiple-of-128 window instead of a pow2 bucket: the
            # a2a recv buffer AND band sort are n_shards*dest_cap rows
            updates["dest_cap"] = _upm(np.ceil(max_dest * slack), 128)
        self.raster_cfg = dataclasses.replace(self.raster_cfg, **updates)
        self._steps = {}
        rows = n * tcap + big_k * big_tcap
        print(f"probed capacities: K={kcap} (densest tile {max_tile}), "
              f"tcap={tcap}, big=({big_k},{big_tcap}), "
              f"rect_cap={rect_cap}, "
              f"big_rect_cap={updates['big_rect_cap']}"
              + (f", dest_cap={updates['dest_cap']}" if max_dest else "")
              + f" (max splat {int(srt[0])} rect tiles, emission rows "
              f"{rows / 1e6:.1f}M)")
        return self.raster_cfg

    def next_buckets(self, rc=None):
        """The configs a single auto-rebucket grow event can produce: ONE
        capacity dimension stepped to its next bucket, using the exact
        growth rules of the rebucket check (so a prewarmed compile is a
        guaranteed cache hit when that grow fires)."""
        rc = rc or self.raster_cfg
        cands = [
            dataclasses.replace(
                rc, tile_capacity=_next_bucket(rc.tile_capacity)
            ),
            dataclasses.replace(
                rc,
                max_tiles_per_gaussian=_next_bucket(
                    rc.max_tiles_per_gaussian, lo=4
                ),
            ),
        ]
        if rc.big_k:
            cands.append(dataclasses.replace(
                rc, big_tcap=_next_bucket(rc.big_tcap, lo=16)
            ))
        if rc.rect_cap:
            cands.append(dataclasses.replace(
                rc, rect_cap=_next_bucket(rc.rect_cap, lo=8)
            ))
        return cands

    def prewarm_bucket_ladder(self, iteration: int = 1, steps_up: int = 1):
        """AOT-compile the train step at the capacity buckets a rebucket
        grow would produce, into the persistent compile cache (VERDICT r3
        item 5 / weak #3): the grow then costs a cache hit instead of a
        fresh multi-minute remote compile at scale. The trainer grows ONE
        dimension per event, so each single-dimension next bucket is
        prewarmed (not the all-dims-grown combo, which never matches).
        Uses the phase active at `iteration` and the CURRENT state's
        abstract shapes; call after setup() (and again after densify
        growth if the model capacity changed)."""
        phase = phase_for_iteration(self.cfg, iteration)
        saved_cfg, saved_steps = self.raster_cfg, self._steps
        try:
            frontier = [self.raster_cfg]
            seen = {self.raster_cfg}
            for _ in range(steps_up):
                nxt = []
                for base in frontier:
                    for rc in self.next_buckets(base):
                        if rc in seen:
                            continue
                        seen.add(rc)
                        nxt.append(rc)
                        self.raster_cfg = rc
                        self._steps = {}
                        step = self._get_step(phase)
                        absargs = jax.tree.map(
                            lambda x: jax.ShapeDtypeStruct(
                                jnp.asarray(x).shape, jnp.asarray(x).dtype
                            ),
                            (self.state, jnp.int32(0),
                             jax.random.PRNGKey(0),
                             make_gates(self.cfg, iteration,
                                        self.init_count)),
                        )
                        t0 = time.perf_counter()
                        step.lower(*absargs).compile()
                        print(
                            f"prewarmed bucket: K={rc.tile_capacity} "
                            f"tcap={rc.max_tiles_per_gaussian} "
                            f"big_tcap={rc.big_tcap} "
                            f"rect_cap={rc.rect_cap} "
                            f"({time.perf_counter() - t0:.1f}s)"
                        )
                frontier = nxt
        finally:
            self.raster_cfg, self._steps = saved_cfg, saved_steps

    def _maintenance(self, iteration: int):
        """Pruning / densification / opacity reset (train_pan.py:672-736)."""
        o = self.cfg.optimization
        st = self.state
        model = GaussianModel(params=st.params, aux=st.aux)
        if iteration < o.densify_until_iter:
            if o.only_prune:
                model = prune_transparent(model, o.min_opacity)
            else:
                d = o.densification
                if (
                    iteration > d.densify_from_iter
                    and iteration % d.densification_interval == 0
                ):
                    grads_avg = np.asarray(
                        model.aux.xyz_gradient_accum
                        / np.maximum(np.asarray(model.aux.denom), 1e-12)
                    )
                    grads_avg = jnp.asarray(np.nan_to_num(grads_avg))
                    mu, nu = st.g_opt.mu, st.g_opt.nu
                    model, mu, nu, _ = densify_clone(
                        model, mu, nu, grads_avg,
                        d.densify_grad_threshold, o.percent_dense,
                        self.scene.cameras_extent,
                    )
                    self.key, k = jax.random.split(self.key)
                    model, mu, nu, _ = densify_split(
                        model, mu, nu, grads_avg, k,
                        d.densify_grad_threshold, o.percent_dense,
                        self.scene.cameras_extent,
                    )
                    size_thr = 20 if iteration > o.opacity_reset_interval else None
                    kill = prune_mask(
                        model, 0.005, size_thr, self.scene.cameras_extent,
                        self.scene.cameras_extent,
                    )
                    model = apply_prune(model, kill)
                    model = reset_densification_stats(model)
                    st = st.replace(g_opt=st.g_opt._replace(mu=mu, nu=nu))
                model = prune_transparent(model, o.min_opacity)
        if (
            o.opacity_reset_interval >= 0
            and iteration % o.opacity_reset_interval == 0
            and iteration < o.iterend_opacity_reset_interval
        ):
            mu, nu = st.g_opt.mu, st.g_opt.nu
            model, mu, nu = reset_opacity_with_moments(model, mu, nu)
            st = st.replace(g_opt=st.g_opt._replace(mu=mu, nu=nu))
        self.state = self._place(st.replace(params=model.params, aux=model.aux))

    def apply_flowmatching_to_affine(self):
        """Bake the per-view mean gt->render flow into every camera affine
        (adjust_affine_from_flow, flow_matching_toaffine.py:28-92)."""
        from eogs2_tpu.flow import adjust_affine, phase_correlation_shift
        from eogs2_tpu.model import GaussianModel
        from eogs2_tpu.pipeline import render_view_full

        model = GaussianModel(params=self.state.params, aux=self.state.aux)
        wn, hn = self.consts.native_wh
        new_affines = []
        for vi, view in enumerate(self.scene.train_views):
            cam = view.camera.replace(affine=self.consts.affines[vi])
            out = render_view_full(
                model, cam, self.raster_cfg, shading=self.state.shading,
                view_idx=vi, with_sun=cam.has_sun,
                pan_mode=self.pan_mode,
            )
            gt = view.image
            if gt.shape[0] == 1 and self.cfg.model.repeat_gt:
                gt = np.repeat(gt, 3, axis=0)
            final = out["final"][: gt.shape[0]]
            dx, dy = phase_correlation_shift(
                jnp.asarray(gt), jnp.asarray(final)
            )
            a = adjust_affine(
                self.consts.affines[vi], wn, hn, float(dx), float(dy)
            )
            new_affines.append(a)
        self.consts = self.consts.replace(affines=jnp.stack(new_affines))
        # jitted steps closed over the old consts — rebuild them
        self._steps = {}

    def color_reset(self):
        """Reset always-in-shadow Gaussians (color_reset_op.py:41-88)."""
        from eogs2_tpu.color_ops import apply_color_reset, shadow_reset_mask
        from eogs2_tpu.model import GaussianModel
        from eogs2_tpu.pipeline import render_view_full

        model = GaussianModel(params=self.state.params, aux=self.state.aux)
        shadowmaps, uvs = [], []
        for vi, view in enumerate(self.scene.train_views):
            if not view.camera.has_sun:
                continue
            out = render_view_full(
                model, view.camera, self.raster_cfg, shading=self.state.shading,
                view_idx=vi, with_sun=True, pan_mode=self.pan_mode,
            )
            if out["shadowmap"] is None:
                continue
            shadowmaps.append(jnp.asarray(out["shadowmap"]))
            uvs.append(view.camera.ecef_to_uva(model.params.xyz)[:, :2])
        if not shadowmaps:
            return
        mask = shadow_reset_mask(jnp.stack(shadowmaps), jnp.stack(uvs))
        st = self.state
        model, mu, nu = apply_color_reset(model, st.g_opt.mu, st.g_opt.nu, mask)
        self.state = st.replace(
            params=model.params, g_opt=st.g_opt._replace(mu=mu, nu=nu)
        )

    def _host_event(self, i: int, iters: int) -> bool:
        """True when host-side work follows iteration i (a scan chunk may
        not run past it)."""
        o = self.cfg.optimization
        d = o.densification
        log = self.cfg.logging
        if i >= iters or i % 50 == 0 or i % log.tb_log_interval == 0:
            return True
        if self.eval_hook and i % log.testing_interval == 0:
            return True
        if (
            i < o.densify_until_iter
            and not o.only_prune
            and i > d.densify_from_iter
            and i % d.densification_interval == 0
        ):
            return True
        if (
            o.opacity_reset_interval >= 0
            and i % o.opacity_reset_interval == 0
            and i < o.iterend_opacity_reset_interval
        ):
            return True
        if i in (o.itr_apply_flowmatching_to_affine, o.color_reset_iterations):
            return True
        return i in self.cfg.checkpoint_iterations

    def train(self, max_iterations: Optional[int] = None, progress: bool = True):
        o = self.cfg.optimization
        iters = max_iterations or o.iterations
        es = o.early_stopping
        best = np.inf if es.operator == "min" else -np.inf
        patience_left = es.patience
        view_stack: list = []
        interval_metrics: list = []
        t0 = time.time()
        num_views = len(self.scene.train_views)
        spd = max(1, int(self.steps_per_dispatch))

        def pick_views():
            nonlocal view_stack
            vps = min(getattr(o, "views_per_step", 1), num_views)
            picked = []
            while len(picked) < vps:
                if not view_stack:
                    view_stack = list(self.rng.permutation(num_views))
                picked.append(int(view_stack.pop()))
            return picked[0] if vps == 1 else picked

        iteration = 0
        while iteration < iters:
            i0 = iteration + 1
            phase = phase_for_iteration(self.cfg, i0)
            fresh_step = phase not in self._steps
            step = self._get_step(phase)
            t_build = time.perf_counter() if fresh_step else 0.0
            span = 1
            while (
                span < spd
                and not self._host_event(i0 + span - 1, iters)
                and phase_for_iteration(self.cfg, i0 + span) == phase
            ):
                span += 1
            if span == 1:
                view_idx = pick_views()
                gates = make_gates(self.cfg, i0, self.init_count)
                self.key, k = jax.random.split(self.key)
                self.state, metrics = step(
                    self.state, jnp.asarray(view_idx, jnp.int32), k, gates
                )
            else:
                view_idxs = np.asarray(
                    [pick_views() for _ in range(span)], np.int32
                )
                gates_list = [
                    make_gates(self.cfg, i0 + s, self.init_count)
                    for s in range(span)
                ]
                gates_stack = {
                    gk: np.stack([g[gk] for g in gates_list])
                    for gk in gates_list[0]
                }
                prune_gates = np.asarray(
                    [
                        1.0 if (i0 + s) < o.densify_until_iter else 0.0
                        for s in range(span)
                    ],
                    np.float32,
                )
                keys = jax.random.split(self.key, span + 1)
                self.key = keys[0]
                self.state, metrics = step.chunk(
                    self.state, view_idxs, keys[1:], gates_stack, prune_gates
                )
            iteration = i0 + span - 1
            interval_metrics.append(metrics)
            if fresh_step:
                # compile telemetry (VERDICT r3 item 5): the first call of
                # a freshly-built step pays trace+compile; with the bucket
                # ladder prewarmed (prewarm_bucket_ladder) a rebucket
                # rebuild should report a persistent-cache hit here
                # (seconds, not minutes)
                dt = time.perf_counter() - t_build
                self.step_build_times.append((i0, dt))
                print(f"[{i0}] step build: trace+compile+first-call "
                      f"{dt:.1f}s (K={self.raster_cfg.tile_capacity}, "
                      f"tcap={self.raster_cfg.max_tiles_per_gaussian}, "
                      f"big_tcap={self.raster_cfg.big_tcap})")

            # loud capacity-overflow watch (VERDICT r3 item 5): clipped
            # pairs carry exactly-zero gradients, so a silent clip under
            # frozen capacities corrupts quality numbers invisibly. Checked
            # every 50 iterations whether or not rebucketing is on.
            if iteration % 50 == 0:
                nclip = float(
                    np.max(np.asarray(metrics.get("clipped_pairs", 0)))
                )
                if nclip > 0 and not self.auto_rebucket \
                        and not self._clip_warned:
                    rc = self.raster_cfg
                    print(
                        f"[{iteration}] WARNING: rasterizer clipped "
                        f"{int(nclip)} pairs this step with capacities "
                        f"FROZEN (auto_rebucket=False; tcap="
                        f"{rc.max_tiles_per_gaussian}, big_k={rc.big_k}, "
                        f"big_tcap={rc.big_tcap}, K={rc.tile_capacity}): "
                        f"their gradients are zero — grow capacities or "
                        f"enable auto_rebucket, quality numbers are "
                        f"suspect until clipped_pairs returns to 0"
                    )
                    self._clip_warned = True

            # capacity auto-rebucketing (the host-side analog of the CUDA
            # rasterizer's dynamic buffer resizing): when the densest tile or
            # widest tile rect approaches its static capacity, grow to the
            # next bucket and rebuild the compiled steps. Checked cheaply
            # every 50 iterations (each check syncs two scalars).
            if iteration % 50 == 0 and self.auto_rebucket:
                mt = float(np.max(np.asarray(metrics["max_tile"])))
                mtg = float(
                    np.max(np.asarray(metrics.get("max_tiles_per_gaussian", 0.0)))
                )
                rc = self.raster_cfg
                grew = None
                if mt >= 0.95 * rc.tile_capacity:
                    grew = dataclasses.replace(
                        rc, tile_capacity=_next_bucket(rc.tile_capacity)
                    )
                if mtg > rc.max_tiles_per_gaussian:
                    grew = dataclasses.replace(
                        grew or rc,
                        max_tiles_per_gaussian=_next_bucket(
                            rc.max_tiles_per_gaussian, lo=4
                        ),
                    )
                if rc.rect_cap:
                    # slot compaction: rect_cap must cover the widest
                    # non-big AABB; grow proactively at 0.95 headroom
                    # (beyond it, active tiles past rect_cap are never
                    # enumerated and count as clipped)
                    rmx = float(
                        np.max(np.asarray(metrics.get("bulk_rect_max", 0.0)))
                    )
                    if rmx >= 0.95 * rc.rect_cap:
                        grew = dataclasses.replace(
                            grew or rc,
                            rect_cap=_next_bucket(rc.rect_cap, lo=8),
                        )
                if rc.big_k:
                    # two-tier emission: the big tier has its own capacity
                    # (big_tcap vs the widest splat overall); the bulk
                    # check above already uses the widest NON-big splat
                    # (max_tiles_per_gaussian_seen excludes the top-K)
                    bmx = float(
                        np.max(np.asarray(metrics.get("big_max_tiles", 0.0)))
                    )
                    # proactive 0.95 headroom (ADVICE r4): reactive growth
                    # (bmx > cap) only fires after pairs were already
                    # clipped with zero gradients for up to a 50-iteration
                    # check interval; grow BEFORE the outliers hit the cap,
                    # same trigger shape as tile_capacity above.
                    if bmx >= 0.95 * rc.big_tcap:
                        grew = dataclasses.replace(
                            grew or rc,
                            big_tcap=_next_bucket(rc.big_tcap, lo=16),
                        )
                if self.raster_backend == "a2a":
                    # a2a per-destination exchange windows clip silently
                    # (zero gradients for dropped pairs) — grow dest_cap
                    # when the largest window nears it or pairs were
                    # actually dropped (the analog of the CUDA dynamic
                    # binning-buffer resize, rasterizer_impl.cu:284-288)
                    mdc = float(np.max(np.asarray(metrics["max_dest_count"])))
                    ndrop = float(
                        np.max(np.asarray(metrics["dropped_pairs"]))
                    )
                    if ndrop > 0 or mdc >= 0.95 * rc.dest_cap:
                        if ndrop > 0:
                            print(
                                f"[{iteration}] WARNING: a2a exchange "
                                f"dropped {int(ndrop)} pairs "
                                f"(dest window {int(mdc)} vs dest_cap "
                                f"{rc.dest_cap}); growing"
                            )
                        # 1.5x when pairs were actually dropped (mdc is
                        # clipped at the cap, true demand unknown), else a
                        # 1.3x-of-observed multiple-of-1024 step — pow2
                        # doubling was the measured 8-device slack cliff
                        # (DESIGN section 10a)
                        new_cap = (
                            _upm(rc.dest_cap * 1.5, 1024) if ndrop > 0
                            else _upm(np.ceil(mdc * 1.3), 1024)
                        )
                        if new_cap > rc.dest_cap:
                            grew = dataclasses.replace(
                                grew or rc, dest_cap=new_cap,
                            )
                if grew is None:
                    # catch-all: ANY clipping under auto_rebucket forces a
                    # reprobe, covering capacity dimensions without a
                    # dedicated 0.95-headroom trigger (e.g. rect overflow
                    # past big_rect_cap under big-tier compaction)
                    nclip_g = float(
                        np.max(np.asarray(metrics.get("clipped_pairs", 0)))
                    )
                    if nclip_g > 0 and self.reprobe_on_grow:
                        print(f"[{iteration}] {int(nclip_g)} clipped pairs "
                              f"under auto_rebucket — reprobing capacities")
                        grew = rc
                if grew is not None:
                    if self.reprobe_on_grow:
                        # re-size ALL capacities from the live state (the
                        # CUDA demand-resize analog,
                        # rasterizer_impl.cu:280-288) instead of stepping
                        # one pow2 bucket: pow2 doubling of a big tier
                        # with tens of thousands of rows walked the table
                        # toward HBM OOM during the early-training splat
                        # widening (big_tcap 96->512 in 200 iters,
                        # ROUND5_NOTES), while the probe re-balances big_k
                        # against big_tcap and keeps the table minimal.
                        # Slack 1.5 (vs 1.2 at init) so steady widening
                        # re-triggers every ~40% growth, not every 50 its.
                        saved_steps = self._steps
                        probed = self.probe_capacities(slack=1.5)
                        # never land below the single-dim growth floor the
                        # trigger asked for (probe covers the live maxima,
                        # but keep the invariant explicit)
                        self.raster_cfg = dataclasses.replace(
                            probed,
                            dest_cap=max(probed.dest_cap, grew.dest_cap),
                        )
                        if self.raster_cfg == rc:
                            # demand didn't move the config (e.g. the row
                            # budget clamps it): keep the compiled steps,
                            # don't churn rebuilds every check interval
                            self._steps = saved_steps
                            grew = None
                        else:
                            grew = self.raster_cfg
                if grew is not None:
                    print(
                        f"[{iteration}] rebucketing rasterizer capacities: "
                        f"K {rc.tile_capacity}->{grew.tile_capacity}, "
                        f"tiles/gauss {rc.max_tiles_per_gaussian}->"
                        f"{grew.max_tiles_per_gaussian}, "
                        f"big {rc.big_k}x{rc.big_tcap}->"
                        f"{grew.big_k}x{grew.big_tcap}, "
                        f"rect_cap {rc.rect_cap}->{grew.rect_cap}, "
                        f"dest_cap {rc.dest_cap}->{grew.dest_cap}"
                    )
                    self.raster_cfg = grew
                    self._steps = {}
                    self._low_occupancy_checks = 0
                    self._clip_warned = False
                else:
                    # shrink with hysteresis: splats widen transiently (the
                    # rect cap doubled 16->64 within 100 iters in measured
                    # runs) but pruning/opacity-reset brings them back, and
                    # the emission table + pair sort scale with N*tcap and
                    # the blend with K — a stuck-high bucket is a permanent
                    # throughput tax. Require 4 consecutive low checks (200
                    # iters) before halving one bucket; thresholds leave
                    # ~2x headroom after the shrink so grow/shrink can't
                    # flap. Recompiles hit the persistent .jax_cache.
                    low_t = (mt < 0.45 * rc.tile_capacity
                             and rc.tile_capacity > 128)
                    low_g = (mtg <= rc.max_tiles_per_gaussian // 2
                             and rc.max_tiles_per_gaussian > 4)
                    if low_t or low_g:
                        self._low_occupancy_checks += 1
                    else:
                        self._low_occupancy_checks = 0
                    if self._low_occupancy_checks >= 4:
                        shrunk = dataclasses.replace(
                            rc,
                            tile_capacity=(rc.tile_capacity // 2
                                           if low_t else rc.tile_capacity),
                            max_tiles_per_gaussian=(
                                rc.max_tiles_per_gaussian // 2
                                if low_g else rc.max_tiles_per_gaussian),
                        )
                        print(
                            f"[{iteration}] shrinking rasterizer capacities: "
                            f"K {rc.tile_capacity}->{shrunk.tile_capacity}, "
                            f"tiles/gauss {rc.max_tiles_per_gaussian}->"
                            f"{shrunk.max_tiles_per_gaussian}"
                        )
                        self.raster_cfg = shrunk
                        self._steps = {}
                        self._low_occupancy_checks = 0

                # early_exit auto-pick (DESIGN.md section 8c): the chunk
                # early exit only pays when pixels saturate (T < eps before
                # the tile's pair count runs out); on translucent scenes its
                # per-chunk sync is pure cost. Flip on observed saturation
                # with a hysteresis band + 2-consecutive-checks debounce.
                if self.early_exit_auto:
                    rc2 = self.raster_cfg
                    sat = float(np.mean(np.asarray(metrics["sat_frac"])))
                    want = sat > (0.35 if rc2.early_exit else 0.55)
                    if want != rc2.early_exit:
                        self._ee_flip_checks += 1
                    else:
                        self._ee_flip_checks = 0
                    if self._ee_flip_checks >= 2:
                        print(
                            f"[{iteration}] early_exit auto-pick: "
                            f"{rc2.early_exit}->{want} (saturation {sat:.2f})"
                        )
                        self.raster_cfg = dataclasses.replace(
                            rc2, early_exit=want
                        )
                        self._steps = {}
                        self._ee_flip_checks = 0

            self._maintenance(iteration)

            if iteration == o.itr_apply_flowmatching_to_affine:
                self.apply_flowmatching_to_affine()
                print("baked flow-matching shifts into camera affines")
            if iteration == o.color_reset_iterations:
                self.color_reset()
                print("color reset applied")

            if iteration % self.cfg.logging.tb_log_interval == 0:
                m = {
                    k: float(
                        np.mean(
                            np.concatenate(
                                [np.atleast_1d(np.asarray(x[k]))
                                 for x in interval_metrics]
                            )
                        )
                    )
                    for k in interval_metrics[0]
                }
                m["iteration"] = iteration
                m["alive"] = int(jnp.sum(self.state.aux.alive))
                m["it_per_s"] = self.cfg.logging.tb_log_interval / max(
                    time.time() - t0, 1e-9
                )
                t0 = time.time()
                interval_metrics = []
                self.metrics_history.append(m)
                if self.log_hook:
                    self.log_hook(self, m, iteration)
                elif progress and iteration % (10 * self.cfg.logging.tb_log_interval) == 0:
                    print(
                        f"[{iteration:6d}] loss={m['loss']:.4f} "
                        f"photo={m['photometric']:.4f} psnr={m['psnr']:.2f} "
                        f"alive={m['alive']} {m['it_per_s']:.1f} it/s",
                        flush=True,
                    )
                # early stopping (callback_utils.py:1-44: skip zero metric)
                if es.use_early_stopping:
                    val = m.get(es.metric_name, 0.0)
                    if val != 0.0:
                        better = val < best if es.operator == "min" else val > best
                        if better:
                            best = val
                            patience_left = es.patience
                        else:
                            patience_left -= 1
                        if patience_left <= 0:
                            print(f"early stopping at iteration {iteration}")
                            break

            if self.eval_hook and iteration % self.cfg.logging.testing_interval == 0:
                self.eval_hook(self, self.state, iteration)

            # full train/test render report (train_pan.py:598, 838-1025)
            if iteration in (self.cfg.logging.big_testing_iterations or ()):
                self.training_report(iteration)

            # mid-run model saves incl. cc->test at save time
            # (train_pan.py:622-660)
            if iteration in self.cfg.save_iterations:
                print(f"[ITER {iteration}] saving gaussians", flush=True)
                self.save_model(iteration)

            if iteration == iters and o.normalize_colors_before_saving:
                from eogs2_tpu.color_ops import normalize_colors_before_saving

                new_params, new_shading = normalize_colors_before_saving(
                    self.state.params, self.state.shading, reference_idx=0
                )
                self.state = self.state.replace(
                    params=new_params, shading=new_shading
                )
                print("baked reference color correction into Gaussian colors")

            if iteration in self.cfg.checkpoint_iterations:
                from eogs2_tpu.checkpoint import save_checkpoint

                path = os.path.join(
                    self.cfg.logging.model_path, f"chkpnt{iteration}"
                )
                save_checkpoint(path, self.state, iteration)
                print(f"checkpoint saved: {path}")

        return self.state

    def calibrate_opacity_init(self, target_acc: float = 0.999,
                               iters: int = 12) -> float:
        """Auto-calibrate opacity_init_value so the mean accumulated opacity
        of the first render is ~`target_acc` — automating the reference's
        empirical per-scene table (gaussian_model.py:190-197: e.g. JAX_068
        0.12@100k pts, 0.06@1M, 0.05@2M). Bisects on a single view render;
        returns the calibrated value (also applied to the model state)."""
        from eogs2_tpu.model import GaussianModel, init_from_points, inverse_sigmoid
        from eogs2_tpu.pipeline import render_view_full

        model = GaussianModel(params=self.state.params, aux=self.state.aux)
        cam = self.scene.train_views[0].camera

        def mean_acc(op_value):
            raw = float(np.log(op_value / (1.0 - op_value)))
            p = model.params.replace(
                opacity=jnp.full_like(model.params.opacity, raw)
            )
            m = model.replace(params=p)
            out = render_view_full(m, cam, self.raster_cfg, with_sun=False)
            return float(np.mean(out["acc_opacity"]))

        lo, hi = 1e-4, 0.9
        for _ in range(iters):
            mid = float(np.sqrt(lo * hi))  # log-space bisection
            if mean_acc(mid) < target_acc:
                lo = mid
            else:
                hi = mid
        value = float(np.sqrt(lo * hi))
        raw = float(np.log(value / (1.0 - value)))
        alive = self.state.aux.alive[:, None]
        new_op = jnp.where(alive, raw, self.state.params.opacity)
        self.state = self.state.replace(
            params=self.state.params.replace(opacity=new_op)
        )
        print(f"calibrated opacity_init_value = {value:.4f} "
              f"(mean acc opacity target {target_acc})")
        return value

    def save_model(self, iteration: Optional[int] = None) -> int:
        """Model save: point-cloud PLY + camera/shading parameters with the
        cc->test conversion applied at save time + optimizer state
        (train_pan.py:622-660). Runs at every cfg.save_iterations during
        training and from the CLI at the end of a run."""
        import orbax.checkpoint as ocp

        from eogs2_tpu.io import ply as plyio

        it = int(self.state.step) if iteration is None else int(iteration)
        model_path = self.cfg.logging.model_path
        os.makedirs(model_path, exist_ok=True)
        pc_dir = os.path.join(model_path, "point_cloud", f"iteration_{it}")
        alive = np.asarray(self.state.aux.alive)
        p = jax.tree.map(np.asarray, self.state.params)
        plyio.save_gaussians_ply(
            os.path.join(pc_dir, "point_cloud.ply"),
            p.xyz[alive], p.features_dc[alive], p.features_rest[alive],
            p.opacity[alive], p.scaling[alive], p.rotation[alive],
        )
        ckptr = ocp.StandardCheckpointer()
        ckpt_dir = os.path.join(model_path, "camera_params", f"iteration_{it}")
        ckptr.save(
            os.path.abspath(os.path.join(ckpt_dir, "shading")),
            dict(jax.tree.map(np.asarray, self.state.shading.__dict__)),
        )
        ckptr.wait_until_finished()
        ckptr.save(
            os.path.abspath(os.path.join(ckpt_dir, "shading_test")),
            dict(jax.tree.map(np.asarray, self.test_shading_params().__dict__)),
        )
        ckptr.wait_until_finished()
        opt_dir = os.path.join(model_path, "optimizer", f"iteration_{it}")
        adam = {
            "g_mu": jax.tree.map(np.asarray, dict(self.state.g_opt.mu.__dict__)),
            "g_nu": jax.tree.map(np.asarray, dict(self.state.g_opt.nu.__dict__)),
            "c_mu": jax.tree.map(np.asarray, dict(self.state.c_opt.mu.__dict__)),
            "c_nu": jax.tree.map(np.asarray, dict(self.state.c_opt.nu.__dict__)),
        }
        # orbax refuses zero-size arrays (e.g. features_rest at sh_degree 0)
        adam = {
            grp: {k: v for k, v in d.items()
                  if v is not None and getattr(v, "size", 1) > 0}
            for grp, d in adam.items()
        }
        ckptr.save(os.path.abspath(os.path.join(opt_dir, "adam")), adam)
        ckptr.wait_until_finished()
        return it

    def training_report(self, iteration: int, logger=None, max_images: int = 5):
        """Full train/test evaluation report (training_report,
        train_pan.py:838-1025): renders EVERY train and test camera through
        the full shading pipeline (test cameras use the cc->test
        conversion), logs per-modality L1/PSNR scalars and up to
        `max_images` rendered images per split, and — when a MaeComputer is
        attached as self.mae_computer — logs the registered DSM and the
        |diff| map of the Nadir render. Driven by
        cfg.logging.big_testing_iterations."""
        from eogs2_tpu.model import GaussianModel
        from eogs2_tpu.pipeline import render_view_full

        logger = logger if logger is not None else getattr(self, "report_logger", None)
        model = GaussianModel(params=self.state.params, aux=self.state.aux)
        test_sh = self.test_shading_params()
        report = {}
        num_views = len(self.modal_views[0][1])
        for split in ("train", "test"):
            sums = {}
            n_logged = 0
            for mi, (mname, tviews) in enumerate(self.modal_views):
                idx_off = 0 if (self._share_cc or mi == 0) else mi * num_views
                views = (
                    tviews if split == "train"
                    else [v for v in self.scene.test_views
                          if v.image_type == mname and not v.is_virtual]
                )
                for vi, view in enumerate(views):
                    if view.image is None:
                        continue
                    out = render_view_full(
                        model, view.camera, self.raster_cfg,
                        shading=(self.state.shading if split == "train"
                                 else test_sh),
                        view_idx=(vi + idx_off if split == "train" else 0),
                        with_sun=view.camera.has_sun,
                        pan_mode=self.pan_mode if mname == "pan" else None,
                    )
                    gt = np.clip(view.image, 0.0, 1.0)
                    img = np.asarray(out["final"])
                    c = min(img.shape[0], gt.shape[0])
                    h = min(img.shape[1], gt.shape[1])
                    w = min(img.shape[2], gt.shape[2])
                    img, gt = img[:c, :h, :w], gt[:c, :h, :w]
                    mse = float(np.mean((img - gt) ** 2))
                    l1, ps, n = sums.get(mname, (0.0, 0.0, 0))
                    sums[mname] = (
                        l1 + float(np.mean(np.abs(img - gt))),
                        ps + (-10.0 * np.log10(mse + 1e-12)),
                        n + 1,
                    )
                    if logger is not None and n_logged < max_images:
                        logger.log_image(
                            f"{split}_v_{view.name[:5]}_{mname}/render",
                            img, iteration,
                        )
                        logger.log_image(
                            f"{split}_v_{view.name[:5]}_{mname}/ground_truth",
                            gt, iteration,
                        )
                        n_logged += 1
            for mname, (l1, ps, n) in sums.items():
                if n:
                    report[f"{split}/l1_loss_{mname}"] = l1 / n
                    report[f"{split}/psnr_{mname}"] = ps / n

        # RDSM + |diff| figure vs lidar GT (train_pan.py:966-1023)
        mc = getattr(self, "mae_computer", None)
        if mc is not None:
            from eogs2_tpu.pipeline import evaluate_dsm_mae

            mae, _, diff, rdsm = evaluate_dsm_mae(
                model, self.scene, mc, self.raster_cfg
            )
            report["report/MAE"] = float(mae)
            if logger is not None:
                for tag, arr in (("RDSM", rdsm), ("abs_diff", np.abs(diff))):
                    a = np.asarray(arr, np.float32)
                    finite = np.isfinite(a)
                    lo = np.nanmin(a[finite]) if finite.any() else 0.0
                    hi = np.nanmax(a[finite]) if finite.any() else 1.0
                    norm = np.where(finite, (a - lo) / max(hi - lo, 1e-9), 0.0)
                    logger.log_image(f"report/{tag}", norm[None], iteration)
        if logger is not None:
            logger.log_scalars(report, iteration)
        if report:
            pretty = {k: round(v, 4) for k, v in report.items()}
            print(f"[ITER {iteration}] report: {pretty}", flush=True)
        return report

    def test_shading_params(self):
        """Shading parameters for test cameras: train cams' cc converted by
        the configured mode (convert_color_correction.py; 'average' default).
        Returns a CameraShadingParams whose single entry applies to any test
        view."""
        import jax.numpy as jnp

        mode = self.cfg.model.train_to_test_cc_converter
        sh = self.state.shading
        if mode == "ref":
            idx = 0
            w = sh.cc_weight[idx:idx + 1]
            b = sh.cc_bias[idx:idx + 1]
        else:  # average
            w = jnp.mean(sh.cc_weight, axis=0, keepdims=True)
            b = jnp.mean(sh.cc_bias, axis=0, keepdims=True)
        take1 = lambda x: x[:1]
        return sh.replace(
            cc_weight=w, cc_bias=b,
            inshadow=take1(sh.inshadow),
            last_row=jnp.zeros_like(take1(sh.last_row)),
            exposure=take1(sh.exposure),
            msi_to_pan_weight=take1(sh.msi_to_pan_weight),
            msi_to_pan_bias=take1(sh.msi_to_pan_bias),
            transient_mask=take1(sh.transient_mask),
        )

    def restore(self, path: str) -> int:
        """Resume from a checkpoint (gaussians.restore parity incl. Adam
        state, train_pan.py:122-124). Returns the saved iteration."""
        from eogs2_tpu.checkpoint import restore_checkpoint

        self.state, iteration = restore_checkpoint(path, self.state)
        self.state = self._place(self.state)
        return iteration
