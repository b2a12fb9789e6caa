"""Per-camera shading pipeline: color correction -> sun shadow -> MSI->PAN.

Parity targets:
  * AffineCamera.render_pipeline (affine_cameras.py:303-348): 1x1-conv color
    correction initialized to identity, shadow map exp(0.4*min(diff,0))
    (ShadowMap, affine_cameras.py:33-40), shadow composite
    shaded = s*cc + (1-s)*inshadow*cc.
  * PANAffineCamera (PAN_affine_cameras.py): msi_to_pan applied after the
    shadow composite ("normal") or before cc with 1-channel cc ("weird"
    setup, PAN_affine_cameras.py:44-63,148-176).
  * MSI->PAN family (scene/msi_to_pan/transf_msi_to_pan.py): fixed WV3
    spectral weights, average, identity, only_one_channel, learnable conv,
    fixed+learnable residual.

All per-camera learnables are stacked arrays indexed by camera id so a single
jitted train step serves every view (vs. the reference's per-camera
nn.Modules), optimized by one optax chain with its own learning rate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Fixed WorldView-3 spectral weights (transf_msi_to_pan.py:5-24):
# pan = w3 * (sum_c w[c] * msi_c + w4)
WV3_PAN_PARAMS = (0.438469, 1.1331377, -0.6794343, 1.0, 0.0016913427)


@struct.dataclass
class CameraShadingParams:
    """Stacked per-view learnable shading parameters ([V, ...])."""

    cc_weight: jnp.ndarray  # [V,3,3] identity-initialized color matrix
    cc_bias: jnp.ndarray  # [V,3]
    inshadow: jnp.ndarray  # [V,3] in-shadow color scale (init 0.05)
    last_row: jnp.ndarray  # [V,4] learnable pose residual (init 0)
    exposure: jnp.ndarray  # [V,3,4] affine exposure (init [I|0])
    msi_to_pan_weight: jnp.ndarray  # [V,3] learnable spectral weights
    msi_to_pan_bias: jnp.ndarray  # [V] learnable offset
    transient_mask: jnp.ndarray = None  # [V,H,W] (or [V,1,1] when unused)


def init_shading_params(num_views: int, transient_hw=None,
                        transient_init: float = 0.01) -> CameraShadingParams:
    eye = jnp.eye(3, dtype=jnp.float32)
    t_shape = (num_views,) + (tuple(transient_hw) if transient_hw else (1, 1))
    return CameraShadingParams(
        transient_mask=jnp.full(t_shape, transient_init, jnp.float32),
        cc_weight=jnp.tile(eye[None], (num_views, 1, 1)),
        cc_bias=jnp.zeros((num_views, 3), jnp.float32),
        inshadow=jnp.full((num_views, 3), 0.05, jnp.float32),
        last_row=jnp.zeros((num_views, 4), jnp.float32),
        exposure=jnp.tile(jnp.eye(3, 4, dtype=jnp.float32)[None], (num_views, 1, 1)),
        msi_to_pan_weight=jnp.tile(
            jnp.asarray(WV3_PAN_PARAMS[:3], jnp.float32)[None], (num_views, 1)
        ),
        msi_to_pan_bias=jnp.full((num_views,), WV3_PAN_PARAMS[4], jnp.float32),
    )


def shadow_map(sun_altitude_diff):
    """exp(0.4 * clip(diff, max=0)) in (0, 1] (affine_cameras.py:33-40)."""
    return jnp.exp(0.4 * jnp.minimum(sun_altitude_diff, 0.0))


def apply_cc(img_chw, weight, bias):
    """1x1 conv color correction: out[c] = sum_k W[c,k] img[k] + b[c]."""
    return jnp.einsum("ck,khw->chw", weight, img_chw) + bias[:, None, None]


def apply_exposure(img_chw, exposure):
    """Affine exposure out = E[:, :3] @ img + E[:, 3] (affine_cameras.py:313-323)."""
    return jnp.einsum("ck,khw->chw", exposure[:, :3], img_chw) + exposure[:, 3][
        :, None, None
    ]


def msi_to_pan(img_chw, mode: str, weight=None, bias=None):
    """MSI (3ch) -> PAN (1ch) conversion family (transf_msi_to_pan.py).

    Modes: 'fixed' (WV3 weights), 'learned' (per-camera weight/bias),
    'average', 'identity', 'only_one_channel', 'fixedandtranslate'
    (stop-gradient fixed WV3 path + learnable residual conv,
    transf_msi_to_pan.py:134-178; residual initialized to zero so the output
    starts at the fixed conversion, vs. the reference's random conv init).
    """
    if mode == "identity":
        return img_chw
    if mode == "average":
        return jnp.mean(img_chw, axis=0, keepdims=True)
    if mode == "only_one_channel":
        return img_chw[:1]
    if mode == "fixedandtranslate":
        w = jnp.asarray(WV3_PAN_PARAMS[:3], img_chw.dtype)
        b = jnp.asarray(WV3_PAN_PARAMS[4], img_chw.dtype)
        fixed = jax.lax.stop_gradient(
            jnp.sum(w[:, None, None] * img_chw, axis=0, keepdims=True) + b
        )
        residual = (
            jnp.sum(weight[:, None, None] * img_chw, axis=0, keepdims=True) + bias
        )
        return fixed + residual
    if mode == "fixed":
        w = jnp.asarray(WV3_PAN_PARAMS[:3], img_chw.dtype)
        b = jnp.asarray(WV3_PAN_PARAMS[4], img_chw.dtype)
        scale = WV3_PAN_PARAMS[3]
    elif mode == "learned":
        w, b, scale = weight, bias, 1.0
    else:
        raise ValueError(f"unknown msi_to_pan mode: {mode}")
    return scale * (
        jnp.sum(w[:, None, None] * img_chw, axis=0, keepdims=True) + b
    )


def render_pipeline(
    raw_render,  # [3,H,W]
    sun_altitude_diff,  # [H,W] or None
    cc_weight,
    cc_bias,
    inshadow,
    use_cc: bool = True,
    use_shadow: bool = True,
    exposure=None,
    use_exposure: bool = False,
    pan_mode: str | None = None,
    pan_weight=None,
    pan_bias=None,
    weird_pan_setup: bool = False,
):
    """Full shading pipeline for one view. Returns dict like the reference's
    render_pipeline: shadowmap / cc / shaded / final."""
    if weird_pan_setup and pan_mode is not None:
        # PAN conversion first, then 1-channel cc (PAN_affine_cameras.py:148-176)
        pan = msi_to_pan(raw_render, pan_mode, pan_weight, pan_bias)
        cc = apply_cc(pan, cc_weight[:1, :1], cc_bias[:1]) if use_cc else pan
        if use_shadow and sun_altitude_diff is not None:
            s = shadow_map(sun_altitude_diff)
            shaded = s[None] * cc + (1.0 - s[None]) * inshadow[:1, None, None] * cc
        else:
            s = None
            shaded = cc
        return {"shadowmap": s, "cc": cc, "shaded": shaded, "final": shaded}

    if use_cc:
        cc = apply_cc(raw_render, cc_weight, cc_bias)
    elif use_exposure:
        cc = apply_exposure(raw_render, exposure)
    else:
        cc = raw_render

    if use_shadow and sun_altitude_diff is not None:
        s = shadow_map(sun_altitude_diff)
        shaded = s[None] * cc + (1.0 - s[None]) * inshadow[:, None, None] * cc
    else:
        s = None
        shaded = cc

    if pan_mode is not None:
        shaded = msi_to_pan(shaded, pan_mode, pan_weight, pan_bias)

    return {"shadowmap": s, "cc": cc, "shaded": shaded, "final": shaded}
