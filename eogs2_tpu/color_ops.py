"""Color maintenance operations.

Parity targets:
  * color_reset (densification_pruning/color_reset_op.py:41-88): render all
    train views, 5x5 min-pool each shadow map, sample at the Gaussians'
    projected UV; Gaussians in shadow everywhere get color/opacity/scale
    reset and their Adam moments zeroed.
  * normalize_before_saving (utils/save_utils.py:10-34): bake the reference
    camera's color correction into the Gaussian colors and re-express every
    camera's cc relative to it.
  * cc train->test conversion (utils/convert_color_correction.py): copy the
    reference cc, or the average of train cams' cc, onto test cameras.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eogs2_tpu.ops.resample import grid_sample
from eogs2_tpu.ops.sh import RGB2SH, SH2RGB


def min_pool_5x5(x):
    """1 - maxpool(1-x) with 5x5 window, stride 1, pad 2."""
    neg = -jax.lax.reduce_window(
        -x[None, None], -jnp.inf, jax.lax.max, (1, 1, 5, 5), (1, 1, 1, 1),
        [(0, 0), (0, 0), (2, 2), (2, 2)],
    )[0, 0]
    return neg


def shadow_reset_mask(shadowmaps, proj_uvs):
    """[V,H,W] shadow maps + [V,N,2] per-view Gaussian UVs -> [N] bool mask
    of Gaussians always in deep shadow."""
    def one(shadow, uv):
        pooled = min_pool_5x5(shadow)
        samp = grid_sample(pooled[None], uv[None, :, :], align_corners=True)[0, 0]
        return samp < 0.5

    per_view = jax.vmap(one)(shadowmaps, proj_uvs)  # [V,N]
    return jnp.all(per_view, axis=0)


def apply_color_reset(model, adam_mu, adam_nu, to_reset):
    """Reset color to 1.1, opacity to 0.005, scale to 1/400; zero the
    affected Adam moments (color_reset_op.py:64-88)."""
    from eogs2_tpu.model import inverse_sigmoid

    p = model.params
    to_reset = to_reset & model.aux.alive
    m1 = to_reset[:, None]
    m2 = to_reset[:, None, None]
    new_op = jnp.where(m1, inverse_sigmoid(jnp.float32(0.005)), p.opacity)
    new_dc = jnp.where(m2, RGB2SH(jnp.float32(1.1)), p.features_dc)
    new_sc = jnp.where(m1, jnp.log(jnp.float32(1.0 / 400)), p.scaling)
    params = p.replace(opacity=new_op, features_dc=new_dc, scaling=new_sc)

    def zero(mom, mask):
        return jnp.where(mask.reshape((-1,) + (1,) * (mom.ndim - 1)), 0.0, mom)

    adam_mu = adam_mu.replace(
        opacity=zero(adam_mu.opacity, to_reset),
        features_dc=zero(adam_mu.features_dc, to_reset),
        scaling=zero(adam_mu.scaling, to_reset),
    )
    adam_nu = adam_nu.replace(
        opacity=zero(adam_nu.opacity, to_reset),
        features_dc=zero(adam_nu.features_dc, to_reset),
        scaling=zero(adam_nu.scaling, to_reset),
    )
    return model.replace(params=params), adam_mu, adam_nu


def normalize_colors_before_saving(params, shading, reference_idx: int):
    """Bake the reference camera's cc into Gaussian colors; re-express every
    camera's cc relative to the reference (save_utils.py:10-34).

    Returns (new_params, new_shading)."""
    a1 = shading.cc_weight[reference_idx]
    b1 = shading.cc_bias[reference_idx]
    a1inv = jnp.linalg.inv(a1.astype(jnp.float64)).astype(jnp.float32)

    rgb = SH2RGB(params.features_dc)  # [N,1,3]
    normalized = jnp.einsum("ij,nkj->nki", a1, rgb) + b1
    new_params = params.replace(features_dc=RGB2SH(normalized))

    ai = shading.cc_weight  # [V,3,3]
    bi = shading.cc_bias  # [V,3]
    new_w = jnp.einsum("vij,jk->vik", ai, a1inv)
    new_b = bi - jnp.einsum("vij,j->vi", new_w, b1)
    return new_params, shading.replace(cc_weight=new_w, cc_bias=new_b)


def cc_train_to_test(shading, train_idx, test_idx, mode: str = "average",
                     reference_idx: int = 0):
    """Fill test cameras' cc from train cameras' (convert_color_correction.py).

    shading holds stacked params for train+test views; train_idx/test_idx are
    integer index arrays into the view axis."""
    if mode == "ref":
        w = shading.cc_weight[reference_idx]
        b = shading.cc_bias[reference_idx]
    elif mode == "average":
        w = jnp.mean(shading.cc_weight[train_idx], axis=0)
        b = jnp.mean(shading.cc_bias[train_idx], axis=0)
    else:
        raise NotImplementedError(mode)
    cc_w = shading.cc_weight.at[test_idx].set(w)
    cc_b = shading.cc_bias.at[test_idx].set(b)
    return shading.replace(cc_weight=cc_w, cc_bias=cc_b)
