"""Densification / pruning / resets as masked fixed-capacity state updates.

Parity target: the reference's tensor-reallocating versions
(gaussian_model.py:451-723) and their optimizer-state surgery:
  * prune_points: drop rows + slice Adam moments      -> alive mask clear
  * densify_and_clone / densify_and_split: cat rows + zero new moments
                                                      -> write free slots,
                                                         zero moments there
  * reset_opacity: opacity<-min(op,0.01), zero opacity moments
  * only_prune path (train_pan.py:674-677): raw opacity < min_opacity (-6.0)

Everything is jittable with static shapes; Adam moment zeroing operates on
the optax state pytree passed alongside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eogs2_tpu.model import GaussianAux, GaussianModel, GaussianParams, inverse_sigmoid
from eogs2_tpu.ops.gaussians import quat_to_rotmat


def prune_transparent(model: GaussianModel, min_opacity_raw: float) -> GaussianModel:
    """only_prune path: kill Gaussians whose RAW (logit) opacity is below
    `min_opacity_raw` (train_pan.py:674-677 compares _opacity < -6.0)."""
    kill = model.params.opacity[:, 0] < min_opacity_raw
    alive = model.aux.alive & ~kill
    return model.replace(aux=model.aux.replace(alive=alive))


def prune_mask(model: GaussianModel, min_opacity: float, max_screen_size,
               scene_extent: float, screen_size_threshold: float):
    """densify_and_prune's prune criterion (gaussian_model.py:705-714):
    activated opacity < min_opacity, or too big on screen / in world."""
    op = model.get_opacity()
    mask = op < min_opacity
    if max_screen_size is not None:
        big_vs = model.aux.max_radii2d > max_screen_size
        big_ws = jnp.max(model.get_scaling(), axis=1) > 0.1 * screen_size_threshold
        mask = mask | big_vs | big_ws
    return mask & model.aux.alive


def apply_prune(model: GaussianModel, kill) -> GaussianModel:
    return model.replace(aux=model.aux.replace(alive=model.aux.alive & ~kill))


def _free_slot_targets(alive, want):
    """For each selected source i (want[i]), pick a distinct dead slot.

    Returns (slot_idx [N], ok [N]): ok[i] means a free slot was available.
    Deterministic: k-th selected source gets the k-th dead slot.
    """
    n = alive.shape[0]
    dead_rank = jnp.cumsum(~alive) - 1  # rank of each dead slot among dead
    # positions of dead slots in order: scatter idx by rank
    dead_pos = jnp.zeros((n,), jnp.int32).at[
        jnp.where(~alive, dead_rank, n)  # clip out alive
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    want_rank = jnp.cumsum(want) - 1
    n_dead = jnp.sum(~alive)
    ok = want & (want_rank < n_dead)
    slot = dead_pos[jnp.clip(want_rank, 0, n - 1)]
    return slot, ok


def _write_rows(params: GaussianParams, slot, ok, rows: GaussianParams) -> GaussianParams:
    """Scatter `rows` (aligned with slot/ok) into param arrays at `slot`."""

    def wr(dst, src):
        idx = jnp.where(ok, slot, dst.shape[0])  # drop not-ok
        return dst.at[idx].set(src, mode="drop")

    return jax.tree.map(wr, params, rows)


def densify_clone(model: GaussianModel, adam_mu, adam_nu, grads_avg,
                  grad_threshold: float, percent_dense: float, scene_extent: float):
    """Clone small high-gradient Gaussians into free slots
    (gaussian_model.py:625-659). New copies get identical parameters and
    zeroed Adam moments. Returns (model, mu, nu, n_cloned)."""
    sel = (
        (grads_avg >= grad_threshold)
        & (jnp.max(model.get_scaling(), axis=1) <= percent_dense * scene_extent)
        & model.aux.alive
    )
    slot, ok = _free_slot_targets(model.aux.alive, sel)
    new_params = _write_rows(model.params, slot, ok, model.params)
    alive = model.aux.alive.at[jnp.where(ok, slot, model.capacity())].set(
        True, mode="drop"
    )

    def zero_moments(m):
        idx = jnp.where(ok, slot, m.shape[0])
        return m.at[idx].set(0.0, mode="drop")

    adam_mu = jax.tree.map(zero_moments, adam_mu)
    adam_nu = jax.tree.map(zero_moments, adam_nu)
    aux = model.aux.replace(alive=alive)
    return model.replace(params=new_params, aux=aux), adam_mu, adam_nu, jnp.sum(ok)


def densify_split(model: GaussianModel, adam_mu, adam_nu, grads_avg, key,
                  grad_threshold: float, percent_dense: float, scene_extent: float,
                  n_split: int = 2):
    """Split large high-gradient Gaussians (gaussian_model.py:573-623):
    sample N=2 children at N(mean, Sigma), scale /= 0.8*N, original dies.

    Fixed-capacity version: child 0 overwrites the parent slot, child 1 goes
    to a free slot; both get zeroed moments (the reference also zeroes the
    parent's moments implicitly by pruning it and cat-ing two fresh rows)."""
    assert n_split == 2, "reference uses N=2"
    sel = (
        (grads_avg >= grad_threshold)
        & (jnp.max(model.get_scaling(), axis=1) > percent_dense * scene_extent)
        & model.aux.alive
    )
    p = model.params
    stds = model.get_scaling()
    # build_rotation in the reference normalizes the quaternion here
    # (utils/general_utils.py:88-110), unlike the rasterizer path.
    rotn = quat_to_rotmat(p.rotation / jnp.linalg.norm(p.rotation, axis=-1, keepdims=True))
    k1, k2 = jax.random.split(key)
    s1 = jax.random.normal(k1, p.xyz.shape) * stds
    s2 = jax.random.normal(k2, p.xyz.shape) * stds
    child_xyz1 = jnp.einsum("nij,nj->ni", rotn, s1) + p.xyz
    child_xyz2 = jnp.einsum("nij,nj->ni", rotn, s2) + p.xyz
    child_scaling = jnp.log(stds / (0.8 * n_split))

    # child 1 -> free slot
    slot, ok = _free_slot_targets(model.aux.alive, sel)
    rows = p.replace(xyz=child_xyz2, scaling=child_scaling)
    new_params = _write_rows(p, slot, ok, rows)
    # child 0 -> parent slot (only where the free-slot write succeeded, so a
    # failed split leaves the parent untouched rather than half-split)
    upd = ok

    def overwrite(dst, src):
        return jnp.where(
            upd.reshape((-1,) + (1,) * (dst.ndim - 1)), src, dst
        )

    new_params = new_params.replace(
        xyz=overwrite(new_params.xyz, child_xyz1),
        scaling=overwrite(new_params.scaling, child_scaling),
    )
    alive = model.aux.alive.at[jnp.where(ok, slot, model.capacity())].set(
        True, mode="drop"
    )

    def zero_moments(m):
        idx = jnp.where(ok, slot, m.shape[0])
        m = m.at[idx].set(0.0, mode="drop")
        return jnp.where(upd.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m)

    adam_mu = jax.tree.map(zero_moments, adam_mu)
    adam_nu = jax.tree.map(zero_moments, adam_nu)
    aux = model.aux.replace(alive=alive)
    return model.replace(params=new_params, aux=aux), adam_mu, adam_nu, jnp.sum(ok)


def reset_densification_stats(model: GaussianModel) -> GaussianModel:
    return model.replace(
        aux=model.aux.replace(
            xyz_gradient_accum=jnp.zeros_like(model.aux.xyz_gradient_accum),
            denom=jnp.zeros_like(model.aux.denom),
            max_radii2d=jnp.zeros_like(model.aux.max_radii2d),
        )
    )


def reset_opacity_with_moments(model: GaussianModel, adam_mu, adam_nu):
    """reset_opacity + zero the opacity Adam moments
    (gaussian_model.py:347-352 + replace_tensor_to_optimizer)."""
    from eogs2_tpu.model import reset_opacity

    model = reset_opacity(model)
    adam_mu = adam_mu.replace(opacity=jnp.zeros_like(adam_mu.opacity))
    adam_nu = adam_nu.replace(opacity=jnp.zeros_like(adam_nu.opacity))
    return model, adam_mu, adam_nu
