"""Fixed-capacity Gaussian SoA model state.

Parity target: ``scene/gaussian_model.py`` in the reference, whose design is
dictated by CUDA/torch: densify/prune reallocate tensors and perform optimizer
-state surgery (gaussian_model.py:451-539). On TPU every shape must be static,
so the model is a fixed-capacity structure-of-arrays with an ``alive`` mask:

  * prune      -> alive[i] = False
  * clone/split-> masked writes into free slots, Adam moments zeroed there
                  (reproducing cat_tensors_to_optimizer's zero-init exactly)
  * reset      -> masked in-place parameter writes + moment zeroing

Nothing ever reshapes, so the jitted train step never recompiles.

Activations (gaussian_model.py:34-53): scaling=exp, opacity=sigmoid,
rotation handed to the rasterizer raw (the reference normalizes in
get_rotation but the CUDA kernel receives the *unnormalized* quaternion and
skips normalization, forward.cu:126 — we match the kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from eogs2_tpu.ops.sh import RGB2SH


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) optimizable parameters, capacity-padded."""

    xyz: jnp.ndarray  # [Nmax,3]
    features_dc: jnp.ndarray  # [Nmax,1,3] SH DC coefficients
    features_rest: jnp.ndarray  # [Nmax,R,3] higher SH bands (R may be 0)
    scaling: jnp.ndarray  # [Nmax,3] log-scales
    rotation: jnp.ndarray  # [Nmax,4] raw quaternions
    opacity: jnp.ndarray  # [Nmax,1] logit-opacities


@struct.dataclass
class GaussianAux:
    """Non-optimized per-Gaussian state."""

    alive: jnp.ndarray  # [Nmax] bool
    max_radii2d: jnp.ndarray  # [Nmax] float
    xyz_gradient_accum: jnp.ndarray  # [Nmax] float (sum of |grad_ndc|)
    denom: jnp.ndarray  # [Nmax] float (visibility counts)


@struct.dataclass
class GaussianModel:
    params: GaussianParams
    aux: GaussianAux
    sh_degree: int = struct.field(pytree_node=False, default=0)

    # ---- activated views --------------------------------------------------

    @property
    def num_alive(self):
        return jnp.sum(self.aux.alive)

    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity[:, 0])

    def get_rotation_raw(self):
        return self.params.rotation

    def get_rgb(self):
        from eogs2_tpu.ops.sh import SH2RGB

        return SH2RGB(self.params.features_dc[:, 0, :])

    def capacity(self) -> int:
        return self.params.xyz.shape[0]


def init_from_points(
    xyz: np.ndarray,
    rgb: np.ndarray,
    capacity: int,
    sh_degree: int = 0,
    opacity_init_value: float = 0.01,
    mean_knn_dist2=None,
) -> GaussianModel:
    """create_from_pcd parity (gaussian_model.py:159-221).

    Scale init = log(sqrt(clamp(mean 3-NN squared distance, 1e-7))), isotropic;
    rotation = identity quaternion; opacity = logit(opacity_init_value).

    Args:
      xyz: [N,3] float initial points.
      rgb: [N,3] float colors in [0,1] (the EOGS init uses 1.1 -> SH dc).
      capacity: Nmax >= N; slots [N:] start dead.
      mean_knn_dist2: optional precomputed [N] mean squared 3-NN distance
        (simple-knn distCUDA2 equivalent); computed here if None.
    """
    n = xyz.shape[0]
    assert capacity >= n, (capacity, n)
    if mean_knn_dist2 is None:
        from eogs2_tpu.ops.knn import mean_knn_dist2 as knn_fn

        mean_knn_dist2 = np.asarray(knn_fn(jnp.asarray(xyz, jnp.float32)))
    dist2 = np.maximum(np.asarray(mean_knn_dist2), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    v = float(opacity_init_value)
    opac = np.full((n, 1), np.log(v / (1.0 - v)), np.float32)
    n_rest = (sh_degree + 1) ** 2 - 1

    params = GaussianParams(
        xyz=pad(xyz.astype(np.float32)),
        features_dc=pad(np.asarray(RGB2SH(rgb))[:, None, :].astype(np.float32)),
        features_rest=jnp.zeros((capacity, n_rest, 3), jnp.float32),
        scaling=pad(scales.astype(np.float32), fill=-10.0),
        rotation=pad(rots).at[n:, 0].set(1.0),
        opacity=pad(opac, fill=-10.0),
    )
    alive = jnp.zeros((capacity,), bool).at[:n].set(True)
    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return GaussianModel(params=params, aux=aux, sh_degree=sh_degree)


def reset_opacity(model: GaussianModel) -> GaussianModel:
    """opacity <- min(opacity, 0.01) on alive Gaussians
    (gaussian_model.py:347-352). The caller must also zero the opacity Adam
    moments (replace_tensor_to_optimizer zeroes them)."""
    op = model.get_opacity()
    new_raw = inverse_sigmoid(jnp.minimum(op, 0.01))[:, None]
    new_op = jnp.where(model.aux.alive[:, None], new_raw, model.params.opacity)
    return model.replace(params=model.params.replace(opacity=new_op))


def add_densification_stats(model: GaussianModel, grad_ndc, radii) -> GaussianModel:
    """Accumulate ||dL/dmean2d_ndc||_2 for visible Gaussians
    (gaussian_model.py:719-723) and track max screen radius
    (train_pan.py:683-686)."""
    visible = radii > 0
    norm = jnp.linalg.norm(grad_ndc[:, :2], axis=-1)
    aux = model.aux
    aux = aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(visible, norm, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(aux.max_radii2d, jnp.where(visible, radii.astype(jnp.float32), 0.0)),
    )
    return model.replace(aux=aux)
