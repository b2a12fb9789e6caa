"""Checkpoint / resume.

Parity target: the reference's three mechanisms (SURVEY.md section 5.4):
  (a) training checkpoints: torch.save((gaussians.capture(), iteration)) at
      checkpoint_iterations, restored incl. Adam state
      (gaussian_model.py:73-107, train_pan.py:122-124, 799-807)
  (b) model saves: point-cloud PLY + camera modules + optimizer states
  (c) render-stage reload by max iteration.

Here a single orbax checkpoint captures the FULL TrainState (Gaussian params
+ aux masks + shading params + both Adam states + step), device-count
independent (arrays are saved unsharded and re-placed on restore).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _state_to_pytree(state):
    return {
        "params": dict(state.params.__dict__),
        "aux": dict(state.aux.__dict__),
        "shading": dict(state.shading.__dict__),
        "g_opt": {
            "count": state.g_opt.count,
            "mu": dict(state.g_opt.mu.__dict__),
            "nu": dict(state.g_opt.nu.__dict__),
        },
        "c_opt": {
            "count": state.c_opt.count,
            "mu": dict(state.c_opt.mu.__dict__),
            "nu": dict(state.c_opt.nu.__dict__),
        },
        "step": state.step,
    }


def save_checkpoint(path: str, state, iteration: int):
    import orbax.checkpoint as ocp

    tree = jax.tree.map(np.asarray, _state_to_pytree(state))
    tree["iteration"] = np.int64(iteration)
    # orbax rejects zero-size arrays (e.g. features_rest at sh_degree=0);
    # drop them — restore rebuilds from the state template.
    tree = jax.tree.map(
        lambda x: None if getattr(x, "size", 1) == 0 else x,
        tree,
        is_leaf=lambda x: isinstance(x, np.ndarray),
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (capacity must match)."""
    import optax
    import orbax.checkpoint as ocp

    from eogs2_tpu.model import GaussianAux, GaussianParams
    from eogs2_tpu.shading import CameraShadingParams

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))

    tmpl = _state_to_pytree(state)

    def merge(saved: dict, template: dict) -> dict:
        """Fill zero-size arrays (dropped at save) back from the template."""
        out = {}
        for k, tv in template.items():
            sv = saved.get(k)
            out[k] = jnp.asarray(tv if sv is None else sv)
        return out

    params = GaussianParams(**merge(tree["params"], tmpl["params"]))
    aux = GaussianAux(**merge(tree["aux"], tmpl["aux"]))
    shading = CameraShadingParams(**merge(tree["shading"], tmpl["shading"]))
    g_opt = optax.ScaleByAdamState(
        count=jnp.asarray(tree["g_opt"]["count"]),
        mu=GaussianParams(**merge(tree["g_opt"]["mu"], tmpl["g_opt"]["mu"])),
        nu=GaussianParams(**merge(tree["g_opt"]["nu"], tmpl["g_opt"]["nu"])),
    )
    c_opt = optax.ScaleByAdamState(
        count=jnp.asarray(tree["c_opt"]["count"]),
        mu=CameraShadingParams(
            **{k: jnp.asarray(v) for k, v in tree["c_opt"]["mu"].items()}
        ),
        nu=CameraShadingParams(
            **{k: jnp.asarray(v) for k, v in tree["c_opt"]["nu"].items()}
        ),
    )
    new_state = state.replace(
        params=params, aux=aux, shading=shading, g_opt=g_opt, c_opt=c_opt,
        step=jnp.asarray(tree["step"]),
    )
    return new_state, int(tree["iteration"])
