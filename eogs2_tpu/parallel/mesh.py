"""Device-mesh scaling for the EOGS training step.

The reference is strictly single-GPU (SURVEY.md section 2.3); this module is
the all-new multi-chip design:

  axes of parallelism for this workload (the transformer tp/pp/dp/sp/ep
  checklist maps onto splatting as follows):
  * "d" (data): independent views/cameras per step — classic DP; view
    gradients all-reduce (psum) over "d".
  * "g" (gaussian): the model's N dimension — the tensor-parallel analog.
    Preprocess, parameter storage and optimizer state shard over "g".
  * tile/pixel sharding — the sequence-parallel analog — lives *inside* the
    rasterizer: pairs are exchanged to tile owners (all_to_all) and each
    chip blends its tile band (parallel/sharded_raster.py).
  * pipeline/expert parallelism have no referent here (no layer stack, no
    experts); depth is 1 render.

Two implementations are provided:
  1. `shard_params` + jit-with-shardings: annotate the Gaussian SoA over "g"
     and the per-view stacks over "d", let XLA/GSPMD partition the existing
     single-chip step. Sorting gathers — correct everywhere, scaling limited
     by the sort. This is the robust fallback path.
  2. shard_map pair-exchange rasterizer (sharded_raster.py) — the scalable
     path with explicit all_to_all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("g",)) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        # favor gaussian sharding; data axis gets the small factor
        d = 1
        for cand in (2, 4):
            if n % cand == 0 and n // cand >= 2:
                d = cand
        shape = (d, n // d)
    else:
        raise ValueError(axes)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def gauss_sharding(mesh: Mesh, axis: str = "g") -> NamedSharding:
    """Shard the leading (N) dim of Gaussian arrays over the gauss axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_gaussian_state(state, mesh: Mesh, axis: str = "g"):
    """Place a TrainState's Gaussian-N-major arrays on the gauss axis and
    replicate everything else. Works under multi-process meshes too (host-
    replicated state in, process-spanning global arrays out)."""
    from eogs2_tpu.parallel.distributed import make_global_array

    def place_params(p):
        return make_global_array(p, mesh, P(axis))

    def place_rep(p):
        return make_global_array(p, mesh, P())

    params = jax.tree.map(place_params, state.params)
    aux = jax.tree.map(place_params, state.aux)
    g_opt = jax.tree.map(
        lambda x: place_params(x) if getattr(x, "ndim", 0) >= 1 and x.shape[:1] == (state.params.xyz.shape[0],) else place_rep(x),
        state.g_opt,
    )
    shading = jax.tree.map(place_rep, state.shading)
    c_opt = jax.tree.map(place_rep, state.c_opt)
    return state.replace(
        params=params, aux=aux, g_opt=g_opt, shading=shading, c_opt=c_opt,
        step=place_rep(state.step),
    )
