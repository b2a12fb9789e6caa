"""VERDICT r4 #4: measure early_exit + n_contrib where they matter — a
SATURATING scene (most pixels' transmittance dies early), the reference's
normal operating point (converged scenes target acc-opacity 0.999,
gaussian_model.py:190-197). Both round-3/4 bench scenes are translucent
(opacity 0.10/0.7) so the CUDA-style early-exit machinery never showed its
worth on a recorded TPU number.

A/B at reference scale (1024², 1M gaussians): {translucent, saturating} x
{early_exit on, off}. The bwd n_contrib walk bound is always on (exact);
its benefit is implicit in the saturating rows.

Usage: ./tpurun.sh python scripts/prof_saturating.py [REPS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
N, W, H = 1_000_000, 1024, 1024


def make(opac_v, sigma_px):
    rng = np.random.RandomState(42)
    means = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
    means[:, 2] = -0.3 + 0.1 * rng.rand(N)
    scales = np.full((N, 3), sigma_px / W, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
    opac = np.full((N,), opac_v, np.float32)
    rgb = rng.uniform(0.2, 0.9, (N, 3)).astype(np.float32)
    affine = np.array([[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0],
                       [0, 0, 1.0, 0.0]], np.float32)
    alt = means @ affine[2, :3] + affine[2, 3]
    feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
    bg = np.array([0, 0, 0, -1, 0], np.float32)
    import jax.numpy as jnp
    return [jnp.asarray(x) for x in (means, scales, quats, opac, feat,
                                     affine, bg)]


def run(args, ee, label):
    cfg = RasterizeConfig(binning_mode="fused", tile_capacity=4096,
                          tile_chunk=256, max_tiles_per_gaussian=16,
                          early_exit=ee, eogs_features=True)

    def loss(means, scales, quats, opac, feat, affine):
        out = rasterize(means, scales, quats, opac, feat, affine, args[6],
                        W, H, cfg)
        return (jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t),
                (out.num_pairs, jnp.mean((out.final_t < 1e-4)
                                         .astype(jnp.float32))))

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                   has_aux=True))
    (v, (npair, sat)), g = f(*args[:6])
    jax.block_until_ready(g)
    float(v)
    t0 = time.perf_counter()
    for _ in range(REPS):
        (v, aux), g = f(*args[:6])
    jax.block_until_ready(g)
    float(v)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label} early_exit={int(ee)}: {dt * 1e3:.1f} ms = "
          f"{W * H / dt / 1e6:.2f} Mrays/s  (pairs {int(npair) / 1e6:.2f}M, "
          f"sat_frac {float(sat):.3f})")
    return dt


# translucent: the round-4 scale scene (opacity 0.10, ~2.4M pairs)
tr_scene = make(0.10, 2.4)
# saturating: opaque converged ground — high opacity, 4x pair density so
# ~10-30 splats cover each pixel and T dies in the first chunks
sat_scene = make(0.92, 5.0)

for label, scn in (("translucent", tr_scene), ("saturating ", sat_scene)):
    d_off = run(scn, False, label)
    d_on = run(scn, True, label)
    print(f"{label}: early-exit speedup {d_off / d_on:.2f}x")
