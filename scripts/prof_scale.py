"""Reference-scale throughput: 1M gaussians at 1 MPix (the scene scale the
reference actually operates at — dataset_affine.py:271-276 inits 0.13/m^3
~ 1-2M points; images are ~1 MPix). VERDICT round-2 item 5.

Usage: ./tpurun.sh python scripts/prof_scale.py [N [W [TCAP [KCAP [KCHUNK]]]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W = H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
TCAP = int(sys.argv[3]) if len(sys.argv) > 3 else 4
KCAP = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
KCHUNK = int(sys.argv[5]) if len(sys.argv) > 5 else 128

rng = np.random.RandomState(42)
means = rng.uniform(-0.95, 0.95, (N, 3)).astype(np.float32)
means[:, 2] = -0.3 + 0.1 * rng.rand(N)
# scale so avg pairs/tile lands near reference density (~2-6k/tile @1MPix):
# sigma_px ~ 1.2 at 1024 canvas
scales = np.full((N, 3), 2.4 / W, np.float32)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), 0.10, np.float32)  # fresh-init-like translucency
rgb = rng.uniform(0.2, 0.9, (N, 3)).astype(np.float32)
affine = np.array(
    [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
    np.float32,
)
alt = means @ affine[2, :3] + affine[2, 3]
feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
bg = np.array([0, 0, 0, -1, 0], np.float32)
args = [jnp.asarray(x) for x in (means, scales, quats, opac, feat, affine, bg)]
CFG = RasterizeConfig(tile_capacity=KCAP, tile_chunk=KCHUNK,
                      max_tiles_per_gaussian=TCAP, binning_mode="fused")


def timeit(name, f, reps=5):
    @jax.jit
    def run(z):
        def body(i, acc):
            return acc + f(acc * 1e-30 + z)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def f_fwd(z):
    out = rasterize(args[0] + z, *args[1:5], args[5], args[6], W, H, CFG)
    return jnp.sum(out.image)


def f_fwdbwd(z):
    def loss(m, s, q, o_, f_):
        out = rasterize(m, s, q, o_, f_, args[5], args[6], W, H, CFG)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
        args[0] + z, *args[1:5]
    )
    return v + sum(jnp.sum(x) for x in g)


out0 = jax.jit(lambda: rasterize(*args[:5], args[5], args[6], W, H, CFG))()
print(
    f"device={jax.devices()[0].platform} N={N} {W}x{H} tcap={TCAP} "
    f"kcap={KCAP} pairs={int(out0.num_pairs)} max_tile={int(out0.max_tile_count)} "
    f"maxtpg={int(out0.max_tiles_per_gaussian_seen)}",
    flush=True,
)
t_f = timeit("SCALE fused fwd", f_fwd)
t_fb = timeit("SCALE fused fwd+bwd", f_fwdbwd)
print(f"=> {W * H / t_fb / 1e6:.2f} Mrays/s fwd+bwd @scale", flush=True)
