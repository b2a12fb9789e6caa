"""Stage-level timing of the rasterizer on the current device.

Times preprocess / binning / blend / full fwd / full fwd+bwd separately with
in-graph fori_loop repetition (the tunnelled chip's block_until_ready is not
a true sync; a value fetch is, and in-graph loops remove dispatch latency
from the measurement — DESIGN.md).

Usage: ./tpurun.sh python scripts/prof_raster.py [N [W]]
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
from eogs2_tpu.ops.gaussians import build_cov3d
from eogs2_tpu.ops.projection import preprocess_gaussians
from eogs2_tpu.ops.pair_pipeline import densify_pairs
from eogs2_tpu.ops.blend_pallas import blend_tiles_pallas, pack_tile_data
from eogs2_tpu.ops.binning import grid_dims

INTERP = jax.default_backend() == "cpu"  # pallas interpret mode off-TPU

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W = H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
TCAP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
KCAP = int(sys.argv[4]) if len(sys.argv) > 4 else 512
KCHUNK = int(sys.argv[5]) if len(sys.argv) > 5 else 64
REPS = 10

rng = np.random.RandomState(42)
means = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
means[:, 2] = -0.3 + 0.1 * rng.rand(N)
scales = np.full((N, 3), 0.006, np.float32)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), 0.7, np.float32)
rgb = rng.uniform(0.2, 0.9, (N, 3)).astype(np.float32)
affine = np.array(
    [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
    np.float32,
)
alt = means @ affine[2, :3] + affine[2, 3]
feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
bg = np.array([0, 0, 0, -1, 0], np.float32)
(means, scales, quats, opac, feat, affine, bg) = (
    jnp.asarray(x) for x in (means, scales, quats, opac, feat, affine, bg)
)
CFG = RasterizeConfig(
    tile_capacity=KCAP, tile_chunk=KCHUNK, max_tiles_per_gaussian=TCAP,
    binning_mode="sorted", use_pallas=True,
)


def timeit(name, f):
    """f(jitter_scalar) -> scalar; times REPS serialized in-graph calls."""

    @jax.jit
    def run(z):
        def body(i, acc):
            return acc + f(acc * 1e-30 + z)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


# --- stage inputs (computed once, treated as constants) ---
cov3d6 = build_cov3d(scales, quats)
prep0 = jax.jit(
    lambda: preprocess_gaussians(means, cov3d6, opac, affine, W, H)
)()
pd0 = jax.jit(
    lambda: densify_pairs(prep0, feat, W, H, CFG.max_tiles_per_gaussian,
                          CFG.tile_capacity)
)()
data0 = jax.jit(
    lambda: pack_tile_data(
        pd0.data[..., 0:2], pd0.data[..., 2:5], pd0.data[..., 5],
        pd0.data[..., 6:], pd0.mask
    )
)()
grid_x, _ = grid_dims(W, H)


def f_pre(z):
    p = preprocess_gaussians(means + z, cov3d6, opac, affine, W, H)
    return jnp.sum(p.mean2d) + jnp.sum(p.conic)


def f_pre_grad(z):
    def loss(m):
        p = preprocess_gaussians(m, build_cov3d(scales + z, quats), opac,
                                 affine, W, H)
        return jnp.sum(p.mean2d) + jnp.sum(p.conic)

    v, g = jax.value_and_grad(loss)(means + z)
    return v + jnp.sum(g)


def f_bin(z):
    p = prep0._replace(mean2d=prep0.mean2d + z)
    pd = densify_pairs(p, feat, W, H, CFG.max_tiles_per_gaussian,
                       CFG.tile_capacity)
    return jnp.sum(pd.data)


def f_bin_grad(z):
    def loss(m2d, ft):
        p = prep0._replace(mean2d=m2d)
        pd = densify_pairs(p, ft, W, H, CFG.max_tiles_per_gaussian,
                           CFG.tile_capacity)
        return jnp.sum(pd.data ** 2)

    v, g = jax.value_and_grad(loss, argnums=(0, 1))(prep0.mean2d + z, feat)
    return v + jnp.sum(g[0]) + jnp.sum(g[1])


def f_blend(z):
    out, ft = blend_tiles_pallas(data0 + z, bg, grid_x, 512, INTERP)
    return jnp.sum(out) + jnp.sum(ft)


def f_blend_grad(z):
    def loss(d):
        out, ft = blend_tiles_pallas(d, bg, grid_x, 512, INTERP)
        return jnp.sum(out ** 2) + jnp.sum(ft)

    v, g = jax.value_and_grad(loss)(data0 + z)
    return v + jnp.sum(g)


def f_fwd(z):
    out = rasterize(means + z, scales, quats, opac, feat, affine, bg, W, H,
                    CFG)
    return jnp.sum(out.image)


def f_fwdbwd(z):
    def loss(m, s, q, o_, f_, a):
        out = rasterize(m, s, q, o_, f_, a, bg, W, H, CFG)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        means + z, scales, quats, opac, feat, affine
    )
    return v + sum(jnp.sum(x) for x in g)


out0 = jax.jit(lambda: rasterize(means, scales, quats, opac, feat, affine,
                                 bg, W, H, CFG))()
CFG_FUSED = RasterizeConfig(
    tile_capacity=KCAP, tile_chunk=KCHUNK, max_tiles_per_gaussian=TCAP,
    binning_mode="fused",
)


def f_fused_fwd(z):
    out = rasterize(means + z, scales, quats, opac, feat, affine, bg, W, H,
                    CFG_FUSED)
    return jnp.sum(out.image)


def f_fused_fwdbwd(z):
    def loss(m, s, q, o_, f_, a):
        out = rasterize(m, s, q, o_, f_, a, bg, W, H, CFG_FUSED)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        means + z, scales, quats, opac, feat, affine
    )
    return v + sum(jnp.sum(x) for x in g)


print(f"device={jax.devices()[0].platform} N={N} {W}x{H} cfg={CFG}")
print(f"observed: max_tile={int(out0.max_tile_count)} "
      f"max_tiles_per_gaussian={int(out0.max_tiles_per_gaussian_seen)} "
      f"num_pairs={int(out0.num_pairs)}")
timeit("preprocess fwd", f_pre)
timeit("preprocess fwd+bwd", f_pre_grad)
timeit("binning (sorted) fwd", f_bin)
timeit("binning (sorted) fwd+bwd", f_bin_grad)
timeit("blend pallas fwd", f_blend)
timeit("blend pallas fwd+bwd", f_blend_grad)
timeit("FULL fwd", f_fwd)
dt = timeit("FULL fwd+bwd", f_fwdbwd)
print(f"=> sorted {W * H / dt / 1e6:.2f} Mrays/s (in-graph, no dispatch)")
timeit("FULL fused fwd", f_fused_fwd)
dtf = timeit("FULL fused fwd+bwd", f_fused_fwdbwd)
print(f"=> fused {W * H / dtf / 1e6:.2f} Mrays/s (in-graph, no dispatch)")
