"""Stage-level timing of the FUSED rasterization path on the current device.

Breaks the fused fwd+bwd into: preprocess (fwd, hand/bwd), emission keys,
emission sort + range, pay_pad materialization, fwd kernel, bwd kernel,
emission-return sort, and the full ends. In-graph fori_loop repetition (see
prof_raster.py for why).

Usage: ./tpurun.sh python scripts/prof_fused.py [N [W [TCAP [KCAP [KCHUNK]]]]]
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
from eogs2_tpu.ops.projection import preprocess_gaussians, compute_cov2d_direct
from eogs2_tpu.ops.pair_pipeline import _emission_keys, emission_broadcast
from eogs2_tpu.ops.binning import grid_dims
from eogs2_tpu.ops import fused_raster as FR

INTERP = jax.default_backend() == "cpu"

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W = H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
TCAP = int(sys.argv[3]) if len(sys.argv) > 3 else 4
KCAP = int(sys.argv[4]) if len(sys.argv) > 4 else 512
KCHUNK = int(sys.argv[5]) if len(sys.argv) > 5 else 128
EARLY_EXIT = bool(int(sys.argv[6])) if len(sys.argv) > 6 else True
COL = bool(int(sys.argv[7])) if len(sys.argv) > 7 else True
REPS = 10

rng = np.random.RandomState(42)
means = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
means[:, 2] = -0.3 + 0.1 * rng.rand(N)
# >=500k: reference-scale scene (match bench.py --scale / prof_scale.py)
SCALE_PX = 2.4 / W if N >= 500_000 else 0.006
OPAC = 0.10 if N >= 500_000 else 0.7
scales = np.full((N, 3), SCALE_PX, np.float32)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), OPAC, np.float32)
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
    binning_mode="fused", early_exit=EARLY_EXIT, payload_col=COL,
)


def timeit(name, f, *arrs):
    """Time f(z, *arrs). Arrays MUST be passed through *arrs, not closed
    over: jit bakes closed-over arrays into the program as CONSTANTS, and at
    reference scale that ships a 2 GB pay_pad through the remote-compile
    tunnel per stage (measured: compile never finishes)."""

    @jax.jit
    def run(z, *arrs):
        def body(i, acc):
            return acc + f(acc * 1e-30 + z, *arrs)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(jnp.float32(0.0), *arrs))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), *arrs))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


grid_x, grid_y = grid_dims(W, H)
n_tiles = grid_x * grid_y

# all precomputations pass arrays as jit ARGUMENTS (closed-over arrays get
# baked into the program as constants — 2 GB of pay_pad at reference scale)
cov2d0 = jax.jit(
    lambda s, q: compute_cov2d_direct(s, q, affine, W, H))(scales, quats)
prep0 = jax.jit(lambda m, o, c: preprocess_gaussians(
    m, None, o, affine, W, H, cov2d=c))(means, opac, cov2d0)
tile_tab0, depth_tab0, _ = jax.jit(
    lambda pp: _emission_keys(pp, W, H, TCAP))(prep0)
pay_cols0 = (
    prep0.mean2d[:, 0], prep0.mean2d[:, 1],
    prep0.conic[:, 0], prep0.conic[:, 1], prep0.conic[:, 2],
    prep0.opacity,
) + tuple(feat[:, j] for j in range(feat.shape[1]))
_sorted = jax.jit(lambda pc, tt, dt_: FR._sort_and_range(
    pc, tt, dt_, n_tiles, TCAP))(pay_cols0, tile_tab0, depth_tab0)
sorted_cols0, _sd0, sort_tile0, src_idx0, tstart0, cnt0 = _sorted
p = tile_tab0.shape[0]
if COL:
    pay_pad0 = jax.jit(lambda sc: FR._pack_col(sc, p, KCAP))(sorted_cols0)
else:
    pay_pad0 = jax.jit(
        lambda sc: jnp.zeros((p + KCAP, FR.NFF), jnp.float32)
        .at[:p, :len(pay_cols0)].set(jnp.stack(sc, -1)))(sorted_cols0)
out8_0 = jax.jit(lambda pp_, ts, cn: FR._fused_fwd_call(
    pp_, ts, cn, n_tiles, KCAP, KCHUNK, grid_x, INTERP, col=COL))(
        pay_pad0, tstart0, cnt0)


def f_prep(z, means, scales, quats, opac):
    c = compute_cov2d_direct(scales + z, quats, affine, W, H)
    pp = preprocess_gaussians(means + z, None, opac, affine, W, H, cov2d=c)
    return jnp.sum(pp.mean2d) + jnp.sum(pp.conic) + jnp.sum(pp.depth)


def f_prep_grad(z, means, scales, quats, opac):
    def loss(m, s, q, o):
        c = compute_cov2d_direct(s, q, affine, W, H)
        pp = preprocess_gaussians(m, None, o, affine, W, H, cov2d=c)
        return (jnp.sum(pp.mean2d ** 2) + jnp.sum(pp.conic ** 2)
                + jnp.sum(pp.opacity ** 2))

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        means + z, scales, quats, opac)
    return v + sum(jnp.sum(x) for x in g)


def f_keys(z, prep0):
    pp = prep0._replace(mean2d=prep0.mean2d + z)
    tt, dt_, _ = _emission_keys(pp, W, H, TCAP)
    return jnp.sum(tt) + jnp.sum(dt_)


def f_sort(z, pay_cols0, tile_tab0, depth_tab0):
    cols = tuple(c + z for c in pay_cols0)
    sc, sd, st, si, ts, cn = FR._sort_and_range(cols, tile_tab0, depth_tab0,
                                                n_tiles, TCAP)
    return sum(jnp.sum(c) for c in sc) + jnp.sum(ts.astype(jnp.float32))


def f_sort_raw(z, pay_cols0, tile_tab0, depth_tab0):
    """RAW 14-operand sort only, scalar-pick of EVERY output column (a
    pick of only 2 columns lets XLA prune the unused sort results down to
    a 3-operand sort — the round-3 micro fell into exactly that trap and
    under-read the sort ~3x)."""
    cols = tuple(emission_broadcast(c + z, TCAP) for c in pay_cols0)
    iota = jnp.arange(tile_tab0.shape[0], dtype=jnp.int32)
    out = jax.lax.sort((tile_tab0 + z, depth_tab0, iota) + cols, num_keys=2)
    return sum(o[0].astype(jnp.float32) for o in out)


def f_sortrange_raw(z, pay_cols0, tile_tab0, depth_tab0):
    """sort + searchsorted range cut, scalar-pick of every output."""
    cols = tuple(c + z for c in pay_cols0)
    sc, sd, st, si, ts, cn = FR._sort_and_range(
        cols, tile_tab0 + z, depth_tab0, n_tiles, TCAP)
    return (sum(c[0] for c in sc) + sd[0] + st[0]
            + si[0].astype(jnp.float32)
            + ts[0].astype(jnp.float32) + cn[0].astype(jnp.float32))


def f_paypad(z, sorted_cols0):
    if COL:
        pay = FR._pack_col(tuple(c + z for c in sorted_cols0), p, KCAP)
        return jnp.sum(pay[0, :])
    pay = jnp.zeros((p + KCAP, FR.NFF), jnp.float32).at[:p, :11].set(
        jnp.stack([c + z for c in sorted_cols0], -1))
    return jnp.sum(pay[:, 0])


def f_fwdkernel(z, pay_pad0, tstart0, cnt0):
    out8 = FR._fused_fwd_call(pay_pad0 + z, tstart0, cnt0, n_tiles, KCAP,
                              KCHUNK, grid_x, INTERP,
                              early_exit=EARLY_EXIT, col=COL)
    return jnp.sum(out8[:, :, :6])


def f_bwdkernel(z, pay_pad0, out8_0, tstart0, cnt0):
    g_out = jnp.ones_like(out8_0) * (1.0 + z)
    gpay = FR._fused_bwd_call(pay_pad0, g_out, out8_0, tstart0, cnt0,
                              n_tiles, KCAP, KCHUNK, grid_x, INTERP,
                              early_exit=EARLY_EXIT, col=COL)
    return jnp.sum(gpay[:11, :] if COL else gpay[:, :11])


def f_return_sort(z, pay_pad0, src_idx0):
    if COL:
        gcols = tuple(jnp.where(src_idx0 >= 0, pay_pad0[j, :p] + z, 0.0)
                      for j in range(11))
    else:
        gcols = tuple(jnp.where(src_idx0 >= 0, pay_pad0[:p, j] + z, 0.0)
                      for j in range(11))
    s = jax.lax.sort((src_idx0,) + gcols, num_keys=1)
    return sum(jnp.sum(c.reshape(N, -1).sum(1)) for c in s[1:])


def f_blendonly(z, pay_cols0, tile_tab0, depth_tab0):
    """sort + pay_pad + fwd kernel in ONE graph (no preprocess/keys): the
    difference vs FULL fwd is the in-graph preprocess+keys contribution."""
    out = FR._fused_sorted_blend(
        tuple(c + z for c in pay_cols0), tile_tab0, depth_tab0,
        jnp.zeros((0,), jnp.float32),
        (n_tiles, KCAP, grid_x), TCAP, KCHUNK, INTERP, EARLY_EXIT, COL,
    )
    return jnp.sum(out.out8[:, :, :6])


def f_blend_fwdbwd(z, pay_cols0, tile_tab0, depth_tab0):
    """value_and_grad of the blend-only graph (sort + pack + kernels +
    return sort + reduce, no preprocess/keys/assemble): FULL fwd+bwd minus
    this is the non-rasterizer VJP overhead."""
    def loss(cols):
        out = FR._fused_sorted_blend(
            cols, tile_tab0, depth_tab0, jnp.zeros((0,), jnp.float32),
            (n_tiles, KCAP, grid_x), TCAP, KCHUNK, INTERP, EARLY_EXIT, COL,
        )
        return jnp.sum(out.out8[:, :, :6] ** 2)

    v, g = jax.value_and_grad(loss)(tuple(c + z for c in pay_cols0))
    return v + sum(jnp.sum(x) for x in g)


def f_fwd(z, means, scales, quats, opac, feat):
    out = rasterize(means + z, scales, quats, opac, feat, affine, bg, W, H, CFG)
    return jnp.sum(out.image)


def f_fwdbwd(z, means, scales, quats, opac, feat):
    def loss(m, s, q, o_, f_, a):
        out = rasterize(m, s, q, o_, f_, a, bg, W, H, CFG)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        means + z, scales, quats, opac, feat, affine)
    return v + sum(jnp.sum(x) for x in g)


print(f"device={jax.devices()[0].platform} N={N} {W}x{H} tcap={TCAP} "
      f"kcap={KCAP} kchunk={KCHUNK} pairs={int(jnp.sum(prep0.tiles_touched))} "
      f"max_tile={int(jnp.max(cnt0))} early_exit={EARLY_EXIT} col={COL}",
      flush=True)
timeit("preprocess fwd", f_prep, means, scales, quats, opac)
timeit("preprocess fwd+bwd", f_prep_grad, means, scales, quats, opac)
timeit("emission keys", f_keys, prep0)
timeit("emission sort+range", f_sort, pay_cols0, tile_tab0, depth_tab0)
timeit("emission sort RAW (scalar pick)", f_sort_raw, pay_cols0, tile_tab0,
       depth_tab0)
timeit("emission sort+range RAW", f_sortrange_raw, pay_cols0, tile_tab0,
       depth_tab0)
timeit("pay_pad materialize", f_paypad, sorted_cols0)
timeit("fwd kernel", f_fwdkernel, pay_pad0, tstart0, cnt0)
timeit("bwd kernel", f_bwdkernel, pay_pad0, out8_0, tstart0, cnt0)
timeit("emission-return sort+reduce", f_return_sort, pay_pad0, src_idx0)
timeit("sort+pack+fwdkernel (one graph)", f_blendonly, pay_cols0, tile_tab0,
       depth_tab0)
timeit("blend-only fwd+bwd (one graph)", f_blend_fwdbwd, pay_cols0,
       tile_tab0, depth_tab0)
t_f = timeit("FULL fused fwd", f_fwd, means, scales, quats, opac, feat)
t_fb = timeit("FULL fused fwd+bwd", f_fwdbwd, means, scales, quats, opac, feat)
print(f"=> {W * H / t_fb / 1e6:.2f} Mrays/s fwd+bwd (in-graph)")
