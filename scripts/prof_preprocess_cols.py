"""Microbench: row-form vs column-form (SoA) preprocess on the current device.

Hypothesis: preprocess cost (2.8 ms fwd / 7.3 ms fwd+bwd at N=100k) is
dominated by the 128-lane padding of the [N,2..4] inputs/outputs (each
[N,k<=4] f32 array occupies N*128*4 bytes in HBM), not by compute. The
column form keeps every intermediate and output as unpadded 1D [N] arrays.

Usage: ./tpurun.sh python scripts/prof_preprocess_cols.py [N]
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

from eogs2_tpu.ops.projection import preprocess_gaussians, compute_cov2d_direct

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W = H = 512
REPS = 20

rng = np.random.RandomState(42)
means = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
scales = jnp.asarray(np.full((N, 3), 0.006, np.float32))
quats = jnp.asarray(np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1)))
opac = jnp.asarray(np.full((N,), 0.7, np.float32))
affine = jnp.asarray(np.array(
    [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
    np.float32,
))


def timeit(name, f):
    @jax.jit
    def run(z):
        def body(i, acc):
            return acc + f(acc * 1e-30 + z)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


# ---------- row form (current) ----------


def f_row(z):
    cov2d = compute_cov2d_direct(scales, quats, affine, W, H)
    p = preprocess_gaussians(means + z, None, opac, affine, W, H, cov2d=cov2d)
    return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.opacity)
            + jnp.sum(p.depth) + jnp.sum(p.tiles_touched.astype(jnp.float32)))


def f_row_grad(z):
    def loss(m, s, q, o):
        cov2d = compute_cov2d_direct(s, q, affine, W, H)
        p = preprocess_gaussians(m, None, o, affine, W, H, cov2d=cov2d)
        return jnp.sum(p.mean2d ** 2) + jnp.sum(p.conic ** 2) + jnp.sum(p.opacity ** 2)

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        means + z, scales, quats, opac)
    return v + sum(jnp.sum(x) for x in g)


# ---------- column form ----------


def preprocess_cols(mx3, scol, qcol, op, affine, width, height):
    """All-1D preprocess. mx3/scol/qcol: tuples of 1D columns."""
    x, y, zc = mx3
    A = affine
    u = A[0, 0] * x + A[0, 1] * y + A[0, 2] * zc + A[0, 3]
    v = A[1, 0] * x + A[1, 1] * y + A[1, 2] * zc + A[1, 3]
    alt = A[2, 0] * x + A[2, 1] * y + A[2, 2] * zc + A[2, 3]
    px = ((u + 1.0) * width - 1.0) * 0.5
    py = ((v + 1.0) * height - 1.0) * 0.5
    r, qx, qy, qz = qcol
    R00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    R01 = 2.0 * (qx * qy - r * qz)
    R02 = 2.0 * (qx * qz + r * qy)
    R10 = 2.0 * (qx * qy + r * qz)
    R11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    R12 = 2.0 * (qy * qz - r * qx)
    R20 = 2.0 * (qx * qz - r * qy)
    R21 = 2.0 * (qy * qz + r * qx)
    R22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    Jw = jnp.asarray([0.5 * width, 0.5 * height], dtype=x.dtype)
    J = Jw[:, None] * A[:2, :3]
    a0 = J[0, 0] * R00 + J[0, 1] * R10 + J[0, 2] * R20
    a1 = J[0, 0] * R01 + J[0, 1] * R11 + J[0, 2] * R21
    a2 = J[0, 0] * R02 + J[0, 1] * R12 + J[0, 2] * R22
    b0 = J[1, 0] * R00 + J[1, 1] * R10 + J[1, 2] * R20
    b1 = J[1, 0] * R01 + J[1, 1] * R11 + J[1, 2] * R21
    b2 = J[1, 0] * R02 + J[1, 1] * R12 + J[1, 2] * R22
    s0, s1, s2 = qcol[0] * 0 + scol[0], scol[1], scol[2]
    s0, s1, s2 = s0 * s0, s1 * s1, s2 * s2
    cxx = a0 * a0 * s0 + a1 * a1 * s1 + a2 * a2 * s2
    cxy = a0 * b0 * s0 + a1 * b1 * s1 + a2 * b2 * s2
    cyy = b0 * b0 * s0 + b1 * b1 * s1 + b2 * b2 * s2
    h_var = 0.3
    cxx_d = cxx + h_var
    cyy_d = cyy + h_var
    det = cxx_d * cyy_d - cxy * cxy
    valid = det > 0.0
    det_safe = jnp.where(valid, det, 1.0)
    det_inv = 1.0 / det_safe
    ca = cyy_d * det_inv
    cb = -cxy * det_inv
    cc = cxx_d * det_inv
    mid = 0.5 * (cxx_d + cyy_d)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
    TILE = 16
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rmin_x = jnp.clip(((px - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((py - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((px + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((py + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    rect_w = rmax_x - rmin_x
    rect_h = rmax_y - rmin_y
    visible = valid & (rect_w > 0) & (rect_h > 0)
    rect_w = jnp.where(visible, rect_w, 0)
    rect_h = jnp.where(visible, rect_h, 0)
    tiles = rect_w * rect_h
    return (px, py, -alt, ca, cb, cc, op, rmin_x, rmin_y, rect_w, rect_h,
            tiles)


mcols = tuple(means[:, i] for i in range(3))
scols = tuple(scales[:, i] for i in range(3))
qcols = tuple(quats[:, i] for i in range(4))


def f_col(z):
    mc = (mcols[0] + z, mcols[1], mcols[2])
    out = preprocess_cols(mc, scols, qcols, opac, affine, W, H)
    return (sum(jnp.sum(o) for o in out[:7])
            + jnp.sum(out[11].astype(jnp.float32)))


def f_col_grad(z):
    def loss(mc, sc, qc, o):
        out = preprocess_cols(mc, sc, qc, o, affine, W, H)
        return sum(jnp.sum(o_ ** 2) for o_ in out[:7])

    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        (mcols[0] + z,) + mcols[1:], scols, qcols, opac)
    return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))


# column form but fed from the [N,k] arrays (slice at entry)
def f_col_sliced(z):
    m = means + z
    mc = tuple(m[:, i] for i in range(3))
    out = preprocess_cols(mc, scols, qcols, opac, affine, W, H)
    return (sum(jnp.sum(o) for o in out[:7])
            + jnp.sum(out[11].astype(jnp.float32)))


print(f"device={jax.devices()[0].platform} N={N}")
timeit("row preprocess fwd", f_row)
timeit("row preprocess fwd+bwd", f_row_grad)
timeit("col preprocess fwd", f_col)
timeit("col preprocess fwd+bwd", f_col_grad)
timeit("col preprocess fwd (sliced in)", f_col_sliced)
