"""Per-Gaussian preprocessing for the affine (pushbroom-approximated) camera.

Parity target: ``preprocessCUDA`` (cuda_rasterizer/forward.cu:155-283) and
``computeCov2D`` (forward.cu:74-112):

  * projection is a plain affine map uva = A @ [xyz, 1] — NO perspective
    divide anywhere (the EOGS satellite-camera model). u,v are NDC in [-1,1],
    the third output channel is the scene-normalized *altitude*.
  * the 2D covariance is the EWA splat with identity projection Jacobian:
    cov2d = J Sigma J^T with J = diag(W/2, H/2) @ A[:2,:3]
    (the reference computes T^T Vrk^T T with T = W_3x3^T NDC2Screen, which is
    the same quantity in its transposed storage convention).
  * +0.3 px dilation on the diagonal; optional antialiasing opacity rescale
    sqrt(det/det_dilated) (forward.cu:219-227).
  * radius = ceil(3 sqrt(lambda_max)) via the eigenvalue trick
    (forward.cu:242-245).
  * the sort key is altitude-descending. The reference encodes this as
    depth = 200 - altitude for radix-sort positivity (forward.cu:262-272);
    we simply use -altitude (lax.sort handles negative floats).

Everything here is pure jnp: JAX autodiff through this module reproduces the
hand-written gradients of ``backward.cu`` (computeCov2DCUDA, preprocessCUDA)
*including* the dL/d(view-matrix) path for pose refinement — the reference
exports a per-Gaussian dL/dT 2x3 block (backward.cu:276-325, with an indexing
bug we do not reproduce) and assembles dL/d(viewmatrix) in Python
(diff_gaussian_rasterization/__init__.py:174-202); here the same gradient
falls out of autodiff, correctly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (cuda_rasterizer/config.h:16-17)


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N] or [N, k])."""

    mean2d: jnp.ndarray  # [N,2] pixel coordinates of the projected center
    depth: jnp.ndarray  # [N] sort key = -altitude (ascending == top first)
    conic: jnp.ndarray  # [N,3] inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray  # [N] opacity (after optional antialias rescale)
    radius: jnp.ndarray  # [N] int32 screen-space radius, 0 == culled
    rect_min: jnp.ndarray  # [N,2] int32 tile rect (x,y) inclusive
    rect_size: jnp.ndarray  # [N,2] int32 tile rect extent (w,h)
    tiles_touched: jnp.ndarray  # [N] int32 number of tiles overlapped


def ndc_to_pixel(ndc, size):
    """((v + 1) * S - 1) / 2 — reference ndc2Pix (auxiliary.h:40-43)."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_points(means3d, affine):
    """uva = A @ [x,y,z,1]. affine: [3,4] row-major (math orientation)."""
    return means3d @ affine[:, :3].T + affine[:, 3]


def compute_cov2d_direct(scales, quats, affine, width, height,
                         scale_modifier: float = 1.0):
    """Fused (scale, quat) -> 2D covariance without [N,3,3] intermediates.

    Same math as build_cov3d + compute_cov2d — cov2d = (J R) diag(s^2)
    (J R)^T with the reference's UNNORMALIZED quaternion convention
    (forward.cu:117-151, :74-112) — but written as scalar column
    expressions over [N] vectors. Materialized [N,3]/[N,3,3] arrays pad
    their minor dim to the 128-lane tile on TPU (a 42x bandwidth tax); the
    column form keeps everything in [N]-shaped registers of one fused
    elementwise kernel. Autodiff reproduces backward.cu:331-394 exactly
    (including the unnormalized-quat rule).
    """
    px = jnp.asarray([0.5 * width, 0.5 * height], dtype=scales.dtype)
    J = px[:, None] * affine[:2, :3]  # [2,3] constant Jacobian
    r, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    # rotation columns (R[:, k]) as scalar expressions
    R00 = 1.0 - 2.0 * (y * y + z * z)
    R01 = 2.0 * (x * y - r * z)
    R02 = 2.0 * (x * z + r * y)
    R10 = 2.0 * (x * y + r * z)
    R11 = 1.0 - 2.0 * (x * x + z * z)
    R12 = 2.0 * (y * z - r * x)
    R20 = 2.0 * (x * z - r * y)
    R21 = 2.0 * (y * z + r * x)
    R22 = 1.0 - 2.0 * (x * x + y * y)
    # A = J @ R, rows a (screen-x) and b (screen-y), columns k=0..2
    a0 = J[0, 0] * R00 + J[0, 1] * R10 + J[0, 2] * R20
    a1 = J[0, 0] * R01 + J[0, 1] * R11 + J[0, 2] * R21
    a2 = J[0, 0] * R02 + J[0, 1] * R12 + J[0, 2] * R22
    b0 = J[1, 0] * R00 + J[1, 1] * R10 + J[1, 2] * R20
    b1 = J[1, 0] * R01 + J[1, 1] * R11 + J[1, 2] * R21
    b2 = J[1, 0] * R02 + J[1, 1] * R12 + J[1, 2] * R22
    s0 = scale_modifier * scales[:, 0]
    s1 = scale_modifier * scales[:, 1]
    s2 = scale_modifier * scales[:, 2]
    s0, s1, s2 = s0 * s0, s1 * s1, s2 * s2
    cxx = a0 * a0 * s0 + a1 * a1 * s1 + a2 * a2 * s2
    cxy = a0 * b0 * s0 + a1 * b1 * s1 + a2 * b2 * s2
    cyy = b0 * b0 * s0 + b1 * b1 * s1 + b2 * b2 * s2
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def compute_cov2d(cov3d6, affine, width, height):
    """2D screen-space covariance (before dilation): J Sigma J^T.

    J = diag(W/2, H/2) @ A[:2,:3] — the affine camera has a constant Jacobian,
    so cov2d does not depend on the Gaussian mean (this is why the reference
    zeroes the mean-through-cov gradient; autodiff gives exactly zero here).

    Returns (cxx, cxy, cyy) stacked on the last axis, batched over cov3d6's
    leading dims.
    """
    scale = jnp.array([0.5 * width, 0.5 * height], dtype=cov3d6.dtype)
    J = scale[:, None] * affine[:2, :3]  # [2,3]
    from eogs2_tpu.ops.gaussians import cov3d_to_matrix

    sigma = cov3d_to_matrix(cov3d6)  # [...,3,3]
    cov = jnp.einsum("ij,...jk,lk->...il", J, sigma, J)  # [...,2,2]
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]], axis=-1)


def preprocess_gaussians(
    means3d,
    cov3d6,
    opacities,
    affine,
    width: int,
    height: int,
    antialiasing: bool = False,
    alive=None,
    cov2d=None,
):
    """Vectorized equivalent of FORWARD::preprocess for one camera.

    Args:
      means3d: [N,3] world (normalized-UTM) positions.
      cov3d6: [N,6] packed 3D covariances (ignored when cov2d is given).
      opacities: [N] activated opacities in (0,1).
      affine: [3,4] camera affine (world -> (u_ndc, v_ndc, altitude)).
      width, height: static image size in pixels.
      antialiasing: apply the sqrt(det/det_dilated) opacity rescale.
      alive: optional [N] bool mask; dead Gaussians get radius 0.
      cov2d: optional [N,3] precomputed screen covariance (cxx,cxy,cyy) —
        the compute_cov2d_direct fast path.

    Returns a Preprocessed NamedTuple. Differentiable in means3d, cov3d6,
    opacities and affine; the integer tile fields are naturally
    non-differentiable.
    """
    uva = project_points(means3d, affine)  # [N,3]
    px = ndc_to_pixel(uva[:, 0], width)
    py = ndc_to_pixel(uva[:, 1], height)
    mean2d = jnp.stack([px, py], axis=-1)
    depth = -uva[:, 2]  # altitude-descending composite order

    cov = cov2d if cov2d is not None else compute_cov2d(
        cov3d6, affine, width, height
    )  # [N,3] (cxx,cxy,cyy)
    h_var = 0.3
    det_cov = cov[:, 0] * cov[:, 2] - cov[:, 1] * cov[:, 1]
    cxx = cov[:, 0] + h_var
    cxy = cov[:, 1]
    cyy = cov[:, 2] + h_var
    det = cxx * cyy - cxy * cxy

    if antialiasing:
        h_conv_scaling = jnp.sqrt(jnp.maximum(0.000025, det_cov / det))
    else:
        h_conv_scaling = 1.0

    valid_det = det > 0.0
    det_safe = jnp.where(valid_det, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    lambda_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE

    # getRect (auxiliary.h:45-55)
    rmin_x = jnp.clip(((px - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((py - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((px + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((py + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    # int() in CUDA truncates toward zero; for negative (px - radius) this
    # yields 0 after the clamp either way.
    rect_w = rmax_x - rmin_x
    rect_h = rmax_y - rmin_y

    visible = valid_det & (rect_w > 0) & (rect_h > 0)
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    rect_w = jnp.where(visible, rect_w, 0)
    rect_h = jnp.where(visible, rect_h, 0)
    tiles = rect_w * rect_h

    opacity = opacities * h_conv_scaling

    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opacity,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_size=jnp.stack([rect_w, rect_h], axis=-1),
        tiles_touched=tiles,
    )
