"""3D-covariance construction from (scale, quaternion).

Parity target: ``computeCov3D`` in the reference CUDA preprocess
(``cuda_rasterizer/forward.cu:117-151``): Sigma = R S^2 R^T built from an
**unnormalized** quaternion (the reference deliberately skips normalization;
forward.cu:126). Autodiff through these functions reproduces the hand-derived
backward in ``backward.cu:331-394`` (including the unnormalized-quat rule).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q, normalize: bool = False):
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix.

    With ``normalize=False`` this matches the reference exactly (which feeds
    raw quaternions). Batched over leading dims.
    """
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales, quats, scale_modifier: float = 1.0):
    """Sigma = R diag(s^2) R^T, packed as the 6 upper-triangular entries
    (xx, xy, xz, yy, yz, zz) — same packing as the reference cov3D buffer.

    Args:
      scales: [..., 3] positive scales (already activated).
      quats:  [..., 4] raw quaternions (w,x,y,z), NOT normalized.
    """
    R = quat_to_rotmat(quats, normalize=False)
    s = scale_modifier * scales
    # M = diag(s) @ R^T in the reference's storage; Sigma = M^T M = R S^2 R^T.
    S2 = s * s
    sigma = jnp.einsum("...ij,...j,...kj->...ik", R, S2, R)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def cov3d_to_matrix(cov6):
    """Unpack the 6-vector into the symmetric 3x3 matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def strip_symmetric(sigma):
    """3x3 symmetric matrix -> packed 6-vector (upper triangular)."""
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )
