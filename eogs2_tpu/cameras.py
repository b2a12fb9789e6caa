"""Affine (RPC-approximated pushbroom) cameras as JAX pytrees.

Parity target: ``scene/cameras/affine_cameras.py`` in the reference, which
stores the camera as a *transposed* 4x4 torch tensor for CUDA compatibility
and derives sun / nadir / randomly-sheared virtual cameras from it
(affine_cameras.py:350-447). Here the camera is a plain [3,4] matrix in math
orientation — uva = A @ [xyz, 1] — and every derivation is a pure function
returning a new camera, so cameras stack/vmap/shard naturally.

Conventions:
  * u, v are NDC in [-1, 1] over the native image; the third row gives the
    scene-normalized altitude.
  * pixel = ((ndc + 1) * size - 1) / 2 (reference ndc2Pix).
  * width/height are static python ints (pytree aux data), so a camera can be
    a jit argument without retracing on parameter changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AffineCamera:
    affine: jnp.ndarray  # [3,4] world -> (u, v, altitude)
    sun_affine: jnp.ndarray  # [3,4] sun-aligned affine (zeros if absent)
    camera_to_sun: jnp.ndarray  # [3,3] UVA -> UVA map into the sun camera
    altitude_bounds: jnp.ndarray  # [2] (min_alt, max_alt) in normalized units
    centerofscene: jnp.ndarray  # [3] scene center in world coords
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    has_sun: bool = struct.field(pytree_node=False, default=True)

    # ---- projections ------------------------------------------------------

    def ecef_to_uva(self, xyz):
        """uva = A @ [xyz, 1] (reference ECEF_to_UVA, affine_cameras.py:432)."""
        return xyz @ self.affine[:, :3].T + self.affine[:, 3]

    def uva_to_ecef(self, uva):
        """Inverse map (reference UVA_to_ECEF, done in float64 there; the
        normalized frame is O(1) so float32 is adequate on device — host-side
        eval re-does this in numpy float64)."""
        ainv = jnp.linalg.inv(self.affine[:, :3])
        return (uva - self.affine[:, 3]) @ ainv.T

    def uv_grid(self):
        """[H,W,2] NDC grid in [-1,1] (reference UV_grid, indexing='xy')."""
        u = jnp.linspace(-1.0, 1.0, self.width)
        v = jnp.linspace(-1.0, 1.0, self.height)
        uu, vv = jnp.meshgrid(u, v, indexing="xy")
        return jnp.stack([uu, vv], axis=-1)

    # ---- derived cameras --------------------------------------------------

    def sun_camera(self, f: int = 2):
        """Sun-POV camera with an f-times footprint.

        Reference get_sun_camera (affine_cameras.py:350-370): the transposed
        composition sun_affine^T @ diag(1/f,1/f,1,1) equals, in math
        orientation, S @ A_sun with S = diag(1/f, 1/f, 1) applied to both the
        linear part and the intercept; cam2virt = S3 @ camera_to_sun.
        """
        s = jnp.array([1.0 / f, 1.0 / f, 1.0])
        new_affine = self.sun_affine * s[:, None]
        cam2virt = s[:, None] * self.camera_to_sun
        cam = self.replace(
            affine=new_affine,
            width=self.width * f,
            height=self.height * f,
        )
        return cam, cam2virt

    def nadir_camera(self):
        """Shear-removed (perfectly vertical) camera.

        Reference get_nadir_camera (affine_cameras.py:372-401): find where the
        up direction projects, and shear it back onto the axis.
        """
        A = self.affine[:, :3]
        b = self.affine[:, 3]
        q = A @ jnp.array([0.0, 0.0, 1.0])
        q = q / q[2]
        M = jnp.eye(3).at[:2, 2].set(-q[:2])
        new_A = M @ A
        new_b = (jnp.eye(3) - M) @ (A @ self.centerofscene) + b
        cam2virt = M
        cam = self.replace(affine=jnp.concatenate([new_A, new_b[:, None]], axis=1))
        return cam, cam2virt

    def random_camera(self, key, extent: float):
        """Randomly UV-sheared virtual camera for the consistency loss.

        Reference sample_random_camera (affine_cameras.py:403-430):
        M[:2,2] += clip(randn(2), -1, 1) * extent.
        """
        A = self.affine[:, :3]
        b = self.affine[:, 3]
        shear = jnp.clip(jax.random.normal(key, (2,)), -1.0, 1.0) * extent
        M = jnp.eye(3).at[:2, 2].add(shear)
        new_A = M @ A
        new_b = (jnp.eye(3) - M) @ (A @ self.centerofscene) + b
        cam = self.replace(affine=jnp.concatenate([new_A, new_b[:, None]], axis=1))
        return cam, M

    def resize_canvas(self, new_width: int, new_height: int) -> "AffineCamera":
        """Rescale the NDC frame so rendering at (new_w, new_h) reproduces the
        native pixel mapping on the overlapping region (used to pad images to
        a common static shape: extra pixels simply extend the sensor)."""
        sx = self.width / new_width
        sy = self.height / new_height
        row_scale = jnp.array([sx, sy, 1.0])
        # pixel = ((u+1)*W - 1)/2 ; require ((u'+1)*W' - 1)/2 == pixel
        # => (u'+1)W' = (u+1)W  =>  u' = s*u + (s - 1),  s = W/W'
        inter_shift = jnp.array([sx - 1.0, sy - 1.0, 0.0])
        new_affine = self.affine * row_scale[:, None]
        new_affine = new_affine.at[:, 3].add(inter_shift)
        return self.replace(affine=new_affine, width=new_width, height=new_height)

    def apply_last_row(self, last_row) -> "AffineCamera":
        """Learnable pose residual: the reference adds a learned 4-vector to
        the last row of the *transposed* view matrix (renderer.py:47-53),
        i.e. to the intercept column b plus a homogeneous term it ignores.
        In math orientation that is affine[:, 3] += last_row[:3]."""
        return self.replace(affine=self.affine.at[:, 3].add(last_row[:3]))


def camera_from_reference_convention(coef, inter, sun_coef=None, sun_inter=None,
                                     camera_to_sun=None, altitude_bounds=(0.0, 1.0),
                                     centerofscene=(0.0, 0.0, 0.0),
                                     width=0, height=0):
    """Build from affine_models.json fields (coef_ [3,3], intercept_ [3])."""
    import numpy as np

    affine = np.concatenate([np.asarray(coef), np.asarray(inter)[:, None]], axis=1)
    has_sun = sun_coef is not None
    if has_sun:
        sun_affine = np.concatenate(
            [np.asarray(sun_coef), np.asarray(sun_inter)[:, None]], axis=1
        )
        cam2sun = np.asarray(camera_to_sun)
    else:
        sun_affine = np.zeros((3, 4))
        cam2sun = np.eye(3)
    return AffineCamera(
        affine=jnp.asarray(affine, dtype=jnp.float32),
        sun_affine=jnp.asarray(sun_affine, dtype=jnp.float32),
        camera_to_sun=jnp.asarray(cam2sun, dtype=jnp.float32),
        altitude_bounds=jnp.asarray(altitude_bounds, dtype=jnp.float32),
        centerofscene=jnp.asarray(centerofscene, dtype=jnp.float32),
        width=int(width),
        height=int(height),
        has_sun=has_sun,
    )
