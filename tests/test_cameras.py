"""Camera math invariants (mirrors utils_to_affine.test: A.sun_dir maps to
the w axis; nadir camera is vertical; resample round trips)."""

import numpy as np
import jax.numpy as jnp
import jax

from eogs2_tpu.cameras import AffineCamera, camera_from_reference_convention
from eogs2_tpu.data.synthetic import make_affine, sun_model_from_affine


def make_camera(shear=(0.25, -0.1), w=64, h=48):
    A = make_affine(shear, w, h, (-0.35, 0.35))
    sun_dir = np.array([0.4, 0.3, 0.85])
    sun_A, sun_b, sdir, myM = sun_model_from_affine(A, sun_dir)
    return camera_from_reference_convention(
        coef=A[:, :3],
        inter=A[:, 3],
        sun_coef=sun_A,
        sun_inter=sun_b,
        camera_to_sun=myM,
        altitude_bounds=(-0.35, 0.35),
        centerofscene=(0.0, 0.0, 0.0),
        width=w,
        height=h,
    ), sdir


def test_sun_invariant():
    """(A_sun @ sun_dir) has zero u,v components: the sun sees along +w."""
    cam, sdir = make_camera()
    v = np.asarray(cam.sun_affine[:, :3]) @ np.asarray(sdir)
    np.testing.assert_allclose(v[:2], 0.0, atol=1e-5)
    np.testing.assert_allclose(v[2], 1.0, atol=1e-4)


def test_ecef_uva_roundtrip():
    cam, _ = make_camera()
    xyz = np.random.RandomState(0).uniform(-1, 1, (100, 3)).astype(np.float32)
    uva = cam.ecef_to_uva(jnp.asarray(xyz))
    back = cam.uva_to_ecef(uva)
    np.testing.assert_allclose(back, xyz, atol=1e-5)


def test_nadir_camera_is_vertical():
    cam, _ = make_camera(shear=(0.3, 0.2))
    nadir, _ = cam.nadir_camera()
    up = np.asarray(nadir.affine[:, :3]) @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(up[:2], 0.0, atol=1e-5)


def test_camera_to_sun_consistency():
    """camera_to_sun maps the camera's UVA of a point to the sun camera's UV
    of the same point (the defining property used for shadow resampling)."""
    cam, _ = make_camera()
    xyz = np.random.RandomState(1).uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
    uva_cam = np.asarray(cam.ecef_to_uva(jnp.asarray(xyz)))
    uva_sun = uva_cam @ np.asarray(cam.camera_to_sun).T
    uva_sun_direct = np.asarray(xyz @ np.asarray(cam.sun_affine[:, :3]).T) + np.asarray(
        cam.sun_affine[:, 3]
    )
    np.testing.assert_allclose(uva_sun, uva_sun_direct, atol=1e-5)


def test_sun_camera_footprint():
    cam, _ = make_camera()
    sun_cam, cam2virt = cam.sun_camera(f=2)
    assert sun_cam.width == cam.width * 2 and sun_cam.height == cam.height * 2
    # the composed map matches scaling the sun affine
    xyz = np.random.RandomState(2).uniform(-0.5, 0.5, (20, 3)).astype(np.float32)
    uva_cam = np.asarray(cam.ecef_to_uva(jnp.asarray(xyz)))
    via_map = uva_cam @ np.asarray(cam2virt).T
    direct = np.asarray(sun_cam.ecef_to_uva(jnp.asarray(xyz)))
    np.testing.assert_allclose(via_map[:, :2], direct[:, :2], atol=1e-5)


def test_random_camera_stays_close():
    cam, _ = make_camera()
    key = jax.random.PRNGKey(0)
    rnd, m = cam.random_camera(key, extent=0.01)
    assert np.abs(np.asarray(m) - np.eye(3)).max() < 0.011


def test_resize_canvas_preserves_pixels():
    cam, _ = make_camera(w=60, h=44)
    big = cam.resize_canvas(64, 48)
    xyz = np.random.RandomState(3).uniform(-0.5, 0.5, (30, 3)).astype(np.float32)
    for c, (w, h) in ((cam, (60, 44)), (big, (64, 48))):
        uva = np.asarray(c.ecef_to_uva(jnp.asarray(xyz)))
        px = ((uva[:, 0] + 1) * w - 1) / 2
        if c is cam:
            px_ref = px
        else:
            np.testing.assert_allclose(px, px_ref, atol=1e-4)
