"""Legacy COLMAP / Blender perspective readers (scene_legacy.py,
io/colmap.py) — parity with the reference's upstream-3DGS loaders."""

import json
import os

import numpy as np
import pytest

from eogs2_tpu.io.colmap import (
    ColmapCamera,
    ColmapImage,
    qvec2rotmat,
    rotmat2qvec,
    read_model,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)
from eogs2_tpu.scene_legacy import (
    focal2fov,
    fov2focal,
    load_blender_scene,
    load_colmap_scene,
    nerfpp_norm,
    perspective_projection,
)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-9)


def _make_colmap_scene(root, n_images=9):
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse)
    cams = {
        1: ColmapCamera(1, "PINHOLE", 640, 480,
                        np.array([500.0, 480.0, 320.0, 240.0])),
        2: ColmapCamera(2, "SIMPLE_PINHOLE", 320, 240,
                        np.array([260.0, 160.0, 120.0])),
    }
    rng = np.random.RandomState(3)
    imgs = {}
    for i in range(1, n_images + 1):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        imgs[i] = ColmapImage(i, q, rng.randn(3), 1 + i % 2, f"im_{i:03d}.png")
    xyz = rng.randn(50, 3)
    rgb = rng.randint(0, 256, (50, 3)).astype(np.uint8)
    write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
    write_images_binary(os.path.join(sparse, "images.bin"), imgs)
    write_points3d_binary(os.path.join(sparse, "points3D.bin"), xyz, rgb)
    return cams, imgs, xyz, rgb


def test_colmap_binary_roundtrip(tmp_path):
    cams, imgs, xyz, rgb = _make_colmap_scene(str(tmp_path))
    rc, ri, (rxyz, rrgb, rerr) = read_model(str(tmp_path / "sparse" / "0"))
    assert set(rc) == set(cams) and set(ri) == set(imgs)
    assert rc[1].model == "PINHOLE" and rc[2].model == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(rc[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(ri[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(ri[i].tvec, imgs[i].tvec)
        assert ri[i].name == imgs[i].name
    np.testing.assert_allclose(rxyz, xyz)
    assert (rrgb == rgb).all()


def test_colmap_scene_info(tmp_path):
    _make_colmap_scene(str(tmp_path), n_images=16)
    info = load_colmap_scene(str(tmp_path), eval_split=True, llffhold=8,
                             load_images=False)
    assert len(info.train_cameras) == 14 and len(info.test_cameras) == 2
    c0 = info.train_cameras[0]
    # fovs from intrinsics
    assert 0.1 < c0.fovx < np.pi and 0.1 < c0.fovy < np.pi
    # R orthonormal, world_to_cam inverts the center
    assert np.allclose(c0.R @ c0.R.T, np.eye(3), atol=1e-9)
    w2c = c0.world_to_cam
    np.testing.assert_allclose(
        (w2c @ np.append(c0.center, 1.0))[:3], 0.0, atol=1e-9
    )
    assert info.points.shape == (50, 3) and info.radius > 0


def test_colmap_text_fallback(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    (sparse / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500 480 320 240\n"
    )
    (sparse / "images.txt").write_text(
        "# two lines per image\n"
        "1 1 0 0 0 0.5 -0.25 2.0 1 a.png\n\n"
    )
    (sparse / "points3D.txt").write_text("1 1.0 2.0 3.0 10 20 30 0.5\n")
    cams, imgs, (xyz, rgb, err) = read_model(str(sparse))
    assert cams[1].model == "PINHOLE" and imgs[1].name == "a.png"
    np.testing.assert_allclose(imgs[1].tvec, [0.5, -0.25, 2.0])
    np.testing.assert_allclose(xyz[0], [1.0, 2.0, 3.0])


def test_blender_scene(tmp_path):
    frames = []
    rng = np.random.RandomState(1)
    for i in range(4):
        c2w = np.eye(4)
        th = i * np.pi / 2
        c2w[:3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        c2w[:3, 3] = [4 * np.sin(th), 0.0, 4 * np.cos(th)]
        frames.append(
            {"file_path": f"./train/r_{i}", "transform_matrix": c2w.tolist()}
        )
    (tmp_path / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.7, "frames": frames})
    )
    info = load_blender_scene(str(tmp_path), load_images=False,
                              num_random_points=1000)
    assert len(info.train_cameras) == 4 and not info.test_cameras
    assert info.points.shape == (1000, 3)
    assert np.abs(info.points).max() <= 1.3 + 1e-6
    # camera centers sit on the radius-4 orbit
    for c in info.train_cameras:
        assert np.isclose(np.linalg.norm(c.center), 4.0, atol=1e-6)
    # nerf++ norm centers the orbit
    t, r = nerfpp_norm(info.train_cameras)
    assert np.allclose(t, 0.0, atol=1e-6) and np.isclose(r, 4.4, atol=1e-6)


def test_projection_matrix():
    p = perspective_projection(np.pi / 2, np.pi / 2, znear=0.1, zfar=10.0)
    # point on the near plane -> z_ndc 0; far plane -> 1 (after divide)
    for z, expect in ((0.1, 0.0), (10.0, 1.0)):
        v = p @ np.array([0.0, 0.0, z, 1.0])
        assert np.isclose(v[2] / v[3], expect, atol=1e-9)
    assert np.isclose(fov2focal(focal2fov(500.0, 640), 640), 500.0)
