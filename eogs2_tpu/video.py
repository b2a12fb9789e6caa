"""Fly-around video rendering.

Parity target: ``render_video.py`` + ``to_affine_video.py``: render an
interpolated virtual-camera trajectory (orbiting UV shear around the nadir
camera) and encode a video. Uses cv2's encoder when available, else writes
a PNG sequence.
"""

from __future__ import annotations

import os

import numpy as np


def orbit_cameras(base_camera, n_frames: int = 60, max_shear: float = 0.25):
    """Cameras whose view direction orbits the vertical: shear magnitude
    `max_shear` rotating through 2*pi (the reference's nadir_pov video)."""
    import jax.numpy as jnp

    cams = []
    nadir, _ = base_camera.nadir_camera()
    A = np.asarray(nadir.affine[:, :3])
    b = np.asarray(nadir.affine[:, 3])
    center = np.asarray(base_camera.centerofscene)
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        m = np.eye(3)
        m[0, 2] = max_shear * np.cos(ang)
        m[1, 2] = max_shear * np.sin(ang)
        new_a = m @ A
        new_b = (np.eye(3) - m) @ (A @ center) + b
        cams.append(
            nadir.replace(
                affine=jnp.asarray(
                    np.concatenate([new_a, new_b[:, None]], axis=1), np.float32
                )
            )
        )
    return cams


def render_video(
    model,
    base_camera,
    raster_cfg,
    out_path: str,
    n_frames: int = 60,
    fps: int = 15,
    max_shear: float = 0.25,
    shading=None,
    view_idx: int = 0,
):
    """Render the orbit and encode. Returns the path actually written."""
    from eogs2_tpu.pipeline import render_view_full

    frames = []
    for cam in orbit_cameras(base_camera, n_frames, max_shear):
        out = render_view_full(
            model, cam, raster_cfg, shading=shading, view_idx=view_idx,
            with_sun=cam.has_sun,
        )
        img = np.clip(np.asarray(out["final"]), 0, 1)
        if img.shape[0] == 1:
            img = np.repeat(img, 3, axis=0)
        frames.append((img.transpose(1, 2, 0) * 255).astype(np.uint8))

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        if not vw.isOpened():
            raise RuntimeError("cv2 encoder unavailable")
        for f in frames:
            vw.write(f[:, :, ::-1])
        vw.release()
        return out_path
    except Exception:
        seq_dir = os.path.splitext(out_path)[0] + "_frames"
        os.makedirs(seq_dir, exist_ok=True)
        import imageio.v2 as iio

        for i, f in enumerate(frames):
            iio.imwrite(os.path.join(seq_dir, f"frame_{i:04d}.png"), f)
        return seq_dir
