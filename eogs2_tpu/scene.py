"""Scene assembly: affine_models.json reader, uniform point init, splits.

Parity targets:
  * ``scene/dataset_readers/dataset_affine.py``: readAffineSceneInfo
    (metadata -> cameras, :331-396), uniform point-cloud init at constant
    density in the normalized [-1,1]^3 frame clipped to 1.1x the world bbox
    (:247-295), train/test split from train.txt/test.txt with the last
    (synthetic Nadir) camera appended to test (:305-328).
  * ``scene/dataset_readers/dataset_MS_affine.py``: paired {pan, msi}
    metadata per view.
  * ``scene/MS_scene.py``: normalization params (shift/scale/n/l), reference
    camera = first train camera, save/load round trip.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np

from eogs2_tpu.cameras import AffineCamera, camera_from_reference_convention


@dataclasses.dataclass
class ViewData:
    """One training/eval view (one modality)."""

    name: str
    image_type: str  # "msi" | "pan"
    camera: AffineCamera
    image: Optional[np.ndarray]  # [C,H,W] float32 in [0,1]; None for Nadir
    reference_altitude: Optional[np.ndarray] = None
    is_reference: bool = False
    is_virtual: bool = False


@dataclasses.dataclass
class SceneData:
    train_views: List[ViewData]
    test_views: List[ViewData]
    init_xyz: np.ndarray  # [N,3]
    init_rgb: np.ndarray  # [N,3]
    # normalization: world = normalized * scale + shift ; UTM zone (n, l)
    scene_shift: np.ndarray
    scene_scale: float
    scene_n: int
    scene_l: str
    cameras_extent: float

    @property
    def reference_view(self) -> ViewData:
        return self.train_views[0]

    def views_by_name(self) -> Dict[str, ViewData]:
        return {v.name: v for v in self.train_views + self.test_views}


def _camera_from_metadata(md: dict) -> AffineCamera:
    model = md["model"]
    sun = md.get("sun_model")
    return camera_from_reference_convention(
        coef=model["coef_"],
        inter=model["intercept_"],
        sun_coef=sun["coef_"] if sun else None,
        sun_inter=sun["intercept_"] if sun else None,
        camera_to_sun=sun["camera_to_sun"] if sun else None,
        altitude_bounds=(md["min_alt"], md["max_alt"]),
        centerofscene=md["centerofscene_UTM"],
        width=md["width"],
        height=md["height"],
    )


def uniform_point_init(
    min_world, max_world, scale: float, target_density: float = 0.13, seed: int = 0
):
    """Uniform init at `target_density` gaussians per true cubic meter
    (dataset_affine.py:247-295): draw in [-1,1]^3, keep points inside the
    1.1x-margin world bbox; N_total = density * 8 * scale^3."""
    rng = np.random.RandomState(seed)
    min_world = np.asarray(min_world, np.float64)
    max_world = np.asarray(max_world, np.float64)
    num = int(target_density * (2.0**3) * float(scale) ** 3)
    xyz = rng.rand(num, 3) * 2.0 - 1.0
    inside = np.all(xyz > min_world * 1.1, axis=1) & np.all(xyz < max_world * 1.1, axis=1)
    xyz = xyz[inside].astype(np.float32)
    rgb = np.full((len(xyz), 3), 1.1, np.float32)  # reference inits colors to 1.1
    return xyz, rgb


def _load_image(images_dir: str, name: str, need_rescale: bool):
    path = os.path.join(images_dir, name)
    if not os.path.exists(path):
        return None
    import imageio.v2 as iio

    img = np.asarray(iio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if need_rescale:
        img = img / 255.0
    return img.transpose(2, 0, 1)  # [C,H,W]


def load_scene(
    path: str,
    images_msi_path: Optional[str] = None,
    images_pan_path: Optional[str] = None,
    eval_split: bool = True,
    need_rescale: bool = False,
    target_density: float = 0.13,
    load_msi: bool = True,
    load_pan: bool = True,
    seed: int = 0,
    scale_factor_z: float = 1.0,
    rescaler_name: str = "clamper",
    input_ply_name: Optional[str] = None,
) -> SceneData:
    """Load a scene directory containing affine_models.json (+ train/test.txt).

    Handles both the single-modality list format and the MS {"pan": [...],
    "msi": [...]} format of the reference's to_affine output.
    """
    with open(os.path.join(path, "affine_models.json")) as f:
        metadatas = json.load(f)

    if isinstance(metadatas, dict):  # MS format
        groups = {k: v for k, v in metadatas.items() if k in ("pan", "msi")}
    else:
        # single-modality list: treat as the requested modality (3PAN-style
        # runs load the same metadata as pan cameras)
        kind = "msi" if load_msi else "pan"
        groups = {kind: metadatas}

    views: List[ViewData] = []
    n_views = len(next(iter(groups.values())))
    model_md = None
    for i in range(n_views):
        for kind, mds in groups.items():
            if kind == "msi" and not load_msi:
                continue
            if kind == "pan" and not load_pan:
                continue
            md = mds[i]
            model_md = md
            cam = _camera_from_metadata(md)
            images_dir = images_pan_path if kind == "pan" else images_msi_path
            img = None
            if images_dir and not md.get("virtual_camera", False) and md["img"] != "Nadir":
                img = _load_image(images_dir, md["img"], need_rescale)
            views.append(
                ViewData(
                    name=md["img"].replace(".tif", ""),
                    image_type=kind,
                    camera=cam,
                    image=img,
                    is_virtual=md.get("virtual_camera", False),
                )
            )

    # split: all-but-last by train.txt/test.txt, last (Nadir) -> test
    per_view = max(1, len(groups))
    if eval_split and os.path.exists(os.path.join(path, "train.txt")):
        with open(os.path.join(path, "train.txt")) as f:
            train_names = {x.replace(".json", "").replace(".tif", "") for x in f.read().split()}
        with open(os.path.join(path, "test.txt")) as f:
            test_names = {x.replace(".json", "").replace(".tif", "") for x in f.read().split()}
        train_views, test_views = [], []
        body, tail = views[: len(views) - per_view], views[len(views) - per_view :]
        for v in body:
            if v.name in train_names:
                train_views.append(v)
            elif v.name in test_names:
                test_views.append(v)
            else:
                raise RuntimeError(f"view {v.name} in neither split")
        test_views.extend(tail)  # synthetic Nadir camera
    else:
        train_views, test_views = views, []

    train_views[0].is_reference = True

    # GT normalization at load (utils/rescaler/rescaler.py:149-172)
    if rescaler_name and rescaler_name != "identity":
        from eogs2_tpu.rescalers import load_rescaler

        ref_img = train_views[0].image
        rescale = load_rescaler(rescaler_name, reference_image=ref_img)
        for v in train_views + test_views:
            if v.image is not None:
                v.image = np.asarray(rescale(v.image), np.float32)

    model = model_md["model"]
    if input_ply_name is not None:
        # PLY-based init: load points/colors from a named PLY in the scene
        # dir instead of the uniform cloud (dataset_MS_affine.py:116-121,
        # dataset_affine.py:298-302)
        from eogs2_tpu.io.ply import read_point_cloud

        xyz, rgb = read_point_cloud(
            os.path.join(path, f"{input_ply_name}.ply")
        )
        xyz = np.asarray(xyz, np.float32)
        rgb = np.asarray(rgb, np.float32)
    else:
        max_world = list(model["max_world"])
        # z-stretch of the init volume (dataset_MS_affine.py:107)
        max_world[2] = max_world[2] * scale_factor_z
        xyz, rgb = uniform_point_init(
            model["min_world"], max_world, model["scale"], target_density, seed
        )
    radius = np.linalg.norm(xyz - xyz.mean(0), axis=1).max() * 2.0

    return SceneData(
        train_views=train_views,
        test_views=test_views,
        init_xyz=xyz,
        init_rgb=rgb,
        scene_shift=np.asarray(model["center"], np.float64),
        scene_scale=float(model["scale"]),
        scene_n=int(model.get("n", 17)),
        scene_l=str(model.get("l", "R")),
        cameras_extent=float(radius),
    )
