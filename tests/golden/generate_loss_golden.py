"""Generate the frozen LOSS-stack golden (losses1.npz).

Run from the repo root:  python tests/golden/generate_loss_golden.py

Inputs: the oracle-rendered image of the frozen golden scene (scene1.npz,
produced by the independent CUDA-math oracle) plus deterministic synthetic
companions (GT image, shadow map, virtual-camera samples, per-Gaussian
arrays). Outputs: every loss term of the reference loss stack computed in
float64 by tests/oracle_losses.py (independent transcriptions of
loss/*.py + utils/loss_utils.py). tests/test_golden.py asserts the
framework's jitted float32 loss functions reproduce them.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import oracle_losses as OL  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    scene = np.load(os.path.join(HERE, "scene1.npz"))
    image = scene["noaa_image"][:3].astype(np.float64)  # oracle RGB render
    alt = scene["noaa_image"][3].astype(np.float64)  # oracle altitude
    acc = 1.0 - scene["noaa_final_T"].astype(np.float64)
    h, w = alt.shape

    rng = np.random.RandomState(21)
    # GT = smoothed shifted render + noise (structured, not identical)
    gt = np.roll(image, 2, axis=-1) * 0.9 + 0.05 + 0.03 * rng.rand(3, h, w)
    sun_diff = rng.uniform(-0.4, 0.3, (h, w))
    shadowmap = np.exp(0.4 * np.minimum(sun_diff, 0.0))  # ShadowMap formula
    sun_rgb = np.clip(image + 0.1 * rng.randn(3, h, w), 0, 1)
    sun_uv = rng.uniform(-1.3, 1.3, (h, w, 2))
    new_alt = alt + rng.uniform(-0.6, 0.6, (h, w))
    new_rgb = np.clip(image + 0.1 * rng.randn(3, h, w), 0, 1)
    new_uv = rng.uniform(-1.3, 1.3, (h, w, 2))
    opacity = scene["opac"].astype(np.float64)
    n = opacity.shape[0]
    radii = rng.randint(0, 5, n)
    scaling = scene["scales"].astype(np.float64)
    transient = rng.uniform(-0.2, 1.2, (h, w))

    out = dict(
        image=image.astype(np.float32), gt=gt.astype(np.float32),
        altitude=alt.astype(np.float32), acc=acc.astype(np.float32),
        shadowmap=shadowmap.astype(np.float32),
        sun_diff=sun_diff.astype(np.float32),
        sun_rgb=sun_rgb.astype(np.float32), sun_uv=sun_uv.astype(np.float32),
        new_alt=new_alt.astype(np.float32), new_rgb=new_rgb.astype(np.float32),
        new_uv=new_uv.astype(np.float32), opacity=opacity.astype(np.float32),
        radii=radii.astype(np.int32), scaling=scaling.astype(np.float32),
        transient=transient.astype(np.float32), n_init=np.float64(n),
    )

    # f32-cast inputs back to f64 so the oracle sees EXACTLY what the
    # framework will read from the npz
    f = {k: np.asarray(v, np.float64) for k, v in out.items()}
    out["ssim"] = OL.ssim_ref(f["image"], f["gt"])
    out["l1"] = OL.l1_ref(f["image"], f["gt"])
    out["photometric"] = OL.photometric_ref(f["image"], f["gt"], 0.2)
    out["opacity_loss"] = OL.opacity_ref(f["opacity"], n)
    out["radii_opacity"] = OL.radii_opacity_ref(f["opacity"], radii, n)
    out["acc_opacity"] = OL.accumulated_opacity_ref(f["acc"])
    out["translucent"] = OL.translucent_shadows_ref(f["shadowmap"])
    out["tv_altitude"] = OL.tv_altitude_ref(f["altitude"])
    out["erank"] = OL.erank_ref(f["scaling"])
    out["sun_alt"], out["sun_rgb_loss"] = OL.suncamera_ref(
        f["image"], f["sun_rgb"], f["sun_diff"], f["sun_uv"]
    )
    out["rand_alt"], out["rand_rgb_loss"] = OL.randomcam_ref(
        f["altitude"], f["new_alt"], f["image"], f["new_rgb"], f["new_uv"]
    )
    out["nll"] = OL.transient_nll_ref(f["image"], f["gt"], f["transient"])

    np.savez_compressed(os.path.join(HERE, "losses1.npz"), **out)
    print("wrote losses1.npz:",
          {k: float(v) for k, v in out.items() if np.ndim(v) == 0})


if __name__ == "__main__":
    main()
