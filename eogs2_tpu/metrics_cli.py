"""Image-metrics CLI: PSNR / SSIM / perceptual distance over rendered dirs.

Parity target: ``metrics.py`` (:38-117) + ``lpipsPyTorch/``. LPIPS-vgg needs
pretrained VGG weights that are not available in this offline environment;
the perceptual metric here is a gradient-domain + multi-scale SSIM distance
(documented substitute — deterministic, weight-free). When torchvision VGG
weights ARE present locally, `lpips_torch` uses them.

Usage: python -m eogs2_tpu.metrics_cli --renders <dir> --gt <dir>
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_dir(d):
    import imageio.v2 as iio

    out = {}
    for f in sorted(os.listdir(d)):
        if f.lower().endswith((".png", ".tif", ".jpg")):
            img = np.asarray(iio.imread(os.path.join(d, f))).astype(np.float32)
            if img.max() > 1.5:
                img = img / 255.0
            if img.ndim == 2:
                img = img[..., None]
            out[os.path.splitext(f)[0]] = img.transpose(2, 0, 1)
    return out


def perceptual_distance(a, b):
    """Weight-free perceptual proxy: 1 - mean(multiscale SSIM) blended with
    gradient-magnitude L1. Returns a distance in [0, ~1]."""
    import jax.numpy as jnp

    from eogs2_tpu.ops.ssim import ssim

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    total = 0.0
    wsum = 0.0
    for scale_w, factor in ((0.5, 1), (0.3, 2), (0.2, 4)):
        if min(a.shape[-2:]) // factor < 16:
            break
        aa = a[:, ::factor, ::factor]
        bb = b[:, ::factor, ::factor]
        total += scale_w * (1.0 - float(ssim(aa, bb)))
        wsum += scale_w
    ga = np.abs(np.gradient(np.asarray(a), axis=-1)) + np.abs(
        np.gradient(np.asarray(a), axis=-2)
    )
    gb = np.abs(np.gradient(np.asarray(b), axis=-1)) + np.abs(
        np.gradient(np.asarray(b), axis=-2)
    )
    grad_term = float(np.mean(np.abs(ga - gb)))
    return (total / max(wsum, 1e-9)) + grad_term


def compute_metrics(render_dir: str, gt_dir: str):
    import jax.numpy as jnp

    from eogs2_tpu.ops.ssim import psnr, ssim

    renders = _load_dir(render_dir)
    gts = _load_dir(gt_dir)
    rows = []
    for name, r in renders.items():
        if name not in gts:
            continue
        g = gts[name]
        c = min(r.shape[0], g.shape[0])
        h = min(r.shape[1], g.shape[1])
        w = min(r.shape[2], g.shape[2])
        r2, g2 = r[:c, :h, :w], g[:c, :h, :w]
        rows.append(
            {
                "name": name,
                "psnr": float(psnr(jnp.asarray(r2), jnp.asarray(g2))),
                "ssim": float(ssim(jnp.asarray(r2), jnp.asarray(g2))),
                "perceptual": perceptual_distance(r2, g2),
            }
        )
    summary = {
        k: float(np.mean([r[k] for r in rows])) if rows else float("nan")
        for k in ("psnr", "ssim", "perceptual")
    }
    return {"per_image": rows, "mean": summary}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--renders", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    res = compute_metrics(args.renders, args.gt)
    print(json.dumps(res["mean"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
