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


_VGG_SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))  # relu1_2..relu5_3
# channel widths of the five LPIPS-vgg blocks (linear-head vector lengths)
_VGG_WIDTHS = (64, 128, 256, 512, 512)


def load_lpips_weights(path: str):
    """Load the LPIPS v0.1 learned linear-head weights.

    Accepts either (a) an .npz with arrays ``lin0``..``lin4`` of lengths
    (64, 128, 256, 512, 512), or (b) the official richzhang/PerceptualSimilarity
    ``vgg.pth`` torch checkpoint (keys ``lin{i}.model.1.weight`` of shape
    [1, C, 1, 1]). Returns a list of five 1-D float32 numpy arrays.

    The weights themselves cannot ship with this offline image (zero
    egress; the reference's lpipsPyTorch also downloads them at runtime) —
    point ``EOGS2_LPIPS_WEIGHTS`` at either file to get metric-exact LPIPS
    (lpipsPyTorch/modules/lpips.py parity).
    """
    if path.endswith(".npz"):
        z = np.load(path)
        lins = [np.asarray(z[f"lin{i}"], np.float32).reshape(-1)
                for i in range(5)]
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        lins = [
            np.asarray(
                sd[f"lin{i}.model.1.weight"], np.float32
            ).reshape(-1)
            for i in range(5)
        ]
    for lin, width in zip(lins, _VGG_WIDTHS):
        if lin.shape != (width,):
            raise ValueError(
                f"linear head shape {lin.shape} != ({width},)"
            )
    return lins


def lpips_torch(a, b, net=None, lin_weights=None):
    """LPIPS-vgg perceptual distance via torchvision VGG16 features.

    Matches the reference's lpipsPyTorch math (lpipsPyTorch/modules/
    lpips.py): ImageNet-normalize, run the 5 VGG16 conv blocks,
    unit-normalize activations along channels, square the difference,
    apply the per-channel learned linear head (a 1x1 conv), spatially
    average, and SUM over blocks.

    `lin_weights` (five 1-D arrays, see load_lpips_weights) selects the
    CALIBRATED path — bit-matching the reference given the same VGG
    backbone. When None, block outputs are averaged with unit weights
    (uncalibrated; the learned heads are not shipped with torchvision).

    `net` (a torchvision `vgg16(...).features`-style module) may be
    injected — tests exercise the pipeline with seeded random weights.
    When omitted, requires torchvision + locally cached
    VGG16_Weights.IMAGENET1K_V1 (this offline image has neither — callers
    fall back to perceptual_distance; see compute_metrics).
    Raises ImportError / RuntimeError when unavailable.
    """
    import torch  # noqa: F401 (torchvision requires torch)

    if net is None:
        from torchvision.models import VGG16_Weights, vgg16

        net = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features.eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def feats(x):
        x = torch.as_tensor(np.asarray(x, np.float32))[None, :3]
        x = (x - mean) / std
        out = []
        for lo, hi in _VGG_SLICES:
            for layer in net[lo:hi]:
                x = layer(x)
            out.append(x / (x.norm(dim=1, keepdim=True) + 1e-10))
        return out

    with torch.no_grad():
        diffs = [
            (fa - fb) ** 2 for fa, fb in zip(feats(a), feats(b))
        ]
        if lin_weights is not None:
            # calibrated: per-channel weighted sum (the learned 1x1 conv),
            # spatial mean, sum over blocks — exactly the reference chain
            total = sum(
                float(
                    (torch.as_tensor(np.asarray(w, np.float32))
                     .view(1, -1, 1, 1) * d).sum(1).mean()
                )
                for w, d in zip(lin_weights, diffs)
            )
            return total
        total = sum(float(d.sum(1).mean()) for d in diffs)
    return total / len(_VGG_SLICES)


def compute_metrics(render_dir: str, gt_dir: str):
    import jax.numpy as jnp

    from eogs2_tpu.ops.ssim import psnr, ssim

    renders = _load_dir(render_dir)
    gts = _load_dir(gt_dir)
    rows = []
    use_lpips = True
    # calibrated LPIPS when the official weights are pointed at via env
    # (EOGS2_LPIPS_WEIGHTS=<vgg.pth or .npz>, see load_lpips_weights)
    lins = None
    wpath = os.environ.get("EOGS2_LPIPS_WEIGHTS", "")
    if wpath and os.path.exists(wpath):
        try:
            lins = load_lpips_weights(wpath)
        except Exception:
            lins = None
    for name, r in renders.items():
        if name not in gts:
            continue
        g = gts[name]
        c = min(r.shape[0], g.shape[0])
        h = min(r.shape[1], g.shape[1])
        w = min(r.shape[2], g.shape[2])
        r2, g2 = r[:c, :h, :w], g[:c, :h, :w]
        perceptual = None
        if use_lpips and c >= 3:
            try:
                perceptual = lpips_torch(r2, g2, lin_weights=lins)
            except Exception:
                use_lpips = False  # torchvision/weights absent: proxy for all
        if perceptual is None:
            perceptual = perceptual_distance(r2, g2)
        rows.append(
            {
                "name": name,
                "psnr": float(psnr(jnp.asarray(r2), jnp.asarray(g2))),
                "ssim": float(ssim(jnp.asarray(r2), jnp.asarray(g2))),
                "perceptual": perceptual,
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
