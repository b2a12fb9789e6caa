"""Independent float64 numpy transcription of the reference LOSS formulas.

Companion to oracle_cuda_math.py (which covers the rasterizer): this module
restates the math of the reference's loss stack in pure numpy, sharing no
code with eogs2_tpu.losses / eogs2_tpu.ops.ssim. Sources (all in
/root/reference/src/gaussiansplatting/):

  * ssim_ref / photometric: utils/loss_utils.py:26-85 (11x11 gaussian
    window sigma=1.5, ZERO-padded depthwise conv2d, C1=0.01^2 C2=0.03^2),
    loss/shadow.py:20-28
  * opacity losses: loss/opacity.py:8-45
  * translucent shadows: loss/shadow.py:7-17
  * sun-camera consistency: loss/shadow.py:31-52
  * random-camera consistency: loss/main_loss.py:56-233 (|d_alt|<0.3 mask)
  * total variation: loss/main_loss.py:40-53
  * erank: loss/main_loss.py:21-37
  * gaussian NLL: torch.nn.functional.gaussian_nll_loss (full=False),
    wired at train_pan.py:433-449
"""

import numpy as np


def _gauss_window(window_size=11, sigma=1.5):
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)  # [11, 11]


def _conv2d_zero_pad(img, kern):
    """Depthwise 2D conv with zero padding kern//2 (F.conv2d semantics).
    img: [C,H,W], kern: [k,k]. Direct (slow) sliding window — oracle only."""
    c, h, w = img.shape
    k = kern.shape[0]
    p = k // 2
    padded = np.zeros((c, h + 2 * p, w + 2 * p), np.float64)
    padded[:, p : p + h, p : p + w] = img
    out = np.zeros((c, h, w), np.float64)
    # correlation (conv2d in torch is cross-correlation); kernel symmetric
    # anyway
    for dy in range(k):
        for dx in range(k):
            out += kern[dy, dx] * padded[:, dy : dy + h, dx : dx + w]
    return out


def ssim_ref(img1, img2, window_size=11):
    w = _gauss_window(window_size)
    mu1 = _conv2d_zero_pad(img1, w)
    mu2 = _conv2d_zero_pad(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _conv2d_zero_pad(img1 * img1, w) - mu1_sq
    s2 = _conv2d_zero_pad(img2 * img2, w) - mu2_sq
    s12 = _conv2d_zero_pad(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return m.mean()


def l1_ref(a, b):
    return np.abs(a - b).mean()


def photometric_ref(image, gt, lambda_dssim=0.2):
    return (1.0 - lambda_dssim) * l1_ref(image, gt) + lambda_dssim * (
        1.0 - ssim_ref(image, gt)
    )


def opacity_ref(opacity, n_init):
    return opacity.sum() / n_init


def radii_opacity_ref(opacity, radii, n_init):
    return opacity[radii > 0].sum() / n_init


def accumulated_opacity_ref(acc):
    return (1.0 - acc).mean()


def translucent_shadows_ref(shadowmap):
    a = shadowmap
    b = np.clip(shadowmap, 0.05, 0.95)
    return -(a * np.log2(b) + (1.0 - a) * np.log2(1.0 - b)).mean()


def tv_altitude_ref(alt):
    d1 = np.abs(alt[..., 1:, :] - alt[..., :-1, :])
    d2 = np.abs(alt[..., :, 1:] - alt[..., :, :-1])
    return 0.5 * (d1.mean() + d2.mean())


def erank_ref(scaling):
    s2 = scaling.astype(np.float64) ** 2 + 1e-5
    total = s2.sum(axis=1, keepdims=True)
    q = s2 / total
    erankm1 = np.expm1(-(q * np.log(q + 1e-6)).sum(axis=1))
    per = np.clip(-np.log(erankm1 + 1e-5), 0.0, None) + np.sqrt(s2.min(axis=1))
    return per.mean()


def suncamera_ref(raw_render, sun_rgb_sample, sun_altitude_diff, sun_uv):
    vis = (sun_altitude_diff > -1e-2) & np.all(np.abs(sun_uv) < 1, axis=-1)
    assert vis.any()
    alt = (np.abs(sun_altitude_diff) * vis).sum() / vis.sum()
    rgb = (np.abs(raw_render - sun_rgb_sample) * vis[None]).sum() / vis.sum()
    return alt, rgb


def randomcam_ref(alt_render, new_alt_sample, rgb_render, new_rgb_sample,
                  new_uv, thr=0.30):
    d = alt_render - new_alt_sample
    occ = (np.abs(d) < thr) & np.all(np.abs(new_uv) < 1, axis=-1)
    assert occ.any()
    alt = (np.abs(d) * occ).sum() / occ.sum()
    rgb = (np.abs(rgb_render - new_rgb_sample) * occ[None]).sum() / occ.sum()
    return alt, rgb


def transient_nll_ref(image, gt, transient_mask, eps=1e-6):
    betaprime = (np.clip(transient_mask, 0.0, 1.0) + 1e-3) ** 2
    var = np.maximum(np.broadcast_to(betaprime[None], image.shape), eps)
    return (0.5 * (np.log(var) + (image - gt) ** 2 / var)).mean()
