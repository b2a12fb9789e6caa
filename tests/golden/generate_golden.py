"""Generate the frozen golden-parity scene + oracle outputs (scene1.npz).

Run from the repo root:  python tests/golden/generate_golden.py

The scene is deterministic (seed 7) and deliberately exercises every skip
rule of the reference kernels: off-screen gaussians (empty tile rect),
near-opaque gaussians (the min(0.99, alpha) clamp and the T<1e-4 early
exit), tiny gaussians (alpha < 1/255 skip), unnormalized quaternions, and
a sheared affine. Oracle outputs are float64 (tests/oracle_cuda_math.py —
an independent numpy transcription of the reference CUDA math).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from oracle_cuda_math import backward, render  # noqa: E402

N = 1000
W = H = 128


def build_scene():
    rng = np.random.RandomState(7)
    means = np.empty((N, 3), np.float32)
    means[:, 0] = rng.uniform(-1.15, 1.15, N)  # some fully off-screen
    means[:, 1] = rng.uniform(-1.15, 1.15, N)
    means[:, 2] = rng.uniform(-0.5, 0.5, N)
    means[:30, :2] = rng.uniform(-0.3, 0.3, (30, 2))  # clustered overlap
    scales = np.exp(rng.normal(-4.6, 0.55, (N, 3))).astype(np.float32)
    scales[:8] *= 8.0  # big splats spanning many tiles
    quats = rng.normal(0, 1, (N, 4)).astype(np.float32)  # raw, unnormalized
    opac = rng.uniform(0.05, 0.6, N).astype(np.float32)
    opac[8:38] = 0.999  # hit the 0.99 alpha clamp + early exit
    rgb = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    affine = np.array(
        [[0.93, 0.11, 0.21, 0.013],
         [-0.07, 1.04, -0.18, -0.021],
         [0.04, -0.03, 0.96, 0.05]], np.float32)
    alt = (means @ affine[2, :3] + affine[2, 3]).astype(np.float32)
    feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
    bg = np.array([0.13, 0.37, 0.71, -0.62, 0.0], np.float32)
    ct = rng.normal(0, 1, (5, H, W)).astype(np.float32)  # loss cotangent
    return dict(means=means, scales=scales, quats=quats, opac=opac,
                feat=feat, affine=affine, bg=bg, ct=ct)


def main():
    s = build_scene()
    f64 = {k: v.astype(np.float64) for k, v in s.items()}
    out = {}
    for aa in (False, True):
        tag = "aa" if aa else "noaa"
        fwd = render(f64["means"], f64["scales"], f64["quats"], f64["opac"],
                     f64["feat"], f64["affine"], f64["bg"], W, H,
                     antialiasing=aa)
        g = backward(fwd, f64["means"], f64["scales"], f64["quats"],
                     f64["opac"], f64["feat"], f64["affine"], f64["bg"],
                     W, H, f64["ct"], antialiasing=aa)
        out[f"{tag}_image"] = fwd["image"]
        out[f"{tag}_final_T"] = fwd["final_T"]
        for k, v in g.items():
            out[f"{tag}_g_{k}"] = v
        ft = fwd["final_T"]
        print(f"[{tag}] pairs={len(fwd['gauss'])} "
              f"img_range=[{fwd['image'].min():.3f},{fwd['image'].max():.3f}] "
              f"T quantiles={np.quantile(ft, [0, .25, .5, .75, 1]).round(4)} "
              f"culled={int((~fwd['prep']['ok']).sum())}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scene1.npz")
    np.savez_compressed(path, **s, **out, width=W, height=H)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
