"""Verify drive: public rasterize() fwd+bwd on the real TPU chip.

End-to-end chip check (the .claude/skills/verify recipe, committed):
  1. fused-path render at 100k gaussians / 512^2, fwd+bwd, finite grads
  2. fused vs sorted-path image/grad parity on the SAME chip
  3. num_pairs within capacity; PNG evidence written to /tmp/eogs2_verify_*.png
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

print("backend:", jax.default_backend(), jax.devices(), flush=True)

N, W, H = 100_000, 512, 512
rng = np.random.RandomState(42)
means = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
means[:, 2] = -0.3 + 0.1 * rng.rand(N)
scales = np.full((N, 3), 0.006, np.float32)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), 0.7, np.float32)
rgb = rng.uniform(0.2, 0.9, (N, 3)).astype(np.float32)
affine = np.array(
    [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
    np.float32,
)
alt = means @ affine[2, :3] + affine[2, 3]
feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
bg = np.array([0, 0, 0, -1, 0], np.float32)
args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, feat))
affine, bg = jnp.asarray(affine), jnp.asarray(bg)

def make_loss(cfg):
    def loss(means, scales, quats, opac, feat):
        out = rasterize(means, scales, quats, opac, feat, affine, bg, W, H, cfg)
        return jnp.sum(out.image ** 2) * 1e-6, (out.image, out.num_pairs)
    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True))

cfg_fused = RasterizeConfig(tile_capacity=1024, tile_chunk=128,
                            max_tiles_per_gaussian=4, binning_mode="fused",
                            pair_capacity=1 << 19)
cfg_sorted = RasterizeConfig(tile_capacity=1024, tile_chunk=128,
                             max_tiles_per_gaussian=4, binning_mode="sorted",
                             pair_capacity=1 << 19)

f_fused = make_loss(cfg_fused)
f_sorted = make_loss(cfg_sorted)

t0 = time.time()
(lf, (img_f, np_f)), g_f = f_fused(*args)
img_f = np.asarray(img_f); lf = float(lf)
print(f"fused: loss={lf:.6f} num_pairs={int(np_f)} compile+run {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
(ls, (img_s, np_s)), g_s = f_sorted(*args)
img_s = np.asarray(img_s); ls = float(ls)
print(f"sorted: loss={ls:.6f} num_pairs={int(np_s)} compile+run {time.time()-t0:.1f}s", flush=True)

# parity fused vs sorted on-chip
di = np.max(np.abs(img_f - img_s))
print(f"image max|diff| fused vs sorted: {di:.3e}", flush=True)
gmax = 0.0
for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_s)):
    a, b = np.asarray(a), np.asarray(b)
    gmax = max(gmax, float(np.max(np.abs(a - b))))
    assert np.all(np.isfinite(a)), "non-finite grad in fused path"
print(f"grad max|diff| fused vs sorted: {gmax:.3e}", flush=True)

import imageio.v2 as iio
rgb_img = np.clip(img_f[:3].transpose(1, 2, 0), 0, 1)
iio.imwrite("/tmp/eogs2_verify_rgb.png", (rgb_img * 255).astype(np.uint8))
a = img_f[3]
a = (a - a.min()) / max(a.max() - a.min(), 1e-9)
iio.imwrite("/tmp/eogs2_verify_alt.png", (a * 255).astype(np.uint8))
print("PNGs written", flush=True)

# image tolerance 5e-4: the fused (product-scan) and sorted (log-space)
# paths make different live/dead decisions for pairs exactly at the CUDA
# T<1e-4 early-out threshold, so borderline pairs contribute O(T_EPS)=1e-4
# image differences — inherent to the algorithm's own truncation, not a bug
# (gradients still match to ~1e-6).
ok = di < 5e-4 and gmax < 1e-3 and int(np_f) < (1 << 19)
print("VERIFY", "PASS" if ok else "FAIL", flush=True)
