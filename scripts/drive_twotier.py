"""Verify driver: two-tier emission on the REAL chip — render + grads with
big_k>0 vs the single-tier path, on an outlier-splat scene."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax; jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from eogs2_tpu import rasterize, RasterizeConfig

N, W, H = 200_000, 512, 512
rng = np.random.RandomState(42)
means = rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32)
means[:, 2] = -0.3 + 0.1 * rng.rand(N)
scales = np.full((N, 3), 0.004, np.float32)
scales[:64] = 0.12  # outlier splats (the train_scale failure shape)
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), 0.5, np.float32)
rgb = rng.uniform(0.2, 0.9, (N, 3)).astype(np.float32)
affine = np.array([[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0],
                   [0, 0, 1.0, 0.0]], np.float32)
alt = means @ affine[2, :3] + affine[2, 3]
feat = np.concatenate([rgb, alt[:, None], np.ones((N, 1), np.float32)], 1)
bg = np.array([0, 0, 0, -1, 0], np.float32)
args = [jnp.asarray(x) for x in (means, scales, quats, opac, feat, affine, bg)]

cfg1 = RasterizeConfig(binning_mode="fused", tile_capacity=2048,
                       max_tiles_per_gaussian=64, early_exit=False)
cfg2 = RasterizeConfig(binning_mode="fused", tile_capacity=2048,
                       max_tiles_per_gaussian=4, early_exit=False,
                       big_k=128, big_tcap=64)

def run(cfg):
    def loss(m, s, q, o, f, a):
        out = rasterize(m, s, q, o, f, a, args[6], W, H, cfg)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)
    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5)),
                 static_argnames=())
    v, g = vg(*args[:6])
    jax.block_until_ready((v, g)); float(v)
    t0 = time.perf_counter()
    for _ in range(5):
        v, g = vg(*args[:6])
    jax.block_until_ready((v, g)); float(v)
    dt = (time.perf_counter() - t0) / 5
    out = jax.jit(lambda *a: rasterize(*a, W, H, cfg))(*args)
    return v, g, out, dt

v1, g1, o1, t1 = run(cfg1)
v2, g2, o2, t2 = run(cfg2)
print(f"single-tier tcap=64: loss={float(v1):.6f}  {t1*1e3:.1f} ms  "
      f"clipped={int(o1.clipped_pairs)} max_tiles={int(o1.big_max_tiles_seen)}")
print(f"two-tier tcap=4/big(128,64): loss={float(v2):.6f}  {t2*1e3:.1f} ms  "
      f"clipped={int(o2.clipped_pairs)} bulk_max={int(o2.max_tiles_per_gaussian_seen)} "
      f"big_max={int(o2.big_max_tiles_seen)}")
img_err = float(jnp.max(jnp.abs(o1.image - o2.image)))
print(f"image maxerr = {img_err:.3e}")
names = ["means", "scales", "quats", "opac", "feat", "affine"]
gerr = 0.0
for nm, a, b in zip(names, g1, g2):
    mx = float(jnp.max(jnp.abs(a)))
    df = float(jnp.max(jnp.abs(a - b)))
    rel = df / (mx + 1e-12)
    print(f"  grad[{nm}] maxabs={mx:.3e} maxdiff={df:.3e} rel={rel:.3e}")
    # relative to the ARG's own scale unless the grad is pure noise
    # (maxabs tiny vs the loss scale): then judge absolutely
    gerr = max(gerr, df / max(mx, 1e-3))
print(f"grad max relerr (noise-floored) = {gerr:.3e}")
import imageio.v2 as iio
rgbimg = np.clip(np.asarray(o2.image[:3]).transpose(1, 2, 0), 0, 1)
iio.imwrite("/tmp/twotier_rgb.png", (rgbimg * 255).astype(np.uint8))
altimg = np.asarray(o2.image[3]); altimg = (altimg - altimg.min()) / (np.ptp(altimg) + 1e-9)
iio.imwrite("/tmp/twotier_alt.png", (altimg * 255).astype(np.uint8))
# clipped>0 is EXPECTED here (the outlier splats exceed big_tcap by
# construction) — the check is that both paths clip identically and agree
ok = (img_err < 5e-5 and gerr < 2e-3
      and int(o1.clipped_pairs) == int(o2.clipped_pairs))
print("TWO-TIER CHIP VERIFY", "PASS" if ok else "FAIL")
