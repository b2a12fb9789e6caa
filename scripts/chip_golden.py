"""Golden parity ON THE CHIP: run the frozen golden scene (tests/golden/
scene1.npz, produced by the independent float64 CUDA-math oracle) through
the real TPU fused rasterizer and check image + final_T + all 7 input
gradients against the stored goldens at the same tolerances as the CPU
test (tests/test_golden.py).

This is the hardware counterpart of test_golden — it guards exactly the
things CPU interpret mode cannot see: Mosaic lowering of the kernels and
the MXU matmul precision setting (fused_raster.HI).

Usage: ./tpurun.sh python scripts/chip_golden.py [wide|col]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

LAYOUT = sys.argv[1] if len(sys.argv) > 1 else "col"
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden", "scene1.npz")


def main():
    g = np.load(GOLDEN)
    w, h = int(g["width"]), int(g["height"])
    cfg = RasterizeConfig(
        tile_capacity=1024, max_tiles_per_gaussian=64, binning_mode="fused",
        payload_col=(LAYOUT == "col"),
    )
    args = [jnp.asarray(g[k]) for k in
            ("means", "scales", "quats", "opac", "feat", "affine")]
    bg = jnp.asarray(g["bg"])
    ct = jnp.asarray(g["ct"])

    @jax.jit
    def run(means, scales, quats, opac, feat, affine, off):
        def loss(m, s, q, o, f, a, of):
            out = rasterize(m, s, q, o, f, a, bg, w, h, cfg,
                            mean2d_ndc_offset=of)
            return jnp.sum(out.image * ct), (out.image, out.final_t)

        (_, (img, ft)), grads = jax.value_and_grad(
            loss, argnums=tuple(range(7)), has_aux=True
        )(means, scales, quats, opac, feat, affine, off)
        return img, ft, grads

    off = jnp.zeros((args[0].shape[0], 2), jnp.float32)
    img, ft, grads = run(*args, off)
    img, ft = np.asarray(img), np.asarray(ft)

    print(f"device={jax.devices()[0].platform} layout={LAYOUT}", flush=True)
    ok = True

    def chk(name, got, want, tol):
        nonlocal ok
        err = np.max(np.abs(got - want))
        good = err <= tol
        ok &= good
        print(f"  {name:14s} maxerr={err:.3e} (tol {tol:.0e}) "
              f"{'OK' if good else 'FAIL'}", flush=True)

    chk("image", img, g["noaa_image"], 2e-4)
    chk("final_T", ft, g["noaa_final_T"], 2e-5)
    names = ("means", "scales", "quats", "opacities", "features", "affine",
             "mean2d_ndc")
    for got, name in zip(grads, names):
        want = g[f"noaa_g_{name}"]
        scale = np.max(np.abs(want)) + 1e-30
        err = np.max(np.abs(np.asarray(got) - want)) / scale
        good = err < 2e-4
        ok &= good
        print(f"  g_{name:12s} rel err={err:.3e} (tol 2e-4) "
              f"{'OK' if good else 'FAIL'}", flush=True)
    print("CHIP GOLDEN " + ("PASS" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
