"""Golden numerical parity vs an independent CUDA-math oracle.

The goldens (tests/golden/scene1.npz) are produced by
tests/oracle_cuda_math.py — a pure-numpy float64 transcription of the
reference kernels (forward.cu:155-411, backward.cu:147-394,457-643) that
shares no code or algorithm with eogs2_tpu (sequential per-tile compositing
vs sort-carried scans). Agreement here is parity *by measurement*:
rendered images and every input gradient (means/scales/quats/opacity/
features/affine/viewspace) must match the reference math to float32
accuracy on a scene that exercises all skip rules.

Tolerances: the framework computes in float32; pairs whose alpha sits
within one float32 ulp of the 1/255 cutoff (or whose transmittance sits at
the 1e-4 early-exit edge) can be included by one implementation and
excluded by the other, bounding isolated pixel diffs by ~alpha*|feature|.
The scene has no such stragglers at the tolerances below.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "scene1.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _cfg(mode):
    return RasterizeConfig(
        tile_capacity=1024,
        max_tiles_per_gaussian=64,
        binning_mode=mode,
        use_pallas=(mode == "sorted"),
    )


def _run(golden, mode, antialiasing=False):
    g = golden
    w, h = int(g["width"]), int(g["height"])
    cfg = _cfg(mode)
    if antialiasing:
        import dataclasses

        cfg = dataclasses.replace(cfg, antialiasing=True)
    args = [jnp.asarray(g[k]) for k in
            ("means", "scales", "quats", "opac", "feat", "affine")]
    bg = jnp.asarray(g["bg"])
    ct = jnp.asarray(g["ct"])

    def loss(means, scales, quats, opac, feat, affine, off):
        out = rasterize(means, scales, quats, opac, feat, affine, bg, w, h,
                        cfg, mean2d_ndc_offset=off)
        return jnp.sum(out.image * ct), (out.image, out.final_t)

    off = jnp.zeros((args[0].shape[0], 2), jnp.float32)
    (_, (img, ft)), grads = jax.value_and_grad(loss, argnums=tuple(range(7)),
                                               has_aux=True)(*args, off)
    return np.asarray(img), np.asarray(ft), [np.asarray(x) for x in grads]


def _check_grads(grads, golden, tag, rtol):
    names = ("means", "scales", "quats", "opacities", "features", "affine",
             "mean2d_ndc")
    for got, name in zip(grads, names):
        want = golden[f"{tag}_g_{name}"]
        scale = np.max(np.abs(want)) + 1e-30
        err = np.max(np.abs(got - want)) / scale
        assert err < rtol, f"{name}: rel err {err:.3e} (tol {rtol})"


@pytest.mark.parametrize("mode", ["gather", "sorted", "fused"])
def test_golden_forward_and_grads(golden, mode):
    img, ft, grads = _run(golden, mode)
    np.testing.assert_allclose(img, golden["noaa_image"], atol=2e-4)
    np.testing.assert_allclose(ft, golden["noaa_final_T"], atol=2e-5)
    _check_grads(grads, golden, "noaa", rtol=2e-4)


def test_golden_losses():
    """Loss-stack golden (VERDICT r2 item 7): the framework's jitted f32
    loss functions must reproduce the frozen float64 oracle values
    (tests/oracle_losses.py — independent transcriptions of the reference
    loss/*.py + the torch-parity SSIM of utils/loss_utils.py:26-85) on the
    oracle-rendered golden scene."""
    import eogs2_tpu.losses as L
    from eogs2_tpu.ops.ssim import ssim

    g = np.load(os.path.join(os.path.dirname(__file__), "golden", "losses1.npz"))
    j = {k: jnp.asarray(g[k]) for k in g.files}
    n_init = float(g["n_init"])

    def chk(name, got, tol=2e-5):
        want = float(g[name])
        err = abs(float(got) - want) / (abs(want) + 1e-12)
        assert err < tol, f"{name}: got {float(got)!r} want {want!r} rel {err:.2e}"

    chk("ssim", ssim(j["image"], j["gt"]))
    chk("l1", L.l1_loss(j["image"], j["gt"]))
    chk("photometric", L.photometric_loss(j["image"], j["gt"], 0.2)[0])
    alive = jnp.ones(j["opacity"].shape, bool)
    chk("opacity_loss", L.opacity_loss(j["opacity"], alive, n_init))
    chk("radii_opacity", L.radii_opacity_loss(j["opacity"], j["radii"], n_init))
    chk("acc_opacity", L.accumulated_opacity_loss(1.0 - (1.0 - j["acc"])))
    chk("translucent", L.translucent_shadows_loss(j["shadowmap"]))
    chk("tv_altitude", L.tv_altitude_loss(j["altitude"]))
    chk("erank", L.erank_loss(j["scaling"], alive))
    sa, sr = L.suncamera_loss(j["image"], j["sun_rgb"], j["sun_diff"], j["sun_uv"])
    chk("sun_alt", sa)
    chk("sun_rgb_loss", sr)
    ra, rr = L.randomcam_loss(j["altitude"], j["new_alt"], j["image"],
                              j["new_rgb"], j["new_uv"])
    chk("rand_alt", ra)
    chk("rand_rgb_loss", rr)
    chk("nll", L.transient_nll_loss(j["image"], j["gt"], j["transient"]))


def test_golden_antialiasing(golden):
    # Looser than the no-AA case: the AA opacity rescale pushes 3 pairs of
    # this scene within one f32 ulp of the 1/255 alpha cutoff, so the f32
    # framework and f64 oracle disagree on including them (diff bounded by
    # alpha*|feature| ~ 1e-3 on isolated pixels; see module docstring).
    img, ft, grads = _run(golden, "gather", antialiasing=True)
    np.testing.assert_allclose(img, golden["aa_image"], atol=2e-3)
    np.testing.assert_allclose(ft, golden["aa_final_T"], atol=6e-4)
    _check_grads(grads, golden, "aa", rtol=2e-3)
