"""Rasterizer correctness: tiled pipeline vs dense oracle, and the
hand-derived blend VJP vs JAX autodiff of the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eogs2_tpu.rasterizer import (
    NUM_CHANNELS,
    RasterizeConfig,
    rasterize,
    reference_rasterize,
)


def make_scene(n=256, seed=0, opac_max=0.8):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.08), (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.05, opac_max, (n,)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    # EOGS feature layout: rgb, altitude, constant 1
    affine = np.array(
        [
            [0.9, 0.05, 0.15, 0.01],
            [-0.04, 0.88, -0.2, -0.02],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=np.float32,
    )
    alt = means @ affine[2, :3] + affine[2, 3]
    feat = np.concatenate([rgb, alt[:, None], np.ones((n, 1), np.float32)], axis=1)
    bg = np.array([0.3, 0.5, 0.2, -1.0, 0.0], dtype=np.float32)
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
        jnp.asarray(feat),
        jnp.asarray(affine),
        jnp.asarray(bg),
    )


CFG = RasterizeConfig(pair_capacity=1 << 15, tile_capacity=256, tile_chunk=8)


@pytest.mark.parametrize("wh", [(64, 64), (80, 48)])
def test_tiled_matches_oracle(wh):
    w, h = wh
    args = make_scene()
    out = rasterize(*args, width=w, height=h, config=CFG)
    img_ref, ft_ref, radii_ref = reference_rasterize(*args, width=w, height=h)
    assert out.num_pairs < CFG.pair_capacity
    assert out.max_tile_count < CFG.tile_capacity
    np.testing.assert_allclose(out.image, img_ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.final_t, ft_ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(out.radii, radii_ref)


def test_altitude_channel_and_background():
    """Empty region composites the background; altitude channel is sensible."""
    args = list(make_scene(n=16))
    out = rasterize(*args, width=64, height=64, config=CFG)
    img = np.asarray(out.image)
    ft = np.asarray(out.final_t)
    empty = ft > 0.999
    assert empty.any()
    bg = np.asarray(args[6])
    for c in range(NUM_CHANNELS):
        np.testing.assert_allclose(img[c][empty], bg[c], atol=1e-3)


def test_custom_vjp_matches_autodiff():
    """The hand-derived blend backward equals autodiff of the same forward
    (away from the alpha=0.99 clamp where the reference intentionally drops
    the clamp derivative)."""
    args = make_scene(n=128, opac_max=0.7)
    w = h = 48

    def loss_with(cfg):
        def f(means, scales, quats, opac, feat, affine, bg):
            out = rasterize(
                means, scales, quats, opac, feat, affine, bg, w, h, cfg
            )
            weights = jnp.arange(NUM_CHANNELS, dtype=jnp.float32) + 1.0
            return jnp.sum(out.image * weights[:, None, None] ** 0.5) + 0.1 * jnp.sum(
                out.final_t
            )

        return f

    cfg_cvjp = CFG
    cfg_ad = RasterizeConfig(
        pair_capacity=CFG.pair_capacity,
        tile_capacity=CFG.tile_capacity,
        tile_chunk=8,
        use_custom_vjp=False,
    )
    g1 = jax.grad(loss_with(cfg_cvjp), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g2 = jax.grad(loss_with(cfg_ad), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    names = ["means", "scales", "quats", "opac", "feat", "affine", "bg"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-3, err_msg=n)


def test_gradients_flow_into_camera():
    """dL/d(affine) is nonzero: the pose-refinement path (the reference's
    dL_dT export, backward.cu:276-325) falls out of autodiff."""
    args = make_scene(n=64)

    def f(affine):
        out = rasterize(
            args[0], args[1], args[2], args[3], args[4], affine, args[6],
            48, 48, CFG,
        )
        return jnp.sum(out.image[:3] ** 2)

    g = jax.grad(f)(args[5])
    assert np.abs(np.asarray(g)).max() > 1e-3


def test_alive_mask_culls():
    args = list(make_scene(n=64))
    alive = jnp.zeros((64,), dtype=bool).at[:32].set(True)
    out_masked = rasterize(*args, width=48, height=48, config=CFG, alive=alive)
    args_half = [a[:32] if getattr(a, "ndim", 0) >= 1 and a.shape[0] == 64 else a for a in args]
    out_half = rasterize(*args_half, width=48, height=48, config=CFG)
    np.testing.assert_allclose(out_masked.image, out_half.image, atol=2e-5, rtol=1e-4)


def test_sorted_binning_mode_matches_gather():
    """The sort-carried pair pipeline (binning_mode='sorted') must match the
    gather path forward and backward."""
    args = make_scene(n=256, seed=11)
    w = h = 64
    cfg_g = RasterizeConfig(tile_capacity=256, tile_chunk=8,
                            max_tiles_per_gaussian=16, binning_mode="gather")
    cfg_s = RasterizeConfig(tile_capacity=256, tile_chunk=8,
                            max_tiles_per_gaussian=16, binning_mode="sorted")
    out_g = rasterize(*args, width=w, height=h, config=cfg_g)
    out_s = rasterize(*args, width=w, height=h, config=cfg_s)
    np.testing.assert_allclose(out_s.image, out_g.image, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out_s.final_t, out_g.final_t, atol=2e-5)

    def loss_with(cfg):
        def f(means, scales, quats, opac, feat, affine, bg):
            out = rasterize(means, scales, quats, opac, feat, affine, bg,
                            w, h, cfg)
            return jnp.sum(out.image ** 2) + jnp.sum(out.final_t)
        return f

    g1 = jax.grad(loss_with(cfg_g), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g2 = jax.grad(loss_with(cfg_s), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for n_, a, b in zip(["means", "scales", "quats", "opac", "feat", "affine"],
                        g1, g2):
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=5e-3, err_msg=n_)
