"""Fused ragged rasterizer (ops/fused_raster.py, binning_mode='fused'):
must match the dense sorted path and the O(N*P) oracle, forward and
backward, in interpret mode on the 8-virtual-device CPU harness."""

import jax
import jax.numpy as jnp
import numpy as np

from eogs2_tpu.rasterizer import RasterizeConfig, rasterize, reference_rasterize
from tests.test_rasterizer import make_scene

W = H = 128

CFG_F = RasterizeConfig(tile_capacity=256, tile_chunk=16,
                        max_tiles_per_gaussian=16, binning_mode="fused")
CFG_S = RasterizeConfig(tile_capacity=256, tile_chunk=16,
                        max_tiles_per_gaussian=16, binning_mode="sorted")


def test_fused_forward_matches_oracle():
    args = make_scene(n=512, seed=7)
    out = rasterize(*args, W, H, CFG_F)
    img_ref, ft_ref, _ = reference_rasterize(*args, W, H)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), np.asarray(ft_ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_matches_sorted_forward_and_grads():
    args = make_scene(n=256, seed=3)

    def loss_with(cfg):
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], W, H, cfg)
            return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t ** 2)

        return loss

    lf = loss_with(CFG_F)(*args[:6])
    ls = loss_with(CFG_S)(*args[:6])
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-5)
    gf = jax.grad(loss_with(CFG_F), argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    gs = jax.grad(loss_with(CFG_S), argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_fused_tile_overflow_matches_sorted():
    """When a tile holds more pairs than K, both paths drop the same
    (depth-sorted) tail and report the same max_tile_count."""
    args = make_scene(n=512, seed=1)
    cfg_f = RasterizeConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                            binning_mode="fused")
    cfg_s = RasterizeConfig(tile_capacity=128, max_tiles_per_gaussian=16,
                            binning_mode="sorted")
    of = rasterize(*args, W, H, cfg_f)
    os_ = rasterize(*args, W, H, cfg_s)
    assert int(of.max_tile_count) == int(os_.max_tile_count)
    np.testing.assert_allclose(np.asarray(of.image), np.asarray(os_.image),
                               atol=5e-5, rtol=1e-4)


def test_fused_dead_mask():
    means, scales, quats, opac, feat, affine, bg = make_scene(n=128, seed=5)
    alive = jnp.arange(128) < 64
    out = rasterize(means, scales, quats, opac, feat, affine, bg, W, H,
                    CFG_F, alive=alive)
    # render only the alive half directly
    out2 = rasterize(means[:64], scales[:64], quats[:64], opac[:64],
                     feat[:64], affine, bg, W, H, CFG_F)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(out2.image),
                               atol=5e-5, rtol=1e-4)
