"""Fused ragged rasterizer (ops/fused_raster.py, binning_mode='fused'):
must match the dense sorted path and the O(N*P) oracle, forward and
backward, in interpret mode on the 8-virtual-device CPU harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _outlier_scene(n=384, seed=11, n_big=6):
    """Scene where a handful of splats are much wider than the rest —
    the measured shape of real training (ROUND3_NOTES train_scale: tcap
    grew 4->32 from a few outliers)."""
    means, scales, quats, opac, feat, affine, bg = make_scene(n=n, seed=seed)
    scales = np.asarray(scales).copy()
    scales[:n_big] *= 6.0  # outlier splats touch many tiles
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(feat), jnp.asarray(affine),
            jnp.asarray(bg))


def test_two_tier_matches_single_tier():
    """big_k>0 must be a pure re-bucketing: identical image and gradients
    to a single-tier table big enough for the widest splat, with zero
    clipped pairs when capacities fit."""
    args = _outlier_scene()
    wide = rasterize(*args, W, H, RasterizeConfig(
        tile_capacity=512, max_tiles_per_gaussian=64, binning_mode="fused"))
    mx = int(wide.max_tiles_per_gaussian_seen)
    assert mx > 8, "outlier scene must actually have wide splats"
    # size the bulk tier by the widest NON-big splat (what the trainer's
    # rebucket policy does via max_tiles_per_gaussian_seen)
    from eogs2_tpu.ops.projection import (
        compute_cov2d_direct, preprocess_gaussians)
    cov2d = compute_cov2d_direct(args[1], args[2], args[5], W, H)
    prep = preprocess_gaussians(args[0], None, args[3], args[5], W, H,
                                cov2d=cov2d)
    tiles = np.sort(np.asarray(prep.tiles_touched))[::-1]
    big_k = 16
    bulk_cap = int(tiles[big_k])  # widest splat outside the top-K
    assert bulk_cap < mx, "two-tier must actually shrink the bulk tier"
    cfg1 = RasterizeConfig(tile_capacity=512, max_tiles_per_gaussian=64,
                           binning_mode="fused")
    cfg2 = RasterizeConfig(tile_capacity=512,
                           max_tiles_per_gaussian=bulk_cap,
                           binning_mode="fused", big_k=big_k, big_tcap=64)

    def loss_with(cfg):
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], W, H, cfg)
            return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t ** 2)
        return loss

    o1 = rasterize(*args, W, H, cfg1)
    o2 = rasterize(*args, W, H, cfg2)
    assert int(o2.clipped_pairs) == 0
    assert int(o1.clipped_pairs) == 0
    # bulk max excludes the top-K splats; overall max is reported separately
    assert int(o2.max_tiles_per_gaussian_seen) <= bulk_cap
    assert int(o2.big_max_tiles_seen) == mx
    np.testing.assert_allclose(np.asarray(o1.image), np.asarray(o2.image),
                               atol=5e-5, rtol=1e-4)
    g1 = jax.grad(loss_with(cfg1), argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    g2 = jax.grad(loss_with(cfg2), argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_two_tier_gather_sort_matches():
    """The 4-operand gather-sort strategy must be bit-compatible with the
    carried sort under the two-tier emission."""
    from eogs2_tpu.ops import fused_raster as FR

    args = _outlier_scene(seed=12)
    cfg = RasterizeConfig(tile_capacity=512, max_tiles_per_gaussian=8,
                          binning_mode="fused", big_k=16, big_tcap=64)

    def run():
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], W, H, cfg)
            return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t ** 2)
        v, g = jax.value_and_grad(loss, argnums=(0, 3))(*args[:6])
        img = rasterize(*args, W, H, cfg).image
        return v, g, img

    old = FR._SORT_GATHER
    try:
        FR._SORT_GATHER = False
        v1, g1, img1 = run()
        FR._SORT_GATHER = True
        jax.clear_caches()  # same static args, different python flag
        v2, g2, img2 = run()
    finally:
        FR._SORT_GATHER = old
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_two_tier_clip_accounting():
    """Pairs beyond the frozen capacities must be COUNTED, not silent:
    clipped_pairs = bulk-tier clip + big-tier clip (+ tile_capacity clip)."""
    args = _outlier_scene()
    # big_k smaller than the number of wide splats and a tiny bulk tcap:
    # some non-big splats must clip
    cfg = RasterizeConfig(tile_capacity=512, max_tiles_per_gaussian=2,
                          binning_mode="fused", big_k=2, big_tcap=16)
    out = rasterize(*args, W, H, cfg)
    # oracle count on host
    wide = rasterize(*args, W, H, RasterizeConfig(
        tile_capacity=512, max_tiles_per_gaussian=64, binning_mode="fused"))
    # recompute tiles_touched via the preprocess used by both
    from eogs2_tpu.ops.projection import preprocess_gaussians, compute_cov2d_direct
    cov2d = compute_cov2d_direct(args[1], args[2], args[5], W, H)
    prep = preprocess_gaussians(args[0], None, args[3], args[5], W, H,
                                cov2d=cov2d)
    tiles = np.asarray(prep.tiles_touched)
    order = np.argsort(-tiles, kind="stable")
    big = order[:2]
    bulk = np.setdiff1d(np.arange(len(tiles)), big)
    expect = (np.maximum(tiles[bulk] - 2, 0).sum()
              + np.maximum(tiles[big] - 16, 0).sum())
    assert int(out.clipped_pairs) == int(expect)
    assert int(out.clipped_pairs) > 0


def test_eogs_features_sort_diet_matches():
    """eogs_features=True (altitude reconstructed from the depth key, ones
    rebuilt post-sort, constant-channel gradient zeroed) must reproduce the
    generic path: same image and same gradients for every real input."""
    args = make_scene(n=384, seed=21)
    cfg0 = RasterizeConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                           binning_mode="fused")
    cfg1 = RasterizeConfig(tile_capacity=256, max_tiles_per_gaussian=16,
                           binning_mode="fused", eogs_features=True)

    def loss_with(cfg):
        def loss(means, scales, quats, opac, affine):
            # feats rebuilt inside so the altitude column is means-linked
            alt = means @ affine[2, :3] + affine[2, 3]
            feat = jnp.concatenate(
                [args[4][:, :3], alt[:, None], jnp.ones_like(alt)[:, None]],
                axis=1)
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], W, H, cfg)
            return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t ** 2)
        return loss

    a = (args[0], args[1], args[2], args[3], args[5])
    v0 = loss_with(cfg0)(*a)
    v1 = loss_with(cfg1)(*a)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    g0 = jax.grad(loss_with(cfg0), argnums=(0, 1, 2, 3, 4))(*a)
    g1 = jax.grad(loss_with(cfg1), argnums=(0, 1, 2, 3, 4))(*a)
    for nm, x, y in zip(["means", "scales", "quats", "opac", "affine"],
                        g0, g1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4, err_msg=nm)


def _aniso_scene(n=384, seed=31):
    """Scene with strongly anisotropic splats so AABB rects have large
    dead-corner fractions (the tile-cull target regime)."""
    means, scales, quats, opac, feat, affine, bg = make_scene(n=n, seed=seed)
    rng = np.random.RandomState(seed + 1)
    s = np.asarray(scales).copy()
    idx = rng.choice(n, n // 2, replace=False)
    s[idx, 0] *= 6.0  # elongate one axis -> rotated thin ellipses
    return (means, jnp.asarray(s), quats, opac, feat, affine, bg)


@pytest.mark.parametrize("big_k", [0, 16])
def test_tile_cull_exact(big_k):
    """Ellipse-exact tile culling (round 5) is OUTPUT-EXACT: every culled
    slot would have failed the kernels' own per-pixel keep test
    (power<=0 & alpha>=1/255, the CUDA forward.cu/backward.cu skip).
    Exactness is proven here in f64: EVERY culled slot's tile has zero
    live pixels under the exact keep test. The full-path outputs then
    match to fp-reassociation noise only (removing alpha=0 slots shifts
    chunk boundaries, regrouping the (1-a) products; the image agrees to
    ~1 ulp, gradients to the usual product-chain amplification) — while
    the emitted pair count strictly drops on anisotropic scenes."""
    from eogs2_tpu.ops.binning import grid_dims
    from eogs2_tpu.ops.pair_pipeline import _tier_keys, cull_tau
    from eogs2_tpu.ops.projection import (
        TILE, compute_cov2d_direct, preprocess_gaussians)
    args = _aniso_scene()
    base = dict(binning_mode="fused", tile_capacity=512, tile_chunk=8,
                max_tiles_per_gaussian=64, big_k=big_k, big_tcap=96)

    def run(cfg):
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], 128, 128, cfg)
            return (jnp.sum(out.image ** 2) + jnp.sum(out.final_t),
                    (out.image, out.num_pairs, out.clipped_pairs))

        (v, aux), g = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                               has_aux=True)
        )(*args[:6])
        return v, aux, g

    # ---- f64 exactness proof: no culled slot has any live pixel ----
    means, scales, quats, opac = args[:4]
    cov2d = compute_cov2d_direct(scales, quats, args[5], 128, 128)
    prep = preprocess_gaussians(means, None, opac, args[5], 128, 128,
                                cov2d=cov2d)
    gx, _gy = grid_dims(128, 128)
    n_tiles = gx * _gy
    tcap = base["max_tiles_per_gaussian"]
    t_off, _, _ = _tier_keys(prep.rect_min, prep.rect_size, prep.depth,
                             prep.tiles_touched, tcap, gx, n_tiles)
    cull = (prep.mean2d, prep.conic, cull_tau(prep.opacity))
    t_on, _, _ = _tier_keys(prep.rect_min, prep.rect_size, prep.depth,
                            prep.tiles_touched, tcap, gx, n_tiles,
                            cull=cull)
    t_off = np.asarray(t_off).reshape(tcap, -1)
    t_on = np.asarray(t_on).reshape(tcap, -1)
    culled = np.argwhere(t_off != t_on)
    assert len(culled) > 0
    m64 = np.asarray(prep.mean2d, np.float64)
    c64 = np.asarray(prep.conic, np.float64)
    o64 = np.asarray(prep.opacity, np.float64)
    tau64 = 2.0 * np.log(255.0 * o64)
    for s_, g_ in culled:
        tile = int(t_off[s_, g_])
        ty, tx = tile // gx, tile % gx
        px, py = np.meshgrid(tx * TILE + np.arange(TILE),
                             ty * TILE + np.arange(TILE), indexing="xy")
        dx, dy = m64[g_, 0] - px, m64[g_, 1] - py
        a_, b_, c_ = c64[g_]
        q = a_ * dx * dx + 2 * b_ * dx * dy + c_ * dy * dy
        assert q.min() > tau64[g_], (g_, q.min(), tau64[g_])
    # ---- full path: fp-reassociation noise only ----
    v0, (img0, np0, cl0), g0 = run(RasterizeConfig(**base))
    v1, (img1, np1, cl1), g1 = run(RasterizeConfig(**base, tile_cull=True))
    np.testing.assert_allclose(img0, img1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-2)
    assert int(np1) < int(np0), (int(np1), int(np0))
    assert int(cl0) == 0 and int(cl1) == 0


def test_rect_cap_compaction_exact():
    """Slot compaction (rect_cap): with tcap sized by ACTIVE tiles and
    rect_cap covering the AABB, outputs match the uncompacted uncull
    baseline (fp-reassociation noise) while the table height tcap
    shrinks."""
    args = _aniso_scene(seed=37)
    base = dict(binning_mode="fused", tile_capacity=512, tile_chunk=8,
                big_k=16, big_tcap=96)

    def run(cfg):
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], 128, 128, cfg)
            return (jnp.sum(out.image ** 2) + jnp.sum(out.final_t),
                    (out.image, out.max_tiles_per_gaussian_seen,
                     out.clipped_pairs, out.bulk_rect_max_seen))

        (v, aux), g = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                               has_aux=True)
        )(*args[:6])
        return v, aux, g

    v0, (img0, _, cl0, _), g0 = run(
        RasterizeConfig(**base, max_tiles_per_gaussian=64)
    )
    assert int(cl0) == 0
    # probe pass: find the max ACTIVE bulk count under culling
    _, (_, bulk_active_max, _, rect_max), _ = run(
        RasterizeConfig(**base, max_tiles_per_gaussian=64, tile_cull=True)
    )
    tcap_active = int(bulk_active_max)
    assert tcap_active < 64, tcap_active
    v1, (img1, _, cl1, rect_seen), g1 = run(
        RasterizeConfig(**base, max_tiles_per_gaussian=tcap_active,
                        tile_cull=True, rect_cap=64)
    )
    assert int(cl1) == 0
    assert int(rect_seen) <= 64
    np.testing.assert_allclose(img0, img1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-2)


def test_big_rect_cap_compaction_exact():
    """Big-tier slot compaction (big_rect_cap): outputs match the
    uncompacted baseline (fp-reassociation noise) with big_tcap sized by
    the outliers' ACTIVE tiles."""
    args = _aniso_scene(seed=43)
    base = dict(binning_mode="fused", tile_capacity=512, tile_chunk=8,
                max_tiles_per_gaussian=32, big_k=96)

    def run(cfg):
        def loss(means, scales, quats, opac, feat, affine):
            out = rasterize(means, scales, quats, opac, feat, affine,
                            args[6], 128, 128, cfg)
            return (jnp.sum(out.image ** 2) + jnp.sum(out.final_t),
                    (out.image, out.big_max_tiles_seen, out.clipped_pairs))

        (v, aux), g = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                               has_aux=True)
        )(*args[:6])
        return v, aux, g

    v0, (img0, big_rect_max, cl0), g0 = run(
        RasterizeConfig(**base, big_tcap=96)
    )
    assert int(cl0) == 0
    # probe the outliers' max ACTIVE count under culling + compaction:
    # with a huge big_tcap the compacted demand (big_max_tiles_seen) is
    # the true active maximum
    _, (_, big_active_max, _), _ = run(
        RasterizeConfig(**base, big_tcap=96, tile_cull=True,
                        big_rect_cap=128)
    )
    bt = int(big_active_max)
    assert bt < int(big_rect_max), (bt, int(big_rect_max))
    v1, (img1, _, cl1), g1 = run(
        RasterizeConfig(**base, big_tcap=bt, tile_cull=True,
                        big_rect_cap=128)
    )
    assert int(cl1) == 0
    np.testing.assert_allclose(img0, img1, atol=2e-6, rtol=1e-6)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-2)
