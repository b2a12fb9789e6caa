"""On-chip kernel tests (VERDICT round-2 item 8): lock down the Pallas
branches that CPU interpret mode does NOT exercise (pltpu.roll scans, the
scalar-prefetch DMA windows, the ordered gradient write-back under tile
overflow).

Skipped on CPU; run on the real chip via:
    ./tpurun.sh python -m pytest tests/test_tpu_chip.py -x -q
Results are recorded in ROUND notes / BENCH json by the bench driver.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",),
    reason="needs the real TPU chip (run via ./tpurun.sh)",
)


def setup_module(_m):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _pallas_scan_harness(fn, x):
    """Run a sublane scan function inside a trivial pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:, :] = fn(x_ref[:, :])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("kc", [128, 256])
def test_roll_scan_sum_matches_cumsum(kc, axis):
    from eogs2_tpu.ops import fused_raster as FR

    rng = np.random.RandomState(0)
    shape = (kc, 256) if axis == 0 else (256, kc)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    got = _pallas_scan_harness(
        functools.partial(FR._scan_incl, interpret=False, axis=axis), x
    )
    # ground truth in f64; the log-tree roll scan and XLA's cumsum both
    # accumulate f32 rounding ~ depth*eps*|value| — compare normalized to
    # the value scale, not elementwise-relative (cumsum crosses zero)
    want = np.cumsum(np.asarray(x, np.float64), axis=axis)
    scale = np.max(np.abs(want))
    err = np.max(np.abs(np.asarray(got, np.float64) - want)) / scale
    assert err < 5e-5, err


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("kc", [128, 256])
def test_roll_scan_prod_matches_cumprod(kc, axis):
    from eogs2_tpu.ops import fused_raster as FR

    rng = np.random.RandomState(1)
    # transmittance-like inputs in (0.9, 1.0]
    shape = (kc, 256) if axis == 0 else (256, kc)
    x = jnp.asarray((1.0 - 0.1 * rng.rand(*shape)).astype(np.float32))
    got = _pallas_scan_harness(
        functools.partial(FR._scan_prod, interpret=False, axis=axis), x
    )
    want = np.cumprod(np.asarray(x, np.float64), axis=axis)
    # k sequential f32 multiplies accumulate ~k*eps relative error
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=0)


def _scene(n, seed=7, opac=0.7):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    means[:, 2] = -0.3 + 0.1 * rng.rand(n)
    scales = np.full((n, 3), 0.01, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    op = np.full((n,), opac, np.float32)
    rgb = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    affine = np.array(
        [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
        np.float32,
    )
    alt = means @ affine[2, :3] + affine[2, 3]
    feat = np.concatenate([rgb, alt[:, None], np.ones((n, 1), np.float32)], 1)
    bg = np.array([0, 0, 0, -1, 0], np.float32)
    return tuple(jnp.asarray(v)
                 for v in (means, scales, quats, op, feat, affine, bg))


def _vgrad(cfg, w, h):
    from eogs2_tpu.rasterizer import rasterize

    def loss(means, scales, quats, op, feat, affine, bg):
        out = rasterize(means, scales, quats, op, feat, affine, bg, w, h, cfg)
        return jnp.sum(out.image ** 2) * 1e-6, out
    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True))


def test_fused_matches_sorted_on_chip():
    """The real-chip fused path (roll scans, DMA double buffering, ordered
    write-back) must match the sorted path bit-for-tolerance, fwd + every
    gradient. This is the committed version of the ROUND1_NOTES manual
    parity claim."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    args = _scene(20_000)
    w = h = 256
    base = dict(tile_capacity=512, tile_chunk=128, max_tiles_per_gaussian=4)
    (lf, of), gf = _vgrad(RasterizeConfig(binning_mode="fused", **base), w, h)(*args)
    (ls, os_), gs = _vgrad(RasterizeConfig(binning_mode="sorted", **base), w, h)(*args)
    # fused (VPU-FMA) and sorted (MXU) compute power in different fp
    # orders, so pairs whose alpha sits within ~1e-5 of the 1/255 cutoff
    # flip inclusion between the paths; each flip moves a pixel by at most
    # cutoff-alpha * |feature| ~ 4e-3. Absolute parity vs the f64 oracle is
    # guarded tightly by scripts/chip_golden.py (maxerr 5.8e-6); this test
    # guards CONSISTENCY of the two approximate paths to the flip bound.
    np.testing.assert_allclose(np.asarray(of.image), np.asarray(os_.image),
                               atol=4e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(of.final_t), np.asarray(os_.final_t),
                               atol=4e-3, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gs)):
        assert np.all(np.isfinite(np.asarray(a)))
        aw, bw = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # floor the scale: an all-but-zero gradient leaf (e.g. rotation of
        # isotropic splats) is noise/noise and compares absolutely
        scale = max(np.max(np.abs(bw)), 1e-6)
        assert np.max(np.abs(aw - bw)) / scale < 2e-3


def test_fused_overflow_write_order_on_chip():
    """Deliberately overflowing tiles: tile_capacity far below the densest
    tile forces every window to clip and consecutive windows to overlap
    maximally — the regression for the ordered gradient write-back (later
    tiles' DMA must overwrite earlier tiles' zero tails, VERDICT weak #7).
    The clipped fused result must equal the sorted path at the SAME clipped
    capacity (identical truncation semantics)."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    args = _scene(20_000, seed=3, opac=0.05)  # translucent: deep tiles
    w = h = 128
    base = dict(tile_capacity=128, tile_chunk=64, max_tiles_per_gaussian=8)
    (lf, of), gf = _vgrad(RasterizeConfig(binning_mode="fused", **base), w, h)(*args)
    (ls, os_), gs = _vgrad(RasterizeConfig(binning_mode="sorted", **base), w, h)(*args)
    assert float(of.max_tile_count) > 128  # overflow actually happened
    # same flip-bound tolerance rationale as test_fused_matches_sorted
    np.testing.assert_allclose(np.asarray(of.image), np.asarray(os_.image),
                               atol=4e-3, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gs)):
        aw, bw = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.max(np.abs(bw)), 1e-6)
        assert np.max(np.abs(aw - bw)) / scale < 2e-3


def test_two_tier_and_eogs_diet_on_chip():
    """Round-4 paths on the real chip: two-tier emission (big_k>0) and the
    EOGS sort operand diet (eogs_features) must each match the plain fused
    path bit-for-tolerance, fwd + gradients (the altitude column is
    reconstructed from the sorted depth key; n_contrib bounds the bwd)."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    means, scales, quats, op, feat, affine, bg = _scene(20_000, seed=5)
    # a few outlier splats so the big tier actually engages
    scales = scales.at[:32].mul(8.0)
    args = (means, scales, quats, op, feat, affine, bg)
    w = h = 256
    base = dict(tile_capacity=1024, tile_chunk=128)
    cfg0 = RasterizeConfig(binning_mode="fused", max_tiles_per_gaussian=32,
                           **base)
    cfg_tier = RasterizeConfig(binning_mode="fused", max_tiles_per_gaussian=4,
                               big_k=64, big_tcap=32, **base)
    cfg_eogs = RasterizeConfig(binning_mode="fused", max_tiles_per_gaussian=32,
                               eogs_features=True, **base)
    (l0, o0), g0 = _vgrad(cfg0, w, h)(*args)
    (lt, ot), gt = _vgrad(cfg_tier, w, h)(*args)
    (le, oe), ge = _vgrad(cfg_eogs, w, h)(*args)
    assert int(ot.clipped_pairs) == 0, int(ot.clipped_pairs)
    # two-tier: identical pair set -> bit-identical-to-tolerance
    np.testing.assert_allclose(np.asarray(o0.image), np.asarray(ot.image),
                               atol=1e-5, rtol=1e-5)
    # eogs diet: altitude rebuilt from the key; same pairs, same order
    np.testing.assert_allclose(np.asarray(o0.image), np.asarray(oe.image),
                               atol=1e-5, rtol=1e-5)
    for ga, gb in ((gt, g0), (ge, g0)):
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            aw, bw = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.max(np.abs(bw)), 1e-6)
            assert np.max(np.abs(aw - bw)) / scale < 2e-3
