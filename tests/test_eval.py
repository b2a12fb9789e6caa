"""Eval-stack units: GeoTIFF round trip, NCC registration, DSM flattening,
MAE computer."""

import numpy as np

from eogs2_tpu.io.geotiff import Affine, read_geotiff, write_geotiff
from eogs2_tpu.eval.registration import (
    compute_shift,
    apply_shift,
    downsample2x,
    dsm_pointwise_diff,
)
from eogs2_tpu.eval.dsm import flatten_cloud
from eogs2_tpu.eval.mae import MaeComputer


def test_geotiff_roundtrip(tmp_path):
    arr = np.random.RandomState(0).rand(33, 47).astype(np.float32)
    t = Affine.from_origin(354000.5, 3456789.0, 0.5, 0.5)
    p = str(tmp_path / "x.tif")
    write_geotiff(p, arr, transform=t)
    back, prof = read_geotiff(p)
    np.testing.assert_allclose(back, arr, rtol=1e-6)
    t2 = prof["transform"]
    assert t2 is not None
    np.testing.assert_allclose([t2.a, t2.c, t2.e, t2.f], [t.a, t.c, t.e, t.f])


def test_affine_inverse():
    t = Affine.from_origin(100.0, 500.0, 0.5, 0.5)
    x, y = t * (10, 20)
    c, r = t.inv((x, y))
    np.testing.assert_allclose([c, r], [10, 20], atol=1e-9)


def test_downsample_nanmean():
    u = np.array([[1.0, np.nan], [3.0, 5.0]])
    out = downsample2x(u)
    np.testing.assert_allclose(out, [[3.0]])


def test_registration_recovers_shift():
    rng = np.random.RandomState(1)
    base = rng.rand(120, 130) * 10
    # smooth it so NCC has structure
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 3)
    dx_true, dy_true, b_true = 3, -2, 1.5
    shifted = apply_shift(base, dx_true, dy_true, 1.0, -b_true)
    dx, dy, a, b = compute_shift(base, shifted, scaling=False)
    # registering `shifted` back onto base must undo the shift
    assert (dx, dy) == (-dx_true, -dy_true) or abs(dx + dx_true) + abs(dy + dy_true) <= 1
    reg = apply_shift(shifted, dx, dy, a, b)
    ok = np.isfinite(reg) & np.isfinite(base)
    assert np.abs(reg[ok] - base[ok]).mean() < 0.05


def test_flatten_cloud_mean():
    pts = np.array(
        [[0.25, -0.25, 1.0], [0.3, -0.3, 3.0], [5.25, -3.25, 7.0]], np.float64
    )
    out = flatten_cloud(pts, xoff=0.0, yoff=0.0, resolution=0.5, xsize=12, ysize=8,
                        radius=1)
    assert np.isclose(out[0, 0], 2.0)  # two points average in cell (0,0)
    assert np.isclose(out[6, 10], 7.0)
    assert np.isnan(out[3, 3])


def test_mae_computer_perfect_prediction():
    rng = np.random.RandomState(2)
    from scipy.ndimage import gaussian_filter

    gt = gaussian_filter(rng.rand(128, 128) * 20, 2)
    t = Affine.from_origin(0.0, 64.0, 0.5, 0.5)
    mc = MaeComputer(gt.astype(np.float64), (0.0, 64.0, 64.0, 0.0))
    mae, diff, rdsm = mc.compute_mae(gt + 2.0, t)  # constant offset removed by z-shift
    assert mae < 1e-6


def test_mae_computer_detects_error():
    rng = np.random.RandomState(3)
    from scipy.ndimage import gaussian_filter

    gt = gaussian_filter(rng.rand(128, 128) * 20, 2)
    t = Affine.from_origin(0.0, 64.0, 0.5, 0.5)
    mc = MaeComputer(gt.astype(np.float64), (0.0, 64.0, 64.0, 0.0))
    bad = gt + rng.rand(128, 128) * 4
    mae, _, _ = mc.compute_mae(bad, t)
    assert 0.5 < mae < 4.0


def test_native_registration_matches_numpy():
    """C++/OpenMP dsmr kernels agree with the numpy reference path."""
    from eogs2_tpu import native
    from eogs2_tpu.eval import registration as reg

    lib = native.get_lib()
    assert lib is not None, "native build failed (g++ present in this env)"
    rng = np.random.RandomState(7)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.rand(150, 140) * 12, 2)
    base[rng.rand(150, 140) < 0.02] = np.nan  # exercise NaN handling
    shifted = reg.apply_shift(base, 2, -3, 1.0, -0.7)

    np_res = reg.compute_shift(base, shifted, scaling=False)
    c_res = native.compute_shift(base, shifted, scaling=False)
    assert np_res[:2] == c_res[:2], (np_res, c_res)
    np.testing.assert_allclose(c_res[2:], np_res[2:], rtol=1e-10)

    out_np = reg.apply_shift(shifted, *np_res)
    out_c = native.apply_shift(shifted, *c_res)
    both = np.isfinite(out_np) & np.isfinite(out_c)
    np.testing.assert_allclose(out_c[both], out_np[both], rtol=1e-12)
    assert (np.isnan(out_np) == np.isnan(out_c)).all()
