"""RPC model, UTM conversion, and the RPC->affine pipeline on synthetic RPCs."""

import json
import os

import numpy as np
import pytest

from eogs2_tpu.dataset_creation.rpc import RPCModel, from_latlon
from eogs2_tpu.dataset_creation.to_affine import convert_scene, validate


def make_rpc(shear=(0.0, 0.0), lon0=-58.58, lat0=-34.45, width=256, height=256,
             gsd_deg=2e-6):
    """Synthetic linear RPC: col/row linear in (lat, lon, alt) — a valid
    RPC00B instance whose ground truth affine we know."""
    lon_scale, lat_scale, alt_scale = 0.01, 0.01, 100.0
    num0 = np.zeros(20)
    den = np.zeros(20)
    den[0] = 1.0
    # col = (nlon + sx*nalt) * col_scale + col_offset   (poly arg x=nlat, y=nlon, z=nalt)
    col_num = num0.copy()
    col_num[1] = 1.0  # y = nlon
    col_num[3] = shear[0]
    row_num = num0.copy()
    row_num[2] = 1.0  # x = nlat
    row_num[3] = shear[1]
    return {
        "row_offset": height / 2,
        "col_offset": width / 2,
        "lat_offset": lat0,
        "lon_offset": lon0,
        "alt_offset": 0.0,
        "row_scale": height / 2,
        "col_scale": width / 2,
        "lat_scale": lat_scale * 0.25,
        "lon_scale": lon_scale * 0.25,
        "alt_scale": alt_scale,
        "row_num": row_num.tolist(),
        "row_den": den.tolist(),
        "col_num": col_num.tolist(),
        "col_den": den.tolist(),
    }


def test_rpc_projection_localization_roundtrip():
    rpc = RPCModel(make_rpc(shear=(0.3, -0.2)))
    rng = np.random.RandomState(0)
    lon = rpc.lon_offset + rng.uniform(-1, 1, 50) * rpc.lon_scale * 0.5
    lat = rpc.lat_offset + rng.uniform(-1, 1, 50) * rpc.lat_scale * 0.5
    alt = rng.uniform(-20, 60, 50)
    col, row = rpc.projection(lon, lat, alt)
    lon2, lat2 = rpc.localization(col, row, alt)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_sanity():
    # Zone 21H (Buenos Aires area); compare against known reference values
    e, n, zn, zl = from_latlon(-34.45, -58.58)
    assert zn == 21 and zl == "H"
    assert 350000 < e < 700000
    assert n > 6_000_000  # southern hemisphere offset applied
    # local metric consistency: ~111.3 km per degree lat
    e2, n2, _, _ = from_latlon(-34.44, -58.58, force_zone_number=21)
    assert abs((n2 - n) - 1109.5) < 5


def test_convert_scene_end_to_end(tmp_path):
    md_dir = str(tmp_path / "meta")
    os.makedirs(md_dir)
    shears = [(0.0, 0.0), (0.3, 0.1), (-0.2, 0.25), (0.15, -0.3)]
    for i, sh in enumerate(shears):
        md = {
            "img": f"img_{i:02d}.tif",
            "width": 128,
            "height": 128,
            "min_alt": -20.0,
            "max_alt": 60.0,
            "sun_elevation": 35.0,
            "sun_azimuth": 120.0 + 10 * i,
            "rpc": make_rpc(shear=sh, width=128, height=128),
        }
        with open(os.path.join(md_dir, f"img_{i:02d}.json"), "w") as f:
            json.dump(md, f)

    out_dir = str(tmp_path / "scene")
    metas = convert_scene(md_dir, out_dir, test_fraction_last=1, grid=(9, 9, 9))
    validate(metas)  # sun invariant + Nadir presence

    # the fitted affine reproduces the RPC projection to sub-pixel accuracy
    m0 = metas[0]
    rpc = RPCModel(make_rpc(shear=shears[0], width=128, height=128))
    A = np.array(m0["model"]["coef_"])
    b = np.array(m0["model"]["intercept_"])
    scale = m0["model"]["scale"]
    shift = np.array(m0["model"]["center"])
    rng = np.random.RandomState(1)
    lon = rpc.lon_offset + rng.uniform(-1, 1, 20) * rpc.lon_scale * 0.4
    lat = rpc.lat_offset + rng.uniform(-1, 1, 20) * rpc.lat_scale * 0.4
    alt = rng.uniform(-15.0, 55.0, 20)
    col, row = rpc.projection(lon, lat, alt)
    e, n, _, _ = from_latlon(lat, lon, force_zone_number=m0["model"]["n"])
    world = (np.stack([e, n, alt], -1) - shift) / scale
    uva = world @ A.T + b
    px = ((uva[:, 0] + 1) * 128) / 2 - 0.5
    py = ((uva[:, 1] + 1) * 128) / 2 - 0.5
    assert np.abs(px - col).max() < 0.5, np.abs(px - col).max()
    assert np.abs(py - row).max() < 0.5
    np.testing.assert_allclose(uva[:, 2], alt, atol=0.5)

    # the produced scene loads through the standard loader
    from eogs2_tpu.scene import load_scene

    scene = load_scene(out_dir, images_msi_path=None, eval_split=True,
                       target_density=0.001)
    assert len(scene.train_views) == 3
    assert any("Nadir" in v.name for v in scene.test_views)
