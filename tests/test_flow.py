"""Flow estimation: phase correlation recovers known shifts; affine
adjustment moves the projection the right way."""

import numpy as np
import jax.numpy as jnp

from eogs2_tpu.flow import (
    adjust_affine,
    apply_flow_to_image,
    estimate_flow,
    lucas_kanade_flow,
    phase_correlation_shift,
)


def _textured(h=96, w=96, seed=0):
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.rand(h, w), 2).astype(np.float32)
    return img


def test_phase_correlation_recovers_shift():
    img = _textured()
    for dx_t, dy_t in [(3.0, -2.0), (-5.0, 4.0), (0.0, 0.0)]:
        # render = gt shifted by (dx_t, dy_t): render(x) = gt(x - d)
        shifted = np.roll(np.roll(img, int(dy_t), axis=0), int(dx_t), axis=1)
        dx, dy = phase_correlation_shift(jnp.asarray(img[None]), jnp.asarray(shifted[None]))
        assert abs(float(dx) - dx_t) < 0.5, (float(dx), dx_t)
        assert abs(float(dy) - dy_t) < 0.5, (float(dy), dy_t)


def test_warp_undoes_shift():
    img = _textured(seed=1)
    shifted = np.roll(img, 3, axis=1)  # render displaced by +3 px in x
    dx, dy = phase_correlation_shift(jnp.asarray(img[None]), jnp.asarray(shifted[None]))
    warped = apply_flow_to_image(jnp.asarray(shifted[None]), dx, dy)[0]
    inner = np.s_[8:-8, 8:-8]
    err = np.abs(np.asarray(warped)[inner] - img[inner]).mean()
    base = np.abs(shifted[inner] - img[inner]).mean()
    assert err < 0.25 * base


def test_lucas_kanade_small_shift():
    img = _textured(seed=2)
    shifted = np.roll(img, 2, axis=1)
    fx, fy = lucas_kanade_flow(jnp.asarray(img[None]), jnp.asarray(shifted[None]))
    inner = np.s_[16:-16, 16:-16]
    assert abs(float(np.median(np.asarray(fx)[inner])) - 2.0) < 0.6
    assert abs(float(np.median(np.asarray(fy)[inner]))) < 0.6


def test_flow_accept_criteria():
    """Each acceptance criterion's accept AND reject branch
    (flow_matching.py:305-329 parity)."""
    from eogs2_tpu.flow import flow_accept

    img = _textured(seed=3)
    gt = jnp.asarray(np.stack([img] * 3))
    # render displaced by +4 px in x; warping it back by the true flow
    # improves both PSNR and l_photom
    render = jnp.asarray(np.stack([np.roll(img, 4, axis=1)] * 3))
    dx, dy = phase_correlation_shift(gt, render)
    good_warp = apply_flow_to_image(render, dx, dy)
    bad_warp = apply_flow_to_image(render, dx + 20.0, dy)
    valid = jnp.ones((1,) + img.shape, bool)
    mag = 0.5 * (jnp.abs(dx) + jnp.abs(dy))

    # max_value_flow: threshold above/below the ~4px magnitude
    assert bool(flow_accept("max_value_flow", mag, render, good_warp, gt, valid, 5.0))
    assert not bool(flow_accept("max_value_flow", mag, render, good_warp, gt, valid, 1.0))
    # always: accepts even a bad warp
    assert bool(flow_accept("always", mag, render, bad_warp, gt, valid, 0.0))
    # psnr: good warp raises PSNR, bad warp lowers it
    assert bool(flow_accept("psnr", mag, render, good_warp, gt, valid, 0.0))
    assert not bool(flow_accept("psnr", mag, render, bad_warp, gt, valid, 0.0))
    # l_photom: same, through the (1-l)L1 + l(1-SSIM) criterion
    assert bool(flow_accept("l_photom", mag, render, good_warp, gt, valid, 0.0))
    assert not bool(flow_accept("l_photom", mag, render, bad_warp, gt, valid, 0.0))
    # unknown criteria rejected at trace time
    import pytest

    with pytest.raises(ValueError):
        flow_accept("nope", mag, render, good_warp, gt, valid, 0.0)


def test_dense_flow_in_estimate():
    """perform_cst_displacement=False routes to dense LK flow ([H,W] output)."""
    img = _textured(seed=4)
    shifted = np.roll(img, 2, axis=1)
    fx, fy = estimate_flow(
        jnp.asarray(img[None]), jnp.asarray(shifted[None]),
        perform_cst_displacement=False,
    )
    assert fx.shape == img.shape and fy.shape == img.shape
    warped = apply_flow_to_image(jnp.asarray(shifted[None]), fx, fy)[0]
    inner = np.s_[16:-16, 16:-16]
    err = np.abs(np.asarray(warped)[inner] - img[inner]).mean()
    base = np.abs(shifted[inner] - img[inner]).mean()
    assert err < 0.5 * base


def test_adjust_affine_direction():
    """After baking the flow into the intercept, the render should shift
    toward the GT: a +dx flow (render displaced +dx vs gt) lowers b_u."""
    affine = jnp.asarray(np.array(
        [[1.0, 0, 0, 0.1], [0, 1.0, 0, -0.1], [0, 0, 1.0, 0]], np.float32))
    out = adjust_affine(affine, img_w=100, img_h=50, mean_flow_x=5.0, mean_flow_y=-2.0)
    assert np.isclose(float(out[0, 3]), 0.1 - 5.0 * 2 / 100)
    assert np.isclose(float(out[1, 3]), -0.1 + 2.0 * 2 / 50)
