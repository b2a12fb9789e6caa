"""Pallas blend kernels (interpret mode on CPU) vs the jnp reference blend."""

import jax
import jax.numpy as jnp
import numpy as np

from eogs2_tpu.ops.blend import blend_tiles
from eogs2_tpu.ops.blend_pallas import (
    blend_tiles_pallas,
    pack_tile_data,
    unpack_grads,
)
from eogs2_tpu.ops.projection import TILE


def make_tiles(t=4, k=128, seed=0, grid_x=2):
    rng = np.random.RandomState(seed)
    # put gaussian centers near their tile so alphas are non-trivial
    origins = np.stack(
        [(np.arange(t) % grid_x) * TILE, (np.arange(t) // grid_x) * TILE], -1
    ).astype(np.float32)
    mean2d = (
        origins[:, None, :]
        + rng.uniform(-4, TILE + 4, (t, k, 2)).astype(np.float32)
    )
    conic = np.zeros((t, k, 3), np.float32)
    conic[..., 0] = rng.uniform(0.05, 0.3, (t, k))
    conic[..., 2] = rng.uniform(0.05, 0.3, (t, k))
    conic[..., 1] = rng.uniform(-0.02, 0.02, (t, k))
    opac = rng.uniform(0.1, 0.9, (t, k)).astype(np.float32)
    feat = rng.uniform(0, 1, (t, k, 5)).astype(np.float32)
    mask = rng.rand(t, k) > 0.1
    bg = np.array([0.2, 0.4, 0.6, -1.0, 0.0], np.float32)
    return (jnp.asarray(mean2d), jnp.asarray(conic), jnp.asarray(opac),
            jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(origins),
            jnp.asarray(bg))


def test_pallas_forward_matches_reference():
    m2, co, op, ft, mk, org, bg = make_tiles()
    ref_out, ref_ft = blend_tiles(m2, co, op, ft, mk, org, bg, tile_chunk=4)
    data = pack_tile_data(m2, co, op, ft, mk)
    img, final_t = blend_tiles_pallas(data, bg, 2, 128, True)
    np.testing.assert_allclose(img, ref_out, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(final_t, ref_ft, atol=1e-5, rtol=1e-4)


def test_pallas_forward_chunked():
    m2, co, op, ft, mk, org, bg = make_tiles(k=256)
    ref_out, ref_ft = blend_tiles(m2, co, op, ft, mk, org, bg, tile_chunk=4)
    data = pack_tile_data(m2, co, op, ft, mk)
    img, final_t = blend_tiles_pallas(data, bg, 2, 128, True)  # 2 chunks
    np.testing.assert_allclose(img, ref_out, atol=1e-4, rtol=1e-4)


def test_pallas_backward_matches_reference():
    m2, co, op, ft, mk, org, bg = make_tiles(k=128, seed=3)
    data = pack_tile_data(m2, co, op, ft, mk)

    def loss_ref(m2, co, op, ft, bg):
        out, final_t = blend_tiles(m2, co, op, ft, mk, org, bg, tile_chunk=4)
        w = jnp.arange(5.0) + 1.0
        return jnp.sum(out * w) + 0.3 * jnp.sum(final_t**2)

    def loss_pal(data, bg):
        img, final_t = blend_tiles_pallas(data, bg, 2, 128, True)
        w = jnp.arange(5.0) + 1.0
        return jnp.sum(img * w) + 0.3 * jnp.sum(final_t**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(m2, co, op, ft, bg)
    g_dat, g_bg = jax.grad(loss_pal, argnums=(0, 1))(data, bg)
    gm2, gco, gop, gft = unpack_grads(g_dat)
    np.testing.assert_allclose(gm2, g_ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(gco, g_ref[1], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(gop, g_ref[2], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(gft, g_ref[3], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(g_bg, g_ref[4], atol=2e-4, rtol=1e-3)


def test_pallas_backward_chunked():
    """Backward with multiple K-chunks (carry propagation across chunks)."""
    m2, co, op, ft, mk, org, bg = make_tiles(k=256, seed=5)
    data = pack_tile_data(m2, co, op, ft, mk)

    def loss_ref(m2, co, op, ft):
        out, final_t = blend_tiles(m2, co, op, ft, mk, org, bg, tile_chunk=4)
        return jnp.sum(out ** 2) + jnp.sum(final_t)

    def loss_pal(data):
        img, final_t = blend_tiles_pallas(data, bg, 2, 128, True)  # 2 chunks
        return jnp.sum(img ** 2) + jnp.sum(final_t)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(m2, co, op, ft)
    g_dat = jax.grad(loss_pal)(data)
    gm2, gco, gop, gft = unpack_grads(g_dat)
    np.testing.assert_allclose(gm2, g_ref[0], atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(gco, g_ref[1], atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(gop, g_ref[2], atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(gft, g_ref[3], atol=5e-4, rtol=2e-3)


def test_scan_incl_roll_algorithm():
    """The TPU roll-based scan (_scan_incl non-interpret branch) must equal
    an inclusive cumsum. pltpu.roll has no CPU lowering, so simulate the
    identical shift/add/select schedule with jnp.roll outside a kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    for p, k in ((8, 128), (4, 512), (2, 384)):
        x = jnp.asarray(rng.randn(p, k).astype(np.float32))
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = x
        s = 1
        while s < k:
            y = jnp.where(lane >= s, y + jnp.roll(y, s, 1), y)
            s *= 2
        np.testing.assert_allclose(
            np.asarray(y), np.cumsum(np.asarray(x), axis=1),
            rtol=1e-5, atol=1e-4,
        )
