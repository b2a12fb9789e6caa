"""Chip A/B for the round-5 ellipse-exact tile cull + slot compaction.

Measures the REAL workload: the reference-scale scene's anisotropic init
state (the synthetic bench scenes use isotropic 2-3-tile splats where the
AABB has no dead corners — culling is a no-op there by design).

Usage: ./tpurun.sh python scripts/prof_cull.py [SCENE_DIR [REPS]]
Prints fwd+bwd wall time and Mrays/s for:
  A) uncull probe config (joint min-row search, rect demand)
  B) tile_cull (sentinel slots, same table)
  C) tile_cull + rect_cap compaction (active-sized table)
and the max image/grad deviation B vs A (expected: fp reassociation only).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from eogs2_tpu.config import baseogs
from eogs2_tpu.rasterizer import RasterizeConfig, rasterize
from eogs2_tpu.scene import load_scene
from eogs2_tpu.train import Trainer

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_scene5"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

scene = load_scene(d, images_msi_path=os.path.join(d, "images"),
                   images_pan_path=os.path.join(d, "images_pan"),
                   eval_split=True, load_pan=True)
cfg = baseogs(d, iterations=10)
base_rc = RasterizeConfig(tile_capacity=4096, tile_chunk=128,
                          max_tiles_per_gaussian=8, binning_mode="fused",
                          early_exit=False, big_k=4096, big_tcap=64)
tr = Trainer(cfg=cfg, scene=scene, raster_cfg=base_rc,
             auto_rebucket=False).setup()
p = tr.state.params
means = p.xyz
scales = jnp.exp(p.scaling)
quats = p.rotation
opac = jax.nn.sigmoid(p.opacity[:, 0])
alive = tr.state.aux.alive
cam = scene.train_views[0].camera
w, h = cam.width, cam.height
affine = cam.affine
alt = means @ affine[2, :3] + affine[2, 3]
rgb = jnp.clip(p.features_dc[:, 0, :] * 0.28209479177 + 0.5, 0.0, 1.0)
feat = jnp.concatenate([rgb, alt[:, None], jnp.ones((means.shape[0], 1))], 1)
bg = jnp.asarray(np.array([0, 0, 0, -1, 0], np.float32))


def probe(cull):
    tr.raster_cfg = RasterizeConfig(
        tile_capacity=4096, tile_chunk=128, max_tiles_per_gaussian=8,
        binning_mode="fused", early_exit=False, big_k=0, big_tcap=64,
        tile_cull=cull, eogs_features=True,
    )
    return tr.probe_capacities()


def run(rc, label):
    def loss(means, scales, quats, opac, feat, affine):
        out = rasterize(means, scales, quats, opac, feat, affine, bg,
                        w, h, rc, alive=alive)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t), out.num_pairs

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                   has_aux=True))
    (v, npair), g = f(means, scales, quats, opac, feat, affine)
    jax.block_until_ready(g)
    float(v)
    t0 = time.perf_counter()
    for _ in range(REPS):
        (v, npair), g = f(means, scales, quats, opac, feat, affine)
    jax.block_until_ready(g)
    float(v)
    dt = (time.perf_counter() - t0) / REPS
    rows = (means.shape[0] * rc.max_tiles_per_gaussian
            + rc.big_k * rc.big_tcap)
    print(f"{label}: {dt * 1e3:.1f} ms fwd+bwd = "
          f"{w * h / dt / 1e6:.2f} Mrays/s  "
          f"(pairs {int(npair) / 1e6:.2f}M, rows {rows / 1e6:.1f}M, "
          f"tcap={rc.max_tiles_per_gaussian}, big=({rc.big_k},{rc.big_tcap}), "
          f"rect_cap={rc.rect_cap}, cull={rc.tile_cull})")
    return v, g, dt


rc_a = probe(False)
va, ga, dta = run(rc_a, "A uncull      ")
rc_b = dataclasses.replace(rc_a, tile_cull=True)
vb, gb, dtb = run(rc_b, "B cull        ")
rc_c = probe(True)
vc, gc, dtc = run(rc_c, "C cull+compact")

ia = float(jnp.abs(va - vb))
gmax = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(ga, gb))
print(f"B vs A: |dloss|={ia:.3e} max|dgrad|={gmax:.3e} (expect fp noise)")
gmax_c = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(ga, gc))
print(f"C vs A: |dloss|={float(jnp.abs(va - vc)):.3e} max|dgrad|={gmax_c:.3e}")
print(f"speedup B/A: {dta / dtb:.2f}x   C/A: {dta / dtc:.2f}x")
