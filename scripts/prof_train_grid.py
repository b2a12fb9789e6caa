"""views_per_step x steps_per_dispatch grid on the real chip (VERDICT
round-2 item 10): measure sustained training it/s for each combination and
print a table for DESIGN.md. Uses a synthetic reference-schema scene.

Usage: ./tpurun.sh python scripts/prof_train_grid.py [N_GAUSS [IMG [ITERS]]]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eogs2_tpu.config import baseogs
from eogs2_tpu.data.synthetic import generate_scene
from eogs2_tpu.rasterizer import RasterizeConfig
from eogs2_tpu.scene import load_scene
from eogs2_tpu.train import Trainer

IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 120

d = tempfile.mkdtemp()
generate_scene(d, n_views=8, width=IMG, height=IMG, hf_res=128,
               n_buildings=6, scale=40.0, seed=0)
scene = load_scene(d, images_msi_path=os.path.join(d, "images"),
                   eval_split=True, load_pan=False)

print(f"device={jax.devices()[0].platform} img={IMG} iters={ITERS} "
      f"n_init={len(scene.init_xyz)}", flush=True)
print(f"{'vps':>4} {'spd':>4} {'it/s':>8} {'renders/s':>10}", flush=True)

for vps in (1, 2, 4):
    for spd in (1, 4, 16):
        cfg = baseogs(d, iterations=ITERS + 160)
        cfg.logging.tb_log_interval = 10_000
        cfg.optimization.views_per_step = vps
        cfg.optimization.densification.densify_from_iter = 10 ** 9
        cfg.optimization.only_prune = True
        cfg.optimization.iterstart_shadowmapping = 0
        cfg.optimization.iterstart_L_new_resample = 0
        # start at the CONVERGED capacities for this scene: a mid-timing
        # rebucket recompiles through the tunnel (~60 s) and destroys the
        # it/s measurement (observed 0.21 it/s artifacts)
        rcfg = RasterizeConfig(tile_capacity=2048, tile_chunk=128,
                               max_tiles_per_gaussian=32,
                               binning_mode="fused")
        tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg,
                     steps_per_dispatch=spd, auto_rebucket=False).setup()
        # warmup past EVERY event cadence (prune at densification_interval
        # = 100 fragments the dispatch chunks -> new span lengths compile;
        # a mid-timing compile through the tunnel destroys the row)
        tr.train(max_iterations=160, progress=False)
        jax.block_until_ready(tr.state.params.xyz)
        t0 = time.perf_counter()
        tr.train(max_iterations=ITERS, progress=False)
        # train() enqueues async dispatches; block on the final state or the
        # measurement is just the enqueue rate (observed "861 it/s")
        jax.block_until_ready(tr.state.params.xyz)
        float(jnp.sum(tr.state.params.xyz))
        dt = time.perf_counter() - t0
        its = ITERS / dt
        print(f"{vps:>4} {spd:>4} {its:>8.2f} {its * vps:>10.2f}",
              flush=True)
