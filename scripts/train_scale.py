"""Reference-scale training run (VERDICT r2 item 3): >=1M init gaussians,
1024² synthetic images, the full eogsplus recipe, on one chip.

Records: it/s per phase, rebucket events, capacity/alive trajectory,
DSM-MAE trajectory (registered, synthetic lidar GT), final TSDF MAE.

Usage: ./tpurun.sh python scripts/train_scale.py [ITERS [WIDTH [SCALE]]]
"""

import json
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

from eogs2_tpu.config import baseogs, eogsplus
from eogs2_tpu.data.synthetic import generate_scene
from eogs2_tpu.eval.mae import MaeComputer
from eogs2_tpu.model import GaussianModel
from eogs2_tpu.pipeline import evaluate_dsm_mae
from eogs2_tpu.rasterizer import RasterizeConfig
from eogs2_tpu.scene import load_scene
from eogs2_tpu.train import Trainer

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
SCALE = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0  # ~1.04M init
RES = 0.5

d = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale_scene"
# recipe: eogsplus (default; 40k-iteration schedule, gates compressed when
# ITERS is small) or baseogs (the reference's COMPLETE 5k-iteration
# baseline recipe, gs_config/experiments/baseogs.yaml — at ITERS=5000 this
# is a full reference training budget, not a truncation)
RECIPE = sys.argv[5] if len(sys.argv) > 5 else "eogsplus"
if not os.path.exists(os.path.join(d, "affine_models.json")):
    print(f"generating {WIDTH}² scene at scale={SCALE} ...", flush=True)
    # ms modality: pan companions for the 3PAN eogsplus recipe
    generate_scene(d, n_views=7, width=WIDTH, height=WIDTH, hf_res=768,
                   n_buildings=24, scale=SCALE, seed=11, modality="ms")
scene = load_scene(d, images_msi_path=os.path.join(d, "images"),
                   images_pan_path=os.path.join(d, "images_pan"),
                   eval_split=True, load_pan=True)
print(f"scene: {len(scene.train_views)} train views, "
      f"init {len(scene.init_xyz)} gaussians", flush=True)

cfg = (baseogs if RECIPE == "baseogs" else eogsplus)(d, iterations=ITERS)
cfg.logging.tb_log_interval = 100
# Two-tier emission + PROBED capacities (round 4): guessing frozen caps
# from a previous run's trajectory clipped 2.8M pairs at iteration 50
# (the recorded eogsplus-1500 run); probe_capacities sizes tcap/big/K from
# the INIT state's actual tiles_touched histograms (preprocess only, no
# big compiles). auto_rebucket stays ON so mid-run growth (densification
# splats) rebuckets loudly instead of clipping silently; with the probe,
# grows should be rare.
rcfg = RasterizeConfig(tile_capacity=4096, tile_chunk=128,
                       max_tiles_per_gaussian=8, binning_mode="fused",
                       early_exit=False, big_k=4096, big_tcap=64,
                       # round 5: ellipse-exact tile culling + active-slot
                       # compaction (output-exact; the probe sizes tcap by
                       # ACTIVE tiles and rect_cap by the AABB, roughly
                       # halving emission rows at this anisotropic init)
                       tile_cull=True)
tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg,
             auto_rebucket=True).setup()
tr.probe_capacities()
mc = MaeComputer.from_synthetic(d, scale=SCALE, resolution=RES)

maes = []


def hook(trainer, state, iteration):
    model = GaussianModel(params=state.params, aux=state.aux)
    t0 = time.perf_counter()
    mae, _, _, _ = evaluate_dsm_mae(model, scene, mc, trainer.raster_cfg,
                                    resolution=RES)
    alive = int(np.asarray(state.aux.alive).sum())
    maes.append((iteration, float(mae), alive))
    print(f"[{iteration}] DSM MAE = {mae:.3f} m  alive={alive}  "
          f"(eval {time.perf_counter() - t0:.1f}s)", flush=True)


tr.eval_hook = hook
cfg.logging.testing_interval = max(100, ITERS // 6)

t0 = time.time()
tr.train(progress=False)
wall = time.time() - t0
hist = tr.metrics_history
its = [m.get("it_per_s", 0.0) for m in hist]


def _mmax(key):
    vals = [float(np.max(np.asarray(m.get(key, 0)))) for m in hist]
    return max(vals) if vals else 0.0


# post-run capacity validation (ADVICE r3): the frozen caps are only valid
# if nothing ever clipped — surface the observed maxima vs the caps so a
# late overflow can't silently corrupt the reported MAE numbers
observed = {
    "max_tile": _mmax("max_tile"),
    "max_tiles_per_gaussian_bulk": _mmax("max_tiles_per_gaussian"),
    "big_max_tiles": _mmax("big_max_tiles"),
    "clipped_pairs_max": _mmax("clipped_pairs"),
}
rc = tr.raster_cfg
caps_ok = (observed["max_tile"] <= rc.tile_capacity
           and observed["max_tiles_per_gaussian_bulk"]
           <= rc.max_tiles_per_gaussian
           and (not rc.big_k or observed["big_max_tiles"] <= rc.big_tcap)
           and observed["clipped_pairs_max"] == 0)
print(f"capacity validation: observed={observed} vs frozen caps "
      f"K={rc.tile_capacity} tcap={rc.max_tiles_per_gaussian} "
      f"big=({rc.big_k},{rc.big_tcap}) -> "
      f"{'OK (zero clipped pairs)' if caps_ok else 'OVERFLOWED'}",
      flush=True)
print(json.dumps({
    "iters": ITERS, "width": WIDTH, "init_gaussians": len(scene.init_xyz),
    "capacity": int(tr.state.params.xyz.shape[0]),
    "final_alive": int(np.asarray(tr.state.aux.alive).sum()),
    "wall_s": round(wall, 1),
    "it_per_s_trajectory": [round(x, 3) for x in its],
    "mae_trajectory": maes,
    "capacity_observed": observed,
    "caps_ok": bool(caps_ok),
    "final_raster_cfg": {
        "tile_capacity": rc.tile_capacity,
        "max_tiles_per_gaussian": rc.max_tiles_per_gaussian,
        "big_k": rc.big_k, "big_tcap": rc.big_tcap,
        "early_exit": rc.early_exit,
    },
    "final_loss": hist[-1]["loss"] if hist else None,
    "final_psnr": hist[-1].get("psnr") if hist else None,
}), flush=True)

# one TSDF fusion + registered MAE at the end (the in-loop trajectory is
# DSM MAE): render every train view's slanted altitude map, fuse, compare
# (the reference's tsdf.py postprocess, render_pan.py:285-306 hand-off)
try:
    from eogs2_tpu.eval.tsdf import run_tsdf
    from eogs2_tpu.pipeline import render_view_full

    t0 = time.perf_counter()
    model1 = GaussianModel(params=tr.state.params, aux=tr.state.aux)
    maps = {}
    for v in scene.train_views:
        out = render_view_full(model1, v.camera, tr.raster_cfg,
                               shading=tr.state.shading, with_sun=False)
        A = np.asarray(v.camera.affine)
        maps[v.name] = (A[:, :3], A[:, 3], np.asarray(out["altitude"]))
    with open(os.path.join(d, "affine_models.json")) as f:
        metas = json.load(f)
    if isinstance(metas, dict):
        metas = metas.get("pan", next(iter(metas.values())))
    md0 = metas[0]["model"]
    profile, dsm = run_tsdf(
        d, maps, md0["scale"], md0["min_world"], md0["max_world"],
        scene_shift=np.asarray(scene.scene_shift),
        vox_size=0.5, trunc_margin_fact=4.0, resolution=RES,
    )
    tmae, _, _ = mc.compute_mae(dsm, profile["transform"])
    print(f"TSDF MAE = {float(tmae):.3f} m "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
except Exception as e:  # noqa: BLE001
    import traceback

    traceback.print_exc()
    print(f"TSDF eval failed: {type(e).__name__}: {e}", flush=True)
