"""a2a vs gspmd measurement (VERDICT r2 item 5).

Two modes:
  * default (TPU, mesh(1)): time one full a2a train step vs the gspmd step
    on a single-device mesh — the a2a path's fixed overhead (band sort,
    window cut, identity all_to_all, second sort) vs the plain rasterizer.
  * --volumes (CPU, virtual devices): on 2/4/8-device CPU meshes, measure
    exchange volume (n_shards * dest_cap * rows sent) vs useful pairs, the
    efficiency model for the scaling story.

Usage:
  ./tpurun.sh python scripts/prof_a2a.py            # chip timing
  PALLAS_AXON_POOL_IPS= python scripts/prof_a2a.py --volumes   # CPU
"""

import os
import sys
import tempfile
import time

if "--volumes" in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if "--volumes" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eogs2_tpu.config import baseogs
from eogs2_tpu.data.synthetic import generate_scene
from eogs2_tpu.parallel.mesh import make_mesh
from eogs2_tpu.rasterizer import RasterizeConfig
from eogs2_tpu.scene import load_scene
from eogs2_tpu.train import Trainer

NF_PAY = 11


def build(d, img, iters, backend, mesh, dest_cap, tcap=8, kcap=256):
    scene = load_scene(d, images_msi_path=os.path.join(d, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(d, iterations=iters)
    cfg.logging.tb_log_interval = 10 ** 9
    cfg.optimization.densification.densify_from_iter = 10 ** 9
    cfg.optimization.only_prune = True
    rcfg = RasterizeConfig(tile_capacity=kcap, tile_chunk=64,
                           max_tiles_per_gaussian=tcap,
                           binning_mode="fused", dest_cap=dest_cap)
    return Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg, mesh=mesh,
                   raster_backend=backend).setup()


def main():
    d = tempfile.mkdtemp()
    img = 256
    generate_scene(d, n_views=6, width=img, height=img, hf_res=256,
                   n_buildings=6, scale=20.0, seed=0)

    if "--volumes" in sys.argv:
        # synthetic uniform scene, 64k gaussians at 256^2
        from eogs2_tpu.parallel.sharded_raster import sharded_rasterize
        import jax.numpy as jnp

        rng = np.random.RandomState(3)
        n = 1 << 16
        means = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        means[:, 2] = -0.3 + 0.1 * rng.rand(n)
        scales = np.full((n, 3), 4.8 / img, np.float32)
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        opac = np.full((n,), 0.3, np.float32)
        feat = np.concatenate(
            [rng.rand(n, 3).astype(np.float32),
             means[:, 2:3], np.ones((n, 1), np.float32)], 1
        )
        affine = np.array(
            [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]],
            np.float32,
        )
        bg = np.zeros(5, np.float32)
        print("n_dev  dest_cap  useful_pairs  exchanged_rows  row_efficiency")
        for n_dev in (2, 4, 8):
            mesh = make_mesh(n_dev)

            def run(dest_cap):
                return sharded_rasterize(
                    mesh, jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac), jnp.asarray(feat),
                    jnp.ones((n,), bool), jnp.asarray(affine),
                    jnp.asarray(bg), img, img, tcap=8, dest_cap=dest_cap,
                    tile_capacity=512, k_chunk=64,
                )

            # probe the densest destination window, then size the cap to the
            # next power of two (what the Trainer's capacity manager does)
            mdc = int(run(1 << 17)["max_dest_count"])
            dest_cap = 1 << max(10, (mdc - 1).bit_length())
            out = run(dest_cap)
            useful = int(np.sum(np.asarray(out["pairs_per_chip"])))
            exchanged = n_dev * n_dev * dest_cap
            bytes_mb = exchanged * (NF_PAY + 2) * 4 / 1e6
            print(f"{n_dev:5d}  {dest_cap:8d}  {useful:12d}  "
                  f"{exchanged:14d}  {useful / exchanged:10.3f}   "
                  f"(max_dest={mdc}, {bytes_mb:.1f} MB/exchange)",
                  flush=True)
        return

    if "--steps" in sys.argv:
        # CPU virtual meshes: a2a train-step wall clock at 1/2/4/8 virtual
        # devices. NOT a throughput claim — virtual devices time-share one
        # host CPU, so ideal scaling shows as ~FLAT step time (n chips do
        # n-fold work in the same wall clock); a superlinear rise is real
        # overhead (exchange volume, pow2 slack, band imbalance).
        for n_dev in (1, 2, 4, 8):
            mesh = make_mesh(n_dev)
            tr = build(d, img, 400, "a2a", mesh, dest_cap=1 << 15)
            # round 5: demand-probed capacities incl. the tight
            # multiple-of-128 dest_cap (the pow2 slack was the 8-device
            # cliff of the round-4 curve)
            rc = tr.probe_capacities()
            print(f"  mesh({n_dev}) probed dest_cap={rc.dest_cap}",
                  flush=True)
            tr.train(max_iterations=30, progress=False)
            t0 = time.perf_counter()
            tr.train(max_iterations=60, progress=False)
            dt = (time.perf_counter() - t0) / 60
            print(f"a2a virtual mesh({n_dev}) train step: {dt * 1e3:8.2f} ms",
                  flush=True)
        return

    # chip: a2a on mesh(1) vs gspmd (plain rasterize) — same scene/config
    for backend in ("gspmd", "a2a"):
        mesh = make_mesh(1)
        tr = build(d, img, 400, backend, mesh, dest_cap=1 << 15)
        tr.probe_capacities()
        tr.train(max_iterations=60, progress=False)  # compile+warm
        t0 = time.perf_counter()
        tr.train(max_iterations=200, progress=False)
        dt = (time.perf_counter() - t0) / 200
        print(f"{backend:6s} mesh(1) train step: {dt * 1e3:8.2f} ms "
              f"({1.0 / dt:6.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
