"""Worker for tests/test_multihost.py: one of two CPU processes forming a
2-process x 4-virtual-device (8 global devices) jax.distributed cluster.

Run via: EOGS2_COORDINATOR=127.0.0.1:PORT EOGS2_NUM_PROCESSES=2 \
         EOGS2_PROCESS_ID=i python tests/multihost_worker.py OUT_DIR

Validates (SURVEY §5.8, VERDICT round-2 item 3):
  * init_distributed wires jax.distributed from env vars
  * a process-spanning ("g",) mesh builds from the global device list
  * the all_to_all sharded rasterizer runs collectives ACROSS processes
    and matches the single-chip render
  * dryrun_multichip (the GSPMD train step + a2a train step) works
    unchanged on the process-spanning mesh
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from eogs2_tpu.parallel.distributed import init_distributed, make_global_array


def main(out_dir: str) -> None:
    assert init_distributed(), "coordinator env vars missing"
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from eogs2_tpu.parallel.mesh import make_mesh
    from eogs2_tpu.parallel.sharded_raster import sharded_render
    from tests.test_rasterizer import make_scene

    mesh = make_mesh(8, axes=("g",))
    # the mesh must SPAN processes (4 local + 4 remote devices)
    mesh_procs = {d.process_index for d in mesh.devices.flat}
    assert mesh_procs == {0, 1}, mesh_procs

    n, w, h = 512, 128, 128
    means, scales, quats, opac, feat, affine, bg = make_scene(n=n, seed=7)
    alive = jnp.ones((n,), bool)
    gargs = tuple(
        make_global_array(np.asarray(x), mesh, P("g"))
        for x in (means, scales, quats, opac, feat, alive)
    )
    rep = tuple(
        make_global_array(np.asarray(x), mesh, P()) for x in (affine, bg)
    )

    img, stats = jax.jit(
        lambda *a: sharded_render(
            mesh, *a, w, h, tcap=16, dest_cap=1 << 12, tile_capacity=256,
            tile_chunk=16,
        )
    )(*gargs, *rep)
    img_local = multihost_utils.process_allgather(img, tiled=True)

    if jax.process_index() == 0:
        from eogs2_tpu.rasterizer import RasterizeConfig, rasterize

        cfg = RasterizeConfig(tile_capacity=256, tile_chunk=16,
                              max_tiles_per_gaussian=16)
        ref = rasterize(means, scales, quats, opac, feat, affine, bg, w, h,
                        cfg, alive=alive)
        np.testing.assert_allclose(
            np.asarray(img_local), np.asarray(ref.image), atol=5e-5, rtol=1e-4
        )

    # the driver-contract dryrun must work unchanged under multi-host
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)

    with open(os.path.join(out_dir, f"ok{jax.process_index()}"), "w") as f:
        f.write("ok")


if __name__ == "__main__":
    main(sys.argv[1])
