"""Probe: does a narrow [N,3] f32 array physically lane-pad to 128 in HBM?

memory_stats() is unavailable through the axon tunnel, so measure the
EFFECTIVE READ BANDWIDTH of a full-array reduction instead: if [N,3] pads
its minor dim to 128 lanes in HBM, summing it streams ~42x the logical
bytes and the per-element time shows it. Decides whether the Gaussian SoA
should be stored transposed for reference-scale (1M+) training.

Usage: ./tpurun.sh python scripts/prof_mem_layout.py
"""

import os
import sys
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

REPS = 30


def probe(shape):
    x = jax.device_put(np.ones(shape, np.float32))

    @jax.jit
    def red(x):
        def body(i, acc):
            return acc + jnp.sum(x * (1.0 + acc * 1e-30))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(red(x))
    t0 = time.perf_counter()
    float(red(x))
    dt = (time.perf_counter() - t0) / REPS
    gb = int(np.prod(shape)) * 4 / 1e9
    return dt, gb / dt


def main():
    print(f"device={jax.devices()[0].platform}", flush=True)
    for shape in [(1 << 20, 3), (3, 1 << 20), (1 << 20, 4), (4, 1 << 20),
                  (1 << 20, 128), (1 << 22,)]:
        dt, bw = probe(shape)
        print(f"  {str(shape):14s} sum: {dt * 1e3:7.3f} ms  "
              f"logical-bw {bw:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
