"""Benchmark driver: forward+backward rasterization throughput on one chip.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: Mrays/s through the full differentiable render (forward + backward),
rays = H*W pixels per render. Baseline context (BASELINE.md): the reference
publishes no throughput numbers; an RTX 3090 running the reference CUDA
rasterizer at this scene scale is estimated at ~2ms fwd+bwd for a 256x256
5-channel render of ~20k visible splats (~33 Mrays/s single-render). We
report vs_baseline against that estimate until a measured reference number
exists.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_MRAYS_S = 33.0  # estimated RTX 3090 fwd+bwd (see module docstring)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"backend unavailable ({e})", file=sys.stderr)
        raise
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eogs2_tpu import rasterize, RasterizeConfig

    rng = np.random.RandomState(42)
    n = 100_000
    w = h = 512
    means = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    means[:, 2] = -0.3 + 0.1 * rng.rand(n)
    scales = np.full((n, 3), 0.006, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.7, np.float32)
    rgb = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    affine = np.array(
        [[1.0, 0.05, 0.3, 0.0], [0.0, 1.0, -0.2, 0.0], [0, 0, 1.0, 0.0]], np.float32
    )
    alt = means @ affine[2, :3] + affine[2, 3]
    feat = np.concatenate([rgb, alt[:, None], np.ones((n, 1), np.float32)], 1)
    bg = np.array([0, 0, 0, -1, 0], np.float32)
    args = [jnp.asarray(x) for x in (means, scales, quats, opac, feat, affine, bg)]
    # max_tiles_per_gaussian=4 is the observed max for this scene (the
    # Trainer's capacity auto-rebucketing converges to exactly this); the
    # emission table is N*tcap rows, so the tight bound halves the pair
    # sort + backward gather vs tcap=8 (52ms vs 76ms fwd+bwd measured).
    # fused = ragged sort-carried blend with scalar-prefetch DMA windows (no
    # dense [T,K,F] gather in either direction); with the roll-based scans it
    # beats 'sorted' at tight capacities too (33.5 vs 37.8 ms fwd+bwd here).
    cfg = RasterizeConfig(
        tile_capacity=512, tile_chunk=64, max_tiles_per_gaussian=4,
        binning_mode="fused",
    )

    def loss(means, scales, quats, opac, feat, affine, bg):
        out = rasterize(means, scales, quats, opac, feat, affine, bg, w, h, cfg)
        return jnp.sum(out.image[:3] ** 2) + jnp.sum(out.final_t)

    vgrad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
    # warmup / compile
    v, g = vgrad(*args)
    jax.block_until_ready((v, g))
    float(v)  # force a full host sync (the axon platform's block_until_ready
    # returns before remote execution completes; a value fetch does not)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = vgrad(*args)
    jax.block_until_ready((v, g))
    float(v)
    dt = (time.perf_counter() - t0) / iters

    mrays = (w * h) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd+bwd rasterization throughput (512x512, 100k gaussians)",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / REFERENCE_MRAYS_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
