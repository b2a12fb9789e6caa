"""EOGS2-TPU: a TPU-native differentiable Gaussian-splatting framework for
satellite photogrammetry (Earth-Observation Gaussian Splatting).

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capabilities of
the reference EOGS++ system (affine pushbroom cameras, 5-channel altitude-sorted
rasterization, sun-shadow rendering, panchromatic pipeline, DSM evaluation,
TSDF fusion) — but architected TPU-first:

  * one pure, jittable train step over a fixed-capacity Gaussian SoA pytree
  * the rasterizer is tile-binned compositing expressed as vectorized
    cumulative products/sums (no per-pixel sequential loop), with a
    hand-derived VJP and a Pallas kernel for the hot path
  * densify/prune/opacity-reset are masked in-place state updates
    (no reshapes, nothing recompiles)
  * multi-chip scaling via jax.sharding.Mesh + shard_map (Gaussian-sharded
    preprocess, tile-sharded blending)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 multiplication, which silently corrupts the
# geometry-critical contractions (affine projection, EWA covariance, the
# log-space transmittance prefix matmuls) enough to destabilize training —
# measured: identical runs converge on CPU and diverge on TPU without this.
# Float32-accurate matmuls cost a fraction of this workload's runtime (the
# hot paths are sort/permute-bound); precision is relaxed per-op where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from eogs2_tpu.rasterizer import rasterize, RasterizeConfig  # noqa: F401
from eogs2_tpu.cameras import AffineCamera  # noqa: F401
