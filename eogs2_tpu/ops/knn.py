"""Mean squared distance to the 3 nearest neighbors.

Parity target: the ``simple-knn`` CUDA submodule (``simple_knn.cu``/
``spatial.cu``: Morton-sort + box-pruned exact 3-NN), used exactly once at
init to set Gaussian scales (gaussian_model.py:179-186). One-shot O(N*B)
work is fine on TPU/CPU: we sort points along a space-filling-ish axis
(Morton-lite: sort by interleaved-scaled z-order proxy) and do an exact
top-k over a sliding window of candidates, falling back to exact blocked
distances for small N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window",))
def _windowed_knn(points, order, window: int):
    """Exact 3-NN *within a +-window neighborhood* of the sorted order."""
    n = points.shape[0]
    sorted_pts = points[order]

    # For each point, gather candidates at offsets [-window, window].
    offsets = jnp.arange(-window, window + 1)
    idx = jnp.arange(n)[:, None] + offsets[None, :]
    valid = (idx >= 0) & (idx < n) & (offsets[None, :] != 0)
    idx = jnp.clip(idx, 0, n - 1)
    cand = sorted_pts[idx]  # [N, 2W+1, 3]
    d2 = jnp.sum((cand - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    k3 = -jax.lax.top_k(-d2, 3)[0]  # 3 smallest
    mean3 = jnp.mean(k3, axis=-1)
    # scatter back to original order
    out = jnp.zeros((n,), points.dtype).at[order].set(mean3)
    return out


def _morton_order(points):
    """Approximate spatial sort: scale to [0, 1024) and interleave bits."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.argsort(code)


def mean_knn_dist2(points, window: int = 64, exact_threshold: int = 4096):
    """[N] mean squared distance to the 3 nearest neighbors.

    Exact for N <= exact_threshold; otherwise Morton-windowed (the same
    box-pruning idea as simple_knn.cu:80-185, adequate for the uniform init
    clouds this feeds).
    """
    n = points.shape[0]
    if n <= exact_threshold:
        d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        k3 = -jax.lax.top_k(-d2, 3)[0]
        return jnp.mean(k3, axis=-1)
    order = _morton_order(points)
    return _windowed_knn(points, order, window)
