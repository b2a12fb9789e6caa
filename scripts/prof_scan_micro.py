"""Microbench: prefix-scan strategies inside a Pallas TPU kernel.

The blend kernels compute inclusive prefix sums of log(1-alpha) along the
K (lane) dimension. Today that's a [P,Kc] @ [Kc,Kc] upper-triangular matmul
at Precision.HIGHEST (f32 -> ~6 MXU passes). Candidates:
  a) tri-matmul HIGHEST (current)
  b) jnp.cumsum along lanes (VPU, exact f32)
  c) log-depth shift-add scan (manual Hillis-Steele via pltpu.roll)

Usage: ./tpurun.sh python scripts/prof_scan_micro.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

P = 256
K = 512
T = 1024
HI = jax.lax.Precision.HIGHEST


def _tri(kc):
    r = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 1)
    return (r <= c).astype(jnp.float32)


def k_tri(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = jnp.dot(x, _tri(K), preferred_element_type=jnp.float32,
                       precision=HI)


def k_tri_default(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = jnp.dot(x, _tri(K), preferred_element_type=jnp.float32)


def k_cumsum(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = jnp.cumsum(x, axis=-1)


def k_hillis(x_ref, o_ref):
    x = x_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
    s = 1
    while s < K:
        shifted = pltpu.roll(x, s, 1)
        x = jnp.where(lane >= s, x + shifted, x)
        s *= 2
    o_ref[0] = x


def k_copy(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def k_copy_b(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def make_tri_batched(b):
    """B tiles per grid step, flattened [B*P, K] tri matmul."""

    def kernel(x_ref, o_ref):
        x = x_ref[...].reshape(b * P, K)
        o_ref[...] = jnp.dot(
            x, _tri(K), preferred_element_type=jnp.float32, precision=HI
        ).reshape(b, P, K)

    return kernel


def make_chunked_batched(b, kc):
    """B tiles per step, chunked scan with carry, flattened rows."""

    def kernel(x_ref, o_ref):
        tri = _tri(kc)
        nch = K // kc

        def body(c, carry):
            sl = pl.ds(c * kc, kc)
            x = x_ref[:, :, sl].reshape(b * P, kc)
            s = carry + jnp.dot(x, tri, preferred_element_type=jnp.float32,
                                precision=HI)
            o_ref[:, :, sl] = s.reshape(b, P, kc)
            return s[:, -1:]

        jax.lax.fori_loop(0, nch, body, jnp.zeros((b * P, 1), jnp.float32))

    return kernel


def make_chunked(kc):
    """Chunked inclusive scan: [P,kc]@[kc,kc] tri per chunk + carry."""

    def kernel(x_ref, o_ref):
        tri = _tri(kc)
        nch = K // kc

        def body(c, carry):
            sl = pl.ds(c * kc, kc)
            x = x_ref[0, :, sl]
            s = carry + jnp.dot(x, tri, preferred_element_type=jnp.float32,
                                precision=HI)
            o_ref[0, :, sl] = s
            return s[:, -1:]

        jax.lax.fori_loop(0, nch, body, jnp.zeros((P, 1), jnp.float32))

    return kernel


def run(kernel, name, b=1):
    f = pl.pallas_call(
        kernel,
        grid=(T // b,),
        in_specs=[pl.BlockSpec((b, P, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, P, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, P, K), jnp.float32),
    )
    x = jnp.asarray(np.random.RandomState(0).rand(T, P, K).astype(np.float32))

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + jnp.sum(f(x + acc * 1e-30)[:, :1, :1])
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    try:
        float(loop(x))
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / 10
    # correctness vs numpy cumsum
    ref = np.cumsum(np.asarray(x[:2]), axis=-1)
    got = np.asarray(f(x)[:2])
    err = np.abs(ref - got).max()
    print(f"{name:24s} {dt*1e3:8.2f} ms   maxerr={err:.2e}")


if __name__ == "__main__":
    print(f"device={jax.devices()[0].platform} T={T} P={P} K={K}")
    run(k_copy, "copy (grid-step floor)")
    run(k_tri, "tri-matmul HIGHEST")
    run(k_tri_default, "tri-matmul default")
    run(k_hillis, "hillis-steele roll")
    run(make_chunked(128), "chunked tri kc=128")
    for b in (4, 8, 16):
        run(k_copy_b, f"copy B={b}", b=b)
    for b in (4, 8):
        run(make_tri_batched(b), f"tri HIGHEST B={b}", b=b)
        run(make_chunked_batched(b, 128), f"chunked kc=128 B={b}", b=b)
