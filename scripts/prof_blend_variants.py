"""Profile variants of the real blend forward/backward kernels to locate
the cost: full kernel vs no-scan vs no-feat-dot vs alpha-only, plus k_chunk
and tiles-per-grid-step sweeps. IO mirrors production exactly:
in [T,NF,K] packed (33 MB), out [T,P,8] (8 MB).

Usage: ./tpurun.sh python scripts/prof_blend_variants.py
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

from eogs2_tpu.ops.blend_pallas import (
    NF, P, _alpha_chunk, _feat_chunk, _tri, blend_backward_pallas,
    blend_forward_pallas,
)
from eogs2_tpu.ops.blend import ALPHA_EPS, ALPHA_MAX, T_EPS
from eogs2_tpu.ops.projection import TILE

HI = jax.lax.Precision.HIGHEST
T = 1024
K = 512
GRID_X = 32


def _origin(grid_x):
    i = pl.program_id(0)
    ox = ((i % grid_x) * TILE).astype(jnp.float32)
    oy = ((i // grid_x) * TILE).astype(jnp.float32)
    return ox, oy


def _hillis(x, kc):
    """Inclusive prefix sum along lanes via log-depth roll+add."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < kc:
        shifted = pltpu.roll(x, s, 1)
        x = jnp.where(lane >= s, x + shifted, x)
        s *= 2
    return x


def make_fwd_variant(k_chunk, scan=True, featdot=True, alpha=True):
    n_chunks = K // k_chunk

    def kernel(data_ref, out_ref):
        ox, oy = _origin(GRID_X)
        tri = _tri(k_chunk)

        def body(c, carry):
            acc, carry_raw, carry_live, carry_n = carry
            if alpha:
                al, _, _, _, _ = _alpha_chunk(data_ref, c, k_chunk, ox, oy)
            else:
                al = data_ref[0, 0, pl.ds(c * k_chunk, k_chunk)][None, :] * jnp.ones(
                    (P, 1), jnp.float32) * 1e-3
            logs = jnp.log1p(-al)
            if scan == "hillis":
                s_incl = carry_raw + _hillis(logs, k_chunk)
            elif scan:
                s_incl = carry_raw + jnp.dot(
                    logs, tri, preferred_element_type=jnp.float32, precision=HI
                )
            else:
                s_incl = carry_raw + logs
            cp = jnp.exp(s_incl)
            live = cp >= T_EPS
            t_before = cp / (1.0 - al)
            w = jnp.where(live, al * t_before, 0.0)
            if featdot:
                featc = _feat_chunk(data_ref, c, k_chunk)
                acc = acc + jax.lax.dot_general(
                    w, featc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
            else:
                acc = acc + jnp.sum(w, axis=-1, keepdims=True) * jnp.ones(
                    (1, 5), jnp.float32)
            carry_live = carry_live + jnp.sum(
                jnp.where(live, logs, 0.0), axis=-1, keepdims=True)
            carry_n = carry_n + jnp.sum(live.astype(jnp.float32), axis=-1,
                                        keepdims=True)
            return acc, s_incl[:, -1:], carry_live, carry_n

        acc, _, carry_live, carry_n = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((P, 5), jnp.float32), jnp.zeros((P, 1), jnp.float32),
             jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32)),
        )
        out_ref[0] = jnp.concatenate(
            [acc, jnp.exp(carry_live), carry_n,
             jnp.zeros((P, 1), jnp.float32)], axis=1)

    return kernel


def time_call(name, f, *args):
    @jax.jit
    def loop(z, *a):
        def body(i, acc):
            # thread acc into the first arg so the call can't be hoisted
            r = f(a[0] + acc * 1e-30, *a[1:])
            return acc + r.reshape(-1)[0] + z * 1e-30
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    try:
        float(loop(jnp.float32(0.0), *args))
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), *args))
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:34s} {dt*1e3:8.2f} ms")


def main():
    rng = np.random.RandomState(0)
    data = rng.rand(T, NF, K).astype(np.float32)
    data[:, 0, :] = rng.rand(T, K) * 512  # mx
    data[:, 1, :] = rng.rand(T, K) * 512  # my
    data[:, 2, :] = 0.05  # ca
    data[:, 3, :] = 0.0
    data[:, 4, :] = 0.05
    data[:, 5, :] = 0.5  # opacity
    data[:, 11, :] = 1.0  # mask
    data = jnp.asarray(data)

    print(f"device={jax.devices()[0].platform} T={T} K={K}")

    def pc(kernel):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, NF, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        )

    time_call("prod fwd (kc=512)",
              lambda d: blend_forward_pallas(d, GRID_X, 512), data)
    gout = jnp.asarray(rng.rand(T, P, 8).astype(np.float32))
    time_call("prod bwd (kc=512)",
              lambda d: blend_backward_pallas(d, gout, GRID_X, 512), data)
    for kc in (512, 256, 128):
        time_call(f"fwd variant full kc={kc}", pc(make_fwd_variant(kc)), data)
    time_call("fwd no-scan kc=512", pc(make_fwd_variant(512, scan=False)), data)
    time_call("fwd no-featdot kc=512", pc(make_fwd_variant(512, featdot=False)), data)
    time_call("fwd no-scan no-featdot", pc(make_fwd_variant(512, scan=False, featdot=False)), data)
    time_call("fwd alpha-off scan-off featdot-off",
              pc(make_fwd_variant(512, scan=False, featdot=False, alpha=False)), data)
    for kc in (512, 256, 128):
        time_call(f"prod bwd kc={kc}",
                  functools.partial(blend_backward_pallas, grid_x=GRID_X,
                                    k_chunk=kc), data, gout)




def sweep64():
    rng = np.random.RandomState(0)
    data = rng.rand(T, NF, K).astype(np.float32)
    data[:, 0, :] = rng.rand(T, K) * 512
    data[:, 1, :] = rng.rand(T, K) * 512
    data[:, 2, :] = 0.05
    data[:, 3, :] = 0.0
    data[:, 4, :] = 0.05
    data[:, 5, :] = 0.5
    data[:, 11, :] = 1.0
    data = jnp.asarray(data)
    gout = jnp.asarray(rng.rand(T, P, 8).astype(np.float32))

    def pc(kernel):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, NF, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, P, 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        )

    for kc in (512, 256, 128):
        time_call(f"fwd hillis kc={kc}",
                  pc(make_fwd_variant(kc, scan="hillis")), data)
    for kc in (128,):
        time_call(f"prod fwd tri kc={kc}",
                  functools.partial(blend_forward_pallas, grid_x=GRID_X,
                                    k_chunk=kc), data)
        time_call(f"prod bwd tri kc={kc}",
                  functools.partial(blend_backward_pallas, grid_x=GRID_X,
                                    k_chunk=kc), data, gout)


if __name__ == "__main__" and os.environ.get("SWEEP64"):
    sweep64()
elif __name__ == "__main__":
    main()
