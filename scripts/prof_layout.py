"""Payload-layout experiments for the fused rasterizer (round 3).

The current pay_pad layout is [rows, NFF=128] f32: every pair's 11 payload
floats occupy a full 128-lane HBM row (512 B), because narrow [rows, k<128]
f32 arrays pad their minor dim to the 128-lane tile. The kernels' window
DMAs, the materialization, and the gradient write-back therefore move ~11x
the real payload. Candidate fix: GROUPED layout [rows/8, 128] where row r
holds pairs 8r..8r+7 as 8 x 16 consecutive lanes (row-major element order
identical to [rows, 16]); a window of k_cap pairs is then k_cap/8 rows of
64 B/pair, DMA'd at a sublane-dim dynamic offset (allowed) — IF Mosaic can
cheaply view a [Kc/8, 128] VMEM block as [Kc, 16].

Experiments (each prints ok/fail + time):
  1. in-kernel reshape [Kc/8, 128] -> [Kc, 16] correctness + cost
  2. DMA from a [16, p] column-major HBM array at a dynamic LANE offset
     (the alternative layout; expected to be rejected by Mosaic)
  3. micro-cost of the grouped window walk vs the NFF=128 window walk

Usage: ./tpurun.sh python scripts/prof_layout.py [ROWS [KCAP [KCHUNK]]]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
KCAP = int(sys.argv[2]) if len(sys.argv) > 2 else 512
KCHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 128
N_TILES = ROWS // KCAP * 2  # overlapping windows like real tiles
REPS = 20


def timeit(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- exp 1+3
def _grouped_kernel(tstart_ref, pay_hbm, out_ref, scratch, sem, *, k_cap,
                    k_chunk, reshape_mode):
    t = pl.program_id(0)
    rows = k_cap // 8
    pltpu.make_async_copy(
        pay_hbm.at[pl.ds(tstart_ref[t] // 8, rows), :],
        scratch, sem,
    ).start()
    pltpu.make_async_copy(
        pay_hbm.at[pl.ds(tstart_ref[t] // 8, rows), :],
        scratch, sem,
    ).wait()
    acc = jnp.zeros((1, 128), jnp.float32)
    for c in range(k_cap // k_chunk):
        blk = scratch[pl.ds(c * (k_chunk // 8), k_chunk // 8), :]
        if reshape_mode == "reshape":
            blk16 = blk.reshape(k_chunk, 16)  # the experiment
            colsum = jnp.sum(blk16, axis=0, keepdims=True)  # [1,16]
            acc = acc.at[:, :16].add(colsum)
        else:
            acc = acc + jnp.sum(blk, axis=0, keepdims=True)
    out_ref[0] = acc


def grouped_call(pay_g, tstart, k_cap, k_chunk, reshape_mode):
    kernel = functools.partial(
        _grouped_kernel, k_cap=k_cap, k_chunk=k_chunk,
        reshape_mode=reshape_mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((k_cap // 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_TILES, 1, 128), jnp.float32),
    )(tstart, pay_g)


def _wide_kernel(tstart_ref, pay_hbm, out_ref, scratch, sem, *, k_cap,
                 k_chunk):
    t = pl.program_id(0)
    pltpu.make_async_copy(
        pay_hbm.at[pl.ds(tstart_ref[t], k_cap), :], scratch, sem,
    ).start()
    pltpu.make_async_copy(
        pay_hbm.at[pl.ds(tstart_ref[t], k_cap), :], scratch, sem,
    ).wait()
    acc = jnp.zeros((1, 128), jnp.float32)
    for c in range(k_cap // k_chunk):
        blk = scratch[pl.ds(c * k_chunk, k_chunk), :]
        acc = acc + jnp.sum(blk, axis=0, keepdims=True)
    out_ref[0] = acc


def wide_call(pay_w, tstart, k_cap, k_chunk):
    kernel = functools.partial(_wide_kernel, k_cap=k_cap, k_chunk=k_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((k_cap, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_TILES, 1, 128), jnp.float32),
    )(tstart, pay_w)


# ---------------------------------------------------------------- exp 2
def _lane_kernel(tstart_ref, pay_hbm, out_ref, scratch, sem, *, k_cap):
    t = pl.program_id(0)
    pltpu.make_async_copy(
        pay_hbm.at[:, pl.ds(tstart_ref[t], k_cap)], scratch, sem,
    ).start()
    pltpu.make_async_copy(
        pay_hbm.at[:, pl.ds(tstart_ref[t], k_cap)], scratch, sem,
    ).wait()
    out_ref[0] = jnp.sum(scratch[:, :], axis=1, keepdims=True).T


def lane_call(pay_c, tstart, k_cap):
    kernel = functools.partial(_lane_kernel, k_cap=k_cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 16), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((16, KCAP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_TILES, 1, 16), jnp.float32),
    )(tstart, pay_c)


def main():
    print(f"device={jax.devices()[0].platform} rows={ROWS} kcap={KCAP} "
          f"kchunk={KCHUNK} n_tiles={N_TILES}", flush=True)
    rng = np.random.RandomState(0)
    base16 = rng.rand(ROWS, 16).astype(np.float32)
    pay_g = jnp.asarray(base16.reshape(ROWS // 8, 128))
    pay_w = jnp.asarray(
        np.concatenate([base16, np.zeros((ROWS, 112), np.float32)], 1)
    )
    # window starts: multiples of 8 (grouped layout needs 8-alignment)
    tstart = jnp.asarray(
        (rng.randint(0, (ROWS - KCAP) // 8, N_TILES) * 8).astype(np.int32)
    )

    # correctness of the in-kernel reshape
    try:
        outg = np.asarray(grouped_call(pay_g, tstart, KCAP, KCHUNK, "reshape"))
        want = np.stack([
            base16[int(s): int(s) + KCAP].sum(0) for s in np.asarray(tstart)
        ])
        got = outg[:, 0, :16]
        ok = np.allclose(got, want, rtol=1e-5, atol=1e-3)
        print(f"exp1 grouped reshape [Kc/8,128]->[Kc,16]: "
              f"{'OK' if ok else 'WRONG'} maxerr="
              f"{np.max(np.abs(got - want)):.2e}", flush=True)
        timeit("exp1 grouped window walk (reshape)",
               lambda: grouped_call(pay_g, tstart, KCAP, KCHUNK, "reshape"))
    except Exception as e:
        print(f"exp1 grouped reshape: FAILED TO LOWER: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    timeit("exp3 grouped window walk (no reshape)",
           lambda: grouped_call(pay_g, tstart, KCAP, KCHUNK, "flat"))
    timeit("exp3 wide NFF=128 window walk",
           lambda: wide_call(pay_w, tstart, KCAP, KCHUNK))

    try:
        pay_c = jnp.asarray(np.ascontiguousarray(base16.T))  # [16, ROWS]
        outc = np.asarray(lane_call(pay_c, tstart, KCAP))
        want = np.stack([
            base16[int(s): int(s) + KCAP].sum(0) for s in np.asarray(tstart)
        ])
        ok = np.allclose(outc[:, 0, :], want, rtol=1e-5, atol=1e-3)
        print(f"exp2 lane-offset DMA [16,p]: {'OK' if ok else 'WRONG'}",
              flush=True)
        timeit("exp2 lane-offset DMA walk",
               lambda: lane_call(pay_c, tstart, KCAP))
    except Exception as e:
        print(f"exp2 lane-offset DMA: FAILED TO LOWER: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
