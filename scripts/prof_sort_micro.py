"""Microbench: emission-sort strategies at rasterizer scale.

The fused/sorted binning pipelines pay ONE lax.sort over the emission table
(~N*tcap rows): 2 f32 keys (tile, depth) + iota + 11 payload columns.
Candidates to cut it:
  a) current: 2 keys + iota + 11 payload
  b) 1 packed f32 key (tile*2^14 + 14-bit quantized depth, exact in f32 for
     tile < 1024) + iota + 11 payload  — fewer radix passes, ties break by
     emission order instead of exact depth (parity-affecting, opt-in only)
  c) 2 keys + iota only (3 columns) — lower bound of a no-payload sort
  d) 1 int32 key + iota + 11 payload

Usage: ./tpurun.sh python scripts/prof_sort_micro.py [rows]
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

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
N_TILES = 1024  # overridden at big ROWS below


def timeit(name, f, *args):
    @jax.jit
    def loop(z, *a):
        def body(i, acc):
            r = f(a[0] + acc * 1e-30, *a[1:])
            return acc + r
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    float(loop(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), *args))
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:34s} {dt*1e3:8.2f} ms")


def main():
    global N_TILES
    if ROWS >= 2_000_000:
        N_TILES = 4096  # reference scale: 1 MPix = 64x64 tiles
    rng = np.random.RandomState(0)
    tile = jnp.asarray(rng.randint(0, N_TILES + 1, ROWS).astype(np.float32))
    depth = jnp.asarray(rng.rand(ROWS).astype(np.float32))
    iota = jnp.arange(ROWS, dtype=jnp.int32)
    pay = [jnp.asarray(rng.rand(ROWS).astype(np.float32)) for _ in range(11)]
    qdepth = jnp.floor(depth * 16383.0)
    packed_f = tile * 16384.0 + qdepth  # < 2^24, exact in f32
    packed_i = (tile.astype(jnp.int32) << 14) | qdepth.astype(jnp.int32)

    print(f"device={jax.devices()[0].platform} rows={ROWS}")

    def keep_all(out):
        # scalar-pick EVERY output: XLA prunes unused sort result columns
        # (round-3's 2-output picks measured a silently 3-operand sort)
        return sum(o.reshape(-1)[0].astype(jnp.float32) for o in out)

    def s_2key_pay(d, t):
        out = jax.lax.sort((t, d, iota) + tuple(pay), num_keys=2)
        return keep_all(out)

    def s_1keyf_pay(k):
        out = jax.lax.sort((k, iota) + tuple(pay), num_keys=1)
        return keep_all(out)

    def s_1keyi_pay(k0, k):
        out = jax.lax.sort((k + (k0 * 0).astype(jnp.int32), iota) + tuple(pay),
                           num_keys=1)
        return keep_all(out)

    def s_2key_iota(d, t):
        out = jax.lax.sort((t, d, iota), num_keys=2)
        return keep_all(out)

    timeit("2 f32 keys + 11 payload (current)", s_2key_pay, depth, tile)

    # (a2) 3-operand sort (keys + iota) + 11 payload gathers at src_idx:
    # trades 11 sort operands for 11 linear-write random-read gathers
    def s_2key_gather(d, t):
        out = jax.lax.sort((t, d, iota), num_keys=2)
        si = out[2]
        cols = tuple(jnp.take(c, si) for c in pay)
        return keep_all(out[:2] + cols)

    timeit("2 keys sort + 11 gathers", s_2key_gather, depth, tile)
    timeit("1 packed f32 key + 11 payload", s_1keyf_pay, packed_f)
    timeit("1 packed i32 key + 11 payload", s_1keyi_pay, depth, packed_i)

    # (d2) EXACT single u32 key: tile*N_rank + depth-rank. Depth ranks come
    # from one cheap [N]-row pre-sort (the pair table is ~tcap x bigger),
    # and tile*(N+1)+rank fits u32 for n_tiles*N < 2^32 — bit-exact
    # (tile, depth) order with rank tie-breaking, no quantization.
    n_rank = ROWS // 4  # gaussian count at tcap=4
    rank = jnp.asarray(
        rng.randint(0, n_rank, ROWS).astype(np.uint32))
    packed_u = (tile.astype(jnp.uint32) * jnp.uint32(n_rank)
                + rank % jnp.uint32(n_rank))

    def s_1keyu_pay(k0, k):
        out = jax.lax.sort((k + (k0 * 0).astype(jnp.uint32), iota)
                           + tuple(pay), num_keys=1)
        return keep_all(out)

    timeit("1 exact u32 rank key + 11 payload", s_1keyu_pay, depth, packed_u)

    # the [N]-row rank pre-sort pair (sort by depth + invert): the price of
    # the u32 key scheme
    gdepth = jnp.asarray(rng.rand(n_rank).astype(np.float32))
    giota = jnp.arange(n_rank, dtype=jnp.int32)

    def s_rank_pre(d):
        _, si = jax.lax.sort((d, giota), num_keys=1)
        _, rk = jax.lax.sort((si, giota), num_keys=1)
        return rk[0].astype(jnp.float32) + si[0].astype(jnp.float32)

    timeit("rank pre-sort pair ([N] rows)", s_rank_pre, gdepth)
    timeit("2 f32 keys + iota only", s_2key_iota, depth, tile)

    # (e) row-bucketed: B independent sorts as ONE batched lax.sort along
    # axis -1 of [B, ROWS/B] — the shape the tile-ROW bucketing produces.
    # Sort cost is superlinear in the axis length, so if this wins big it
    # justifies a bucketing pass (and it matches the sharded row bands).
    for b in (8, 32, 64):
        if ROWS % b:
            continue
        c = ROWS // b
        tile_b = tile.reshape(b, c)
        depth_b = depth.reshape(b, c)
        iota_b = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (b, c))
        pay_b = [x.reshape(b, c) for x in pay]

        def s_batched(d, t, iota_b=iota_b, pay_b=pay_b):
            out = jax.lax.sort((t, d, iota_b) + tuple(pay_b), num_keys=2,
                               dimension=-1)
            return keep_all(out)

        timeit(f"2 keys + 11 payload batched B={b:3d}", s_batched,
               depth_b, tile_b)

    # (f) the NON-SORT pieces of _sort_and_range (round 3: the stage
    # measures 43.9 ms at 4M rows while the raw sort is 15.8 — find the
    # rest): searchsorted range-cut + the emission broadcast
    tile_sorted = jnp.sort(tile)
    tids = jnp.arange(N_TILES, dtype=jnp.float32)

    def s_searchsorted(d, ts):
        a = jnp.searchsorted(ts + d * 1e-30, tids).astype(jnp.int32)
        b2 = jnp.searchsorted(ts + d * 1e-30, tids + 1.0).astype(jnp.int32)
        return jnp.sum(b2 - a).astype(jnp.float32)

    timeit("searchsorted range-cut (2x)", s_searchsorted, depth, tile_sorted)

    n_src = ROWS // 4

    def s_broadcast(d, c0):
        cols = tuple(
            jnp.broadcast_to((c0 + d[:n_src] * 1e-30)[None, :],
                             (4, n_src)).reshape(-1)
            for _ in range(11)
        )
        return sum(c[0] for c in cols)

    timeit("emission broadcast 11x (tcap=4)", s_broadcast, depth,
           pay[0][:n_src])

    from eogs2_tpu.ops import fused_raster as FR

    def s_sort_and_range(d, t):
        cols = tuple(c[:n_src] + d[:n_src] * 1e-30 for c in pay)
        sc, sd, st, si, ts, cn = FR._sort_and_range(cols, t, d, N_TILES, 4)
        return sc[0][0] + cn[0].astype(jnp.float32)

    timeit("FULL _sort_and_range (tcap=4)", s_sort_and_range, depth, tile)




def emission_return():
    """Compare the VJP emission-return strategies at rasterizer scale:
    (a) current: 2-int-col sort for the inverse permutation + [rows,16]
        row gather, (b) ONE payload sort keyed by src_idx carrying the 16
        gradient columns."""
    rng = np.random.RandomState(1)
    src_idx = jnp.asarray(rng.permutation(ROWS).astype(np.int32))
    pos = jnp.arange(ROWS, dtype=jnp.int32)
    rows16 = jnp.asarray(rng.rand(ROWS, 16).astype(np.float32))

    def a_inv_gather(r16):
        _, inv = jax.lax.sort((src_idx, pos), num_keys=1)
        out = jnp.take(r16, inv, axis=0)
        return out[0, 0]

    def b_payload_sort(r16):
        ops = (src_idx,) + tuple(r16[:, j] for j in range(16))
        out = jax.lax.sort(ops, num_keys=1)
        return out[1][0]

    timeit("emission-return inv+gather (cur)", a_inv_gather, rows16)
    timeit("emission-return payload sort", b_payload_sort, rows16)

    # (c) linear-cost inverse permutation: ONE 1-D i32 permutation scatter
    # (no sort at all) + 11 per-column gathers. Sort cost is superlinear;
    # if TPU lowers the unique-indices scatter well this wins at scale.
    def c_scatter_inv(r16):
        inv = jnp.zeros((ROWS,), jnp.int32).at[src_idx].set(
            pos, unique_indices=True, mode="drop"
        )
        # 16 columns, same byte volume as strategies (a)/(b) (ADVICE r3)
        cols = tuple(jnp.take(r16[:, j], inv) for j in range(16))
        return cols[0][0]

    # (d) skip emission order entirely: the consumer only needs gradients
    # summed PER GAUSSIAN (n = ROWS/tcap rows); scatter-add the sorted-order
    # rows straight into gaussian slots keyed by src_idx % n. Replaces the
    # return sort AND the emission_reduce.
    n_g = ROWS // 4
    gid = src_idx % n_g

    def d_segment_scatter(r16):
        # 16 columns, same byte volume as strategies (a)/(b) (ADVICE r3)
        cols = tuple(
            jnp.zeros((n_g,), jnp.float32).at[gid].add(
                r16[:, j], mode="drop"
            )
            for j in range(16)
        )
        return cols[0][0]

    timeit("emission-return scatter-inv+gather", c_scatter_inv, rows16)
    timeit("emission-return scatter-add to gid", d_segment_scatter, rows16)


if __name__ == "__main__":
    if os.environ.get("EMISSION"):
        emission_return()
    else:
        main()
