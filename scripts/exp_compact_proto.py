"""Prototype: Pallas TPU intra-tile stream compaction / expansion.

Validates on the real chip:
 1. flat left/right shift of a [8,128]-viewed 1024-lane tile via pltpu.roll
 2. compaction network (LSB->MSB left shifts): alive lanes packed to front
 3. expansion network (MSB->LSB right shifts): inverse of compaction
 4. SMEM scratch running offset across sequential grid steps + manual
    dynamic-offset DMA write of compacted tiles into an ANY-space output
 5. per-tile count/offset SMEM outputs
"""

import os
import sys
import functools
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

TILE = 1024
ROWS, LANES = 8, 128


def _flat_shift_left(x, k):
    """y[i] = x[i+k] on the row-major flattened [ROWS,LANES] view; elements
    shifted in from beyond the end are garbage (cyclic wrap).  pltpu.roll
    only takes non-negative shifts, so left rolls use the complement."""
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, ROWS - q, 0)
    if r == 0:
        return x
    y1 = pltpu.roll(x, LANES - r, 1)
    y2 = pltpu.roll(y1, ROWS - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return jnp.where(lane < LANES - r, y1, y2)


def _flat_shift_right(x, k):
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, q, 0)
    if r == 0:
        return x
    y1 = pltpu.roll(x, r, 1)
    y2 = pltpu.roll(y1, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return jnp.where(lane >= r, y1, y2)


def _prefix_sum_flat(v):
    """Inclusive prefix sum over the flattened [ROWS,LANES] i32 view."""
    flat_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    )
    b = 1
    while b < TILE:
        sh = _flat_shift_right(v, b)
        v = jnp.where(flat_pos >= b, v + sh, v)
        b *= 2
    return v


def compact_tile(alive, planes):
    """Stable-compact alive lanes to the front of the tile.

    alive: bool[ROWS,LANES]; planes: list of f32/i32 [ROWS,LANES].
    Returns (compacted planes (garbage beyond count), count i32[]).
    """
    ai = alive.astype(jnp.int32)
    dead_incl = _prefix_sum_flat(1 - ai)
    # distance for an alive lane = # dead strictly before it
    dist = dead_incl - (1 - ai)
    valid = ai
    outs = list(planes)
    b = 1
    bit = 0
    while b < TILE:
        move_src = valid * ((dist >> bit) & 1)
        moved = _flat_shift_left(move_src, b)
        stay = valid * (1 - ((dist >> bit) & 1))
        for i in range(len(outs)):
            outs[i] = jnp.where(moved > 0, _flat_shift_left(outs[i], b),
                                outs[i])
        valid = moved | stay
        b *= 2
        bit += 1
    count = jnp.sum(ai)
    return outs, count


def expand_tile(alive, planes, fill=None):
    """Inverse of compact_tile: route compacted lane k to the k-th alive
    original position; non-alive positions get `fill` (default: untouched
    garbage is replaced by 0)."""
    ai = alive.astype(jnp.int32)
    flat_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    )
    # l_k (original position of k-th alive lane) = compact(flat_pos)
    (l_of_k,), count = compact_tile(alive, [flat_pos])
    e = l_of_k - flat_pos  # right-shift distance per input position
    valid = (flat_pos < count).astype(jnp.int32)
    outs = list(planes)
    for bit in reversed(range(10)):
        b = 1 << bit
        move_src = valid * ((e >> bit) & 1)
        moved = _flat_shift_right(move_src, b)
        stay = valid * (1 - ((e >> bit) & 1))
        for i in range(len(outs)):
            outs[i] = jnp.where(moved > 0, _flat_shift_right(outs[i], b),
                                outs[i])
        valid = moved | stay
    if fill is not None:
        outs = [jnp.where(alive, o, f) for o, f in zip(outs, fill)]
    else:
        outs = [jnp.where(alive, o, jnp.zeros_like(o)) for o in outs]
    return outs


# ---------------- kernels ----------------

def _compact_kernel(n_planes, alive_ref, *refs, ):
    in_refs = refs[:n_planes]
    out_refs = refs[n_planes:n_planes * 2]
    cnt_ref = refs[n_planes * 2]
    alive = alive_ref[...] > 0.0
    planes = [r[...] for r in in_refs]
    outs, count = compact_tile(alive, planes)
    for o, r in zip(outs, out_refs):
        r[...] = o
    cnt_ref[pl.program_id(0)] = count


def run_compact(alive_f, planes):
    n = len(planes)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    n_tiles = alive_f.shape[0] // ROWS
    outs = pl.pallas_call(
        functools.partial(_compact_kernel, n),
        grid=(n_tiles,),
        in_specs=[spec] * (n + 1),
        out_specs=[spec] * n
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(alive_f.shape, p.dtype) for p in planes]
        + [jax.ShapeDtypeStruct((n_tiles,), jnp.int32)],
    )(alive_f, *planes)
    return outs[:n], outs[n]


def _expand_kernel(n_planes, alive_ref, *refs):
    in_refs = refs[:n_planes]
    out_refs = refs[n_planes:n_planes * 2]
    alive = alive_ref[...] > 0.0
    planes = [r[...] for r in in_refs]
    outs = expand_tile(alive, planes)
    for o, r in zip(outs, out_refs):
        r[...] = o


def run_expand(alive_f, planes):
    n = len(planes)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    n_tiles = alive_f.shape[0] // ROWS
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n),
        grid=(n_tiles,),
        in_specs=[spec] * (n + 1),
        out_specs=[spec] * n,
        out_shape=[jax.ShapeDtypeStruct(alive_f.shape, p.dtype) for p in planes],
    )(alive_f, *planes)
    return outs


def main():
    rng = np.random.default_rng(0)
    R = 1 << 20
    n_tiles = R // TILE
    alive_np = rng.random(R) < 0.2
    alive_f = jnp.asarray(
        alive_np.astype(np.float32).reshape(n_tiles * ROWS, LANES))
    x_np = rng.standard_normal(R).astype(np.float32)
    x = jnp.asarray(x_np.reshape(n_tiles * ROWS, LANES))

    # correctness: compaction
    (xc,), counts = run_compact(alive_f, [x])
    xc_np = np.asarray(xc).reshape(n_tiles, TILE)
    counts_np = np.asarray(counts)
    a2 = alive_np.reshape(n_tiles, TILE)
    xv = x_np.reshape(n_tiles, TILE)
    ok = True
    for t in range(n_tiles):
        want = xv[t][a2[t]]
        c = counts_np[t]
        if c != want.size or not np.array_equal(xc_np[t][:c], want):
            ok = False
            print(f"tile {t}: MISMATCH count={c} want={want.size}")
            break
    print("compaction correct:", ok, flush=True)

    # correctness: expansion (round trip)
    (xe,) = run_expand(alive_f, [xc])
    xe_np = np.asarray(xe).reshape(-1)
    want = np.where(alive_np, x_np, 0.0)
    print("expansion correct:", np.array_equal(xe_np, want), flush=True)

    # timing: 11-plane compact, chained (data-dependent)
    planes = [jnp.asarray(rng.standard_normal(R).astype(np.float32)
                          .reshape(n_tiles * ROWS, LANES)) for _ in range(11)]

    @jax.jit
    def prog(c0, alive_f, *planes):
        def body(c, _):
            ps = [p + c for p in planes]
            outs, counts = run_compact(alive_f, ps)
            return c + outs[0][0, 0] + counts[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, c0, None, length=8)
        return c

    out = jax.block_until_ready(prog(jnp.float32(0), alive_f, *planes))
    t0 = time.perf_counter()
    out = jax.block_until_ready(prog(jnp.float32(1), alive_f, *planes))
    dt = (time.perf_counter() - t0) / 8 * 1e3
    print(f"compact 11 planes [1M]: {dt:.3f} ms/iter", flush=True)

    @jax.jit
    def prog2(c0, alive_f, *planes):
        def body(c, _):
            ps = [p + c for p in planes]
            outs = run_expand(alive_f, ps)
            return c + outs[0][0, 0], None
        c, _ = jax.lax.scan(body, c0, None, length=8)
        return c

    out = jax.block_until_ready(prog2(jnp.float32(0), alive_f, *planes))
    t0 = time.perf_counter()
    out = jax.block_until_ready(prog2(jnp.float32(1), alive_f, *planes))
    dt = (time.perf_counter() - t0) / 8 * 1e3
    print(f"expand 11 planes [1M]: {dt:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
