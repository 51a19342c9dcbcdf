"""Prototype v2: stacked-plane (3D) compaction/expansion network at
CHUNK=8192 + cross-chunk packing via SMEM running offset and
dynamic-offset DMA.  Measures the full compact->expand round trip cost.
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

CHUNK = 8192
ROWS, LANES = CHUNK // 128, 128  # 64 x 128
STAGES = 13  # log2(8192)


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)


def _flat_pos():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
        + _lane_iota()
    )


def _shift_left_2d(x, k):
    """Flat left shift of a [ROWS,LANES] (or [P,ROWS,LANES]) row-major
    array by k (cyclic wrap; wrapped lanes carry garbage that the network
    never selects)."""
    ax = x.ndim - 2
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, ROWS - q, ax)
    if r == 0:
        return x
    y1 = pltpu.roll(x, LANES - r, ax + 1)
    y2 = pltpu.roll(y1, ROWS - 1, ax)
    lane = _lane_iota()
    return jnp.where(lane < LANES - r, y1, y2)


def _shift_right_2d(x, k):
    ax = x.ndim - 2
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, q, ax)
    if r == 0:
        return x
    y1 = pltpu.roll(x, r, ax + 1)
    y2 = pltpu.roll(y1, 1, ax)
    lane = _lane_iota()
    return jnp.where(lane >= r, y1, y2)


def _prefix_sum(v):
    pos = _flat_pos()
    b = 1
    while b < CHUNK:
        sh = _shift_right_2d(v, b)
        v = jnp.where(pos >= b, v + sh, v)
        b *= 2
    return v


def compact_chunk(alive_i, stacked):
    """alive_i: i32[ROWS,LANES] 0/1; stacked: i32[P,ROWS,LANES].
    Returns (compacted stacked (tail garbage), count)."""
    dead_incl = _prefix_sum(1 - alive_i)
    dist = dead_incl - (1 - alive_i)
    valid = alive_i
    x = stacked
    for bit in range(STAGES):
        b = 1 << bit
        bitset = (dist >> bit) & 1
        move_src = valid * bitset
        moved = _shift_left_2d(move_src, b)
        x = jnp.where((moved > 0)[None], _shift_left_2d(x, b), x)
        valid = moved | (valid * (1 - bitset))
    return x, jnp.sum(alive_i)


def expand_chunk(alive_i, stacked, count, fills):
    """Inverse: route compacted lane k to the k-th alive position; dead
    positions get fills[p]."""
    pos = _flat_pos()
    dead_incl = _prefix_sum(1 - alive_i)
    dist = dead_incl - (1 - alive_i)
    # l_of_k = compact(pos): original position of the k-th alive lane
    (l_of_k,), _ = _compact1(alive_i, dist, pos)
    e = l_of_k - pos
    valid = (pos < count).astype(jnp.int32)
    x = stacked
    for bit in reversed(range(STAGES)):
        b = 1 << bit
        bitset = (e >> bit) & 1
        move_src = valid * bitset
        moved = _shift_right_2d(move_src, b)
        x = jnp.where((moved > 0)[None], _shift_right_2d(x, b), x)
        valid = moved | (valid * (1 - bitset))
        # e must follow the elements: same invariant as compaction reads
        # dist at current position... but e is per-INPUT-position; after a
        # move the element's remaining distance low bits live at its new
        # position only if e satisfies the same interval property.  It
        # does NOT in general, so shift e along with the data.
        e = jnp.where(moved > 0, _shift_right_2d(e, b), e)
    return [jnp.where(alive_i > 0, x[i], jnp.full_like(x[i], fills[i]))
            for i in range(x.shape[0])]


def _compact1(alive_i, dist, plane):
    valid = alive_i
    x = plane
    for bit in range(STAGES):
        b = 1 << bit
        bitset = (dist >> bit) & 1
        move_src = valid * bitset
        moved = _shift_left_2d(move_src, b)
        x = jnp.where(moved > 0, _shift_left_2d(x, b), x)
        valid = moved | (valid * (1 - bitset))
    return (x,), jnp.sum(alive_i)


def _compact_kernel(n_planes, missed_ref, *refs):
    in_refs = refs[:n_planes]
    out_ref = refs[n_planes]      # ANY [NP, R] i32
    offs_ref = refs[n_planes + 1]  # SMEM [n_chunks]
    nal_ref = refs[n_planes + 2]   # SMEM [1]
    scratch = refs[n_planes + 3]   # VMEM [NP, ROWS, LANES] i32
    sem = refs[n_planes + 4]
    run_ref = refs[n_planes + 5]   # SMEM [1] running offset

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        run_ref[0] = 0

    alive_i = (missed_ref[...] == 0.0).astype(jnp.int32)
    stacked = jnp.stack([r[...].astype(jnp.int32) if r.dtype == jnp.int32
                         else pltpu.bitcast(r[...], jnp.int32)
                         for r in in_refs], axis=0)
    comp, count = compact_chunk(alive_i, stacked)
    # DMA offsets along the lane dim must be 128-aligned: pack at row
    # granularity (<=127 bubble lanes per chunk); clear the garbage tail
    # of plane 0 == missed payload is handled by the caller convention:
    # here we zero ALL planes' tails so bubbles are deterministic.
    pos3 = _flat_pos()[None]
    comp = jnp.where(pos3 < count, comp, jnp.zeros_like(comp))
    np_pad = scratch.shape[0]
    flat = comp.reshape(comp.shape[0], CHUNK)
    if np_pad != n_planes:
        flat = jnp.concatenate(
            [flat, jnp.zeros((np_pad - n_planes, CHUNK), jnp.int32)], axis=0)
    scratch[...] = flat
    # run_ref tracks ROWS (128-lane units) so the DMA offset is provably
    # 128-aligned (Mosaic requires it for tiled HBM slices)
    off_rows = run_ref[0]
    offs_ref[k] = off_rows
    run_ref[0] = off_rows + (count + 127) // 128
    copy = pltpu.make_async_copy(
        scratch, out_ref.at[:, pl.ds(off_rows * 128, CHUNK)], sem
    )
    copy.start()
    copy.wait()

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        nal_ref[0] = (off_rows + (count + 127) // 128) * 128


def run_compact(missed, planes):
    """missed: f32[R]; planes: list of f32/i32 [R].  Returns
    (stacked_compacted i32[NP, R], offsets i32[n_chunks], n_alive)."""
    n = len(planes)
    r = missed.shape[0]
    n_chunks = r // CHUNK
    m2 = missed.reshape(ROWS * n_chunks, LANES)
    p2 = [p.reshape(ROWS * n_chunks, LANES) for p in planes]
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    n_pad = -(-n // 8) * 8
    outs = pl.pallas_call(
        functools.partial(_compact_kernel, n),
        grid=(n_chunks,),
        in_specs=[spec] * (n + 1),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, r), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(m2, *p2)
    return outs


def _expand_kernel(n_planes, fills, missed_ref, comp_ref, offs_ref, nal_ref,
                   *refs):
    out_refs = refs[:n_planes]
    scratch = refs[n_planes]
    sem = refs[n_planes + 1]
    k = pl.program_id(0)
    off_rows = offs_ref[k]
    copy = pltpu.make_async_copy(
        comp_ref.at[:, pl.ds(off_rows * 128, CHUNK)], scratch, sem
    )
    copy.start()
    copy.wait()
    alive_i = (missed_ref[...] == 0.0).astype(jnp.int32)
    count = jnp.sum(alive_i)
    stacked = scratch[...].reshape(scratch.shape[0], ROWS, LANES)[:n_planes]
    outs = expand_chunk(alive_i, stacked, count, fills)
    for i, r in enumerate(out_refs):
        plane = outs[i]
        if r.dtype == jnp.float32:
            plane = pltpu.bitcast(plane, jnp.float32)
        r[...] = plane


def run_expand(missed, comp, offs, nal, dtypes, fills):
    n = len(dtypes)
    r = missed.shape[0]
    n_chunks = r // CHUNK
    m2 = missed.reshape(ROWS * n_chunks, LANES)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n, tuple(fills)),
        grid=(n_chunks,),
        in_specs=[
            spec,
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec] * n,
        out_shape=[
            jax.ShapeDtypeStruct((ROWS * n_chunks, LANES), dt)
            for dt in dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((comp.shape[0], CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(m2, comp, offs, nal)
    return [o.reshape(r) for o in outs]


def main():
    rng = np.random.default_rng(0)
    R = 1 << 20
    alive_np = rng.random(R) < 0.2
    missed = jnp.asarray((~alive_np).astype(np.float32))
    NP = 11
    planes_np = [rng.standard_normal(R).astype(np.float32) for _ in range(NP)]
    planes = [jnp.asarray(p) for p in planes_np]

    comp, offs, nal = run_compact(missed, planes)
    comp_np = np.asarray(comp)
    offs_np = np.asarray(offs)
    nal_np = int(np.asarray(nal)[0])
    # verify: per chunk, compacted prefix at offs[k] == alive elements
    ok = nal_np >= alive_np.sum()
    for k in range(R // CHUNK):
        a = alive_np[k * CHUNK:(k + 1) * CHUNK]
        c = a.sum()
        for p in range(NP):
            want = planes_np[p][k * CHUNK:(k + 1) * CHUNK][a]
            got = comp_np[p, offs_np[k] * 128:offs_np[k] * 128 + c].view(np.float32)
            if not np.array_equal(got, want):
                ok = False
                print(f"chunk {k} plane {p} MISMATCH")
                break
        if not ok:
            break
    print("compact correct:", ok, f"(n_alive={nal_np})", flush=True)

    outs = run_expand(missed, comp, offs, nal,
                      [jnp.float32] * NP, [0] * NP)
    ok = all(
        np.array_equal(np.asarray(o), np.where(alive_np, p, 0.0))
        for o, p in zip(outs, planes_np)
    )
    print("expand correct:", ok, flush=True)

    # timing, chained
    @jax.jit
    def prog(c0, missed, *planes):
        def body(c, _):
            ps = [p + c for p in planes]
            comp, offs, nal = run_compact(missed, ps)
            outs = run_expand(missed, comp, offs, nal,
                              [jnp.float32] * NP, [0] * NP)
            return c + outs[0][0] + outs[-1][-1], None
        c, _ = jax.lax.scan(body, c0, None, length=8)
        return c

    out = jax.block_until_ready(prog(jnp.float32(0), missed, *planes))
    t0 = time.perf_counter()
    out = jax.block_until_ready(prog(jnp.float32(1), missed, *planes))
    dt = (time.perf_counter() - t0) / 8 * 1e3
    print(f"compact+expand {NP} planes [1M]: {dt:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
