"""Pallas TPU stream compaction / expansion for survivor-compacted tracing.

Replaces the two multi-payload ``lax.sort``s that ops/mega.py used for the
survivor partition (profiled at 11.4 ms of a 38.5 ms sample step at 1024^2
on v5e; XLA's variadic sort is a ~210-stage bitonic network that moves
every payload plane at every stage, and XLA's 1D gathers/scatters are
>8 ms per [1M] plane, so no XLA-level formulation beats the sort).  Here
the partition is two O(R) Pallas kernels:

``stream_compact``
    Grid over CHUNK=8192-ray chunks.  Per chunk: a 13-stage logarithmic
    shift network (``pltpu.roll`` on lane/sublane axes) stably packs the
    alive lanes of all payload planes — stacked [P, 64, 128] so one roll
    op moves every plane — to the chunk front, then one dynamic-offset
    DMA appends the packed prefix to a global stream at a running SMEM
    offset.  Offsets are in 128-lane rows (tiled-HBM DMA slices must be
    128-aligned), so each chunk contributes <=127 "bubble" lanes, filled
    with per-plane fill values (the miss plane's fill marks them dead).

``stream_expand``
    The inverse: per original chunk, one dynamic-offset DMA read of the
    packed segment, then the reverse network (MSB->LSB right shifts)
    routes compacted lane k back to the k-th alive original position.
    The routing distances ride along as a compacted payload written by
    ``stream_compact`` (the local-position plane), so expansion needs no
    prefix-sum network of its own.

Correctness of reading the distance plane at an element's *current*
position (it is never shifted alongside the data in the forward network):
after the stages for bits < b, an element with original position i and
distance d sits at j = i - (d mod 2^b); every skipped position in [j, i)
is dead, so dist[j] = d - (d mod 2^b) + (#alive in [j,i) = 0 adjustments)
— precisely: dist[j] ∈ [hi_b(d), hi_b(d) + lo_b(d)] and lo_b(d) < 2^b
cannot carry into bit b, hence bits >= b of dist[j] equal bits >= b of d.
The cyclic wrap of ``pltpu.roll`` is provably never selected: a move by
2^b at stage b requires dist >= 2^b at a position < 2^b, impossible since
dist[j] <= j.

The reference has no analog (its megakernel keeps dead threads idle,
`cuSrc/path_tracer.cu:141-170`); this is the TPU substitute for warp-level
divergence handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_CHUNK = 8192

# f32 1.0 as an i32 bit pattern (fill for the miss plane: bubbles = dead)
FILL_ONE_F32 = 0x3F800000


def unstack_planes(comp, dtypes):
    """Slice the first len(dtypes) rows of a [np_pad, R] compact stack as
    flat 1D planes behind a layout firewall: a bare row slice rides as a
    [1, R] {T(1,128)} value (1/8 VPU width) through every downstream
    fusion — and through lax.cond boundaries — unless forced to a dense
    {T(1024)} 1D layout here (one 4 MB relayout copy per plane)."""
    out = []
    for i, dt in enumerate(dtypes):
        p = jax.lax.optimization_barrier(jnp.reshape(comp[i], (-1,)))
        if dt == jnp.float32:
            p = jax.lax.bitcast_convert_type(p, jnp.float32)
        out.append(p)
    return tuple(out)


def _lane_iota(rows):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)


def _flat_pos(rows):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + _lane_iota(rows)
    )


def _shift_left(x, k, rows):
    """Flat row-major left shift by k of [..., rows, LANES] (cyclic)."""
    ax = x.ndim - 2
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, rows - q, ax)
    if r == 0:
        return x
    y1 = pltpu.roll(x, LANES - r, ax + 1)
    y2 = pltpu.roll(y1, rows - 1, ax)
    lane = _lane_iota(rows)
    return jnp.where(lane < LANES - r, y1, y2)


def _shift_right(x, k, rows):
    ax = x.ndim - 2
    q, r = divmod(k, LANES)
    if q:
        x = pltpu.roll(x, q, ax)
    if r == 0:
        return x
    y1 = pltpu.roll(x, r, ax + 1)
    y2 = pltpu.roll(y1, 1, ax)
    lane = _lane_iota(rows)
    return jnp.where(lane >= r, y1, y2)


def _prefix_sum(v, rows, chunk):
    pos = _flat_pos(rows)
    b = 1
    while b < chunk:
        sh = _shift_right(v, b, rows)
        v = jnp.where(pos >= b, v + sh, v)
        b *= 2
    return v


def _compact_net(alive_i, stacked, rows, chunk):
    """Stably pack alive lanes to the chunk front (stacked [P,rows,LANES]
    moves as one unit per stage).  Returns (packed, count)."""
    dead_incl = _prefix_sum(1 - alive_i, rows, chunk)
    dist = dead_incl - (1 - alive_i)
    valid = alive_i
    x = stacked
    bit = 0
    b = 1
    while b < chunk:
        bitset = (dist >> bit) & 1
        move_src = valid * bitset
        moved = _shift_left(move_src, b, rows)
        x = jnp.where((moved > 0)[None], _shift_left(x, b, rows), x)
        valid = moved | (valid * (1 - bitset))
        b *= 2
        bit += 1
    return x, jnp.sum(alive_i)


def _expand_net(stacked, e, count, rows, chunk):
    """Route compacted lane k (k < count) right by e[k] positions.
    e must be the non-decreasing original-position-minus-k plane."""
    pos = _flat_pos(rows)
    valid = (pos < count).astype(jnp.int32)
    x = stacked
    stages = chunk.bit_length() - 1
    for bit in reversed(range(stages)):
        b = 1 << bit
        bitset = (e >> bit) & 1
        move_src = valid * bitset
        moved = _shift_right(move_src, b, rows)
        x = jnp.where((moved > 0)[None], _shift_right(x, b, rows), x)
        valid = moved | (valid * (1 - bitset))
        # e is per-element (not per-position): it rides with the data
        e = jnp.where(moved > 0, _shift_right(e, b, rows), e)
    return x


def _bitcast_i32(x):
    if x.dtype == jnp.int32:
        return x
    return pltpu.bitcast(x, jnp.int32)


def _compact_kernel(n_planes, fills, rows, chunk,
                    missed_ref, *refs):
    in_refs = refs[:n_planes]
    out_ref = refs[n_planes]       # ANY [np_pad, R] i32
    offs_ref = refs[n_planes + 1]  # SMEM [n_chunks] (row units)
    nal_ref = refs[n_planes + 2]   # SMEM [1] (lanes, row-rounded)
    scratch = refs[n_planes + 3]   # VMEM [np_pad, chunk] i32
    sem = refs[n_planes + 4]
    run_ref = refs[n_planes + 5]   # SMEM [1] running row offset

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        run_ref[0] = 0

    alive_i = (missed_ref[...] == 0.0).astype(jnp.int32)
    pos = _flat_pos(rows)
    # the local-position plane rides along: stream_expand derives its
    # routing distances from it (e = l_of_k - k)
    stacked = jnp.concatenate(
        [_bitcast_i32(r[...])[None] for r in in_refs] + [pos[None]], axis=0
    )
    packed, count = _compact_net(alive_i, stacked, rows, chunk)
    # garbage beyond the packed prefix -> per-plane fills (bubbles between
    # chunk segments read as dead/neutral downstream)
    fill_rows = fills + (0,)
    packed = jnp.concatenate(
        [
            jnp.where(pos < count, packed[p],
                      jnp.full_like(packed[p], fill_rows[p]))[None]
            for p in range(n_planes + 1)
        ],
        axis=0,
    )
    np_pad = scratch.shape[0]
    flat = packed.reshape(n_planes + 1, chunk)
    if np_pad != n_planes + 1:
        flat = jnp.concatenate(
            [flat, jnp.zeros((np_pad - n_planes - 1, chunk), jnp.int32)],
            axis=0,
        )
    scratch[...] = flat
    # offsets tracked in 128-lane ROWS: tiled-HBM DMA slices must be
    # provably 128-aligned
    off_rows = run_ref[0]
    offs_ref[k] = off_rows
    run_ref[0] = off_rows + (count + LANES - 1) // LANES
    copy = pltpu.make_async_copy(
        scratch, out_ref.at[:, pl.ds(off_rows * LANES, chunk)], sem
    )
    copy.start()
    copy.wait()

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        nal_ref[0] = (off_rows + (count + LANES - 1) // LANES) * LANES


@functools.partial(
    jax.jit,
    static_argnames=("fills", "chunk", "interpret"),
)
def stream_compact(missed, planes, *, fills, chunk=DEFAULT_CHUNK,
                   interpret=False):
    """Stably pack the alive (missed == 0) lanes of `planes` into a global
    prefix stream.

    missed: f32[R] (0.0 = alive); planes: tuple of f32/i32 [R];
    fills: per-plane i32 bit patterns for bubble lanes.
    R must be a multiple of `chunk`.

    Returns (stacked i32[np_pad, R], offs_rows i32[n_chunks],
    n_alive i32[1]): plane p of the stream is stacked[p] (bitcast back for
    f32); stacked[n_planes] is the local-position plane consumed by
    stream_expand; n_alive is row-rounded (bubbles included) and the
    stream beyond n_alive[0] is uninitialized.
    """
    n = len(planes)
    r = missed.shape[0]
    assert r % chunk == 0, (r, chunk)
    rows = chunk // LANES
    n_chunks = r // chunk
    m2 = missed.reshape(rows * n_chunks, LANES)
    p2 = [p.reshape(rows * n_chunks, LANES) for p in planes]
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    np_pad = -(-(n + 1) // 8) * 8
    return pl.pallas_call(
        functools.partial(_compact_kernel, n, tuple(fills), rows, chunk),
        grid=(n_chunks,),
        in_specs=[spec] * (n + 1),
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_pad, r), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((np_pad, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(m2, *p2)


def _expand_kernel(n_planes, fills, rows, chunk,
                   missed_ref, comp_ref, offs_ref, *refs):
    out_refs = refs[:n_planes]
    scratch = refs[n_planes]
    sem = refs[n_planes + 1]
    k = pl.program_id(0)
    off_rows = offs_ref[k]
    copy = pltpu.make_async_copy(
        comp_ref.at[:, pl.ds(off_rows * LANES, chunk)], scratch, sem
    )
    copy.start()
    copy.wait()
    alive_i = (missed_ref[...] == 0.0).astype(jnp.int32)
    count = jnp.sum(alive_i)
    stacked = scratch[...].reshape(scratch.shape[0], rows, LANES)
    pos = _flat_pos(rows)
    # routing distance from the carried local-position plane
    e = stacked[n_planes] - pos
    outs = _expand_net(stacked[:n_planes], e, count, rows, chunk)
    alive_b = alive_i > 0
    for i, ref in enumerate(out_refs):
        plane = jnp.where(alive_b, outs[i],
                          jnp.full_like(outs[i], fills[i]))
        if ref.dtype == jnp.float32:
            plane = pltpu.bitcast(plane, jnp.float32)
        ref[...] = plane


@functools.partial(
    jax.jit,
    static_argnames=("dtypes", "fills", "chunk", "interpret"),
)
def stream_expand(missed, comp, offs_rows, *, dtypes, fills,
                  chunk=DEFAULT_CHUNK, interpret=False):
    """Inverse of stream_compact for a *different* set of planes computed
    in the compacted domain: route compacted lane k of `comp[:len(dtypes)]`
    back to the k-th alive original position; dead positions get `fills`.

    comp must carry the local-position plane at row len(dtypes) (build it
    with `restack_for_expand` / by writing outputs in stream_compact's
    layout).  Returns a list of [R] planes with the given dtypes.
    """
    n = len(dtypes)
    r = missed.shape[0]
    rows = chunk // LANES
    n_chunks = r // chunk
    m2 = missed.reshape(rows * n_chunks, LANES)
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n, tuple(fills), rows, chunk),
        grid=(n_chunks,),
        in_specs=[
            spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec] * n,
        out_shape=[
            jax.ShapeDtypeStruct((rows * n_chunks, LANES), dt)
            for dt in dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((comp.shape[0], chunk), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(m2, comp, offs_rows)
    return [o.reshape(r) for o in outs]
