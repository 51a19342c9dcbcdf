"""Pallas TPU megakernel: the FULL bounce loop in one kernel.

One kernel invocation per ray tile runs all `depth` bounces of the
integrator — winner selection (:func:`intersect_kernel._mxu_best_index`),
winner-record fetch (one-hot MXU matmul against the packed scene tables),
hit-attribute reconstruction, PCG4D uniforms, BSDF sampling
(``planar.shade_p``) and the carry updates — entirely in VMEM.  Per ray
it reads 6 f32 + 2 i32 and writes 14 f32 planes plus one i32 winner-index
plane per bounce; every intermediate that the plain-XLA bounce loop
round-trips through HBM (~24 planes per bounce, profiled at ~6.7 ms per
1M-ray sample step on v5e — a third of the forward pass) stays on-chip.

Layout discipline: the winner/onehot/record math is 2D ([Ng, TR] objects
on sublanes — full vregs), but ALL per-ray math (hit attrs, RNG, shade,
carries) runs on flat 1D f32[TR] values, which Mosaic tiles densely
(8x128 per vreg).  A [1, TR] row shape here would run the whole shade
chain at 1/8 VPU width (profiled: 23 ms vs 13 ms per 1M-ray call).

The kernel is NOT differentiated.  It returns the per-bounce winner
indices (`hit_idx`, sign-encoded with the hit decision), and
``ops/mega.py`` wraps it in a `jax.custom_vjp` whose backward replays the
bounce chain in plain XLA from those indices — the identical
gather-epilogue/shade code (``planar.gather_epilogue_p`` /
``planar.shade_p``) the kernel itself inlines, so gradients match the
non-mega path.  Discrete RNG decisions match bitwise (PCG4D is exact
integer math); recomputed hit attributes can differ from the kernel's by
FMA-contraction ulps only (see ops/mega.py for how that is handled).

Semantics: the loop body is `integrator.trace_bounces`'s planar body —
radiance/throughput accumulation, miss bookkeeping (carry-free: frozen
dirn/thru stand in for the miss direction/throughput), first-bounce aux,
`BOUNCE_RAY_TMIN` re-seeding (`cuSrc/path_tracer.cu:124-175`).  The sky
epilogue stays outside (it needs the texture gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpppathtracer_tpu.ops import planar
from cpppathtracer_tpu.ops.pallas.intersect_kernel import (
    _ceil8,
    _mxu_best_index,
)
from cpppathtracer_tpu.types import (
    BOUNCE_RAY_TMIN,
    DEFAULT_RAY_TMAX,
    MaterialType,
)
from cpppathtracer_tpu.utils.rng import _pcg4d_jnp

_INF = float(np.float32(DEFAULT_RAY_TMAX))
_INV_2_24 = float(2.0**-24)


def _uniforms3(seed_u32, pix, samp, ctr):
    """First three PCG4D uniforms as f32[TR] (bitwise identical to
    utils.rng.uniforms4: (v >> 8) < 2^24 so the i32 hop is exact)."""
    x = pix.astype(jnp.uint32)
    y = samp.astype(jnp.uint32)
    z = jnp.full_like(x, jnp.uint32(ctr))
    w = jnp.full_like(x, jnp.uint32(0)) + seed_u32
    a, b, c, _ = _pcg4d_jnp(x, y, z, w)
    to_f = lambda v: (
        (v >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(_INV_2_24)
    )
    return to_f(a), to_f(b), to_f(c)


def _mega_kernel(
    counts, depth, n_pad, with_aux, start_bounce, with_o, guarded,
    has_amask,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tx0_ref, tx1_ref, tx2_ref,
    pix_ref, samp_ref, seed_ref,
    geom_ref, gmx_ref, ts_ref, tr_ref,
    *rest_refs,
):
    # optional compacted-phase per-lane alive mask (stream bubbles and
    # phase-A dead lanes read as 1.0 = dead); see ops/pallas/compact_kernel
    if has_amask:
        amask_ref, *rest_refs = rest_refs
    (rad0_ref, rad1_ref, rad2_ref,
     md0_ref, md1_ref, md2_ref,
     mt0_ref, mt1_ref, mt2_ref,
     missed_ref,
     fn0_ref, fn1_ref, fn2_ref, ft_ref,
     *out_refs) = rest_refs
    # out_refs: [o0,o1,o2 if with_o] + depth hit planes + (with_aux:
    # depth x (px, py, pz, att) planes — per-bounce hit positions +
    # attenuation-on masks for the textured-albedo epilogue, ops/mega.py).
    o_refs = ()
    if with_o:
        o_refs, out_refs = out_refs[:3], out_refs[3:]
    aux_refs = ()
    hit_refs = out_refs
    if with_aux:
        hit_refs, aux_refs = out_refs[:depth], out_refs[depth:]
    tr = ox_ref.shape[0]

    # Compacted-phase guard (ops/mega.py split forward): rays are
    # partitioned alive-first, seed_ref[1] holds n_alive.  Tiles entirely
    # past the prefix skip all bounce work; the boundary tile masks its
    # dead lanes via alive0.  Skipped tiles still publish neutral outputs
    # (rad=0, missed=0, thru=0, hit=-1) so the XLA merge/unpermute reads
    # zeros for suffix rays.
    if guarded:
        n_alive = seed_ref[1]
        tile_start = pl.program_id(0) * tr

        def _zero3(refs):
            for ref in refs:
                ref[...] = jnp.zeros((tr,), ref.dtype)

        _zero3((rad0_ref, rad1_ref, rad2_ref, md0_ref, md1_ref, md2_ref,
                mt0_ref, mt1_ref, mt2_ref, missed_ref,
                fn0_ref, fn1_ref, fn2_ref, ft_ref))
        _zero3(o_refs)
        _zero3(aux_refs)
        for ref in hit_refs:
            ref[...] = jnp.full((tr,), -1, jnp.int32)

    def bounce_loop():
        o = (ox_ref[...], oy_ref[...], oz_ref[...])  # 1D f32[TR]
        d = (dx_ref[...], dy_ref[...], dz_ref[...])
        thru = (tx0_ref[...], tx1_ref[...], tx2_ref[...])
        pix = pix_ref[...]
        samp = samp_ref[...]
        seed_u32 = seed_ref[0].astype(jnp.uint32)
        geom = geom_ref[...]
        gmx = gmx_ref[...]
        ts = ts_ref[...]  # [F_S, n_pad]
        trt = tr_ref[...]  # [F_R, n_pad]

        zero = jnp.zeros((tr,), jnp.float32)
        tmax = zero + _INF
        tmax_row = tmax[None, :]
        rad = (zero, zero, zero)
        if guarded:
            lane = tile_start + jax.lax.broadcasted_iota(jnp.int32, (tr,), 0)
            alive0 = lane < n_alive
            if has_amask:
                alive0 = alive0 & (amask_ref[...] == 0.0)
        else:
            alive0 = zero < 1.0  # all True
        alive = alive0
        first_n = (zero, zero, zero)
        first_t = zero

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, tr), 0)

        for b in range(depth):
            tmin = zero + (
                0.0 if start_bounce + b == 0
                else float(np.float32(BOUNCE_RAY_TMIN))
            )
            best_i = _mxu_best_index(
                counts,
                o[0][None, :], o[1][None, :], o[2][None, :],
                d[0][None, :], d[1][None, :], d[2][None, :],
                tmin[None, :], tmax_row, geom, gmx,
            )  # i32[1, TR] dense grouped

            onehot = (row_iota == best_i).astype(jnp.float32)  # [n_pad, TR]
            rec = jax.lax.dot_general(
                ts, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
            )  # [F_S, TR]
            rec_r = jax.lax.dot_general(
                trt, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
            )  # [F_R, TR]

            # everything per-ray from here on is flat 1D [TR]
            center = (rec[0], rec[1], rec[2])
            prim_type = rec[6].astype(jnp.int32)
            t, normal = planar.object_hit_attrs_p(
                prim_type, center, rec[3], rec[4], rec[5], o, d, tmin, tmax
            )
            hit = t < _INF
            # Sign-encode the hit decision into the saved index: the backward
            # replay recomputes t with different FMA contractions (ulp-level)
            # and must not revive a ray the kernel terminated.
            hit_refs[b][...] = jnp.where(hit, best_i[0], -1)
            t_safe = jnp.where(hit, t, 0.0)
            pos = planar.add_p(o, planar.scale_p(d, t_safe))
            normal = planar.where_p(hit, normal, (zero, zero, zero))
            mats = {
                "mat_type": rec[7].astype(jnp.int32),
                "kd_p": (rec_r[0], rec_r[1], rec_r[2]),
                "emission": rec_r[3],
                "smoothness": rec[8],
                "reflectivity": rec[9],
                "ior": rec[10],
            }
            u1, u2, u3 = _uniforms3(seed_u32, pix, samp, 1 + start_bounce + b)
            # score_grad off: the surrogate weights are exactly 1.0 in the
            # forward and this kernel is never differentiated (ops/mega.py's
            # replay carries them).
            bounce_dir, attenuation, emitted = planar.shade_p(
                mats, normal, d, u1, u2, u3, score_grad=False
            )

            if with_aux:
                # hit position + attenuation-on mask (horizon check; glass
                # always attenuates, material.cu:140) for the texture epilogue
                att_on = (mats["mat_type"] == MaterialType.GLASS) | (
                    planar.dot_p(normal, bounce_dir) > 0.0
                )
                base = b * 4
                aux_refs[base][...] = pos[0]
                aux_refs[base + 1][...] = pos[1]
                aux_refs[base + 2][...] = pos[2]
                aux_refs[base + 3][...] = att_on.astype(jnp.float32)

            live_hit = hit & alive
            lh = live_hit.astype(jnp.float32)
            rad = planar.add_p(rad, planar.scale_p(planar.mul_p(thru, emitted), lh))
            thru = planar.where_p(live_hit, planar.mul_p(thru, attenuation), thru)
            if b == 0:
                first_n = planar.where_p(hit, normal, planar.scale_p(d, -1.0))
                first_t = jnp.where(hit, t, _INF)
            alive = alive & hit
            o = planar.where_p(hit, pos, o)
            d = planar.where_p(hit, planar.normalize_p(bounce_dir), d)

        rad0_ref[...] = rad[0]
        rad1_ref[...] = rad[1]
        rad2_ref[...] = rad[2]
        md0_ref[...] = d[0]
        md1_ref[...] = d[1]
        md2_ref[...] = d[2]
        mt0_ref[...] = thru[0]
        mt1_ref[...] = thru[1]
        mt2_ref[...] = thru[2]
        # missed mask as f32 (1.0 where the path escaped to the sky);
        # never-alive lanes (compacted-phase boundary mask) stay 0 so the
        # XLA merge does not double-apply the sky.
        missed_ref[...] = (alive0 & ~alive).astype(jnp.float32)
        fn0_ref[...] = first_n[0]
        fn1_ref[...] = first_n[1]
        fn2_ref[...] = first_n[2]
        ft_ref[...] = first_t
        if with_o:
            o_refs[0][...] = o[0]
            o_refs[1][...] = o[1]
            o_refs[2][...] = o[2]

    if guarded:
        @pl.when(tile_start < n_alive)
        def _():
            bounce_loop()
    else:
        bounce_loop()



def build_tables_T(gs):
    """Transposed, row-padded scene tables for the in-kernel record fetch:
    (table_s^T f32[F_S, n_pad], table_r^T f32[F_R, n_pad]) with n_pad =
    ceil8(Na); pad columns are zero and can never win (winner indices are
    dense grouped < Na)."""
    na = sum(gs.counts)
    n_pad = max(8, _ceil8(na))
    pad = n_pad - na
    ts = gs.table_s[:na].T
    trt = gs.table_r[:na].T
    if pad:
        ts = jnp.pad(ts, ((0, 0), (0, pad)))
        trt = jnp.pad(trt, ((0, 0), (0, pad)))
    return ts, trt


@functools.partial(
    jax.jit,
    static_argnames=(
        "counts", "depth", "tile", "interpret", "with_aux",
        "start_bounce", "with_o",
    ),
)
def pallas_mega_trace(
    o, d, pixel_idx, sample_idx, seed, geom, gmx, ts, trt,
    *, counts, depth, tile=1024, interpret=False, with_aux=False,
    start_bounce=0, with_o=False, thru=None, n_alive=None, alive_mask=None,
):
    """Run the full bounce loop for planar rays (o, d tuples of f32[R]).

    Returns (rad vec3, miss_dir vec3, miss_thru vec3, missed f32[R],
    first_n vec3, first_t f32[R], hit_idx: tuple of depth i32[R],
    aux).  With `with_aux`, aux is a tuple of depth (pos vec3,
    att f32[R]) per-bounce records for the textured-albedo epilogue;
    otherwise None.  R must be a multiple of `tile` (caller pads).  All
    inputs should be stop_gradient'ed — gradients flow through
    ops/mega.py's replay.  The winner-index planes are returned
    SEPARATELY (not stacked [depth, R]) so the backward replay consumes
    flat 1D arrays — a stacked residual drags 1/8-width T(1,128) layouts
    through the whole replayed chain (profiled ~2x on the backward).
    """
    r = pixel_idx.shape[0]
    assert r % tile == 0, (r, tile)
    n_rep = geom.shape[0]
    m = gmx.shape[0]
    n_pad = ts.shape[1]
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f1 = jax.ShapeDtypeStruct((r,), jnp.float32)
    i1 = jax.ShapeDtypeStruct((r,), jnp.int32)
    n_aux = 4 * depth if with_aux else 0
    n_o = 3 if with_o else 0
    guarded = n_alive is not None
    has_amask = alive_mask is not None
    assert not has_amask or guarded
    if thru is None:
        ones = jnp.ones((r,), jnp.float32)
        thru = (ones, ones, ones)
    sc = jnp.stack([
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(n_alive if guarded else r, jnp.int32),
    ])
    amask_in = (alive_mask,) if has_amask else ()
    outs = pl.pallas_call(
        functools.partial(
            _mega_kernel, counts, depth, n_pad, with_aux, start_bounce,
            with_o, guarded, has_amask,
        ),
        grid=(r // tile,),
        in_specs=[spec1d] * 11
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            whole((n_rep, 8)),
            whole((m, 11)),
            whole(ts.shape),
            whole(trt.shape),
        ]
        + [spec1d] * len(amask_in),
        out_specs=[spec1d] * (14 + n_o + depth + n_aux),
        out_shape=[f1] * 14 + [f1] * n_o + [i1] * depth + [f1] * n_aux,
        interpret=interpret,
    )(
        o[0], o[1], o[2], d[0], d[1], d[2],
        thru[0], thru[1], thru[2],
        pixel_idx, sample_idx, sc,
        geom, gmx, ts, trt,
        *amask_in,
    )
    rad = tuple(outs[0:3])
    miss_dir = tuple(outs[3:6])
    miss_thru = tuple(outs[6:9])
    missed = outs[9]
    first_n = tuple(outs[10:13])
    first_t = outs[13]
    o_out = tuple(outs[14:14 + n_o]) if with_o else None
    hit_idx = tuple(outs[14 + n_o : 14 + n_o + depth])
    aux = None
    if with_aux:
        flat = outs[14 + n_o + depth :]
        aux = tuple(
            (tuple(flat[b * 4 : b * 4 + 3]), flat[b * 4 + 3])
            for b in range(depth)
        )
    out = (rad, miss_dir, miss_thru, missed, first_n, first_t, hit_idx, aux)
    if with_o:
        out = out + (o_out,)
    return out
