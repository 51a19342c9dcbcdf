"""Pallas TPU backward kernels for the megakernel: the VJP replay fused
on-chip.

The megakernel (ops/pallas/mega_kernel.py) runs the whole bounce loop in
VMEM and saves only the per-bounce winner indices; its custom-vjp
backward (ops/mega.py) reconstructs every bounce's record from the saved
index and differentiates the record-fetch -> hit-attrs -> shade ->
accumulate chain.  Round 2 ran that replay in plain XLA, and it dominated
the iteration (~3.0 s of a 3.6 s fwd+bwd step at 1024^2 x 16spp on v5e):
reverse-mode XLA round-trips every per-bounce intermediate (~70 planes x
8 bounces) through HBM twice.

Kernel decomposition.  A single whole-chain in-kernel VJP does not fit
VMEM: Mosaic's stack allocation for the unrolled linearize-transpose
graph measures ~5.2 MB *per bounce* at tile 1024 (18.3 MB at depth 4,
39 MB at depth 8, vs the 16 MB budget), and `jax.checkpoint` can't trim
it (remat2 has no Pallas lowering).  So the backward runs as
`1 + depth` small kernels, each of which fits comfortably:

  1. `pallas_replay_carries` — re-runs the forward chain from the saved
     winner indices once, writing the NONLINEAR bounce-entry carries
     (o, d, throughput, alive: 10 planes/bounce) to HBM.  The linear /
     pass-through carry components (radiance, first_n, first_t) are NOT
     stored: their values never enter any cotangent (radiance is purely
     additive; first_n/first_t are pass-through selects with static
     bounce index), so the bounce-VJP kernels feed zeros for them.
  2. `pallas_bounce_bwd` — the VJP of ONE bounce (trace-time `jax.vjp`
     of the shared `_replay_bounce` body): consumes the stored carry,
     the sign-encoded winner plane and the swept cotangents
     (ct_o, ct_d, ct_thru); produces the previous bounce's sweep
     cotangents plus this bounce's scene-table cotangent contribution
     (accumulated across the sequential ray-tile grid in an output
     block).  The radiance / first-bounce cotangents are loop-invariant
     (ct_rad passes through unchanged; first_n/first_t are consumed only
     at bounce 0), so they enter every call as constants instead of
     being swept.  Only two Pallas kernels compile regardless of depth:
     `is_first` (bounce 0: tmin=0, writes first_n/first_t) and the
     generic bounce with its RNG counter in SMEM.

The differentiated math is definitionally identical to the XLA replay
(ops/mega.py::_replay_outputs) because both trace the same bounce body;
tests pin the equivalence (tests/test_mega.py).  Reference spec being
differentiated: the hot loop of `cuSrc/path_tracer.cu:124-175` with
`material.cu:20-143` shading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpppathtracer_tpu.ops import planar
from cpppathtracer_tpu.utils.rng import _pcg4d_jnp
from cpppathtracer_tpu.types import BOUNCE_RAY_TMIN, DEFAULT_RAY_TMAX

_INF = float(np.float32(DEFAULT_RAY_TMAX))
_INV_2_24 = float(2.0**-24)


def _uniforms3_dyn(seed_u32, pix, samp, ctr_u32):
    """First three PCG4D uniforms with a (possibly traced) counter —
    bitwise identical to mega_kernel._uniforms3 / utils.rng.uniforms4."""
    x = pix.astype(jnp.uint32)
    y = samp.astype(jnp.uint32)
    z = jnp.zeros_like(x) + ctr_u32
    w = jnp.zeros_like(x) + seed_u32
    a, b, c, _ = _pcg4d_jnp(x, y, z, w)
    to_f = lambda v: (
        (v >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(_INV_2_24)
    )
    return to_f(a), to_f(b), to_f(c)


def _replay_bounce(is_first, carry, ts, trt, enc, pix, samp, seed_u32,
                   ctr_u32, with_aux=False):
    """One bounce of the replay chain, differentiable w.r.t. carry+tables.

    Mirrors ops/mega.py::_replay_outputs' loop body exactly (which
    mirrors the megakernel's forward): the saved sign-encoded index
    `enc` vetoes ulp-level false revivals; `is_first` is the static
    bounce-0 flag (tmin = 0, first_n/first_t written); `ctr_u32` is the
    per-bounce RNG counter (traced so one compiled kernel serves all
    non-first bounces).
    """
    (o, d, thru, rad, alive, first_n, first_t) = carry
    n_pad = ts.shape[1]
    tr = pix.shape[0]
    zero = jnp.zeros((tr,), jnp.float32)
    tmax = zero + _INF
    tmin = zero + (0.0 if is_first else float(np.float32(BOUNCE_RAY_TMIN)))
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, tr), 0)
    idx = jnp.maximum(enc, 0)
    onehot = (row_iota == idx[None, :]).astype(jnp.float32)
    rec = jax.lax.dot_general(
        ts, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F_S, TR]
    rec_r = jax.lax.dot_general(
        trt, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F_R, TR]
    center = (rec[0], rec[1], rec[2])
    prim_type = rec[6].astype(jnp.int32)
    t, normal = planar.object_hit_attrs_p(
        prim_type, center, rec[3], rec[4], rec[5], o, d, tmin, tmax
    )
    hit = (t < _INF) & (enc >= 0)
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
    u1, u2, u3 = _uniforms3_dyn(seed_u32, pix, samp, ctr_u32)
    bounce_dir, attenuation, emitted = planar.shade_p(
        mats, normal, d, u1, u2, u3
    )
    live_hit = hit & alive
    lh = live_hit.astype(jnp.float32)
    rad = planar.add_p(rad, planar.scale_p(planar.mul_p(thru, emitted), lh))
    thru = planar.where_p(live_hit, planar.mul_p(thru, attenuation), thru)
    if is_first:
        first_n = planar.where_p(hit, normal, planar.scale_p(d, -1.0))
        first_t = jnp.where(hit, t, _INF)
    alive = alive & hit
    o = planar.where_p(hit, pos, o)
    d = planar.where_p(hit, planar.normalize_p(bounce_dir), d)
    out = (o, d, thru, rad, alive, first_n, first_t)
    if with_aux:
        from cpppathtracer_tpu.types import MaterialType

        att_on = (mats["mat_type"] == MaterialType.GLASS) | (
            planar.dot_p(normal, bounce_dir) > 0.0
        )
        return out, (pos, att_on.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# kernel 1: carry dump (forward replay, bounce-entry carries to HBM)
# ---------------------------------------------------------------------------


def _carries_kernel(
    depth,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pix_ref, samp_ref, seed_ref, ts_ref, tr_ref,
    *rest_refs,
):
    hit_refs = rest_refs[:depth]
    out_refs = rest_refs[depth:]  # (depth-1) * 10 planes
    o = (ox_ref[...], oy_ref[...], oz_ref[...])
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    pix = pix_ref[...]
    samp = samp_ref[...]
    seed_u32 = seed_ref[0].astype(jnp.uint32)
    ts = ts_ref[...]
    trt = tr_ref[...]
    tr = pix.shape[0]
    zero = jnp.zeros((tr,), jnp.float32)
    one = zero + 1.0
    carry = (o, d, (one, one, one), (zero, zero, zero), zero < 1.0,
             (zero, zero, zero), zero)
    for b in range(depth - 1):
        carry = _replay_bounce(
            b == 0, carry, ts, trt, hit_refs[b][...], pix, samp, seed_u32,
            jnp.uint32(1 + b),
        )
        (co, cd, cthru, _rad, calive, _fn, _ft) = carry
        base = b * 10
        for j in range(3):
            out_refs[base + j][...] = co[j]
            out_refs[base + 3 + j][...] = cd[j]
            out_refs[base + 6 + j][...] = cthru[j]
        out_refs[base + 9][...] = calive.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("depth", "tile", "interpret"))
def pallas_replay_carries(
    o, d, pixel_idx, sample_idx, seed, ts, trt, hit_idx,
    *, depth, tile=1024, interpret=False,
):
    """Bounce-entry carries for bounces 1..depth-1 (bounce 0's carry is
    the primary rays).  Returns a list of (depth-1) tuples
    (o v3, d v3, thru v3, alive f32[R])."""
    r = pixel_idx.shape[0]
    assert r % tile == 0, (r, tile)
    n_out = (depth - 1) * 10
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f1 = jax.ShapeDtypeStruct((r,), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_carries_kernel, depth),
        grid=(r // tile,),
        in_specs=[spec1d] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [whole(ts.shape), whole(trt.shape)]
        + [spec1d] * depth,
        out_specs=[spec1d] * n_out,
        out_shape=[f1] * n_out,
        interpret=interpret,
    )(
        o[0], o[1], o[2], d[0], d[1], d[2],
        pixel_idx, sample_idx,
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        ts, trt, *hit_idx,
    )
    carries = []
    for b in range(depth - 1):
        base = b * 10
        carries.append((
            tuple(outs[base : base + 3]),
            tuple(outs[base + 3 : base + 6]),
            tuple(outs[base + 6 : base + 9]),
            outs[base + 9],
        ))
    return carries


# ---------------------------------------------------------------------------
# kernel 2: one bounce's VJP
# ---------------------------------------------------------------------------


def _float0(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _bounce_bwd_kernel(
    is_first, with_aux,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    th0_ref, th1_ref, th2_ref, alive_ref,
    enc_ref, pix_ref, samp_ref, seed_ref, ctr_ref, ts_ref, tr_ref,
    ctr0_ref, ctr1_ref, ctr2_ref,  # ct_rad (loop-invariant)
    ctn0_ref, ctn1_ref, ctn2_ref, ctft_ref,  # ct_first_n / ct_first_t
    cso0_ref, cso1_ref, cso2_ref,  # swept ct_o in
    csd0_ref, csd1_ref, csd2_ref,  # swept ct_d in
    cst0_ref, cst1_ref, cst2_ref,  # swept ct_thru in
    *rest_refs,
):
    # rest_refs: [ct_pos x3 if with_aux] then outputs (ct_ts, ct_trt,
    # ct_o x3, ct_d x3, ct_thru x3)
    if with_aux:
        ctp_refs, rest_refs = rest_refs[:3], rest_refs[3:]
    (ct_ts_ref, ct_tr_ref,
     oo0_ref, oo1_ref, oo2_ref, od0_ref, od1_ref, od2_ref,
     ot0_ref, ot1_ref, ot2_ref) = rest_refs
    o = (ox_ref[...], oy_ref[...], oz_ref[...])
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    thru = (th0_ref[...], th1_ref[...], th2_ref[...])
    alive = alive_ref[...] > 0.5
    enc = enc_ref[...]
    pix = pix_ref[...]
    samp = samp_ref[...]
    seed_u32 = seed_ref[0].astype(jnp.uint32)
    ctr_u32 = ctr_ref[0].astype(jnp.uint32)
    ts = ts_ref[...]
    trt = tr_ref[...]
    tr = pix.shape[0]
    zero = jnp.zeros((tr,), jnp.float32)
    z3 = (zero, zero, zero)

    def fn(carry, ts_, trt_):
        return _replay_bounce(
            is_first, carry, ts_, trt_, enc, pix, samp, seed_u32, ctr_u32,
            with_aux=with_aux,
        )

    # rad / first_n / first_t primal values never enter cotangents
    # (additive / pass-through) — zeros stand in (see module docstring).
    carry_in = (o, d, thru, z3, alive, z3, zero)
    _, vjp_fn = jax.vjp(fn, carry_in, ts, trt)
    ct_out = (
        (cso0_ref[...], cso1_ref[...], cso2_ref[...]),
        (csd0_ref[...], csd1_ref[...], csd2_ref[...]),
        (cst0_ref[...], cst1_ref[...], cst2_ref[...]),
        (ctr0_ref[...], ctr1_ref[...], ctr2_ref[...]),
        _float0(alive),
        (ctn0_ref[...], ctn1_ref[...], ctn2_ref[...]),
        ctft_ref[...],
    )
    if with_aux:
        ct_out = (
            ct_out,
            ((ctp_refs[0][...], ctp_refs[1][...], ctp_refs[2][...]), zero),
        )
    ct_carry, ct_ts, ct_trt = vjp_fn(ct_out)
    (ct_o, ct_d, ct_thru, _ct_rad, _ct_alive, _ct_fn, _ct_ft) = ct_carry

    oo0_ref[...] = ct_o[0]
    oo1_ref[...] = ct_o[1]
    oo2_ref[...] = ct_o[2]
    od0_ref[...] = ct_d[0]
    od1_ref[...] = ct_d[1]
    od2_ref[...] = ct_d[2]
    ot0_ref[...] = ct_thru[0]
    ot1_ref[...] = ct_thru[1]
    ot2_ref[...] = ct_thru[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        ct_ts_ref[...] = jnp.zeros_like(ct_ts_ref)
        ct_tr_ref[...] = jnp.zeros_like(ct_tr_ref)

    ct_ts_ref[...] += ct_ts
    ct_tr_ref[...] += ct_trt


@functools.partial(
    jax.jit, static_argnames=("is_first", "tile", "interpret")
)
def pallas_bounce_bwd(
    carry, enc, pixel_idx, sample_idx, seed, ctr, ts, trt,
    ct_rad, ct_fn, ct_ft, ct_o, ct_d, ct_thru, ct_pos=None,
    *, is_first, tile=1024, interpret=False,
):
    """VJP of one replay bounce.

    carry: (o v3, d v3, thru v3, alive f32[R]) at this bounce's entry.
    ct_o/ct_d/ct_thru: swept output-side cotangents; ct_rad/ct_fn/ct_ft:
    loop-invariant cotangents; ct_pos: this bounce's hit-position
    cotangent (textured-albedo epilogue), or None.  Returns (ct_ts,
    ct_trt, ct_o', ct_d', ct_thru') — the entry-side sweep cotangents
    plus this bounce's table contribution.
    """
    r = pixel_idx.shape[0]
    assert r % tile == 0, (r, tile)
    with_aux = ct_pos is not None
    o, d, thru, alive = carry
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f1 = jax.ShapeDtypeStruct((r,), jnp.float32)
    aux_in = list(ct_pos) if with_aux else []
    outs = pl.pallas_call(
        functools.partial(_bounce_bwd_kernel, is_first, with_aux),
        grid=(r // tile,),
        in_specs=[spec1d] * 10
        + [spec1d] * 3  # enc, pix, samp
        + [smem, smem]
        + [whole(ts.shape), whole(trt.shape)]
        + [spec1d] * (16 + len(aux_in)),
        out_specs=[whole(ts.shape), whole(trt.shape)] + [spec1d] * 9,
        out_shape=[
            jax.ShapeDtypeStruct(ts.shape, jnp.float32),
            jax.ShapeDtypeStruct(trt.shape, jnp.float32),
        ] + [f1] * 9,
        interpret=interpret,
    )(
        o[0], o[1], o[2], d[0], d[1], d[2],
        thru[0], thru[1], thru[2], alive,
        enc, pixel_idx, sample_idx,
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        jnp.asarray(ctr, jnp.int32).reshape((1,)),
        ts, trt,
        ct_rad[0], ct_rad[1], ct_rad[2],
        ct_fn[0], ct_fn[1], ct_fn[2], ct_ft,
        ct_o[0], ct_o[1], ct_o[2],
        ct_d[0], ct_d[1], ct_d[2],
        ct_thru[0], ct_thru[1], ct_thru[2],
        *aux_in,
    )
    ct_ts, ct_trt = outs[0], outs[1]
    return (
        ct_ts, ct_trt,
        tuple(outs[2:5]), tuple(outs[5:8]), tuple(outs[8:11]),
    )


def pallas_mega_bwd(
    o, d, pixel_idx, sample_idx, seed, ts, trt, hit_idx, ct,
    *, ct_pos=None, depth, tile=1024, interpret=False,
):
    """Fused VJP of the megakernel replay: carry-dump kernel + `depth`
    bounce-VJP kernels chained in reverse.

    Args match ops/mega.py::_mega_bwd_pallas: planar primary rays, the
    transposed padded scene tables (build_tables_T), the sign-encoded
    winner planes (pads carry -1), and the output cotangents
    (rad v3, miss_dir v3, miss_thru v3, first_n v3, first_t f32[R]) —
    `missed` has no gradient and is not taken.  `ct_pos` optionally
    carries the per-bounce hit-position cotangents of the textured-
    albedo epilogue.

    Returns (ct_ts, ct_trt, ct_o v3, ct_d v3).
    """
    ct_rad, ct_md, ct_mt, ct_fn, ct_ft = ct
    tr0 = pixel_idx.shape[0]
    zero = jnp.zeros((tr0,), jnp.float32)
    one = zero + 1.0
    carries = [(o, d, (one, one, one), one)]
    if depth > 1:
        carries += pallas_replay_carries(
            o, d, pixel_idx, sample_idx, seed, ts, trt, hit_idx,
            depth=depth, tile=tile, interpret=interpret,
        )

    # sweep seeds: miss_dir == final d, miss_thru == final thru
    z3 = (zero, zero, zero)
    ct_o, ct_d, ct_thru = z3, ct_md, ct_mt
    ct_ts = jnp.zeros_like(ts)
    ct_trt = jnp.zeros_like(trt)
    for b in reversed(range(depth)):
        ct_ts_b, ct_trt_b, ct_o, ct_d, ct_thru = pallas_bounce_bwd(
            carries[b], hit_idx[b], pixel_idx, sample_idx, seed, 1 + b,
            ts, trt, ct_rad, ct_fn, ct_ft, ct_o, ct_d, ct_thru,
            None if ct_pos is None else ct_pos[b],
            is_first=(b == 0), tile=tile, interpret=interpret,
        )
        ct_ts = ct_ts + ct_ts_b
        ct_trt = ct_trt + ct_trt_b
    return ct_ts, ct_trt, ct_o, ct_d
