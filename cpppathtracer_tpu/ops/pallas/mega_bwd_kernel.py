"""Pallas TPU backward kernel for the megakernel: the FULL VJP replay
fused in ONE kernel.

The megakernel (ops/pallas/mega_kernel.py) runs the whole bounce loop in
VMEM and saves only the per-bounce winner indices; its custom-vjp
backward (ops/mega.py) reconstructs every bounce's record from the saved
index and differentiates the record-fetch -> hit-attrs -> shade ->
accumulate chain.  Round 2 ran that replay in plain XLA, and it dominated
the iteration (~3.0 s of a 3.6 s fwd+bwd step at 1024^2 x 16spp on v5e):
reverse-mode XLA round-trips every per-bounce intermediate (~70 planes x
8 bounces) through HBM twice.

Kernel structure.  Per ray tile, entirely in VMEM:

  1. FORWARD SWEEP (`lax.fori_loop` over bounces): re-run the bounce
     chain from the saved sign-encoded winner planes, storing each
     bounce's ENTRY carry — the only nonlinear state: o, d, throughput,
     alive = 10 planes — into loop-carried [depth, TILE] value stacks
     (masked one-hot insert/extract; Mosaic has no dynamic VMEM
     indexing).  (radiance / first_n /
     first_t never enter any cotangent: radiance is purely additive and
     the first-bounce aux are pass-through selects, so zeros stand in
     for them during the reverse sweep.)
  2. REVERSE SWEEP (`lax.fori_loop`, bounces depth-1..1, then bounce 0
     statically for its tmin=0 / first-aux terms): per bounce, a
     trace-time `jax.vjp` of the shared bounce body consumes the stored
     carry and the swept cotangents (ct_o, ct_d, ct_thru) and folds this
     bounce's scene-table cotangent into VMEM accumulators.  The
     radiance / first-bounce cotangents are loop-invariant (ct_rad
     passes through every bounce unchanged; first_n / first_t are
     consumed only at bounce 0), so they are closure constants rather
     than sweep state.

Both sweeps are `fori_loop`s over a SINGLE traced body, so Mosaic's
stack holds one bounce's linearize-transpose interior (~5 MB at tile
1024) regardless of depth — an UNROLLED whole-chain vjp measures
~5.2 MB *per bounce* (18.3 MB at depth 4, 39 MB at depth 8 vs the 16 MB
VMEM budget), and `jax.checkpoint` can't trim it (remat2 has no Pallas
lowering).  A previous decomposition into 1 + depth separate kernels fit
VMEM but streamed ~280 MB of carry planes through HBM per sample and
spent more time in XLA memory-space shuffling around the kernel chain
than in the kernels (profiled: the backward scan's async slice/copy
waits dominated its 44 ms/sample).

Scene-table cotangents accumulate across the sequential ray-tile grid in
output blocks; the (tiny) camera.ray_gen VJP stays outside in XLA — in
PLANAR form (Camera.ray_gen_planar), because a standalone row-major
ray_gen VJP lays its [R,1] broadcast transposes out as {T(1,128)} and
runs at 1/128 vector width.

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
from cpppathtracer_tpu.types import (
    BOUNCE_RAY_TMIN,
    DEFAULT_RAY_TMAX,
    MaterialType,
)

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
    per-bounce RNG counter (traced, so one loop body serves all
    non-first bounces).  With `with_aux` also returns this bounce's
    (hit position, attenuation-on mask) — the textured-albedo epilogue
    record (integrator.py::_mega_tex_radiance).
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
        precision=jax.lax.Precision.HIGHEST,
    )  # [F_S, TR]
    rec_r = jax.lax.dot_general(
        trt, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
        att_on = (mats["mat_type"] == MaterialType.GLASS) | (
            planar.dot_p(normal, bounce_dir) > 0.0
        )
        return out, (pos, att_on.astype(jnp.float32))
    return out


def _float0(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _row_mask(depth, b):
    """[depth, 1] one-hot row mask for a (possibly traced) bounce index —
    dynamic indexing of per-bounce stacks via pure vector selects (Mosaic
    has no dynamic VMEM loads; masked select/reduce lowers everywhere)."""
    return jax.lax.broadcasted_iota(jnp.int32, (depth, 1), 0) == b


def _stack_insert(stack, mask, plane):
    return jnp.where(mask, plane[None, :], stack)


def _stack_row(stack, mask):
    return jnp.sum(jnp.where(mask, stack, 0), axis=0)


def _mega_bwd_kernel(
    depth, with_aux,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pix_ref, samp_ref, seed_ref, ts_ref, tr_ref, hit_ref,
    ctr0_ref, ctr1_ref, ctr2_ref,  # ct_rad (loop-invariant)
    ctn0_ref, ctn1_ref, ctn2_ref, ctft_ref,  # ct_first_n / ct_first_t
    ctm0_ref, ctm1_ref, ctm2_ref,  # ct_miss_dir (sweep seed for ct_d)
    ctt0_ref, ctt1_ref, ctt2_ref,  # ct_miss_thru (sweep seed for ct_thru)
    *rest_refs,
):
    # rest_refs: [ctpx, ctpy, ctpz f32[depth, TILE] if with_aux], then
    # outputs (ct_ts, ct_trt, ct_o x3, ct_d x3).
    if with_aux:
        ctp_refs, rest_refs = rest_refs[:3], rest_refs[3:]
    (ct_ts_ref, ct_tr_ref,
     oo0_ref, oo1_ref, oo2_ref, od0_ref, od1_ref, od2_ref) = rest_refs

    o = (ox_ref[...], oy_ref[...], oz_ref[...])
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    pix = pix_ref[...]
    samp = samp_ref[...]
    seed_u32 = seed_ref[0].astype(jnp.uint32)
    ts = ts_ref[...]
    trt = tr_ref[...]
    hits = hit_ref[...]  # i32[depth, TR] (32 KB at tile 1024)
    ctp = (
        (ctp_refs[0][...], ctp_refs[1][...], ctp_refs[2][...])
        if with_aux else None
    )
    tr = pix.shape[0]
    zero = jnp.zeros((tr,), jnp.float32)
    one = zero + 1.0
    z3 = (zero, zero, zero)

    def hit_row(mask):
        return _stack_row(hits, mask)

    def bounce(is_first, carry10, enc, ctr_u32):
        """carry10 = (o3, d3, thru3, alive f32) -> full-carry call."""
        (co, cd, cthru, calive) = carry10
        full = (co, cd, cthru, z3, calive > 0.5, z3, zero)
        return _replay_bounce(
            is_first, full, ts, trt, enc, pix, samp, seed_u32, ctr_u32,
            with_aux=with_aux,
        )

    # ---- forward sweep: bounce-entry carries into value STACKS
    # ([depth, TR] per plane, fori-carried; masked insert/extract) ----
    stacks = [jnp.zeros((depth, tr), jnp.float32) for _ in range(10)]

    def put(stacks, b, carry10):
        mask = _row_mask(depth, b)
        planes = (*carry10[0], *carry10[1], *carry10[2], carry10[3])
        return [_stack_insert(s, mask, p) for s, p in zip(stacks, planes)]

    def get(stacks, mask):
        p = [_stack_row(s, mask) for s in stacks]
        return ((p[0], p[1], p[2]), (p[3], p[4], p[5]), (p[6], p[7], p[8]),
                p[9])

    carry0 = (o, d, (one, one, one), one)
    stacks = put(stacks, 0, carry0)
    # bounce 0 runs statically: is_first changes the tmin window
    out0 = bounce(True, carry0, hit_row(_row_mask(depth, 0)), jnp.uint32(1))
    nxt0 = out0[0] if with_aux else out0
    carry10 = (nxt0[0], nxt0[1], nxt0[2], nxt0[4].astype(jnp.float32))
    if depth > 1:
        stacks = put(stacks, 1, carry10)

        def fwd_body(b, state):
            stacks, carry10 = state
            out = bounce(False, carry10, hit_row(_row_mask(depth, b)),
                         (1 + b).astype(jnp.uint32))
            nxt = out[0] if with_aux else out
            new10 = (nxt[0], nxt[1], nxt[2], nxt[4].astype(jnp.float32))
            return put(stacks, b + 1, new10), new10

        stacks, _ = jax.lax.fori_loop(
            1, depth - 1, fwd_body, (stacks, carry10)
        )

    # ---- reverse sweep ----
    ct_rad = (ctr0_ref[...], ctr1_ref[...], ctr2_ref[...])
    ct_fn = (ctn0_ref[...], ctn1_ref[...], ctn2_ref[...])
    ct_ft = ctft_ref[...]

    def ctp_row(mask):
        if not with_aux:
            return None
        return tuple(_stack_row(c, mask) for c in ctp)

    def bounce_vjp(is_first, b, ct_sweep, ct_ts_acc, ct_trt_acc):
        ct_o, ct_d, ct_thru = ct_sweep
        mask = _row_mask(depth, b)
        carry10 = get(stacks, mask)
        ctr_u32 = (
            (1 + b).astype(jnp.uint32) if hasattr(b, "dtype")
            else jnp.uint32(1 + b)
        )
        enc = hit_row(mask)

        def fn(c10, ts_, trt_):
            (co, cd, cthru, calive) = c10
            full = (co, cd, cthru, z3, calive > 0.5, z3, zero)
            return _replay_bounce(
                is_first, full, ts_, trt_, enc, pix, samp, seed_u32,
                ctr_u32, with_aux=with_aux,
            )

        _, vjp_fn = jax.vjp(fn, carry10, ts, trt)
        ct_full = (ct_o, ct_d, ct_thru, ct_rad, _float0(zero > 0), ct_fn, ct_ft)
        ct_out = (ct_full, (ctp_row(mask), zero)) if with_aux else ct_full
        ct_c10, ct_ts_b, ct_trt_b = vjp_fn(ct_out)
        (cto, ctd, ctthru, _ca) = ct_c10
        return (cto, ctd, ctthru), ct_ts_acc + ct_ts_b, ct_trt_acc + ct_trt_b

    ct_sweep = (
        z3,
        (ctm0_ref[...], ctm1_ref[...], ctm2_ref[...]),
        (ctt0_ref[...], ctt1_ref[...], ctt2_ref[...]),
    )
    ct_ts_acc = jnp.zeros(ts.shape, jnp.float32)
    ct_trt_acc = jnp.zeros(trt.shape, jnp.float32)

    def rev_body(i, state):
        ct_sweep, ct_ts_acc, ct_trt_acc = state
        b = depth - 1 - i  # depth-1 .. 1
        return bounce_vjp(False, b, ct_sweep, ct_ts_acc, ct_trt_acc)

    if depth > 1:
        ct_sweep, ct_ts_acc, ct_trt_acc = jax.lax.fori_loop(
            0, depth - 1, rev_body, (ct_sweep, ct_ts_acc, ct_trt_acc)
        )
    ct_sweep, ct_ts_acc, ct_trt_acc = bounce_vjp(
        True, 0, ct_sweep, ct_ts_acc, ct_trt_acc
    )
    (ct_o, ct_d, _ct_thru) = ct_sweep

    oo0_ref[...] = ct_o[0]
    oo1_ref[...] = ct_o[1]
    oo2_ref[...] = ct_o[2]
    od0_ref[...] = ct_d[0]
    od1_ref[...] = ct_d[1]
    od2_ref[...] = ct_d[2]

    # scene-table cotangents: accumulate across the sequential tile grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        ct_ts_ref[...] = jnp.zeros_like(ct_ts_ref)
        ct_tr_ref[...] = jnp.zeros_like(ct_tr_ref)

    ct_ts_ref[...] += ct_ts_acc
    ct_tr_ref[...] += ct_trt_acc


@functools.partial(
    jax.jit, static_argnames=("depth", "tile", "interpret", "has_ct_pos")
)
def _pallas_mega_bwd_call(
    o, d, pixel_idx, sample_idx, seed, ts, trt, hit_mat, ct, ct_pos_mat,
    *, depth, tile, interpret, has_ct_pos,
):
    r = pixel_idx.shape[0]
    assert r % tile == 0, (r, tile)
    ct_rad, ct_md, ct_mt, ct_fn, ct_ft = ct
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    dep_spec = pl.BlockSpec((depth, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    f1 = jax.ShapeDtypeStruct((r,), jnp.float32)
    aux_in = list(ct_pos_mat) if has_ct_pos else []
    outs = pl.pallas_call(
        functools.partial(_mega_bwd_kernel, depth, has_ct_pos),
        grid=(r // tile,),
        in_specs=[spec1d] * 8
        + [smem]
        + [whole(ts.shape), whole(trt.shape), dep_spec]
        + [spec1d] * 13
        + [dep_spec] * len(aux_in),
        out_specs=[whole(ts.shape), whole(trt.shape)] + [spec1d] * 6,
        out_shape=[
            jax.ShapeDtypeStruct(ts.shape, jnp.float32),
            jax.ShapeDtypeStruct(trt.shape, jnp.float32),
        ] + [f1] * 6,
        interpret=interpret,
    )(
        o[0], o[1], o[2], d[0], d[1], d[2],
        pixel_idx, sample_idx,
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        ts, trt, hit_mat,
        ct_rad[0], ct_rad[1], ct_rad[2],
        ct_fn[0], ct_fn[1], ct_fn[2], ct_ft,
        ct_md[0], ct_md[1], ct_md[2],
        ct_mt[0], ct_mt[1], ct_mt[2],
        *aux_in,
    )
    ct_ts, ct_trt = outs[0], outs[1]
    return ct_ts, ct_trt, tuple(outs[2:5]), tuple(outs[5:8])


def pallas_mega_bwd(
    o, d, pixel_idx, sample_idx, seed, ts, trt, hit_idx, ct,
    *, ct_pos=None, depth, tile=1024, interpret=False,
):
    """Fused VJP of the megakernel replay (one kernel; see module doc).

    Args match ops/mega.py::_mega_bwd_pallas: planar primary rays, the
    transposed padded scene tables (build_tables_T), the sign-encoded
    winner planes (pads carry -1), and the output cotangents
    (rad v3, miss_dir v3, miss_thru v3, first_n v3, first_t f32[R]) —
    `missed` has no gradient and is not taken.  `ct_pos` optionally
    carries the per-bounce hit-position cotangents of the textured-
    albedo epilogue (integrator.py::_mega_tex_radiance).

    Returns (ct_ts, ct_trt, ct_o v3, ct_d v3).
    """
    hit_mat = jnp.stack(hit_idx, axis=0)  # i32[depth, R]
    if ct_pos is not None:
        ct_pos_mat = tuple(
            jnp.stack([p[c] for p in ct_pos], axis=0) for c in range(3)
        )
    else:
        ct_pos_mat = ()
    return _pallas_mega_bwd_call(
        o, d, pixel_idx, sample_idx, seed, ts, trt, hit_mat, ct, ct_pos_mat,
        depth=depth, tile=tile, interpret=interpret,
        has_ct_pos=ct_pos is not None,
    )
