"""Pallas TPU backward kernel for the megakernel: the FULL VJP replay in
one kernel.

The megakernel (ops/pallas/mega_kernel.py) runs the whole bounce loop in
VMEM and saves only the per-bounce winner indices; its custom-vjp
backward (ops/mega.py) reconstructs every bounce's record from the saved
index and differentiates the record-fetch -> hit-attrs -> shade ->
accumulate chain.  Round 2 ran that replay in plain XLA, and it dominated
the iteration (~3.0 s of a 3.6 s fwd+bwd step at 1024^2 x 16spp on v5e):
reverse-mode XLA round-trips every per-bounce intermediate (~70 planes x
8 bounces) through HBM twice.

This kernel fuses the ENTIRE replay VJP on-chip.  Per ray tile it
  1. reconstructs the forward bounce chain from the saved winner-index
     planes (no winner search — the indices are the residual), and
  2. computes the cotangents of (scene tables, primary rays) w.r.t. the
     radiance / miss / first-bounce outputs,
with `jax.vjp` applied at TRACE time to the in-kernel replay function —
the differentiated graph lowers to Mosaic like any other kernel body, so
the gradient math is definitionally identical to the XLA replay
(ops/mega.py::_replay_outputs), which tests pin against FD and the
oracle.  Scene-table cotangents accumulate across sequential grid steps
into a single output block (TPU grid iterations execute in order on the
core); primary-ray cotangents stream out per tile and the (tiny)
camera.ray_gen VJP stays outside in XLA.

Reference spec being differentiated: the hot loop of
`cuSrc/path_tracer.cu:124-175` with `material.cu:20-143` shading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpppathtracer_tpu.ops import planar
from cpppathtracer_tpu.ops.pallas.mega_kernel import _uniforms3
from cpppathtracer_tpu.types import BOUNCE_RAY_TMIN, DEFAULT_RAY_TMAX

_INF = float(np.float32(DEFAULT_RAY_TMAX))


def _replay_tile(ts, trt, o, d, pix, samp, seed_u32, hit_enc, depth):
    """Forward replay of the bounce chain for one tile from the saved
    sign-encoded winner indices.  Differentiable w.r.t. (ts, trt, o, d).

    Semantics mirror ops/mega.py::_replay_outputs exactly (which mirrors
    the megakernel's forward): the saved sign encodes the kernel's hit
    decision and vetoes ulp-level false revivals; `missed` is omitted —
    it is a boolean-derived mask with no gradient.
    """
    n_pad = ts.shape[1]
    tr = pix.shape[0]
    zero = jnp.zeros((tr,), jnp.float32)
    one = zero + 1.0
    tmax = zero + _INF
    thru = (one, one, one)
    rad = (zero, zero, zero)
    alive = zero < 1.0
    first_n = (zero, zero, zero)
    first_t = zero
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, tr), 0)

    for b in range(depth):
        tmin = zero + (0.0 if b == 0 else float(np.float32(BOUNCE_RAY_TMIN)))
        enc = hit_enc[b]
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
        u1, u2, u3 = _uniforms3(seed_u32, pix, samp, 1 + b)
        bounce_dir, attenuation, emitted = planar.shade_p(
            mats, normal, d, u1, u2, u3
        )
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
    return rad, d, thru, first_n, first_t


def _mega_bwd_kernel(
    depth,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    pix_ref, samp_ref, seed_ref, ts_ref, tr_ref,
    *rest_refs,
):
    # rest_refs: depth hit planes, 13 cotangent planes (rad3, md3, mt3,
    # fn3, ft), then outputs: ct_ts, ct_trt, ct_o x3, ct_d x3.
    hit_refs = rest_refs[:depth]
    (ctr0, ctr1, ctr2, ctm0, ctm1, ctm2, ctt0, ctt1, ctt2,
     ctn0, ctn1, ctn2, ctft) = rest_refs[depth : depth + 13]
    (ct_ts_ref, ct_tr_ref,
     cto0, cto1, cto2, ctd0, ctd1, ctd2) = rest_refs[depth + 13 :]

    o = (ox_ref[...], oy_ref[...], oz_ref[...])
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    pix = pix_ref[...]
    samp = samp_ref[...]
    seed_u32 = seed_ref[0].astype(jnp.uint32)
    ts = ts_ref[...]
    trt = tr_ref[...]
    hit_enc = [h[...] for h in hit_refs]

    def replay(ts_, trt_, o_, d_):
        return _replay_tile(ts_, trt_, o_, d_, pix, samp, seed_u32, hit_enc, depth)

    _, vjp_fn = jax.vjp(replay, ts, trt, o, d)
    ct = (
        (ctr0[...], ctr1[...], ctr2[...]),
        (ctm0[...], ctm1[...], ctm2[...]),
        (ctt0[...], ctt1[...], ctt2[...]),
        (ctn0[...], ctn1[...], ctn2[...]),
        ctft[...],
    )
    ct_ts, ct_trt, ct_o, ct_d = vjp_fn(ct)

    cto0[...] = ct_o[0]
    cto1[...] = ct_o[1]
    cto2[...] = ct_o[2]
    ctd0[...] = ct_d[0]
    ctd1[...] = ct_d[1]
    ctd2[...] = ct_d[2]

    # table cotangents: accumulate across the (sequential) ray-tile grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        ct_ts_ref[...] = jnp.zeros_like(ct_ts_ref)
        ct_tr_ref[...] = jnp.zeros_like(ct_tr_ref)

    ct_ts_ref[...] += ct_ts
    ct_tr_ref[...] += ct_trt


@functools.partial(jax.jit, static_argnames=("depth", "tile", "interpret"))
def pallas_mega_bwd(
    o, d, pixel_idx, sample_idx, seed, ts, trt, hit_idx, ct,
    *, depth, tile=512, interpret=False,
):
    """Fused VJP of the megakernel replay.

    Args:
      o, d: planar vec3 tuples of f32[R] primary rays (R % tile == 0).
      pixel_idx, sample_idx: i32[R] planes.
      ts, trt: transposed padded scene tables (build_tables_T).
      hit_idx: tuple of `depth` sign-encoded winner planes i32[R]
        (pad rays carry -1).
      ct: cotangents (rad v3, miss_dir v3, miss_thru v3, first_n v3,
        first_t f32[R]) — `missed` has no gradient and is not taken.

    Returns (ct_ts, ct_trt, ct_o v3, ct_d v3).
    """
    r = pixel_idx.shape[0]
    assert r % tile == 0, (r, tile)
    ct_rad, ct_md, ct_mt, ct_fn, ct_ft = ct
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f1 = jax.ShapeDtypeStruct((r,), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_mega_bwd_kernel, depth),
        grid=(r // tile,),
        in_specs=[spec1d] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [whole(ts.shape), whole(trt.shape)]
        + [spec1d] * (depth + 13),
        out_specs=[whole(ts.shape), whole(trt.shape)] + [spec1d] * 6,
        out_shape=[
            jax.ShapeDtypeStruct(ts.shape, jnp.float32),
            jax.ShapeDtypeStruct(trt.shape, jnp.float32),
        ]
        + [f1] * 6,
        interpret=interpret,
    )(
        o[0], o[1], o[2], d[0], d[1], d[2],
        pixel_idx, sample_idx,
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        ts, trt,
        *hit_idx,
        ct_rad[0], ct_rad[1], ct_rad[2],
        ct_md[0], ct_md[1], ct_md[2],
        ct_mt[0], ct_mt[1], ct_mt[2],
        ct_fn[0], ct_fn[1], ct_fn[2],
        ct_ft,
    )
    ct_ts, ct_trt = outs[0], outs[1]
    ct_o = tuple(outs[2:5])
    ct_d = tuple(outs[5:8])
    return ct_ts, ct_trt, ct_o, ct_d
