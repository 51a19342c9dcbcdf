"""Differentiable wrapper around the Pallas bounce-loop megakernel.

`mega_sample` runs one full sample (ray-gen -> all bounces) with the
forward pass entirely inside the fused Pallas kernel
(ops/pallas/mega_kernel.py) and the backward pass as a plain-XLA replay
of the bounce chain from the kernel's saved per-bounce winner indices —
the exact mechanism the non-mega path gets from `jax.checkpoint` with the
`hit_idx` save-only policy (integrator.py), made explicit via
`jax.custom_vjp` so the kernel itself is never re-entered or
differentiated.

Residuals per sample: the winner-index stack i32[depth, R] plus the tiny
loop-invariant inputs (scene tables, camera, pixel indices, seed) — the
same O(depth x R) footprint as the non-mega remat policy.  The replay
regenerates primary rays (`camera.ray_gen`) and uniforms (stateless PCG4D
— bitwise equal to the kernel's in-VMEM draws), reconstructs each
bounce's record from the saved index (`planar.gather_epilogue_p`), and
re-runs `planar.shade_p`; `jax.vjp` of that replay yields gradients for
the scene tables AND the camera.  Replay values can differ from the
kernel's forward by MXU-f32 rounding ulps only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from cpppathtracer_tpu.ops import planar
from cpppathtracer_tpu.ops.pallas.mega_kernel import (
    build_tables_T,
    pallas_mega_trace,
)
from cpppathtracer_tpu.types import BOUNCE_RAY_TMIN, DEFAULT_RAY_TMAX
from cpppathtracer_tpu.utils import rng as prng

_MEGA_TILE = 1024
# backward-kernel tile.  NOTE: 1D f32 operands must use block == XLA's
# {T(1024)} tiling — Mosaic rejects mismatched 1D layouts — so this stays
# 1024 like the forward (VMEM holds the vjp graph fine at this size).
_MEGA_BWD_TILE = 1024


def _float0_zero(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _res_pack_ok(gs, depth):
    """Whether the custom-vjp residual hit planes ride as 16-bit pairs.

    Static predicate (gs.counts is static): winner indices are < n_pad =
    max(8, ceil8(sum(counts))) (build_tables_T), so (idx+1) fits a 16-bit
    half whenever n_pad < 2^15.  Packing halves the residual bytes the
    spp scan stacks per sample (8x s32[spp, R] -> 4x): profiled at
    1024^2 the stack writes alone are ~1.0 ms/sample and the backward's
    dynamic-slice reads another ~0.5 ms/sample.
    """
    na = sum(gs.counts)
    return depth >= 2 and max(8, -(-na // 8) * 8) < 2 ** 15


def _pack_hit_res(hit_idx):
    """[depth] i32 planes -> [ceil(depth/2)] planes of (hi+1)<<16|(lo+1);
    an odd tail plane rides unpacked."""
    n = len(hit_idx)
    packed = [
        ((hit_idx[i] + 1) << 16) | (hit_idx[i + 1] + 1)
        for i in range(0, n - 1, 2)
    ]
    if n % 2:
        packed.append(hit_idx[n - 1])
    return tuple(packed)


def _unpack_hit_res(packed, depth):
    out = []
    for i in range(0, depth - 1, 2):
        w = packed[i // 2]
        out.append((w >> 16) - 1)  # halves are in [0, 2^15): >> is exact
        out.append((w & 0xFFFF) - 1)
    if depth % 2:
        out.append(packed[-1])
    return tuple(out)


def _replay_chain(gs, o, d, thru, rad, alive, hit_planes, pixel_idx,
                  sample_idx, seed, start_bounce, with_aux):
    """The replayed bounce chain [start_bounce, start_bounce + len(hit
    _planes)): shared by the full-width replay and both halves of the
    split replay.  Returns the updated carry plus per-bounce aux and the
    first-bounce denoiser records (meaningful only when start_bounce==0).
    """
    zero1 = o[0] * 0.0
    first_n = (zero1, zero1, zero1)
    first_t = zero1
    tmax = zero1 + jnp.float32(DEFAULT_RAY_TMAX)
    aux = []
    for i, enc in enumerate(hit_planes):
        b = start_bounce + i
        tmin = zero1 + (0.0 if b == 0 else jnp.float32(BOUNCE_RAY_TMIN))
        # hit_idx is sign-encoded: winner index where the kernel saw a
        # hit, -1 on miss.  The replay recomputes the hit attributes from
        # the saved index (differentiably — geometry grads flow through
        # t/normal) but the KERNEL's sign decides continuation outright:
        # the forward value being differentiated came from the kernel's
        # arithmetic, so on the rare lane where FMA-contraction ulps at a
        # grazing tangency flip the recomputed t to a miss, following the
        # recompute would differentiate a DIFFERENT bounce chain than the
        # one that produced the value (and a different lane population
        # than the textured-albedo epilogue, which gates on enc >= 0 —
        # r4 advisor item).  gather_epilogue_p's t_safe/pos stay finite
        # on such lanes (pos falls back to o), so no NaNs can flow.
        hitrec, mats = planar.gather_epilogue_p(
            gs, o, d, tmin, tmax, jnp.maximum(enc, 0),
            firewall=os.environ.get("POCA_REPLAY_FIREWALL", "1") != "0",
        )
        hit = enc >= 0
        u1, u2, u3, _ = prng.uniforms4(seed, pixel_idx, sample_idx, 1 + b)
        bounce_dir, attenuation, emitted, score_w = planar.shade_p(
            mats, hitrec["normal"], d, u1, u2, u3, with_score=True
        )
        if with_aux:
            from cpppathtracer_tpu.types import MaterialType

            att_on = (mats["mat_type"] == MaterialType.GLASS) | (
                planar.dot_p(hitrec["normal"], bounce_dir) > 0.0
            )
            # The textured-albedo epilogue multiplies its throughput by
            # this plane, so (a) carry the score-function weight
            # (value-exact 1.0) — detached-branch reflectivity / Fresnel
            # IOR gradients then flow on textured scenes through ct_att,
            # the same estimator as every other path — and (b) gate by
            # the replay's own hit veto so the backward's lane
            # population matches its radiance recurrence on
            # ulp-grazing lanes (the forward epilogue uses the kernel's
            # sign-encoded hit, identical except on those lanes).
            aux.append((
                hitrec["pos"],
                att_on.astype(jnp.float32) * score_w
                * hit.astype(jnp.float32),
            ))
        live_hit = hit & alive
        lh = live_hit.astype(jnp.float32)
        rad = planar.add_p(rad, planar.scale_p(planar.mul_p(thru, emitted), lh))
        thru = planar.where_p(live_hit, planar.mul_p(thru, attenuation), thru)
        if b == 0:
            first_n = planar.where_p(
                hit, hitrec["normal"], planar.scale_p(d, -1.0)
            )
            first_t = jnp.where(hit, hitrec["t"], DEFAULT_RAY_TMAX)
        alive = alive & hit
        o = planar.where_p(hit, hitrec["pos"], o)
        d = planar.where_p(hit, planar.normalize_p(bounce_dir), d)
    return o, d, thru, rad, alive, first_n, first_t, aux


def _replay_outputs(gs, camera, pixel_idx, sample_idx, seed, hit_idx, depth,
                    with_aux=False):
    """Plain-XLA reconstruction of the megakernel's outputs from the saved
    winner indices.  Shares planar.gather_epilogue_p / planar.shade_p with
    both the kernel (inlined) and the non-mega integrator body, so the
    differentiated math is identical."""
    o, d = camera.ray_gen_planar(pixel_idx, sample_idx, seed)
    zero1 = o[0] * 0.0
    one1 = zero1 + 1.0
    thru = (one1, one1, one1)
    rad = (zero1, zero1, zero1)
    alive = zero1 < 1.0
    _, d, thru, rad, alive, first_n, first_t, aux = _replay_chain(
        gs, o, d, thru, rad, alive, tuple(hit_idx)[:depth], pixel_idx,
        sample_idx, seed, 0, with_aux,
    )
    missed = (~alive).astype(jnp.float32)
    if with_aux:
        return rad, d, thru, missed, first_n, first_t, tuple(hit_idx), tuple(aux)
    return rad, d, thru, missed, first_n, first_t


def _replay_split_outputs(gs, camera, pixel_idx, sample_idx, seed, hit_idx,
                          depth, split, chunk, interpret, with_aux=False):
    """Survivor-compacted backward replay: bounces [0, split) run full
    width, the alive rays are packed (ops/permute.py custom-vjp linear
    maps, so cotangents route back through the same permutation) and
    bounces [split, depth) replay at a static quarter width (lax.cond
    falls back to full width if the packed prefix spills — gradients stay
    exact).  Mirrors the forward megakernel split, so the post-split
    shade/gather VJP chain — the dominant backward cost — runs on ~20%
    of the lanes instead of all of them.  Output pytree and semantics are
    identical to :func:`_replay_outputs` (values differ only in fp
    summation grouping, exactly like the forward split does)."""
    from cpppathtracer_tpu.ops.pallas.compact_kernel import (
        FILL_ONE_F32,
        stream_compact,
        unstack_planes,
    )
    from cpppathtracer_tpu.ops.permute import (
        apply_expand,
        compact_mixed,
    )

    r = pixel_idx.shape[0]
    r_pad = -(-r // chunk) * chunk
    nb = depth - split

    def pad(a, cv=0):
        return (
            jnp.pad(a, (0, r_pad - r), constant_values=cv)
            if r_pad != r else a
        )

    samp = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32),
                            pixel_idx.shape)
    pix_p = pad(pixel_idx)
    samp_p = pad(samp)
    hit_pad = [pad(h, -1) for h in hit_idx]

    o, d = camera.ray_gen_planar(pixel_idx, sample_idx, seed)
    # pad AFTER ray-gen (pad lanes are dead via enc=-1; dz=1 keeps their
    # garbage math finite)
    o = tuple(pad(c) for c in o)
    d = (pad(d[0]), pad(d[1]), pad(d[2], 1.0))
    zero1 = o[0] * 0.0
    one1 = zero1 + 1.0
    oA, dA, thruA, radA, aliveA, first_n, first_t, auxA = _replay_chain(
        gs, o, d, (one1, one1, one1), (zero1, zero1, zero1), zero1 < 1.0,
        tuple(hit_pad[:split]), pix_p, samp_p, seed, 0, with_aux,
    )
    missed_a = jax.lax.stop_gradient((~aliveA).astype(jnp.float32))
    # ONE compaction kernel: differentiated state (o/d/thru at the split;
    # dz fill keeps bubble math finite — bubbles have enc=-1 so they
    # contribute nothing) + non-differentiated payloads (RNG keys + the
    # post-split hit planes); the plan (pos/offs/n_alive) rides out of
    # the same invocation.
    planes_c, pos_c, offs, nal = compact_mixed(
        missed_a,
        oA + dA + thruA + (pix_p, samp_p) + tuple(hit_pad[split:]),
        9,
        (0, 0, 0, 0, 0, FILL_ONE_F32, 0, 0, 0) + (-1,) * (2 + nb),
        chunk, interpret,
    )
    o_s = planes_c[0:3]
    d_s = planes_c[3:6]
    thru_s = planes_c[6:9]
    pix_s, samp_s = planes_c[9], planes_c[10]
    hit_s = planes_c[11:]

    r_q = max(chunk, (r_pad // 4) // chunk * chunk)

    # jax.checkpoint is load-bearing: under lax.cond, each branch's AD
    # residuals become materialized cond OUTPUTS — including the [N, R]
    # one-hot record-fetch intermediates (gigabytes at 1024^2, OOMs HBM).
    # Remat makes the branch residual just its inputs; the transpose
    # re-runs the quarter-width chain, which is the replay's normal mode
    # (dots_saveable measured 1 ms/sample WORSE than plain remat here).
    @jax.checkpoint
    def b_chain(gs_, o_b, d_b, thru_b, pix_b, samp_b, hits_b):
        z = o_b[0] * 0.0
        _, d_f, thru_f, rad_f, alive_f, _fn, _ft, aux_f = _replay_chain(
            gs_, o_b, d_b, thru_b, (z, z, z), z < 1.0, hits_b,
            pix_b, samp_b, seed, split, with_aux,
        )
        missed_f = (~alive_f).astype(jnp.float32)
        aux_flat = tuple(
            c for p, att in aux_f for c in (p[0], p[1], p[2], att)
        )
        return (rad_f, d_f, thru_f, missed_f) + aux_flat

    def b_quarter(args):
        gs_, planes = args
        sliced = jax.tree.map(lambda a: a[:r_q], planes)
        outs = b_chain(gs_, *sliced)
        padq = lambda a: jnp.pad(a, (0, r_pad - r_q))
        return jax.tree.map(padq, outs)

    def b_full(args):
        gs_, planes = args
        return b_chain(gs_, *planes)

    b_args = (gs, (o_s, d_s, thru_s, pix_s, samp_s, hit_s))
    if r_q < r_pad:
        outs_b = jax.lax.cond(nal > r_q, b_full, b_quarter, b_args)
    else:
        outs_b = b_full(b_args)
    rad_b, md_b, mt_b, missed_b = outs_b[0], outs_b[1], outs_b[2], outs_b[3]
    aux_flat_b = outs_b[4:]

    exp_planes = (
        tuple(rad_b) + tuple(md_b) + tuple(mt_b) + (missed_b,)
        + tuple(aux_flat_b)
    )
    n_exp = len(exp_planes)
    outs_u = apply_expand(
        missed_a, pos_c, offs, exp_planes,
        (jnp.float32,) * n_exp, (0,) * n_exp, chunk, interpret,
    )
    rad_bu = outs_u[0:3]
    md_bu = outs_u[3:6]
    mt_bu = outs_u[6:9]
    missed_bu = outs_u[9]
    a_dead = missed_a > 0.0
    sl = lambda a: a[:r] if r_pad != r else a
    rad = tuple(sl(radA[i] + rad_bu[i]) for i in range(3))
    miss_dir = tuple(sl(jnp.where(a_dead, dA[i], md_bu[i])) for i in range(3))
    miss_thru = tuple(
        sl(jnp.where(a_dead, thruA[i], mt_bu[i])) for i in range(3)
    )
    missed = sl(missed_a + missed_bu)
    first_n = tuple(sl(c) for c in first_n)
    first_t = sl(first_t)
    if with_aux:
        aux = tuple(
            (tuple(sl(c) for c in p), sl(att)) for p, att in auxA
        ) + tuple(
            (
                (sl(outs_u[10 + b * 4]), sl(outs_u[10 + b * 4 + 1]),
                 sl(outs_u[10 + b * 4 + 2])),
                sl(outs_u[10 + b * 4 + 3]),
            )
            for b in range(nb)
        )
        return (rad, miss_dir, miss_thru, missed, first_n, first_t,
                tuple(hit_idx), aux)
    return rad, miss_dir, miss_thru, missed, first_n, first_t


def _split_plan(r, depth):
    """The survivor-compaction plan shared by the forward kernel split
    and the backward split replay: (split bounce S, compaction chunk).
    chunk == 0 means the stream-compaction path is off (unsplit, or the
    lax.sort fallback was forced via POCA_MEGA_COMPACT=sort)."""
    from cpppathtracer_tpu.ops.fast import _pick_tile

    mega_tile = int(os.environ.get("POCA_MEGA_TILE", "0")) or _MEGA_TILE
    tile = min(mega_tile, _pick_tile(r))
    r_pad = -(-r // tile) * tile
    split_env = os.environ.get("POCA_MEGA_SPLIT", "2")
    split = int(split_env) if split_env.lstrip("-").isdigit() else 2
    do_split = 0 < split and depth - split >= 2 and r_pad >= 4 * tile
    chunk = 0
    if do_split and os.environ.get("POCA_MEGA_COMPACT", "") != "sort":
        for c in (8192, 4096, 2048, 1024):
            if r_pad >= 4 * c or (c == 1024 and r_pad >= c):
                chunk = c
                break
    return split, chunk


def _kernel_forward(gs, camera, pixel_idx, sample_idx, seed, depth, interpret,
                    with_aux=False, iota_rn=0):
    from cpppathtracer_tpu.ops.fast import _pick_tile
    from cpppathtracer_tpu.ops.pallas.intersect_kernel import (
        build_geom_mxu,
        build_geom_rows,
    )

    r = pixel_idx.shape[0]
    samp = jnp.broadcast_to(
        jnp.asarray(sample_idx, jnp.int32), pixel_idx.shape
    )
    o, d = camera.ray_gen_planar(pixel_idx, sample_idx, seed)

    mega_tile = int(os.environ.get("POCA_MEGA_TILE", "0")) or _MEGA_TILE
    tile = min(mega_tile, _pick_tile(r))
    r_pad = -(-r // tile) * tile

    # Survivor compaction (the big forward lever): on the demo scene only
    # ~20% of rays survive bounce 1 and ~9% survive bounce 2, but the
    # survivors are scattered pixel-i.i.d. (diffuse bounce directions are
    # random), so per-tile early-exit inside one kernel saves nothing at
    # ANY granularity or pixel ordering (measured: live-tile fraction is
    # 1.00 even for 128-lane Morton tiles).  Instead split the trace at
    # bounce S: phase A runs bounces [0, S) for all rays, the survivors
    # are stably packed to a global prefix, and phase B runs bounces
    # [S, depth) with whole-tile skip past the alive prefix (n_alive
    # scalar in SMEM).  Per-ray RNG keys are (pixel, sample, bounce)-
    # based, so radiance is bitwise invariant to the permutation; hit
    # planes are unpermuted before returning, so the backward replay is
    # completely unchanged.  POCA_MEGA_SPLIT sets S (0 disables).
    # S=2 measured best on the demo scene: alive fraction is 19.8% after
    # bounce 1 but 8.8% after bounce 2, and the second bounce's
    # full-width cost is cheaper than running bounces 2..7 on 2.25x more
    # tiles.
    split, chunk = _split_plan(r, depth)
    do_split = (
        0 < split and depth - split >= 2 and r_pad >= 4 * tile
        and os.environ.get("POCA_MEGA_SPLIT", "2") != "0"
    )
    if chunk and r_pad % chunk:
        r_pad = -(-r_pad // chunk) * chunk  # extra pad rays: all-dead
    use_pc = do_split and chunk > 0

    sg = jax.lax.stop_gradient
    padf = lambda a: jnp.pad(sg(a), (0, r_pad - r)) if r_pad != r else sg(a)
    o_in = tuple(padf(c) for c in o)
    d_in = tuple(padf(c) for c in d)
    pix_in = padf(pixel_idx)
    samp_in = padf(samp)

    geom = sg(build_geom_rows(gs))
    gmx = sg(build_geom_mxu(gs))
    ts, trt = build_tables_T(gs)
    seed_in = sg(jnp.asarray(seed, jnp.int32))
    if use_pc:
        (rad_a, d_a, thru_a, missed_a, first_n, first_t, hit_a, aux_a,
         o_a) = pallas_mega_trace(
            o_in, d_in, pix_in, samp_in, seed_in,
            geom, gmx, sg(ts), sg(trt),
            counts=gs.counts, depth=split, tile=tile, interpret=interpret,
            with_aux=with_aux, with_o=True,
        )
        from cpppathtracer_tpu.ops.pallas.compact_kernel import (
            FILL_ONE_F32,
            stream_compact,
            stream_expand,
        )

        payloads = (pix_in, samp_in) + o_a + d_a + thru_a + (missed_a,)
        fills = (-1, -1) + (0,) * 9 + (FILL_ONE_F32,)
        comp, offs, nal = stream_compact(
            missed_a, payloads, fills=fills, chunk=chunk,
            interpret=interpret,
        )
        from cpppathtracer_tpu.ops.pallas.compact_kernel import (
            unstack_planes,
        )

        up = unstack_planes(
            comp,
            (jnp.int32, jnp.int32) + (jnp.float32,) * 10 + (jnp.int32,),
        )
        pix_s, samp_s = up[0], up[1]
        o_s = up[2:5]
        d_s = up[5:8]
        thru_s = up[8:11]
        missedc = up[11]
        pos_plane = up[12]
        n_alive = nal[0]
        nb = depth - split

        def run_b(o_b, d_b, thru_b, pix_b, samp_b, amask_b, n_alive_b,
                  depth_b):
            return pallas_mega_trace(
                o_b, d_b, pix_b, samp_b, seed_in,
                geom, gmx, sg(ts), sg(trt),
                counts=gs.counts, depth=depth_b, tile=tile,
                interpret=interpret, with_aux=with_aux,
                start_bounce=split,
                thru=thru_b, n_alive=n_alive_b, alive_mask=amask_b,
            )

        # Static-prefix ladder (see the sort path below for rationale):
        # B1 covers the first quarter; B2 runs under lax.cond only when
        # the packed alive prefix spills past it (alive fraction on the
        # demo scene is ~20% after bounce 2, so B2 is usually skipped).
        r_q = (r_pad // 4) // tile * tile
        ladder_env = os.environ.get("POCA_MEGA_LADDER", "")
        use_ladder = (
            r_q >= tile and r_pad - r_q >= tile
            and (ladder_env == "1" if ladder_env in ("0", "1")
                 else not interpret)
        )
        # Second-level split: the packed prefix still carries every ray
        # alive after bounce S, but only ~7-9% of rays survive bounce
        # S+2 — so inside the ladder's prefix, run bounces [S, S+2) at
        # quarter width, re-pack the survivors, and run the remaining
        # bounces on a half-of-quarter static prefix (cond spill to the
        # full quarter keeps it exact).  POCA_MEGA_SPLIT2=0 disables.
        chunk2 = next(
            (c for c in (chunk, 4096, 2048, 1024)
             if c <= chunk and r_q and r_q % c == 0), 0,
        )
        sp2_env = os.environ.get("POCA_MEGA_SPLIT2", "")
        use_split2 = (
            use_ladder and nb >= 4 and chunk2 > 0
            and (sp2_env == "1" if sp2_env in ("0", "1") else True)
        )

        def run_b_nested(o_b, d_b, thru_b, pix_b, samp_b, amask_b,
                         n_alive_b):
            outs1 = pallas_mega_trace(
                o_b, d_b, pix_b, samp_b, seed_in,
                geom, gmx, sg(ts), sg(trt),
                counts=gs.counts, depth=2, tile=tile,
                interpret=interpret, with_aux=with_aux,
                start_bounce=split,
                thru=thru_b, n_alive=n_alive_b, alive_mask=amask_b,
                with_o=True,
            )
            (rad1, md1, mt1, missed1, _f1, _t1, hit1, aux1, o2) = outs1
            lane = jnp.arange(r_q, dtype=jnp.int32)
            alive2 = (
                (lane < n_alive_b) & (amask_b == 0.0) & (missed1 == 0.0)
            )
            mask2 = 1.0 - alive2.astype(jnp.float32)
            payl2 = (
                (pix_b, samp_b) + o2 + md1 + mt1 + (mask2,)
            )
            fl2 = (-1, -1, 0, 0, 0, 0, 0, FILL_ONE_F32, 0, 0, 0,
                   FILL_ONE_F32)
            comp2, offs2, nal2v = stream_compact(
                mask2, payl2, fills=fl2, chunk=chunk2, interpret=interpret,
            )
            up2 = unstack_planes(
                comp2,
                (jnp.int32, jnp.int32) + (jnp.float32,) * 10
                + (jnp.int32,),
            )
            pix2, samp2 = up2[0], up2[1]
            o2s, d2s, thru2s = up2[2:5], up2[5:8], up2[8:11]
            mask2c = up2[11]
            pos2 = up2[12]
            nal2 = nal2v[0]
            nb2 = nb - 2
            # Stage 2 runs over the full quarter domain and relies on
            # the kernel's own n_alive whole-tile skip (~2 us/tile): at
            # this width the skipped-tile walk (~0.26 ms) is cheaper
            # than a static half-prefix lax.cond, whose taken branch
            # pays pad + layout-firewall copies (~0.74 ms/sample
            # profiled).  POCA_MEGA_PREFIX2=1 re-enables the prefix
            # (the win flips at the first level, where the domain is 4x
            # wider — see the ladder above).
            r_q2 = r_q
            if os.environ.get("POCA_MEGA_PREFIX2", "") == "1":
                r_q2 = max(chunk2, (r_q // 2) // tile * tile)

            def run2(o_c, d_c, thru_c, pix_c, samp_c, am_c, na_c):
                return pallas_mega_trace(
                    o_c, d_c, pix_c, samp_c, seed_in,
                    geom, gmx, sg(ts), sg(trt),
                    counts=gs.counts, depth=nb2, tile=tile,
                    interpret=interpret, with_aux=with_aux,
                    start_bounce=split + 2,
                    thru=thru_c, n_alive=na_c, alive_mask=am_c,
                )

            if r_q2 < r_q:
                pre2 = lambda a: a[:r_q2]
                ops2 = (o2s, d2s, thru2s, pix2, samp2, mask2c)

                def s2_prefix(ops):
                    o_c, d_c, thru_c, pix_c, samp_c, am_c = jax.tree.map(
                        pre2, ops
                    )
                    outs = run2(o_c, d_c, thru_c, pix_c, samp_c, am_c,
                                nal2)
                    padq = lambda a: jnp.pad(
                        a, (0, r_q - r_q2),
                        constant_values=(-1 if a.dtype == jnp.int32 else 0),
                    )
                    flat = (outs[:4] + outs[6]
                            + (tuple(c for p, a_ in outs[7]
                                     for c in (p[0], p[1], p[2], a_))
                               if with_aux else ()))
                    return jax.tree.map(padq, flat)

                def s2_full(ops):
                    o_c, d_c, thru_c, pix_c, samp_c, am_c = ops
                    outs = run2(o_c, d_c, thru_c, pix_c, samp_c, am_c,
                                nal2)
                    return (outs[:4] + outs[6]
                            + (tuple(c for p, a_ in outs[7]
                                     for c in (p[0], p[1], p[2], a_))
                               if with_aux else ()))

                outs2f = jax.lax.cond(nal2 > r_q2, s2_full, s2_prefix,
                                      ops2)
                # layout firewall: cond outputs otherwise ride as
                # [1, r_q] {T(1,128)} values into the expansion stack
                outs2f = jax.tree.map(
                    lambda a: jax.lax.optimization_barrier(
                        jnp.reshape(a, (-1,))
                    ),
                    outs2f,
                )
            else:
                outs = run2(o2s, d2s, thru2s, pix2, samp2, mask2c, nal2)
                outs2f = (outs[:4] + outs[6]
                          + (tuple(c for p, a_ in outs[7]
                                   for c in (p[0], p[1], p[2], a_))
                             if with_aux else ()))
            rad2c, md2c, mt2c = outs2f[0], outs2f[1], outs2f[2]
            missed2c_out = outs2f[3]
            hit2c = outs2f[4:4 + nb2]
            aux2c = outs2f[4 + nb2:]
            # expand stage-2 outputs back to the quarter domain
            exp2 = (
                tuple(rad2c) + tuple(md2c) + tuple(mt2c)
                + (missed2c_out,) + tuple(hit2c) + tuple(aux2c)
            )
            n2 = len(exp2)
            bci2 = lambda p: (
                p if p.dtype == jnp.int32
                else jax.lax.bitcast_convert_type(p, jnp.int32)
            )
            np2p = -(-(n2 + 1) // 8) * 8
            stack2 = jnp.concatenate(
                [bci2(p)[None] for p in exp2] + [pos2[None]]
                + ([jnp.zeros((np2p - n2 - 1, r_q), jnp.int32)]
                   if np2p != n2 + 1 else []),
                axis=0,
            )
            dt2 = (
                (jnp.float32,) * 10 + (jnp.int32,) * nb2
                + (jnp.float32,) * len(aux2c)
            )
            fl2o = (0,) * 10 + (-1,) * nb2 + (0,) * len(aux2c)
            outs2u = stream_expand(
                mask2, stack2, offs2, dtypes=dt2, fills=fl2o,
                chunk=chunk2, interpret=interpret,
            )
            rad2u = outs2u[0:3]
            md2u = outs2u[3:6]
            mt2u = outs2u[6:9]
            missed2u = outs2u[9]
            hit2u = tuple(outs2u[10:10 + nb2])
            aux2u = outs2u[10 + nb2:]
            live2 = mask2 == 0.0
            rad_q = tuple(rad1[i] + rad2u[i] for i in range(3))
            md_q = tuple(jnp.where(live2, md2u[i], md1[i])
                         for i in range(3))
            mt_q = tuple(jnp.where(live2, mt2u[i], mt1[i])
                         for i in range(3))
            missed_q = missed1 + missed2u
            hits_q = tuple(hit1) + hit2u
            aux_q = ()
            if with_aux:
                aux_q = tuple(aux1) + tuple(
                    ((aux2u[b * 4], aux2u[b * 4 + 1], aux2u[b * 4 + 2]),
                     aux2u[b * 4 + 3])
                    for b in range(nb2)
                )
            z = missed_q * 0.0
            return (rad_q, md_q, mt_q, missed_q, (z, z, z), z, hits_q,
                    aux_q if with_aux else None)

        if use_ladder:
            pre = lambda a: a[:r_q]
            suf = lambda a: a[r_q:]
            b1_args = (
                tuple(pre(c) for c in o_s), tuple(pre(c) for c in d_s),
                tuple(pre(c) for c in thru_s), pre(pix_s), pre(samp_s),
                pre(missedc),
            )
            if use_split2:
                outs_b1 = run_b_nested(*b1_args, n_alive)
            else:
                outs_b1 = run_b(*b1_args, n_alive, nb)
            suf_ops = (
                tuple(suf(c) for c in o_s), tuple(suf(c) for c in d_s),
                tuple(suf(c) for c in thru_s), suf(pix_s), suf(samp_s),
                suf(missedc), n_alive - r_q,
            )

            def b2_live(ops):
                o_b, d_b, thru_b, pix_b, samp_b, am_b, na = ops
                outs = run_b(o_b, d_b, thru_b, pix_b, samp_b, am_b, na, nb)
                return outs[:7] + (() if outs[7] is None else outs[7],)

            def b2_skip(ops):
                r_s = r_pad - r_q
                z = jnp.zeros((r_s,), jnp.float32)
                z3 = (z, z, z)
                hits = tuple(
                    jnp.full((r_s,), -1, jnp.int32) for _ in range(nb)
                )
                aux0 = (
                    tuple((z3, z) for _ in range(nb)) if with_aux else ()
                )
                return (z3, z3, z3, z, z3, z, hits, aux0)

            outs_b2 = jax.lax.cond(
                n_alive > r_q, b2_live, b2_skip, suf_ops
            )
            cat = lambda a, b: jnp.concatenate([a, b])
            cat3 = lambda a, b: tuple(cat(a[i], b[i]) for i in range(3))
            rad_b = cat3(outs_b1[0], outs_b2[0])
            md_b = cat3(outs_b1[1], outs_b2[1])
            mt_b = cat3(outs_b1[2], outs_b2[2])
            missed_b = cat(outs_b1[3], outs_b2[3])
            hit_b = tuple(
                cat(h1, h2) for h1, h2 in zip(outs_b1[6], outs_b2[6])
            )
            aux_b = None
            if with_aux:
                aux_b = tuple(
                    (cat3(p1, p2), cat(a1, a2))
                    for (p1, a1), (p2, a2) in zip(outs_b1[7], outs_b2[7])
                )
        else:
            (rad_b, md_b, mt_b, missed_b, _fn_b, _ft_b, hit_b, aux_b) = (
                run_b(o_s, d_s, thru_s, pix_s, samp_s, missedc, n_alive, nb)
            )

        # Expansion back to original lane order.  Hit planes ride as
        # 16-bit pairs ((enc+1) halves); the 0 fill unpacks to -1 (miss).
        n_padt = ts.shape[1]
        if n_padt >= 2 ** 15:  # sign-extension on the arithmetic unpack
            raise ValueError(
                f"hit-plane pair packing requires n_pad < 2^15, got {n_padt}"
            )
        packed = []
        for i in range(0, nb - 1, 2):
            packed.append(((hit_b[i] + 1) << 16) | (hit_b[i + 1] + 1))
        if nb % 2:
            packed.append(hit_b[nb - 1] + 1)
        aux_flat = []
        if with_aux:
            aux_flat = [
                c for p, att in aux_b for c in (p[0], p[1], p[2], att)
            ]
        planes_b = (
            list(rad_b) + list(md_b) + list(mt_b) + [missed_b]
            + packed + aux_flat
        )
        bci = lambda p: (
            p if p.dtype == jnp.int32
            else jax.lax.bitcast_convert_type(p, jnp.int32)
        )
        np2 = len(planes_b) + 1
        np2_pad = -(-np2 // 8) * 8
        stack = jnp.concatenate(
            [bci(p)[None] for p in planes_b] + [pos_plane[None]]
            + ([jnp.zeros((np2_pad - np2, r_pad), jnp.int32)]
               if np2_pad != np2 else []),
            axis=0,
        )
        dtypes = (
            (jnp.float32,) * 10 + (jnp.int32,) * len(packed)
            + (jnp.float32,) * len(aux_flat)
        )
        fills2 = (0,) * len(planes_b)
        outs_u = stream_expand(
            missed_a, stack, offs, dtypes=dtypes, fills=fills2,
            chunk=chunk, interpret=interpret,
        )
        rad_bu = outs_u[0:3]
        md_bu = outs_u[3:6]
        mt_bu = outs_u[6:9]
        missed_bu = outs_u[9]
        hp = outs_u[10:10 + len(packed)]
        hit_bu = []
        for i in range(0, nb - 1, 2):
            w = hp[i // 2]
            hit_bu.append((w >> 16) - 1)
            hit_bu.append((w & 0xFFFF) - 1)
        if nb % 2:
            hit_bu.append(hp[-1] - 1)
        a_dead = missed_a > 0.0
        sel = jnp.where
        rad = tuple(rad_a[i] + rad_bu[i] for i in range(3))
        miss_dir = tuple(sel(a_dead, d_a[i], md_bu[i]) for i in range(3))
        miss_thru = tuple(sel(a_dead, thru_a[i], mt_bu[i]) for i in range(3))
        missed = missed_a + missed_bu
        hit_idx = hit_a + tuple(hit_bu)
        aux = None
        if with_aux:
            af = outs_u[10 + len(packed):]
            aux = aux_a + tuple(
                ((af[b * 4], af[b * 4 + 1], af[b * 4 + 2]), af[b * 4 + 3])
                for b in range(nb)
            )
    elif do_split:
        (rad_a, d_a, thru_a, missed_a, first_n, first_t, hit_a, aux_a,
         o_a) = pallas_mega_trace(
            o_in, d_in, pix_in, samp_in, seed_in,
            geom, gmx, sg(ts), sg(trt),
            counts=gs.counts, depth=split, tile=tile, interpret=interpret,
            with_aux=with_aux, with_o=True,
        )
        # Element gathers inside the spp scan cost ~9 ms per [1M] plane on
        # v5e, but ONE lax.sort moving a dozen payload planes costs
        # ~3-7 ms — so both the partition and its inverse are sorts
        # (~2.5 ms base + ~0.33 ms per payload plane, measured).
        dead_key = (missed_a > 0.0).astype(jnp.int32)
        n_alive = r_pad - jnp.sum(dead_key)
        src = jnp.arange(r_pad, dtype=jnp.int32)
        # pix/samp payloads are skipped when the caller used the standard
        # iota construction (pixel_idx = arange(r_n) tiled spp_chunk
        # times): both reconstruct from the sorted src plane.
        extra = () if iota_rn else (pix_in, samp_in)
        sorted_in = jax.lax.sort(
            (dead_key, src,
             o_a[0], o_a[1], o_a[2], d_a[0], d_a[1], d_a[2],
             thru_a[0], thru_a[1], thru_a[2]) + extra,
            num_keys=1, is_stable=True,
        )
        src_s = sorted_in[1]
        o_s = tuple(sorted_in[2:5])
        d_s = tuple(sorted_in[5:8])
        thru_s = tuple(sorted_in[8:11])
        if iota_rn:
            pix_s = src_s % iota_rn
            samp_s = jnp.reshape(samp_in[0], ()) + src_s // iota_rn
        else:
            pix_s, samp_s = sorted_in[11], sorted_in[12]

        def run_b(o_b, d_b, thru_b, pix_b, samp_b, n_alive_b, depth_b):
            return pallas_mega_trace(
                o_b, d_b, pix_b, samp_b, seed_in,
                geom, gmx, sg(ts), sg(trt),
                counts=gs.counts, depth=depth_b, tile=tile,
                interpret=interpret, with_aux=with_aux,
                start_bounce=split,
                thru=thru_b, n_alive=n_alive_b,
            )

        # Static-prefix ladder: B1 always covers the first quarter of the
        # sorted rays; B2 covers the rest but only RUNS (lax.cond) when
        # the alive prefix spills past r_q — on the demo scene ~9% of
        # rays survive bounce 2, so the typical sample pays grid
        # iteration for r_pad/4 tiles instead of all of them (skipped
        # tiles cost ~2 us each; ~1.5 ms/sample at 1024 tiles).
        r_q = (r_pad // 4) // tile * tile
        nb = depth - split
        ladder_env = os.environ.get("POCA_MEGA_LADDER", "")
        use_ladder = (
            r_q >= tile and r_pad - r_q >= tile
            and (ladder_env == "1" if ladder_env in ("0", "1")
                 else not interpret)
        )
        if use_ladder:
            pre = lambda a: a[:r_q]
            suf = lambda a: a[r_q:]
            outs_b1 = run_b(
                tuple(pre(c) for c in o_s), tuple(pre(c) for c in d_s),
                tuple(pre(c) for c in thru_s), pre(pix_s), pre(samp_s),
                n_alive, nb,
            )

            suf_ops = (
                tuple(suf(c) for c in o_s), tuple(suf(c) for c in d_s),
                tuple(suf(c) for c in thru_s), suf(pix_s), suf(samp_s),
                n_alive - r_q,
            )

            def b2_live(ops):
                o_b, d_b, thru_b, pix_b, samp_b, na = ops
                outs = run_b(o_b, d_b, thru_b, pix_b, samp_b, na, nb)
                return outs[:7] + (() if outs[7] is None else outs[7],)

            def b2_skip(ops):
                r_s = r_pad - r_q
                z = jnp.zeros((r_s,), jnp.float32)
                z3 = (z, z, z)
                hits = tuple(
                    jnp.full((r_s,), -1, jnp.int32) for _ in range(nb)
                )
                aux0 = (
                    tuple((z3, z) for _ in range(nb)) if with_aux else ()
                )
                return (z3, z3, z3, z, z3, z, hits, aux0)

            outs_b2 = jax.lax.cond(
                n_alive > r_q, b2_live, b2_skip, suf_ops
            )
            cat = lambda a, b: jnp.concatenate([a, b])
            cat3 = lambda a, b: tuple(cat(a[i], b[i]) for i in range(3))
            rad_b = cat3(outs_b1[0], outs_b2[0])
            md_b = cat3(outs_b1[1], outs_b2[1])
            mt_b = cat3(outs_b1[2], outs_b2[2])
            missed_b = cat(outs_b1[3], outs_b2[3])
            hit_b = tuple(
                cat(h1, h2) for h1, h2 in zip(outs_b1[6], outs_b2[6])
            )
            aux_b = None
            if with_aux:
                aux_b = tuple(
                    (cat3(p1, p2), cat(a1, a2))
                    for (p1, a1), (p2, a2) in zip(outs_b1[7], outs_b2[7])
                )
        else:
            (rad_b, md_b, mt_b, missed_b, _fn_b, _ft_b, hit_b, aux_b) = (
                run_b(o_s, d_s, thru_s, pix_s, samp_s, n_alive, nb)
            )
        # inverse permutation: sort phase-B outputs by original position
        # (src_s is a permutation, so keys are unique).  Hit planes ride
        # in PAIRS — (enc+1) in 16-bit halves (winner indices < n_pad <<
        # 2^15) — halving their payload count (~0.33 ms/plane).
        aux_flat = ()
        if with_aux:
            aux_flat = tuple(
                c for p, att in aux_b for c in (p[0], p[1], p[2], att)
            )
        packed = []
        for i in range(0, nb - 1, 2):
            packed.append(((hit_b[i] + 1) << 16) | (hit_b[i + 1] + 1))
        if nb % 2:
            packed.append(hit_b[nb - 1] + 1)
        inv = jax.lax.sort(
            (src_s,) + tuple(rad_b) + tuple(md_b) + tuple(mt_b)
            + (missed_b,) + tuple(packed) + aux_flat,
            num_keys=1, is_stable=False,
        )
        rad_bu = inv[1:4]
        md_bu = inv[4:7]
        mt_bu = inv[7:10]
        missed_bu = inv[10]
        hp = inv[11 : 11 + len(packed)]
        hit_bu = []
        for i in range(0, nb - 1, 2):
            w = hp[i // 2]
            hit_bu.append((w >> 16) - 1)
            hit_bu.append((w & 0xFFFF) - 1)
        if nb % 2:
            hit_bu.append(hp[-1] - 1)
        a_dead = missed_a > 0.0
        sel = jnp.where
        rad = tuple(rad_a[i] + rad_bu[i] for i in range(3))
        miss_dir = tuple(sel(a_dead, d_a[i], md_bu[i]) for i in range(3))
        miss_thru = tuple(sel(a_dead, thru_a[i], mt_bu[i]) for i in range(3))
        missed = missed_a + missed_bu
        hit_idx = hit_a + tuple(hit_bu)
        aux = None
        if with_aux:
            af = inv[11 + len(packed) :]
            aux = aux_a + tuple(
                ((af[b * 4], af[b * 4 + 1], af[b * 4 + 2]), af[b * 4 + 3])
                for b in range(nb)
            )
    else:
        rad, miss_dir, miss_thru, missed, first_n, first_t, hit_idx, aux = (
            pallas_mega_trace(
                o_in, d_in, pix_in, samp_in, seed_in,
                geom, gmx, sg(ts), sg(trt),
                counts=gs.counts, depth=depth, tile=tile, interpret=interpret,
                with_aux=with_aux,
            )
        )
    sl = lambda a: a[:r] if r_pad != r else a
    hit_out = tuple(sl(h) for h in hit_idx)
    out = (
        tuple(sl(a) for a in rad),
        tuple(sl(a) for a in miss_dir),
        tuple(sl(a) for a in miss_thru),
        sl(missed),
        tuple(sl(a) for a in first_n),
        sl(first_t),
    )
    if with_aux:
        aux_out = tuple(
            (tuple(sl(c) for c in pos), sl(att)) for pos, att in aux
        )
        out = out + (hit_out, aux_out)
    return out, hit_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def mega_sample(gs, camera, pixel_idx, sample_idx, seed, depth,
                interpret=False, with_aux=False, iota_rn=0):
    """One integrator sample via the megakernel.

    Returns planar (rad vec3, miss_dir vec3, miss_thru vec3,
    missed f32[R], first_n vec3, first_t f32[R]); the sky epilogue is the
    caller's (it needs the texture gather, which stays in XLA).
    With `with_aux`, additionally returns (hit_idx planes i32,
    per-bounce (pos vec3, att f32[R])) — the textured-albedo epilogue's
    inputs (integrator.py); hit/att carry no gradient, pos does.
    Differentiable w.r.t. `gs` (scene tables) and `camera`.
    """
    out, _ = _kernel_forward(
        gs, camera, pixel_idx, sample_idx, seed, depth, interpret, with_aux,
        iota_rn,
    )
    return out


def _mega_fwd(gs, camera, pixel_idx, sample_idx, seed, depth, interpret,
              with_aux, iota_rn):
    out, hit_idx = _kernel_forward(
        gs, camera, pixel_idx, sample_idx, seed, depth, interpret, with_aux,
        iota_rn,
    )
    if _res_pack_ok(gs, depth):
        hit_idx = _pack_hit_res(hit_idx)
    return out, (gs, camera, pixel_idx, sample_idx, seed, hit_idx)


def _mega_bwd(depth, interpret, with_aux, iota_rn, res, ct):
    gs, camera, pixel_idx, sample_idx, seed, hit_idx = res

    # Default: the plain-XLA replay.  Round-3 profiling showed the
    # backward is COMPUTE-bound (21.9 ms/sample vs 27.7 ms forward at
    # 1024^2 on v5e), and XLA's globally-fused reverse sweep is already
    # near the op-count floor; the Pallas per-bounce-VJP kernels
    # (ops/pallas/mega_bwd_kernel.py) re-run each bounce's forward
    # before transposing it and measured 43 ms/sample (kernel chain) —
    # kept as an env-gated alternative (POCA_MEGA_BWD=pallas), verified
    # equivalent in tests, not yet faster.
    force = os.environ.get("POCA_MEGA_BWD", "")
    # The Pallas bwd kernel ignores ct_att, which now carries the
    # score-function gradient on textured scenes — route those through
    # the XLA replay.
    use_pallas = force == "pallas" and not with_aux
    if use_pallas:
        if _res_pack_ok(gs, depth):
            hit_idx = _unpack_hit_res(hit_idx, depth)
        return _mega_bwd_pallas(
            depth, interpret, with_aux, gs, camera, pixel_idx, sample_idx,
            seed, hit_idx, ct,
        )

    # Layout firewall: under the spp `lax.scan`, per-sample residuals are
    # stacked [spp, R] and the backward step dynamic-slices them back as
    # [1, R] values with {T(1,128)} tiling — 1/8 VPU width — and XLA
    # propagates that 2D shape/layout through the ENTIRE replayed chain
    # (profiled: the r4 backward was a wall of [1,1048576]{T(1,128)}
    # fusions).  Reshape to flat 1D behind an optimization_barrier so the
    # replay consumes {T(1024)} full-width planes; the relayout copy is
    # one 4 MB op per plane.
    def flat(a):
        if getattr(a, "dtype", None) == jax.dtypes.float0:
            return a  # int-output cotangents (hit planes) are symbolic
        return jax.lax.optimization_barrier(jnp.reshape(a, (-1,)))

    # flatten the (packed) residual planes first — half the relayout
    # copies — then unpack to per-bounce winner indices.
    hit_idx = tuple(flat(h) for h in hit_idx)
    if _res_pack_ok(gs, depth):
        hit_idx = _unpack_hit_res(hit_idx, depth)
    ct = jax.tree.map(flat, ct)

    # Survivor-compacted replay (env POCA_MEGA_BWD_SPLIT=1): bounces >=
    # split differentiate at ~quarter width, mirroring the forward split.
    # MEASURED NEGATIVE on v5e at 1024^2x64spp (268.6 vs 282.7 Mrays/s):
    # the quarter-width win (post-split chain 7.6 -> 4.4 ms/sample) is
    # cancelled by the 4 stream-kernel invocations (~1.4 ms), the
    # cond+remat double forward, and the lost cross-bounce XLA fusion of
    # the straight-line full-width replay.  Kept env-gated (gradients
    # verified equal) — it may win at deeper bounce counts or lower
    # survivor fractions than the demo scene's 20%.
    r = pixel_idx.shape[0]
    split, chunk = _split_plan(r, depth)
    use_split = (
        chunk > 0
        and os.environ.get("POCA_MEGA_BWD_SPLIT", "0") == "1"
    )

    if use_split:
        def replay(gs_, camera_):
            return _replay_split_outputs(
                gs_, camera_, pixel_idx, sample_idx, seed, hit_idx, depth,
                split, chunk, interpret, with_aux=with_aux,
            )
    else:
        def replay(gs_, camera_):
            return _replay_outputs(
                gs_, camera_, pixel_idx, sample_idx, seed, hit_idx, depth,
                with_aux=with_aux,
            )

    _, vjp_fn = jax.vjp(replay, gs, camera)
    gs_bar, cam_bar = vjp_fn(ct)
    return (
        gs_bar,
        cam_bar,
        _float0_zero(pixel_idx),
        _float0_zero(sample_idx),
        _float0_zero(seed),
    )


def _mega_bwd_pallas(depth, interpret, with_aux, gs, camera, pixel_idx,
                     sample_idx, seed, hit_idx, ct):
    """Backward via the fused Pallas VJP kernels
    (ops/pallas/mega_bwd_kernel.py): the whole replay-and-cotangent chain
    runs in VMEM; only the tiny camera.ray_gen and table-repack VJPs stay
    in XLA."""
    from cpppathtracer_tpu.ops.fast import _pick_tile
    from cpppathtracer_tpu.ops.pallas.mega_bwd_kernel import pallas_mega_bwd

    if with_aux:
        (ct_rad, ct_md, ct_mt, _ct_missed, ct_fn, ct_ft,
         _ct_hit, ct_aux) = ct
        ct_pos = [c[0] for c in ct_aux]  # per-bounce vec3 (ct_att == 0)
    else:
        ct_rad, ct_md, ct_mt, _ct_missed, ct_fn, ct_ft = ct
        ct_pos = None
    r = pixel_idx.shape[0]
    samp = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32), pixel_idx.shape)

    def rays_of(cam):
        # planar form: the standalone vjp of the row-major ray_gen lays
        # its [R,1] broadcast transposes out as {T(1,128)} — 1/128-width
        # (see Camera.ray_gen_planar docstring)
        return cam.ray_gen_planar(pixel_idx, sample_idx, seed)

    (o, d), cam_vjp = jax.vjp(rays_of, camera)
    (ts, trt), tab_vjp = jax.vjp(build_tables_T, gs)

    tile = min(_MEGA_BWD_TILE, _pick_tile(r))
    r_pad = -(-r // tile) * tile
    sg = jax.lax.stop_gradient
    padf = lambda a: jnp.pad(sg(a), (0, r_pad - r)) if r_pad != r else sg(a)
    padm = lambda a: (  # pad hit planes with -1 (miss) so pads contribute 0
        jnp.pad(a, (0, r_pad - r), constant_values=-1) if r_pad != r else a
    )
    ct_in = (
        tuple(padf(c) for c in ct_rad),
        tuple(padf(c) for c in ct_md),
        tuple(padf(c) for c in ct_mt),
        tuple(padf(c) for c in ct_fn),
        padf(ct_ft),
    )
    ct_pos_in = (
        None if ct_pos is None
        else [tuple(padf(c) for c in p) for p in ct_pos]
    )
    ct_ts, ct_trt, ct_o, ct_d = pallas_mega_bwd(
        tuple(padf(c) for c in o), tuple(padf(c) for c in d),
        padf(pixel_idx), padf(samp), sg(jnp.asarray(seed, jnp.int32)),
        sg(ts), sg(trt), tuple(padm(h) for h in hit_idx), ct_in,
        ct_pos=ct_pos_in, depth=depth, tile=tile, interpret=interpret,
    )
    sl = lambda a: a[:r] if r_pad != r else a
    cam_bar = cam_vjp(
        (tuple(sl(c) for c in ct_o), tuple(sl(c) for c in ct_d))
    )[0]
    gs_bar = tab_vjp((ct_ts, ct_trt))[0]
    return (
        gs_bar,
        cam_bar,
        _float0_zero(pixel_idx),
        _float0_zero(sample_idx),
        _float0_zero(seed),
    )


mega_sample.defvjp(_mega_fwd, _mega_bwd)
