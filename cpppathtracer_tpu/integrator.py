"""Monte-Carlo path integrator — wavefront `lax.scan` over bounces.

Re-designs the reference's per-pixel megakernel (`SamplePixel`,
`cuSrc/path_tracer.cu:124-175`) as a wavefront: the whole pixel grid's rays
advance one bounce per scan step, dead rays masked.  On TPU there is no
per-lane divergence, so megakernel-vs-wavefront collapses into "vectorize
everything" — one fused XLA program per bounce with zero host syncs
(the reference needs a `cudaDeviceSynchronize` between kernels,
`path_tracer.cu:279-294`).

Loop semantics matched exactly (`path_tracer.cu:141-170`):
  radiance += throughput * (hit ? emit*kd : sky(dir))       (:156)
  throughput *= attenuation                                 (:157)
  miss terminates the path (Miss sets depth = 32, :121)
  next ray: origin = hit_pos, dir = normalize(bounce_dir),
            tmin = BOUNCE_RAY_TMIN (2e-5), tmax = 1e30      (:165-168)
  paths surviving max_recursion_depth bounces are truncated with no sky
  contribution (loop simply ends).

First-bounce aux buffers for the denoiser (`path_tracer.cu:159-163`):
normal = first-hit normal (miss: -ray.dir, :152).  NOTE the reference
intends to record hit depth but passes its Ray by value into TraceRay
(`bvh.cu:167`), so its depth buffer is the constant DEFAULT_RAY_TMAX; we
record the actual first-hit t, which strictly improves the denoiser's
edge-stopping (the reference's depth weight degenerates to 1).

Differentiability: the scan body is `jax.checkpoint`ed (recompute in the
backward sweep — the rendering analog of gradient rematerialization), and
sampling uses detached discrete decisions (see ops/bsdf.py).  Gradients
flow to material parameters, emitter intensities, the sky texture, and
camera/geometry parameters.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.ops import bsdf, fast, intersect, mathx, planar, texture
from cpppathtracer_tpu.types import BOUNCE_RAY_TMIN, DEFAULT_RAY_TMAX, Rays
from cpppathtracer_tpu.utils import rng as prng


def trace_bounces(scene, sky_tex, rays: Rays, pixel_idx, sample_idx, seed, max_depth: int,
                  tex_stack=None, unroll: bool | None = None, sky_packed=None,
                  gs=None):
    """Integrate `max_depth` bounces for a wavefront of primary rays.

    Returns (radiance f32[R,3], first_normal f32[R,3], first_t f32[R]).

    Perf notes (TPU): uses the matmul-form type-partitioned intersector +
    one-hot winner gather (ops/fast.py) when the scene carries partition
    metadata; the sky env-map is sampled ONCE per path at its recorded
    termination (direction, throughput) instead of per bounce — exactly
    equivalent (the sky lookup never feeds back into the path state) but
    `max_depth`x fewer texture gathers.
    """
    batch = pixel_idx.shape
    if gs is None:
        gs = fast.group_scene(scene)
    # quad-packed sky: ONE gather per sample instead of 4 (ops/texture.py).
    # Callers rendering many samples pass a prepacked texture — packing
    # inside the per-sample remat costs a [H,W,16] concat per sample AND
    # per backward replay (profiled at ~3 ms/sample at 256^2, v5e).
    if sky_packed is None:
        sky_packed = texture.pack_bilinear(sky_tex)
    use_planar = (
        gs is not None and len(batch) == 1
        and os.environ.get("POCA_PLANAR", "1") != "0"
    )

    # The bounce body is jax.checkpoint'ed below (second remat level under
    # the per-sample checkpoint in render_radiance).  Without it, the
    # backward's per-sample replay stacks plain-scan-AD residuals per
    # bounce — profiled at ~470ms of raw dynamic-update-slice/-slice
    # traffic out of a 1012ms fwd+bwd program (512^2x16spp, v5e).  With
    # the body checkpointed on the save-only-hit_idx policy, residuals
    # per bounce are just the carries + the winner index; the backward
    # replays the cheap record-gather/rng/shade chain from the saved
    # index and the Pallas winner kernel never re-runs.  Measured 2.1x
    # end-to-end fwd+bwd (32.8 -> 69.8 Mrays/s at that config).
    #
    # The body computes in PLANAR layout (ops/planar.py): every 3-vector
    # carry is three flat f32[R] planes, which XLA tiles as {T(1024)} at
    # full VPU width — the [R,3]/[R,1] row-major forms waste 2-8x of each
    # (8 sublane x 128 lane) register (profiled at 1024^2).
    # Miss bookkeeping is carry-free: after a miss, `dirn`/`thru`/`alive`
    # freeze (updates are masked by hit/live_hit, and the stale ray
    # re-traces identically, so `hit` stays False), hence at scan end
    #   miss direction  == final dirn
    #   miss throughput == final thru
    #   ever-missed     == ~final alive
    # (truncated-alive paths get no sky — reference semantics).  This
    # deletes 7 of the 24 carry planes plus their per-bounce selects and
    # backward cotangent chains.
    def body(carry, bounce):
        (o, dirn, thru, rad, alive, first_n, first_t) = carry
        tmin = jnp.where(bounce == 0, 0.0, BOUNCE_RAY_TMIN) * jnp.ones(batch, jnp.float32)
        tmax = jnp.full(batch, DEFAULT_RAY_TMAX, jnp.float32)
        # dispatches to the fused Pallas winner kernel on TPU, the
        # XLA [N,R] fast path elsewhere (env POCA_PALLAS overrides)
        hit, mats = fast.intersect_and_gather_planar(gs, o, dirn, tmin, tmax)
        u1, u2, u3, _ = prng.uniforms4(seed, pixel_idx, sample_idx, 1 + bounce)
        kd_override = None
        if tex_stack is not None:
            # per-material albedo textures (Material::GetKd with real UVs,
            # see ops/uv.py); static unroll over the texture stack.
            from cpppathtracer_tpu.ops.uv import surface_uv_p

            tid = mats["tex_id"]
            uu, vv = surface_uv_p(*mats["_geom_p"], hit["pos"])
            zed = jnp.zeros_like(uu)
            kd_tex = (zed, zed, zed)
            for t in range(tex_stack.shape[0]):
                smp = planar.unstack_v3(texture.sample_bilinear(tex_stack[t], uu, vv))
                kd_tex = planar.where_p(tid == t, smp, kd_tex)
            kd_override = planar.where_p(tid >= 0, kd_tex, mats["kd_p"])
        bounce_dir, attenuation, emitted = planar.shade_p(
            mats, hit["normal"], dirn, u1, u2, u3, kd_override=kd_override
        )
        live_hit = hit["hit"] & alive
        lh = live_hit.astype(jnp.float32)
        rad = planar.add_p(rad, planar.scale_p(planar.mul_p(thru, emitted), lh))
        thru = planar.where_p(live_hit, planar.mul_p(thru, attenuation), thru)

        # First-bounce denoiser aux (miss normal = -dir, path_tracer.cu:152).
        n0 = planar.where_p(hit["hit"], hit["normal"], planar.scale_p(dirn, -1.0))
        t0 = jnp.where(hit["hit"], hit["t"], DEFAULT_RAY_TMAX)
        first_n = planar.where_p(bounce == 0, n0, first_n)
        first_t = jnp.where(bounce == 0, t0, first_t)

        new_alive = alive & hit["hit"]
        o = planar.where_p(hit["hit"], hit["pos"], o)
        dirn = planar.where_p(hit["hit"], planar.normalize_p(bounce_dir), dirn)
        return (o, dirn, thru, rad, new_alive, first_n, first_t), None

    def body_rowmajor(carry, bounce):
        (origin, direction, throughput, radiance, alive, first_n, first_t) = carry
        cur = Rays(
            origin=origin,
            dir=direction,
            tmin=jnp.where(bounce == 0, 0.0, BOUNCE_RAY_TMIN) * jnp.ones(batch, jnp.float32),
            tmax=jnp.full(batch, DEFAULT_RAY_TMAX, jnp.float32),
        )
        if gs is not None:
            hit, mats = fast.intersect_and_gather(gs, cur)
        else:
            hit = intersect.intersect(scene, cur)
            mats = bsdf.gather_materials(scene, hit.obj_idx)
        u1, u2, u3, _ = prng.uniforms4(seed, pixel_idx, sample_idx, 1 + bounce)
        kd_override = None
        if tex_stack is not None:
            # per-material albedo textures (Material::GetKd with real UVs,
            # see ops/uv.py); static unroll over the texture stack.
            from cpppathtracer_tpu.ops import texture as _tex
            from cpppathtracer_tpu.ops.uv import surface_uv

            tid = mats["tex_id"]
            u, v = surface_uv(*mats["_geom"], hit.pos)
            kd_tex = jnp.zeros_like(mats["kd"])
            for t in range(tex_stack.shape[0]):
                kd_tex = jnp.where(
                    (tid == t)[..., None],
                    _tex.sample_bilinear(tex_stack[t], u, v),
                    kd_tex,
                )
            kd_override = jnp.where((tid >= 0)[..., None], kd_tex, mats["kd"])
        bounce_dir, attenuation, emitted = bsdf.shade(
            mats, hit.normal, direction, u1, u2, u3, kd_override=kd_override
        )
        live_hit = hit.hit & alive
        radiance = radiance + throughput * emitted * live_hit[..., None]
        throughput = jnp.where(
            live_hit[..., None], throughput * attenuation, throughput
        )
        n0 = jnp.where(hit.hit[..., None], hit.normal, -direction)
        t0 = jnp.where(hit.hit, hit.t, DEFAULT_RAY_TMAX)
        first_n = jnp.where(bounce == 0, n0, first_n)
        first_t = jnp.where(bounce == 0, t0, first_t)
        new_alive = alive & hit.hit
        origin = jnp.where(hit.hit[..., None], hit.pos, origin)
        direction = jnp.where(
            hit.hit[..., None], mathx.normalize(bounce_dir), direction
        )
        return (
            origin, direction, throughput, radiance, new_alive, first_n, first_t
        ), None

    ckpt = functools.partial(
        jax.checkpoint,
        policy=jax.checkpoint_policies.save_only_these_names("hit_idx"),
    )

    # For GRADIENT paths on TPU the bounce loop should be UNROLLED
    # (max_depth is static and small): under lax.scan, reverse-mode AD
    # stacks every live carry per step with [depth, R]
    # dynamic-update-slices whose single-row writes into (8,128)-tiled
    # stacks are whole-buffer read-modify-writes — profiled at ~140 ms of
    # the 1024^2x16spp backward (v5e); unrolled, residuals are plain SSA
    # values and the bounce==0 selects fold statically (856 -> 704 ms
    # fwd+bwd).  Forward-only programs REGRESS unrolled (372 -> 813 ms:
    # XLA fuses across bounces into spilling mega-live-ranges), and CPU
    # tests pay ~8x trace/compile time — so unrolling is opt-in: the
    # differentiable drivers (bench, inverse training) pass unroll=True;
    # plain renders keep the scan.  Numerics are identical either way.
    # Env POCA_UNROLL=0/1 overrides.
    force = os.environ.get("POCA_UNROLL", "")
    if force in ("0", "1"):
        unroll = force == "1"
    elif unroll is None:
        unroll = False

    def run_bounces(body_fn, init):
        if unroll:
            carry = init
            for b in range(max_depth):
                carry, _ = ckpt(body_fn)(carry, jnp.int32(b))
            return carry
        carry, _ = jax.lax.scan(ckpt(body_fn), init, jnp.arange(max_depth))
        return carry

    # Carry inits derive from the ray arrays (not fresh constants) so that
    # under shard_map their varying-manual-axes type matches the loop
    # outputs (JAX >= 0.9 check_vma).
    if use_planar:
        o0 = planar.unstack_v3(rays.origin)
        d0 = planar.unstack_v3(rays.dir)
        zero1 = rays.tmin * 0.0
        one1 = zero1 + 1.0
        z3 = (zero1, zero1, zero1)
        init = (o0, d0, (one1, one1, one1), z3, rays.tmax > 0.0, z3, zero1)
        (_, miss_dir, miss_thru, rad, alive, first_n, first_t) = run_bounces(
            body, init
        )
        radiance = planar.stack_v3(rad)
        miss_dir = planar.stack_v3(miss_dir)
        miss_thru = planar.stack_v3(miss_thru)
        first_n = planar.stack_v3(first_n)
    else:
        zero3 = rays.origin * 0.0
        zero1 = rays.tmin * 0.0
        init = (
            rays.origin,
            rays.dir,
            zero3 + 1.0,  # throughput
            zero3,  # radiance
            rays.tmax > 0.0,  # alive (all True)
            zero3,  # first normal
            zero1,  # first t
        )
        (_, miss_dir, miss_thru, radiance, alive, first_n, first_t) = run_bounces(
            body_rowmajor, init
        )
    missed = ~alive
    # Named so the per-sample remat policy SAVES the sampled sky radiance:
    # the [R]-row gather + quad select is pure overhead to replay (the
    # texture cotangent only needs the detached indices/weights, and those
    # are recomputed cheaply from miss_dir).
    sky = checkpoint_name(
        texture.sample_sky_packed(sky_packed, miss_dir), "sky_rgb"
    )
    radiance = radiance + miss_thru * sky * missed[..., None]
    return radiance, first_n, first_t


def _mega_tex_radiance(gs, tex_stack, hit_planes, aux, miss_p, missed,
                       sky_packed, max_depth):
    """Textured-albedo accumulation epilogue for the mega path.

    The megakernel's path GEOMETRY is kd-independent (bounce directions /
    masks never read the albedo), so with per-bounce winner indices
    (`hit_planes`), hit positions and attenuation-on masks (`aux`) saved
    by the kernel, the radiance recurrence
        rad += thru * (emission_b * kd_b);  thru *= A_b
    with A_b = texture(uv_b) where tex_id >= 0 else kd_b (Material::GetKd,
    material.cu:11-18; emission reads the raw kd_ field, :140-141) can be
    replayed in XLA with just O(depth) table takes + texture gathers —
    no winner search, no shade recompute.  Differentiable w.r.t. the
    scene tables, the textures (exact gathers) and, through the
    hit-position cotangents, the geometry.  The attenuation-on plane
    `att` also carries the score-function surrogate weight (ops/bsdf.py;
    value-exact 1.0, applied by the backward replay in ops/mega.py), so
    detached-branch (reflectivity / Fresnel-choice) gradients use the
    SAME estimator as the untextured and non-mega paths.
    """
    from cpppathtracer_tpu.ops.uv import surface_uv_p

    r = hit_planes[0].shape[0]
    zero = missed * 0.0
    one = zero + 1.0
    thru = (one, one, one)
    rad = (zero, zero, zero)
    alive = zero < 1.0
    for b in range(max_depth):
        enc = hit_planes[b]
        hit = enc >= 0
        idx = jnp.maximum(enc, 0)
        take = lambda col: jnp.take(col, idx, axis=0)
        kd_b = (take(gs.table_r[:, 0]), take(gs.table_r[:, 1]),
                take(gs.table_r[:, 2]))
        em_b = take(gs.table_r[:, 3])
        tid = take(gs.table_s[:, 11]).astype(jnp.int32)
        prim = take(gs.table_s[:, 6]).astype(jnp.int32)
        center = (take(gs.table_s[:, 0]), take(gs.table_s[:, 1]),
                  take(gs.table_s[:, 2]))
        radius = take(gs.table_s[:, 3])
        y_pos = take(gs.table_s[:, 4])
        height = take(gs.table_s[:, 5])
        pos, att = aux[b]
        uu, vv = surface_uv_p(prim, center, radius, y_pos, height, pos)
        kd_tex = (zero, zero, zero)
        for t in range(tex_stack.shape[0]):
            smp = planar.unstack_v3(texture.sample_bilinear(tex_stack[t], uu, vv))
            kd_tex = planar.where_p(tid == t, smp, kd_tex)
        kd_att = planar.where_p(tid >= 0, kd_tex, kd_b)
        attn = planar.scale_p(kd_att, att)
        live = hit & alive
        lh = live.astype(jnp.float32)
        rad = planar.add_p(
            rad, planar.scale_p(planar.mul_p(thru, planar.scale_p(kd_b, em_b)), lh)
        )
        thru = planar.where_p(live, planar.mul_p(thru, attn), thru)
        alive = alive & hit
    sky = texture.sample_sky_packed(sky_packed, planar.stack_v3(miss_p))
    return planar.stack_v3(rad) + (
        planar.stack_v3(thru) * sky * missed[..., None]
    )


def render_sample(scene, camera: Camera, sky_tex, pixel_idx, sample_idx, seed, max_depth: int,
                  tex_stack=None, unroll: bool | None = None, sky_packed=None,
                  gs=None):
    """One sample-per-pixel pass over flat pixel indices (the analog of one
    `SamplePixel` launch).  Returns (radiance, first_normal, first_t)."""
    rays = camera.ray_gen(pixel_idx, sample_idx, seed)
    return trace_bounces(scene, sky_tex, rays, pixel_idx, sample_idx, seed, max_depth,
                         tex_stack=tex_stack, unroll=unroll,
                         sky_packed=sky_packed, gs=gs)


def render_radiance(
    scene,
    camera: Camera,
    sky_tex,
    *,
    spp: int,
    max_depth: int,
    seed: int = 0,
    pixel_idx=None,
    sample_offset=0,
    tex_stack=None,
    unroll: bool | None = None,
    spp_chunk: int = 1,
):
    """Mean radiance over `spp` samples (scan over the sample axis — the
    rendering analog of gradient accumulation; memory stays O(pixels)).

    Returns (radiance f32[R,3], first_normal f32[R,3], first_t f32[R]); the
    aux buffers come from sample 0.  Differentiable w.r.t. scene material
    params, sky_tex and camera.
    """
    # standard iota pixel layout (pix_c = tile(arange(r_n), chunk)): the
    # mega path then skips the pix/samp sort payloads and reconstructs
    # both from the sorted src plane (ops/mega.py)
    iota_pix = pixel_idx is None
    if pixel_idx is None:
        pixel_idx = jnp.arange(camera.width * camera.height, dtype=jnp.int32)

    # spp chunking: fold `spp_chunk` samples into one wavefront per scan
    # step ([C*R] ray batch, per-ray sample indices) to amortize per-step
    # fixed costs.  RNG keys are (pixel, sample)-based so the draws — and
    # hence every sample's radiance — are identical to the unchunked
    # render; only the accumulation order changes (fp-level).
    env_chunk = os.environ.get("POCA_SPP_CHUNK", "")
    if env_chunk.isdigit() and int(env_chunk) > 0:
        spp_chunk = int(env_chunk)
    spp_chunk = max(1, min(spp_chunk, spp))
    if spp % spp_chunk != 0:
        spp_chunk = 1

    # Rematerialize each sample in the backward sweep: without this the
    # spp-scan saves every sample's inner bounce-scan carries (~0.8 GB per
    # spp step at 1024^2) and 64spp fwd+bwd overflows HBM; with it, per-step
    # residuals are just the O(pixels) accumulators.  The policy saves the
    # per-bounce winner indices (named in ops/fast.py) through THIS level
    # too: the backward sample replay then rebuilds each bounce's record
    # from the saved index and the whole [R, N] candidate computation —
    # the dominant forward cost — runs exactly once per sample, in the
    # true forward pass.  Residual cost: max_depth x int32[R] per spp step
    # (32 MB/step at 1024^2 x 8 bounces).
    r_n = pixel_idx.shape[0]
    if spp_chunk > 1:
        pix_c = jnp.tile(pixel_idx, spp_chunk)
        samp_rep = jnp.repeat(
            jnp.arange(spp_chunk, dtype=jnp.int32), r_n
        )
    else:
        pix_c = pixel_idx
        samp_rep = None

    # Hoisted per-render precomputations (shared across samples AND their
    # backward replays): the grouped-scene repack and the quad-packed sky.
    gs = fast.group_scene(scene)
    sky_packed = texture.pack_bilinear(sky_tex)

    # Megakernel path: the WHOLE bounce loop fused into one Pallas kernel
    # (ops/pallas/mega_kernel.py) with an explicit custom-vjp replay
    # backward (ops/mega.py) — no jax.checkpoint needed, the custom_vjp
    # already keeps only the hit_idx stack as residual.  Default on TPU;
    # env POCA_MEGA=0/1 overrides (1 uses interpret mode off-TPU).
    force_mega = os.environ.get("POCA_MEGA", "")
    on_tpu = jax.default_backend() == "tpu"
    use_mega = (
        gs is not None
        # BVH scenes take the per-bounce traversal-kernel path — the mega
        # kernel's in-VMEM winner search is the dense O(R*N) form
        and (gs.bvh_meta is None or os.environ.get("POCA_BVH", "1") == "0")
        and (force_mega == "1" if force_mega in ("0", "1") else on_tpu)
    )
    if use_mega:
        from cpppathtracer_tpu.ops import mega

        mega_aux = tex_stack is not None

        def body_mega(acc, s):
            s_key = sample_offset + s * spp_chunk
            if samp_rep is not None:
                s_key = s_key + samp_rep
            outs = mega.mega_sample(
                gs, camera, pix_c, s_key, seed, max_depth, not on_tpu,
                mega_aux, r_n if iota_pix else 0,
            )
            if mega_aux:
                (rad_p, miss_p, thru_p, missed, fn_p, ft,
                 hit_planes, aux) = outs
                rad = _mega_tex_radiance(
                    gs, tex_stack, hit_planes, aux, miss_p, missed,
                    sky_packed, max_depth,
                )
            else:
                rad_p, miss_p, thru_p, missed, fn_p, ft = outs
                sky = texture.sample_sky_packed(
                    sky_packed, planar.stack_v3(miss_p)
                )
                rad = planar.stack_v3(rad_p) + (
                    planar.stack_v3(thru_p) * sky * missed[..., None]
                )
            n0 = planar.stack_v3(fn_p)
            if spp_chunk > 1:
                rad = jnp.sum(rad.reshape(spp_chunk, r_n, 3), axis=0)
                n0 = n0[:r_n]
                ft = ft[:r_n]
            acc_rad, acc_n, acc_t = acc
            keep_first = s == 0
            return (
                acc_rad + rad,
                jnp.where(keep_first, n0, acc_n),
                jnp.where(keep_first, ft, acc_t),
            ), None

        zero1 = pixel_idx.astype(jnp.float32) * 0.0
        zero3 = zero1[..., None] + jnp.zeros((3,), jnp.float32)
        init = (zero3, zero3, zero1)
        (rad_sum, n0, t0), _ = jax.lax.scan(
            body_mega, init, jnp.arange(spp // spp_chunk)
        )
        return rad_sum / jnp.float32(spp), n0, t0

    def _one_sample(scene, camera, sky_tex, sky_packed, gs, tex_stack, s):
        s_key = s if samp_rep is None else s + samp_rep
        return render_sample(
            scene, camera, sky_tex, pix_c, s_key, seed, max_depth,
            tex_stack=tex_stack, unroll=unroll, sky_packed=sky_packed, gs=gs,
        )

    _one_sample_ckpt = jax.checkpoint(
        _one_sample,
        policy=jax.checkpoint_policies.save_only_these_names(
            "hit_idx", "sky_rgb"
        ),
    )

    def body(acc, s):
        rad, n0, t0 = _one_sample_ckpt(
            scene, camera, sky_tex, sky_packed, gs, tex_stack,
            sample_offset + s * spp_chunk,
        )
        if spp_chunk > 1:
            rad = jnp.sum(rad.reshape(spp_chunk, r_n, 3), axis=0)
            n0 = n0[:r_n]
            t0 = t0[:r_n]
        acc_rad, acc_n, acc_t = acc
        keep_first = s == 0
        return (
            acc_rad + rad,
            jnp.where(keep_first, n0, acc_n),
            jnp.where(keep_first, t0, acc_t),
        ), None

    # varying-axes-safe zero inits (see trace_bounces)
    zero1 = pixel_idx.astype(jnp.float32) * 0.0
    zero3 = zero1[..., None] + jnp.zeros((3,), jnp.float32)
    init = (zero3, zero3, zero1)
    (rad_sum, n0, t0), _ = jax.lax.scan(
        body, init, jnp.arange(spp // spp_chunk)
    )
    return rad_sum / jnp.float32(spp), n0, t0


@functools.partial(jax.jit, static_argnames=("spp", "max_depth"))
def render_radiance_jit(scene, camera, sky_tex, spp: int, max_depth: int, seed):
    return render_radiance(scene, camera, sky_tex, spp=spp, max_depth=max_depth, seed=seed)
