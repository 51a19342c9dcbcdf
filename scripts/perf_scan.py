"""Scan-amortized component timings on the current platform: run each
component 64x inside one jit so tunnel dispatch latency vanishes."""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops import bsdf, fast, texture
from cpppathtracer_tpu.types import Rays
from cpppathtracer_tpu.utils import rng as prng

R = 512 * 512
ITERS = 64
scene = demo_scene(seed=0).build()
camera = Camera.make(512, 512, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
pix = jnp.arange(R, dtype=jnp.int32)
rays = camera.ray_gen(pix, 0, 0)
gs = fast.group_scene(scene)
sky = jnp.asarray(texture.procedural_sky(256, 256))
print("platform:", jax.devices()[0], "counts:", gs.counts, flush=True)


def scan_time(name, step):
    """step: carry[R,3] -> carry[R,3] (must depend on carry to serialize)."""

    @jax.jit
    def run(x0):
        return jax.lax.scan(lambda c, _: (step(c), None), x0, None, length=ITERS)[0]

    x0 = rays.origin
    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:8.3f} ms/iter ({R/dt/1e6:8.1f} M rays/s)", flush=True)


def mk_rays(c):
    return Rays(origin=c, dir=rays.dir, tmin=rays.tmin, tmax=rays.tmax)


# full intersect+gather
def step_intersect(c):
    hit, mats = fast.intersect_and_gather(gs, mk_rays(c))
    return c + 1e-30 * hit.pos


scan_time("intersect_and_gather", step_intersect)


# candidates+argmin only
def step_cand(c):
    t_all = fast._candidates_grouped(gs, mk_rays(c))
    m = jnp.min(t_all, axis=1)
    return c + 1e-30 * m[:, None]


scan_time("candidates+min [R,N]", step_cand)


# transposed winner (objects on sublanes)
def step_cand_t(c):
    t, i = fast._winner_grouped_T(gs, mk_rays(c))
    return c + 1e-30 * (t + i.astype(jnp.float32))[:, None]


scan_time("winner_T [N,R]", step_cand_t)


# fused pallas winner kernel
def step_winner_pl(c):
    i = fast.winner_index_pallas(gs, mk_rays(c))
    return c + 1e-30 * i.astype(jnp.float32)[:, None]


scan_time("winner pallas kernel", step_winner_pl)


# full intersect+gather via pallas
def step_intersect_pl(c):
    hit, mats = fast.intersect_and_gather(gs, mk_rays(c), use_pallas=True)
    return c + 1e-30 * hit.pos


scan_time("intersect_and_gather pallas", step_intersect_pl)


# record gather only (one-hot matmul from a fixed index)
gidx0 = jnp.zeros(R, jnp.int32)
na = sum(gs.counts)


def step_rec(c):
    gidx = (gidx0 + c[:, 0].astype(jnp.int32)) % na
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (na, R), 0) == gidx[None, :]
    ).astype(jnp.float32)
    rec = jax.lax.dot_general(
        onehot, gs.table[:na], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return c + 1e-30 * rec[:, 0:3]


scan_time("record one-hot matmul", step_rec)


# shade only
mats0 = bsdf.gather_materials(scene, jnp.zeros(R, jnp.int32))
u1, u2, u3, _ = prng.uniforms4(0, pix, 0, 1)


def step_shade(c):
    n = c * 0.0 + jnp.asarray([0.0, 1.0, 0.0])
    wo, att, em = bsdf.shade(mats0, n, c, u1, u2, u3)
    return c + 1e-30 * (wo + att + em)


scan_time("shade", step_shade)


# rng
def step_rng(c):
    a, b, d, e = prng.uniforms4(0, pix + c[:, 0].astype(jnp.int32), 0, 1)
    return c + 1e-30 * a[:, None]


scan_time("rng", step_rng)


# sky
def step_sky(c):
    s = texture.sample_sky(sky, c)
    return c + 1e-30 * s


scan_time("sample_sky", step_sky)

sky_packed = texture.pack_bilinear(sky)


def step_sky_packed(c):
    s = texture.sample_sky_packed(sky_packed, c)
    return c + 1e-30 * s


scan_time("sample_sky_packed", step_sky_packed)


# sky uv math only (transcendentals)
def step_sky_uv(c):
    u, v = texture.sky_uv(c, jnp)
    return c + 1e-30 * (u + v)[:, None]


scan_time("sky_uv transcendentals", step_sky_uv)


# packed-table row gather only
import numpy as _np

idx_fix = jnp.asarray(_np.random.RandomState(0).randint(0, 256 * 256, R), jnp.int32)


def step_gather(c):
    i = (idx_fix + c[:, 0].astype(jnp.int32)) % (256 * 256)
    row = jnp.take(sky_packed.data, i, axis=0)
    return c + 1e-30 * row[:, 0:3]


scan_time("packed row gather [R,16]", step_gather)


# full bounce body via trace_bounces depth-8 ( / 8 per bounce)
from cpppathtracer_tpu.integrator import trace_bounces


@jax.jit
def full(c):
    rad, _, _ = trace_bounces(scene, sky, mk_rays(c), pix, 0, 0, 8)
    return rad


out = full(rays.origin)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = full(rays.origin)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(f"{'full 8-bounce trace':32s} {dt*1e3:8.3f} ms ({R*8/dt/1e6:8.1f} M rays/s)", flush=True)
