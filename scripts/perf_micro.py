"""Microbenchmark the integrator's pieces on the current platform."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops import bsdf, intersect
from cpppathtracer_tpu.ops.intersect import _object_best_t
from cpppathtracer_tpu.types import Rays
from cpppathtracer_tpu.utils import rng as prng

R = 512 * 512
scene = demo_scene(seed=0).build()
camera = Camera.make(512, 512, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
pix = jnp.arange(R, dtype=jnp.int32)
rays = camera.ray_gen(pix, 0, 0)
N = scene.num_objects
print("platform:", jax.devices()[0], "N objects:", N, "R rays:", R, flush=True)


def timeit(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms  ({R/dt/1e6:8.1f} M/s)", flush=True)
    return dt


# 1. candidate t's + argmin only
def cands_argmin(scene, rays):
    o = rays.origin[..., None, :]
    d = rays.dir[..., None, :]
    t_all = _object_best_t(
        scene.prim_type, scene.center, scene.radius, scene.y_pos, scene.height,
        o, d, rays.tmin[..., None], rays.tmax[..., None],
    )
    return jnp.argmin(t_all, axis=-1), jnp.min(t_all, axis=-1)


timeit("candidates+argmin [R,N]", cands_argmin, scene, rays)


# 1b. [N, R] layout variant
def cands_argmin_nr(scene, rays):
    o = rays.origin[None, :, :]  # [1,R,3]
    d = rays.dir[None, :, :]
    t_all = _object_best_t(
        scene.prim_type[:, None], scene.center[:, None, :], scene.radius[:, None],
        scene.y_pos[:, None], scene.height[:, None],
        o, d, rays.tmin[None, :], rays.tmax[None, :],
    )  # [N, R]
    return jnp.argmin(t_all, axis=0), jnp.min(t_all, axis=0)


timeit("candidates+argmin [N,R]", cands_argmin_nr, scene, rays)


# 2. full intersect (incl. gather + recompute)
timeit("intersect full", intersect.intersect, scene, rays)


# 3. gathers alone
def gathers(scene, idx):
    take = lambda a: jnp.take(a, idx, axis=0)
    return (
        take(scene.prim_type), take(scene.center), take(scene.radius),
        take(scene.y_pos), take(scene.height), take(scene.kd),
        take(scene.mat_type), take(scene.emission), take(scene.smoothness),
        take(scene.reflectivity), take(scene.ior),
    )


idx = jnp.zeros(R, jnp.int32)
timeit("11 gathers via take", gathers, scene, idx)


# 3b. one-hot matmul gathers
def gathers_onehot(scene, idx):
    oh = jax.nn.one_hot(idx, N, dtype=jnp.float32)  # [R, N]
    g3 = lambda a: oh @ a
    g1 = lambda a: oh @ a[:, None]
    return (
        g3(scene.center), g1(scene.radius), g1(scene.y_pos), g1(scene.height),
        g3(scene.kd), g1(scene.emission), g1(scene.smoothness),
        g1(scene.reflectivity), g1(scene.ior),
    )


timeit("9 gathers via one-hot matmul", gathers_onehot, scene, idx)


# 4. shading alone
mats = bsdf.gather_materials(scene, idx)
mats = jax.tree_util.tree_map(jnp.asarray, mats)
normal = rays.dir
u1, u2, u3, _ = prng.uniforms4(0, pix, 0, 1)
timeit("shade", bsdf.shade, mats, normal, rays.dir, u1, u2, u3)

# 5. rng alone
timeit("rng uniforms4", lambda p: prng.uniforms4(0, p, 0, 1), pix)

# 6. sky sampling
from cpppathtracer_tpu.ops import texture

sky = jnp.asarray(texture.procedural_sky(256, 256))
timeit("sample_sky (bilinear gather)", texture.sample_sky, sky, rays.dir)
