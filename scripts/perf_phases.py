"""Phase breakdown of the bench config: fwd-only vs fwd+bwd, Pallas vs XLA.

Usage: python scripts/perf_phases.py [spp] [size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
depth = 8

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

scene = demo_scene(seed=0).build()
camera = Camera.make(size, size, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
sky = jnp.asarray(procedural_sky(256, 256))
rays = size * size * spp * depth


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.1f} ms  {rays/dt/1e6:8.1f} Mrays/s")
    return dt


def loss_fn(params, scene, sky_tex):
    scene = scene.with_material_params({**scene.material_params(), **params})
    rad, _, _ = render_radiance(
        scene, camera, sky_tex, spp=spp, max_depth=depth, seed=0,
        unroll=jax.default_backend() == "tpu",
    )
    return jnp.sum(rad * rad)


params = {"kd": scene.kd, "emission": scene.emission}

fwd = jax.jit(loss_fn)
fwdbwd = jax.jit(jax.value_and_grad(loss_fn))

timeit("fwd only", fwd, params, scene, sky)
timeit("fwd+bwd", fwdbwd, params, scene, sky)
