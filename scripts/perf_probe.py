"""Measure fwd and fwd+bwd render throughput at several configs on the
current JAX platform (run with default env for TPU)."""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky


def bench_config(width, spp, depth, mode, iters=3):
    scene = demo_scene(seed=0).build()
    camera = Camera.make(width, width, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
    sky = jnp.asarray(procedural_sky(256, 256))

    if mode == "fwd":
        fn = jax.jit(
            lambda s, c, sk: render_radiance(s, c, sk, spp=spp, max_depth=depth, seed=0)[0]
        )
        args = (scene, camera, sky)
    else:
        def loss(params, scene, sky_tex):
            s2 = scene.with_material_params({**scene.material_params(), **params})
            rad, _, _ = render_radiance(s2, camera, sky_tex, spp=spp, max_depth=depth, seed=0)
            return jnp.sum(rad * rad)

        fn = jax.jit(jax.value_and_grad(loss))
        args = ({"kd": scene.kd, "emission": scene.emission}, scene, sky)

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rays = width * width * spp * depth
    print(
        f"{mode:7s} {width}x{width} spp={spp:3d} d={depth}: compile={compile_s:6.1f}s "
        f"iter={dt*1e3:8.1f}ms rays/s={rays/dt/1e6:9.1f}M",
        flush=True,
    )


if __name__ == "__main__":
    print("platform:", jax.devices()[0], flush=True)
    for cfg in sys.argv[1:] or ["256,4,8,fwd"]:
        w, spp, d, mode = cfg.split(",")
        bench_config(int(w), int(spp), int(d), mode)
