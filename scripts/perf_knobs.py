"""Sweep perf knobs (env-gated) for the bench config on the current
platform.  Usage: python scripts/perf_knobs.py [spp] [size] [fwd|fwdbwd]

Each config is traced fresh (the knobs are read from os.environ at trace
time), compiled (persistent cache), and timed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
mode = sys.argv[3] if len(sys.argv) > 3 else "fwdbwd"
depth = 8

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

scene = demo_scene(seed=0).build()
camera = Camera.make(size, size, origin=(130.0, 103.0, 130.0),
                     look_at=(0.0, 0.0, 0.0))
sky = jnp.asarray(procedural_sky(256, 256))
rays = size * size * spp * depth

CONFIGS = [
    ("baseline", {}),
    ("tile2048", {"POCA_MEGA_TILE": "2048"}),
    ("tile4096", {"POCA_MEGA_TILE": "4096"}),
    ("tile8192", {"POCA_MEGA_TILE": "8192"}),
    ("chunk2", {"POCA_SPP_CHUNK": "2"}),
    ("chunk4", {"POCA_SPP_CHUNK": "4"}),
]
if len(sys.argv) > 4:
    names = set(sys.argv[4].split(","))
    CONFIGS = [c for c in CONFIGS if c[0] in names]

KNOB_KEYS = sorted({k for _, env in CONFIGS for k in env})

for name, env in CONFIGS:
    for k in KNOB_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)

    def make():
        if mode == "fwd":
            fn = jax.jit(lambda s, c, sk: render_radiance(
                s, c, sk, spp=spp, max_depth=depth, seed=0)[0])
            return fn, (scene, camera, sky)

        def loss(params, scene_, sky_tex):
            s2 = scene_.with_material_params(
                {**scene_.material_params(), **params})
            rad, _, _ = render_radiance(
                s2, camera, sky_tex, spp=spp, max_depth=depth, seed=0,
                unroll=jax.default_backend() == "tpu")
            return jnp.sum(rad * rad)

        fn = jax.jit(jax.value_and_grad(loss))
        return fn, ({"kd": scene.kd, "emission": scene.emission}, scene, sky)

    fn, args = make()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    loss_v = out[0] if mode != "fwd" else jnp.sum(out)
    print(
        f"{name:12s} {mode}: {dt*1e3:8.1f} ms  {rays/dt/1e6:7.1f} Mrays/s "
        f"  {dt*1e3/spp:6.1f} ms/sample  (compile {compile_s:.0f}s, "
        f"check {float(loss_v):.6g})",
        flush=True,
    )
