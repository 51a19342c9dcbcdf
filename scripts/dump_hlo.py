"""Dump optimized HLO of the bench fwd+bwd program and print select fusions."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

spp, size = 16, 1024
scene = demo_scene(seed=0).build()
camera = Camera.make(size, size, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
sky = jnp.asarray(procedural_sky(256, 256))


def loss_fn(params, scene, sky_tex):
    scene = scene.with_material_params({**scene.material_params(), **params})
    rad, _, _ = render_radiance(
        scene, camera, sky_tex, spp=spp, max_depth=8, seed=0,
        unroll=jax.default_backend() == "tpu",
    )
    return jnp.sum(rad * rad)


params = {"kd": scene.kd, "emission": scene.emission}
fn = jax.jit(jax.value_and_grad(loss_fn))
compiled = fn.lower(params, scene, sky).compile()
txt = compiled.as_text()
open("/tmp/bench_hlo.txt", "w").write(txt)
print("HLO dumped:", len(txt), "chars", flush=True)
