"""Capture a jax.profiler trace of one cached render program."""
import sys, time, glob
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, ".")
from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

scene = demo_scene(seed=0).build()
camera = Camera.make(512, 512, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
sky = jnp.asarray(procedural_sky(256, 256))
fn = jax.jit(lambda s, c, sk: render_radiance(s, c, sk, spp=16, max_depth=8, seed=0)[0])
out = fn(scene, camera, sky); jax.block_until_ready(out)
print("warm; tracing...", flush=True)
with jax.profiler.trace("/tmp/poca_trace"):
    out = fn(scene, camera, sky)
    jax.block_until_ready(out)
print("files:", glob.glob("/tmp/poca_trace/**/*", recursive=True), flush=True)
