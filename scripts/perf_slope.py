"""Per-bounce slope vs fixed overhead: time trace_bounces at several depths."""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, ".")
from cpppathtracer_tpu.integrator import trace_bounces
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

R = 512 * 512
scene = demo_scene(seed=0).build()
camera = Camera.make(512, 512, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
pix = jnp.arange(R, dtype=jnp.int32)
rays = camera.ray_gen(pix, 0, 0)
sky = jnp.asarray(procedural_sky(256, 256))
print("platform:", jax.devices()[0], flush=True)
for depth in [1, 2, 4, 8]:
    f = jax.jit(lambda o: trace_bounces(scene, sky, type(rays)(o, rays.dir, rays.tmin, rays.tmax), pix, 0, 0, depth)[0])
    out = f(rays.origin); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(rays.origin)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"depth={depth:2d}: {dt*1e3:8.2f} ms", flush=True)
