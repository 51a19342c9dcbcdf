"""Capture a jax.profiler trace of one cached program and dump the op table.

Usage: python scripts/capture_profile.py [fwd|fwdbwd] [spp] [size]
"""
import glob
import os
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

mode = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

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
if mode == "fwd":
    fn = jax.jit(loss_fn)
else:
    fn = jax.jit(jax.value_and_grad(loss_fn))

out = fn(params, scene, sky)
jax.block_until_ready(out)
print("warm; tracing...", flush=True)
trace_dir = f"/tmp/poca_trace_{mode}"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    out = fn(params, scene, sky)
    jax.block_until_ready(out)

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane:", xplanes, flush=True)

# Convert to the op-profile table via the tensorboard profile plugin.
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

for tool in ("framework_op_stats", "op_profile"):
    try:
        data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        out_path = f"{trace_dir}/{tool}.out"
        with open(out_path, "wb") as f:
            f.write(data if isinstance(data, bytes) else data.encode())
        print("wrote", out_path, flush=True)
    except Exception as e:
        print(tool, "failed:", e, flush=True)
