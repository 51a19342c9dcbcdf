"""Progressive-loop throughput at the reference's operating point:
1280x720, 1 spp/frame, depth 8 (the paint-pump loop of
`cppSrc/main_wnd.cpp:165-220` + `cuSrc/path_tracer.cu:256-306`).

Measures ProgressiveRenderer.step() end-to-end (integrate + denoise +
mix as one jitted program, async dispatch) and the blocking frame()
fetch cadence.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.renderer import ProgressiveRenderer, RenderConfig


def main():
    w, h, depth = 1280, 720, 8
    scene = demo_scene(seed=0).build()
    cam = Camera.make(w, h, origin=(130.0, 103.0, 130.0),
                      look_at=(0.0, 0.0, 0.0))
    sky = jnp.asarray(procedural_sky(256, 256))
    for denoise in (True, False):
        r = ProgressiveRenderer(
            scene, cam, sky,
            RenderConfig(width=w, height=h, max_depth=depth,
                         denoise=denoise),
        )
        img = r.step()
        jax.block_until_ready(img)  # compile + warm
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            img = r.step()
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / n
        rays = w * h * depth
        print(
            f"[progressive {w}x{h}x1spp d{depth} denoise={denoise}] "
            f"{1.0/dt:.1f} fps, {dt*1e3:.1f} ms/frame, "
            f"{rays/dt/1e6:.1f} Mrays/s fwd",
            flush=True,
        )


if __name__ == "__main__":
    main()
