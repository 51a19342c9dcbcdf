"""Leaf-size sweep for the BVH traversal kernel: does K=8 (more, smaller
leaves; bigger SMEM node tables) beat the auto K=ceil(N/256)?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.presets import big_camera, big_scene
from cpppathtracer_tpu.ops.texture import procedural_sky

os.environ["POCA_MEGA"] = "0"


def time_render(scene, cam, sky, spp, depth, iters=3):
    fn = jax.jit(lambda s, c, k: render_radiance(
        s, c, k, spp=spp, max_depth=depth, seed=0)[0])
    out = fn(scene, cam, sky)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(scene, cam, sky))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    res, spp, depth = 512, 2, 4
    sky = jnp.asarray(procedural_sky(128, 128, seed=1))
    for n in (2048, 4096, 8192):
        cam = big_camera(n, res, res)
        base = big_scene(n)
        ref_out = None
        for leaf in (None, 8, 16, 32):
            try:
                scene = base.with_bvh(leaf_size=leaf)
                m, k = scene.bvh_dims
                t, out = time_render(scene, cam, sky, spp, depth)
                tag = "auto" if leaf is None else str(leaf)
                ok = ""
                if ref_out is None:
                    ref_out = out
                else:
                    import numpy as np

                    ok = "" if np.array_equal(
                        np.asarray(out), np.asarray(ref_out)
                    ) else "  !! MISMATCH"
                print(f"n={n} leaf={tag:4s} (M={m}, K={k}): "
                      f"{t*1e3:7.1f} ms{ok}", flush=True)
            except Exception as e:
                print(f"n={n} leaf={leaf}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
