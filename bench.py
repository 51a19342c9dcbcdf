"""Benchmark: rays/s forward+backward on the BASELINE north-star config.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The metric is differentiable-render throughput (forward + material-
parameter backward) on the 100-object sphere/cylinder scene (BASELINE
config 3) at 1024x1024 x 64spp x depth 8.  vs_baseline is measured
against the BASELINE.json v5p-16 target of 1e9 rays/s (we run on a single
chip; >0.0625 of target == beating per-chip parity with the 16-chip goal).

Run on whatever JAX platform the environment provides (TPU under axon;
falls back to CPU with a smaller problem for smoke-testing).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_RAYS_PER_SEC = 1e9  # BASELINE.md north star (v5p-16, fwd+bwd)


def build_bench(width, height, spp, max_depth):
    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.models.camera import Camera
    from cpppathtracer_tpu.models.scene import demo_scene
    from cpppathtracer_tpu.ops.texture import procedural_sky

    scene = demo_scene(seed=0).build()  # ~75 objects: config-3 scale
    camera = Camera.make(
        width, height, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0)
    )
    sky = jnp.asarray(procedural_sky(256, 256))

    def loss_fn(params, scene, sky_tex):
        scene = scene.with_material_params({**scene.material_params(), **params})
        rad, _, _ = render_radiance(
            scene, camera, sky_tex, spp=spp, max_depth=max_depth, seed=0,
            # gradient path: unroll the bounce loop on TPU (integrator.py)
            unroll=jax.default_backend() == "tpu",
        )
        return jnp.sum(rad * rad)

    params = {"kd": scene.kd, "emission": scene.emission}
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    return grad_fn, params, scene, sky


def main():
    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    if on_accel:
        width = height = 1024
        spp, max_depth = 64, 8
    else:  # CPU smoke mode
        width = height = 64
        spp, max_depth = 2, 4

    grad_fn, params, scene, sky = build_bench(width, height, spp, max_depth)

    # compile + warmup
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, scene, sky)
    jax.block_until_ready((loss, grads))
    compile_s = time.perf_counter() - t0
    print(f"[bench] platform={platform} compile+first={compile_s:.1f}s", file=sys.stderr)

    iters = 3 if on_accel else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = grad_fn(params, scene, sky)
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters

    rays = width * height * spp * max_depth
    rays_per_sec = rays / dt
    print(
        f"[bench] {width}x{height}x{spp}spp depth={max_depth}: "
        f"{dt*1e3:.1f} ms/iter, {rays_per_sec/1e6:.1f} Mrays/s fwd+bwd, loss={float(loss):.4g}",
        file=sys.stderr,
    )
    result = {
        "metric": f"rays/s fwd+bwd {width}x{height}x{spp}spp d{max_depth} ({platform})",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS_PER_SEC,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
