"""Pre-snapshot TPU lowering gate.

Round-3 postmortem: the CPU test suite pins JAX_PLATFORMS=cpu and runs
Pallas in interpret mode, so a Mosaic-only lowering failure (e.g. the
Precision.HIGH regression, ops/pallas/intersect_kernel.py) is invisible
to pytest and only surfaces when the driver runs bench.py on the real
chip — after the round is over.  This gate compiles (no full-size run)
every default TPU path at small-but-real shapes ON THE CURRENT BACKEND.

Run it with the TPU env (no JAX_PLATFORMS=cpu override) before the last
commit of every round:

    timeout 900 python scripts/tpu_smoke_gate.py

Exit 0 = all paths compile and execute one tiny step; nonzero = broken.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _grad_fn(scene, camera, sky):
    from cpppathtracer_tpu.integrator import render_radiance

    def loss_fn(params, scene, sky_tex):
        scene = scene.with_material_params(
            {**scene.material_params(), **params}
        )
        rad, _, _ = render_radiance(
            scene, camera, sky_tex, spp=2, max_depth=8, seed=0,
            unroll=jax.default_backend() == "tpu",
        )
        return jnp.sum(rad * rad)

    params = {"kd": scene.kd, "emission": scene.emission}
    return jax.jit(jax.value_and_grad(loss_fn)), params


def main() -> int:
    platform = jax.devices()[0].platform
    if platform == "cpu":
        print(
            "[gate] WARNING: running on CPU — Mosaic lowering is NOT "
            "exercised; run with the TPU env for a real gate",
            file=sys.stderr,
        )

    import numpy as np

    from cpppathtracer_tpu.models.camera import Camera
    from cpppathtracer_tpu.models.scene import SceneBuilder, demo_scene
    from cpppathtracer_tpu.ops.texture import procedural_sky

    camera = Camera.make(
        256, 256, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0)
    )
    sky = jnp.asarray(procedural_sky(64, 64))

    # (name, env overrides, scene builder)
    dense = demo_scene(seed=0).build()
    rng = np.random.RandomState(0)
    sb = SceneBuilder()
    sb.add_platform(0.0)
    for _ in range(255):
        c = rng.uniform(-200, 200, 3)
        sb.add_sphere((c[0], abs(c[1]) * 0.2 + 2.0, c[2]),
                      rng.uniform(1.0, 8.0))
    bvh = sb.build(bvh=True)  # force BVH tables (auto-attach is >=3072)
    paths = [
        ("mega (default TPU fwd+bwd)", {}, dense),
        ("winner-kernel (POCA_MEGA=0)", {"POCA_MEGA": "0"}, dense),
        ("bvh traversal kernel", {}, bvh),
    ]
    failures = []
    for name, env, scene in paths:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            t0 = time.perf_counter()
            fn, params = _grad_fn(scene, camera, sky)
            loss, grads = fn(params, scene, sky)
            jax.block_until_ready((loss, grads))
            ok_grads = all(
                bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads)
            )
            dt = time.perf_counter() - t0
            status = "ok" if ok_grads else "NON-FINITE GRADS"
            print(f"[gate] {name}: {status} ({dt:.1f}s)", file=sys.stderr)
            if not ok_grads:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — the gate's job is to report
            print(f"[gate] {name}: FAILED — {type(e).__name__}: {e}",
                  file=sys.stderr)
            failures.append(name)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    if failures:
        print(f"[gate] FAIL ({platform}): {failures}", file=sys.stderr)
        return 1
    print(f"[gate] PASS ({platform}): all default paths compile+run",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
