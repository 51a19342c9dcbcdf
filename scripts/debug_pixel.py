"""Diagnose oracle-vs-JAX pixel mismatches on the Cornell test scene."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.integrator import render_sample
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.types import MaterialType

SKY = procedural_sky(64, 64, seed=3)


def cornell_scene():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.95, 0.95, 0.95))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, mat_type=MaterialType.DIFFUSE, kd=(0.7, 0.3, 0.3))
    return b.build()


scene = cornell_scene()
cam = Camera.make(24, 18, origin=(0.0, 4.0, -12.0), look_at=(0.0, 2.0, 0.0), view_fov=40.0)
spp, max_depth, seed = 2, 4, 1

sc = ref.scene_to_np(scene)
cam_np = ref.camera_to_np(cam)
n_pix = cam.width * cam.height
pix = jnp.arange(n_pix, dtype=jnp.int32)

for s in range(spp):
    got, _, _ = render_sample(scene, cam, jnp.asarray(SKY), pix, s, seed, max_depth)
    got = np.asarray(got)
    for p in range(n_pix):
        want, _, _ = ref.render_pixel(sc, cam_np, SKY, p, s, seed, max_depth)
        err = np.abs(got[p] - want).max()
        if err > 1e-4:
            x, y = p % cam.width, p // cam.width
            print(f"sample {s} pixel {p} ({x},{y}): jax={got[p]} oracle={want} err={err:.3e}")
            # trace the oracle path
            o, d = ref._ray_gen(cam_np, p, np.uint32(s), np.uint32(seed))
            tmin, tmax = np.float32(0.0), np.float32(1e30)
            for b in range(max_depth):
                res = ref.intersect_scene_np(sc, o, d, tmin, tmax)
                if res is None:
                    print(f"  bounce {b}: MISS dir={d}")
                    break
                t, nrm, i = res
                print(f"  bounce {b}: hit obj {i} t={t:.6f} n={nrm} o={o} d={d}")
                u1, u2, u3, _ = ref.uniforms4_np(np.uint32(seed), np.uint32(p), np.uint32(s), np.uint32(1 + b))
                wo, att, em = ref._shade(sc, i, nrm, d, u1, u2, u3)
                o = (o + np.float32(t) * d).astype(np.float32)
                d = ref._normalize(wo)
                tmin, tmax = np.float32(2e-5), np.float32(1e30)
