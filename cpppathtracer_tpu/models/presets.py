"""First-class presets for the five BASELINE.json benchmark configs.

The reference hard-codes every setting (SURVEY.md §5, config row); here
each benchmark scenario is a named, constructible preset.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder, demo_scene
from cpppathtracer_tpu.types import MaterialType


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    width: int
    height: int
    spp: int
    max_depth: int
    scene_fn: object
    camera_fn: object

    def build(self):
        return self.scene_fn(), self.camera_fn()


def _cornell_scene():
    """Config 1: one diffuse sphere on a platform under the sky env map."""
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.95, 0.95, 0.95))
    b.add_sphere((0.0, 3.0, 0.0), 3.0, kd=(0.7, 0.3, 0.3))
    return b.build()


def _cornell_camera(w=256, h=256):
    return Camera.make(w, h, origin=(0.0, 6.0, -18.0), look_at=(0.0, 3.0, 0.0),
                       view_fov=40.0)


def _zoo_scene():
    """Config 2: diffuse+metal+mirror+glass spheres (all four BSDFs)."""
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    b.add_sphere((-7.5, 2.5, 0.0), 2.5, mat_type=MaterialType.DIFFUSE, kd=(0.8, 0.3, 0.2))
    b.add_sphere((-2.5, 2.5, 0.0), 2.5, mat_type=MaterialType.METAL, kd=(0.9, 0.8, 0.4),
                 smoothness=3.0)
    b.add_sphere((2.5, 2.5, 0.0), 2.5, mat_type=MaterialType.MIRROR, kd=(0.8, 0.8, 0.9),
                 smoothness=2.0, reflectivity=0.7)
    b.add_sphere((7.5, 2.5, 0.0), 2.5, mat_type=MaterialType.GLASS, kd=(1.0, 1.0, 1.0),
                 smoothness=4.0, ior=1.5)
    b.add_sphere((7.5, 2.5, 0.0), 0.01 - 2.5, mat_type=MaterialType.GLASS,
                 kd=(1.0, 1.0, 1.0), smoothness=4.0, ior=1.5)
    return b.build()


def _zoo_camera(w=512, h=512):
    return Camera.make(w, h, origin=(0.0, 6.0, -20.0), look_at=(0.0, 2.5, 0.0),
                       view_fov=45.0)


def _hundred_scene():
    """Config 3: ~100 spheres + cylinders (BVH / large-N intersection)."""
    rng = np.random.RandomState(42)
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    mats = []
    for _ in range(16):
        t = rng.randint(4)
        mats.append(
            dict(
                mat_type=MaterialType(t),
                kd=tuple(rng.uniform(0.2, 1.0, 3)) if t != MaterialType.GLASS else (1.0, 1.0, 1.0),
                smoothness=float(rng.uniform(0.5, 4.0)),
                reflectivity=float(rng.uniform(0.0, 0.8)),
                ior=float(rng.uniform(1.2, 2.2)),
            )
        )
    for i in range(100):
        m = mats[rng.randint(16)]
        x = float(rng.uniform(-120, 120))
        z = float(rng.uniform(-120, 120))
        if i % 2 == 0:
            r = float(rng.uniform(1.5, 8.0))
            b.add_sphere((x, r, z), r, **m)
        else:
            r = float(rng.uniform(1.5, 6.0))
            h = float(rng.uniform(3.0, 16.0))
            b.add_cylinder((x, h / 2, z), r, h, **m)
    return b.build()


def _hundred_camera(w=1024, h=1024):
    return Camera.make(w, h, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))


def big_scene(n: int = 1024, seed: int = 7, bvh: bool | None = None):
    """N-object stress scene for the BVH traversal kernel: a jittered
    grid of spheres/cylinders over a floor (the >=1000-object benchmark
    the round-2 verdict asked for; dense O(R*N) cannot survive here)."""
    rng = np.random.RandomState(seed)
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    side = int(np.ceil(np.sqrt(n)))
    pitch = 14.0
    ext = side * pitch / 2
    count = 0
    for gx in range(side):
        for gz in range(side):
            if count >= n - 1:
                break
            x = gx * pitch - ext + float(rng.uniform(-4, 4))
            z = gz * pitch - ext + float(rng.uniform(-4, 4))
            t = int(rng.randint(4))
            m = dict(
                mat_type=MaterialType(t),
                kd=(1.0, 1.0, 1.0) if t == MaterialType.GLASS
                else tuple(rng.uniform(0.2, 1.0, 3)),
                smoothness=float(rng.uniform(0.5, 4.0)),
                reflectivity=float(rng.uniform(0.0, 0.8)),
                ior=float(rng.uniform(1.2, 2.2)),
                emission=float(rng.uniform(0.0, 2.0)) if rng.uniform() < 0.05 else 0.0,
            )
            if count % 3 == 2:
                r = float(rng.uniform(1.0, 4.0))
                h = float(rng.uniform(3.0, 10.0))
                b.add_cylinder((x, h / 2, z), r, h, **m)
            else:
                r = float(rng.uniform(1.0, 5.0))
                b.add_sphere((x, r, z), r, **m)
            count += 1
    return b.build(bvh=bvh)


def big_camera(n: int = 1024, w=1024, h=1024):
    side = int(np.ceil(np.sqrt(n)))
    ext = side * 14.0 / 2
    return Camera.make(w, h, origin=(ext * 1.2, ext * 0.8, ext * 1.2),
                       look_at=(0.0, 0.0, 0.0), view_fov=50.0)


def _demo():
    return demo_scene(seed=0).build()


PRESETS = {
    "cornell": Preset("cornell", 256, 256, 4, 4, _cornell_scene, _cornell_camera),
    "material_zoo": Preset("material_zoo", 512, 512, 16, 8, _zoo_scene, _zoo_camera),
    "hundred_objects": Preset(
        "hundred_objects", 1024, 1024, 64, 8, _hundred_scene, _hundred_camera
    ),
    # config 4 (inverse rendering) re-uses hundred_objects' scene with 16
    # optimizable materials — see cpppathtracer_tpu/inverse.py and
    # scripts/run_inverse.py.
    "demo": Preset("demo", 1280, 720, 1, 8, _demo, lambda: Camera.make(
        1280, 720, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))),
    "thousand_objects": Preset(
        "thousand_objects", 1024, 1024, 16, 8, big_scene, big_camera
    ),
}
