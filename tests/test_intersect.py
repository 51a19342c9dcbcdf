"""Dense vectorized intersection vs the scalar oracle, all primitive types,
including the negative-radius inverted-normal shells."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.intersect import intersect
from cpppathtracer_tpu.types import MaterialType, Rays

RNG = np.random.RandomState(7)


def _random_scene(seed=0, n_sph=6, n_cyl=4, platform=True, neg_shell=True):
    rng = np.random.RandomState(seed)
    b = SceneBuilder()
    if platform:
        b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    for _ in range(n_sph):
        c = rng.uniform(-20, 20, 3)
        c[1] = rng.uniform(1, 15)
        b.add_sphere(c, rng.uniform(1, 6), kd=tuple(rng.uniform(0, 1, 3)))
    if neg_shell:
        c = rng.uniform(-10, 10, 3)
        c[1] = 5.0
        r = 4.0
        b.add_sphere(c, r, mat_type=MaterialType.GLASS)
        b.add_sphere(c, 0.01 - r, mat_type=MaterialType.GLASS)
    for _ in range(n_cyl):
        c = rng.uniform(-20, 20, 3)
        h = rng.uniform(2, 10)
        c[1] = h / 2
        b.add_cylinder(c, rng.uniform(1, 5), h, kd=tuple(rng.uniform(0, 1, 3)))
    return b.build()


def _random_rays(n, seed=1):
    rng = np.random.RandomState(seed)
    origin = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    origin[:, 1] = rng.uniform(0.5, 30, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return origin, d.astype(np.float32)


def _compare(scene, origin, direction, tmin=0.0):
    n = origin.shape[0]
    rays = Rays.make(origin, direction, tmin=np.full(n, tmin, np.float32))
    hit = intersect(scene, rays)
    g_hit = np.asarray(hit.hit)
    g_t = np.asarray(hit.t)
    g_n = np.asarray(hit.normal)
    g_obj = np.asarray(hit.obj_idx)
    sc = ref.scene_to_np(scene)
    n_mismatch = 0
    for i in range(n):
        res = ref.intersect_scene_np(sc, origin[i], direction[i], np.float32(tmin), np.float32(1e30))
        if res is None:
            assert not g_hit[i], f"ray {i}: jax hit, oracle miss"
        else:
            t, normal, obj = res
            assert g_hit[i], f"ray {i}: jax miss, oracle hit t={t}"
            if int(g_obj[i]) != obj:
                # distinct objects can legitimately tie within fp noise
                assert abs(float(g_t[i]) - t) < 1e-3 * max(1.0, abs(t))
                n_mismatch += 1
                continue
            np.testing.assert_allclose(float(g_t[i]), t, rtol=2e-5, atol=1e-4)
            np.testing.assert_allclose(g_n[i], normal, rtol=1e-4, atol=1e-4)
    assert n_mismatch <= n // 50


def test_sphere_platform_cylinder_scene():
    scene = _random_scene(0)
    origin, direction = _random_rays(512)
    _compare(scene, origin, direction)


def test_bounce_tmin_window():
    scene = _random_scene(3)
    origin, direction = _random_rays(256, seed=9)
    _compare(scene, origin, direction, tmin=2e-5)


def test_negative_radius_sphere_normal_inverted():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), -2.0)
    scene = b.build()
    # ray from outside: hits the (inverted) sphere surface
    rays = Rays.make(np.array([[0.0, 0.0, -10.0]]), np.array([[0.0, 0.0, 1.0]]))
    hit = intersect(scene, rays)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 8.0, atol=1e-4)
    # near-root normal is (p-c)/r with r negative -> points INTO the sphere
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)


def test_sphere_inside_far_root():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 2.0)
    scene = b.build()
    rays = Rays.make(np.array([[0.0, 0.0, 0.0]]), np.array([[0.0, 0.0, 1.0]]))
    hit = intersect(scene, rays)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)
    # far root: normal = normalize(p - c), pointing outward
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)


def test_platform_normal_faces_ray():
    b = SceneBuilder()
    b.add_platform(0.0)
    scene = b.build()
    rays = Rays.make(
        np.array([[0.0, 5.0, 0.0], [0.0, -5.0, 0.0]]),
        np.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]]),
    )
    hit = intersect(scene, rays)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit.normal[1]), [0, -1, 0], atol=1e-6)


def test_cylinder_cap_and_lateral():
    b = SceneBuilder()
    b.add_cylinder((0.0, 2.0, 0.0), 1.0, 4.0)  # y in [0, 4]
    scene = b.build()
    rays = Rays.make(
        np.array([[0.0, 10.0, 0.0], [-5.0, 2.0, 0.0]]),
        np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0]]),
    )
    hit = intersect(scene, rays)
    # top cap at y=4 -> t=6, flat normal (0,1,0)
    np.testing.assert_allclose(float(hit.t[0]), 6.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 1, 0], atol=1e-6)
    # lateral at x=-1 -> t=4, radial normal (-1,0,0)
    np.testing.assert_allclose(float(hit.t[1]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[1]), [-1, 0, 0], atol=1e-5)


def test_miss_everything():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0)
    scene = b.build()
    rays = Rays.make(np.array([[0.0, 5.0, 0.0]]), np.array([[0.0, 1.0, 0.0]]))
    hit = intersect(scene, rays)
    assert not bool(hit.hit[0])
    assert int(hit.obj_idx[0]) == -1
