"""BSDF shading vs the scalar oracle for all four material behaviors."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops import bsdf
from cpppathtracer_tpu.types import MaterialType

RNG = np.random.RandomState(5)


def _scene_one_of_each():
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.DIFFUSE, kd=(0.8, 0.4, 0.2), emission=0.5)
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.METAL, kd=(0.9, 0.9, 0.1), smoothness=2.5)
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.MIRROR, kd=(0.7, 0.7, 0.9),
                 smoothness=1.5, reflectivity=0.6)
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.GLASS, kd=(1.0, 1.0, 1.0),
                 smoothness=3.0, ior=1.5)
    return b.build()


def _rand_unit(n):
    v = RNG.normal(size=(n, 3)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_shade_matches_oracle_all_materials():
    scene = _scene_one_of_each()
    sc = ref.scene_to_np(scene)
    n_rays = 64
    for obj in range(4):
        normal = _rand_unit(n_rays)
        in_dir = _rand_unit(n_rays)
        u1 = RNG.uniform(0, 1, n_rays).astype(np.float32)
        u2 = RNG.uniform(0, 1, n_rays).astype(np.float32)
        u3 = RNG.uniform(0, 1, n_rays).astype(np.float32)
        mats = bsdf.gather_materials(scene, jnp.full(n_rays, obj, jnp.int32))
        wo, att, emit = bsdf.shade(
            mats, jnp.asarray(normal), jnp.asarray(in_dir),
            jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(u3),
        )
        wo, att, emit = np.asarray(wo), np.asarray(att), np.asarray(emit)
        for i in range(n_rays):
            wwo, watt, wemit = ref._shade(sc, obj, normal[i], in_dir[i], u1[i], u2[i], u3[i])
            np.testing.assert_allclose(wo[i], wwo, atol=2e-4, err_msg=f"obj {obj} ray {i} dir")
            np.testing.assert_allclose(att[i], watt, atol=1e-5, err_msg=f"obj {obj} ray {i} att")
            np.testing.assert_allclose(emit[i], wemit, atol=1e-6, err_msg=f"obj {obj} ray {i} emit")


def test_diffuse_cosine_sampling_stats():
    scene = _scene_one_of_each()
    n = 1 << 14
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    in_dir = jnp.tile(jnp.asarray([[0.0, 0.7071, -0.7071]], jnp.float32), (n, 1))
    from cpppathtracer_tpu.utils.rng import uniforms4

    u1, u2, u3, _ = uniforms4(0, jnp.arange(n), 0, 1)
    mats = bsdf.gather_materials(scene, jnp.zeros(n, jnp.int32))
    wo, att, _ = bsdf.shade(mats, normal, in_dir, u1, u2, u3)
    wo = np.asarray(wo)
    cos_t = wo[:, 2] / np.linalg.norm(wo, axis=-1)
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos_t.mean() - 2 / 3) < 0.01
    assert (cos_t > 0).all()


def test_glass_energy_not_attenuated_below_horizon():
    # GLASS keeps kd attenuation regardless of horizon (material.cu:140).
    scene = _scene_one_of_each()
    n = 256
    normal = _rand_unit(n)
    in_dir = _rand_unit(n)
    u = [jnp.asarray(RNG.uniform(0, 1, n).astype(np.float32)) for _ in range(3)]
    mats = bsdf.gather_materials(scene, jnp.full(n, 3, jnp.int32))
    _, att, _ = bsdf.shade(mats, jnp.asarray(normal), jnp.asarray(in_dir), *u)
    np.testing.assert_allclose(np.asarray(att), 1.0, atol=1e-6)


def test_mirror_reflectivity_mix():
    # With reflectivity=0 MIRROR must behave like DIFFUSE sampling.
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.MIRROR, kd=(0.5, 0.5, 0.5),
                 smoothness=2.0, reflectivity=0.0)
    scene = b.build()
    n = 4096
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    in_dir = jnp.tile(jnp.asarray([[0.7071, 0.0, -0.7071]], jnp.float32), (n, 1))
    from cpppathtracer_tpu.utils.rng import uniforms4

    u1, u2, u3, _ = uniforms4(1, jnp.arange(n), 0, 1)
    mats = bsdf.gather_materials(scene, jnp.zeros(n, jnp.int32))
    wo, _, _ = bsdf.shade(mats, normal, in_dir, u1, u2, u3)
    wo = np.asarray(wo)
    assert abs(wo[:, 2].mean() - 2 / 3) < 0.02  # cosine lobe around +z


def test_unknown_mat_type_dispatches_to_diffuse():
    # MaterialType::Test (and any unknown enum value) runs the diffuse
    # shader in the reference (`default:`, material.cu:160-161).
    from cpppathtracer_tpu.ops import planar

    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, mat_type=MaterialType.DIFFUSE,
                 kd=(0.8, 0.4, 0.2), emission=0.3)
    scene = b.build()
    n = 64
    normal = _rand_unit(n)
    in_dir = _rand_unit(n)
    u1 = RNG.uniform(0, 1, n).astype(np.float32)
    u2 = RNG.uniform(0, 1, n).astype(np.float32)
    u3 = RNG.uniform(0, 1, n).astype(np.float32)
    mats = bsdf.gather_materials(scene, jnp.zeros(n, jnp.int32))
    ref_out = bsdf.shade(mats, jnp.asarray(normal), jnp.asarray(in_dir),
                         jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(u3))
    for unknown in (MaterialType.TEST, 7):
        mats_u = dict(mats, mat_type=jnp.full(n, int(unknown), jnp.int32))
        got = bsdf.shade(mats_u, jnp.asarray(normal), jnp.asarray(in_dir),
                         jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(u3))
        for a, b_ in zip(ref_out, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # planar twin
        mats_p = {
            "mat_type": jnp.full(n, int(unknown), jnp.int32),
            "kd_p": planar.unstack_v3(mats["kd"]),
            "emission": mats["emission"],
            "smoothness": mats["smoothness"],
            "reflectivity": mats["reflectivity"],
            "ior": mats["ior"],
        }
        wo_p, att_p, em_p = planar.shade_p(
            mats_p, planar.unstack_v3(jnp.asarray(normal)),
            planar.unstack_v3(jnp.asarray(in_dir)),
            jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(u3),
        )
        np.testing.assert_allclose(
            np.asarray(planar.stack_v3(wo_p)), np.asarray(ref_out[0]), atol=1e-6)
        # scalar oracle
        sc = ref.scene_to_np(scene)
        sc["mat_type"] = np.full(1, int(unknown), np.int32)
        for i in range(8):
            wwo, watt, wemit = ref._shade(sc, 0, normal[i], in_dir[i], u1[i], u2[i], u3[i])
            np.testing.assert_allclose(np.asarray(ref_out[0])[i], wwo, atol=2e-4)
            np.testing.assert_allclose(np.asarray(ref_out[1])[i], watt, atol=1e-5)
