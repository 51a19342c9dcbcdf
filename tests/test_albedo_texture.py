"""Per-material albedo textures (Material::GetKd capability with real UVs)."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.integrator import render_sample
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky

SKY = jnp.asarray(procedural_sky(16, 16, seed=0))


def _setup(tex_id):
    b = SceneBuilder()
    # emissive dome so the one-bounce attenuation is directly observable
    b.add_sphere((0.0, 0.0, 0.0), 500.0, kd=(1.0, 1.0, 1.0), emission=1.0)
    b.add_platform(0.0, kd=(0.5, 0.5, 0.5), tex_id=tex_id)
    scene = b.build()
    # wide fov + high vantage so the footprint spans several checker cells
    # (platform UV scale is 0.01/unit -> an 8x8 texture cell is 12.5 units)
    cam = Camera.make(8, 8, origin=(0.0, 40.0, -1.0), look_at=(0.0, 0.0, 0.0),
                      lens_radius=0.0, view_fov=90.0)
    return scene, cam


def test_textured_albedo_changes_attenuation():
    # checkerboard texture: attenuation should differ from flat kd render
    tex = np.zeros((1, 8, 8, 3), np.float32)
    tex[0, ::2, ::2] = 1.0
    tex[0, 1::2, 1::2] = 1.0
    pix = jnp.arange(64, dtype=jnp.int32)

    scene_t, cam = _setup(tex_id=0)
    rad_tex, _, _ = render_sample(scene_t, cam, SKY, pix, 0, 0, 2,
                                  tex_stack=jnp.asarray(tex))
    scene_f, _ = _setup(tex_id=-1)
    rad_flat, _, _ = render_sample(scene_f, cam, SKY, pix, 0, 0, 2,
                                   tex_stack=jnp.asarray(tex))
    rad_tex = np.asarray(rad_tex)
    rad_flat = np.asarray(rad_flat)
    assert not np.allclose(rad_tex, rad_flat)
    # the 0/1 checker must spread radiance far beyond the flat-0.5 render
    # (bilinear filtering keeps the extremes off exactly 0/1)
    assert rad_tex.min() < 0.15
    assert rad_tex.max() > rad_flat.max()
    assert rad_tex.std() > 2.0 * rad_flat.std()


def test_no_texture_matches_baseline():
    # tex_stack present but no object uses it -> identical to no-stack path
    tex = np.random.RandomState(0).uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    pix = jnp.arange(64, dtype=jnp.int32)
    scene, cam = _setup(tex_id=-1)
    rad_with, _, _ = render_sample(scene, cam, SKY, pix, 0, 0, 3,
                                   tex_stack=jnp.asarray(tex))
    rad_none, _, _ = render_sample(scene, cam, SKY, pix, 0, 0, 3)
    np.testing.assert_array_equal(np.asarray(rad_with), np.asarray(rad_none))


def test_emission_uses_plain_kd():
    # the reference's emission term reads the raw kd_ field even for
    # textured materials (material.cu:36 uses kd_, not GetKd)
    tex = np.zeros((1, 4, 4, 3), np.float32)  # black texture
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 5.0), 2.0, kd=(0.5, 0.5, 0.5), emission=2.0, tex_id=0)
    scene = b.build()
    cam = Camera.make(4, 4, origin=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, 5.0),
                      lens_radius=0.0)
    pix = jnp.arange(16, dtype=jnp.int32)
    rad, _, _ = render_sample(scene, cam, SKY, pix, 0, 0, 1, tex_stack=jnp.asarray(tex))
    np.testing.assert_allclose(np.asarray(rad), 1.0, atol=1e-5)
