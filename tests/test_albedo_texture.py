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


def test_mega_path_textured_matches_default(monkeypatch):
    # The megakernel + textured-albedo epilogue (integrator.py::
    # _mega_tex_radiance) must reproduce the wavefront path: forward
    # radiance AND texture/kd gradients.
    import jax
    from cpppathtracer_tpu.integrator import render_radiance

    tex = np.zeros((1, 8, 8, 3), np.float32)
    tex[0, ::2, ::2] = 0.9
    tex[0, 1::2, 1::2] = 0.9
    tex[0, :, :, 1] = 0.4
    tex = jnp.asarray(tex)
    pix_n = 64
    scene, cam = _setup(tex_id=0)
    monkeypatch.setenv("POCA_PALLAS", "1")
    monkeypatch.setenv("POCA_KVARIANT", "mxu")

    def loss(kd, tex_stack, use_mega):
        import dataclasses

        monkeypatch.setenv("POCA_MEGA", "1" if use_mega else "0")
        s = dataclasses.replace(scene, kd=kd)
        rad, n0, t0 = render_radiance(
            s, cam, SKY, spp=2, max_depth=3, seed=0, tex_stack=tex_stack
        )
        return jnp.sum(rad * rad), rad

    _, rad0 = loss(scene.kd, tex, False)
    _, rad1 = loss(scene.kd, tex, True)
    # the mega path's planar primary rays differ from the row-major path
    # by final-ulp direction rounding (Camera.ray_gen_planar), so a
    # grazing-tangency pixel may take a different (equally valid) bounce
    # chain; the rest must agree to float accumulation noise
    r0, r1 = np.asarray(rad0), np.asarray(rad1)
    close = np.abs(r1 - r0).max(axis=-1) <= 2e-5
    assert close.mean() > 0.95, close.mean()
    np.testing.assert_allclose(r1[close], r0[close], atol=2e-5)

    g_flat = jax.grad(lambda kd, ts: loss(kd, ts, False)[0], argnums=(0, 1))(
        scene.kd, tex
    )
    g_mega = jax.grad(lambda kd, ts: loss(kd, ts, True)[0], argnums=(0, 1))(
        scene.kd, tex
    )
    # aggregate agreement: the 500-radius dome makes |c|^2 - r^2 a
    # catastrophic cancellation, so the mega replay's FMA contractions
    # honestly diverge from the wavefront body on a few grazing rays at
    # depth 3 (~1-2% of the grad norm — the same class the demo-scene
    # aggregate test documents); direction and magnitude must agree.
    for a, b, name in zip(g_flat, g_mega, ("kd", "tex")):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, (name, cos)
        assert abs(np.linalg.norm(b) / (np.linalg.norm(a) + 1e-12) - 1) < 0.03, name
    assert float(jnp.abs(g_mega[1]).sum()) > 0  # texture grads flow
