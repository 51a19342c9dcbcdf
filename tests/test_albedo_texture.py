"""Per-material albedo textures (Material::GetKd capability with real UVs)."""

import numpy as np
import pytest
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
        # spp1/depth2 keeps the interpret-mode compile short; bounce-0
        # textured attenuation still shapes bounce-1 radiance and the
        # texture gradient
        rad, n0, t0 = render_radiance(
            s, cam, SKY, spp=1, max_depth=2, seed=0, tex_stack=tex_stack
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

    g_flat = jax.jit(jax.grad(lambda kd, ts: loss(kd, ts, False)[0],
                              argnums=(0, 1)))(scene.kd, tex)
    g_mega = jax.jit(jax.grad(lambda kd, ts: loss(kd, ts, True)[0],
                              argnums=(0, 1)))(scene.kd, tex)
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


def test_replay_aux_att_carries_score_weight():
    # Unit-level pin of the estimator unification (round-3 verdict weak
    # #7): the backward replay's aux attenuation plane must carry the
    # score-function weight, so a loss read through aux att has a
    # nonzero reflectivity gradient (it was exactly zero before), while
    # the forward att value stays the exact 0/1 mask (w == 1.0).
    import jax
    import jax.numpy as jnp

    from cpppathtracer_tpu.models.camera import Camera
    from cpppathtracer_tpu.ops import fast, mega
    from cpppathtracer_tpu.types import MaterialType

    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 500.0, kd=(1.0, 1.0, 1.0), emission=1.0)
    b.add_platform(0.0, kd=(0.6, 0.6, 0.6), tex_id=0,
                   mat_type=MaterialType.MIRROR, smoothness=2.0,
                   reflectivity=0.4)
    scene = b.build()
    cam = Camera.make(8, 8, origin=(0.0, 40.0, -1.0),
                      look_at=(0.0, 0.0, 0.0), lens_radius=0.0,
                      view_fov=90.0)
    pix = jnp.arange(64, dtype=jnp.int32)
    gs0 = fast.group_scene(scene)

    # consistent, kernel-contract hit planes (grouped winner indices,
    # sign-encoded) built with the plain-XLA winner path: bounce 0 hits
    # the platform, bounce 1 the emissive dome
    from cpppathtracer_tpu.ops import planar as pl
    from cpppathtracer_tpu.types import Rays
    from cpppathtracer_tpu.utils import rng as prng

    tmin = jnp.zeros((64,), jnp.float32)
    tmax = jnp.full((64,), 1e30, jnp.float32)
    o, d = cam.ray_gen_planar(pix, 0, 0)
    hit_planes = []
    for bounce in range(2):
        rays = Rays(origin=jnp.stack(o, -1), dir=jnp.stack(d, -1),
                    tmin=tmin if bounce == 0 else tmin + 2e-5, tmax=tmax)
        t_w, i_w = fast._winner_grouped_T(gs0, rays)
        hitb = t_w < 1e29
        hit_planes.append(jnp.where(hitb, i_w, -1))
        hit, mats = fast.intersect_and_gather_planar(
            gs0, o, d, rays.tmin, tmax, use_pallas=False)
        u1, u2, u3, _ = prng.uniforms4(0, pix, 0, 1 + bounce)
        bounce_dir, _, _ = pl.shade_p(mats, hit["normal"], d, u1, u2, u3)
        o = pl.where_p(hit["hit"], hit["pos"], o)
        d = pl.where_p(hit["hit"], pl.normalize_p(bounce_dir), d)

    def loss(gs):
        outs = mega._replay_outputs(gs, cam, pix, 0, 0, hit_planes, 2,
                                    with_aux=True)
        aux = outs[7]
        return sum(jnp.sum(att) for _, att in aux)

    val, g = jax.value_and_grad(loss)(gs0)
    # forward att values stay the exact 0/1 mask (w == 1 bit-exactly)
    assert float(val) == int(val)
    refl_col = np.asarray(g.table_s)[:, 9]
    assert np.abs(refl_col).sum() > 1e-3, refl_col


@pytest.mark.slow
def test_mega_textured_reflectivity_grad_matches_default(monkeypatch):
    # Round-3 verdict weak #7: the mega textured-albedo epilogue used to
    # drop the score-function surrogate, silently degrading reflectivity /
    # Fresnel-IOR gradients to pathwise-only exactly when textures are on.
    # The surrogate weight now rides the aux attenuation plane
    # (ops/mega.py::_replay_outputs), so the estimator matches the
    # (FD-verified, test_grad.py) non-mega path on textured scenes too.
    import dataclasses

    import jax
    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.types import MaterialType

    tex = np.zeros((1, 8, 8, 3), np.float32)
    tex[0, ::2, ::2] = 0.9
    tex[0, 1::2, 1::2] = 0.9
    tex[0, :, :, 1] = 0.5
    tex = jnp.asarray(tex)
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 500.0, kd=(1.0, 1.0, 1.0), emission=1.0)
    b.add_platform(0.0, kd=(0.6, 0.6, 0.6), tex_id=0,
                   mat_type=MaterialType.MIRROR, smoothness=2.0,
                   reflectivity=0.4)
    scene = b.build()
    cam = Camera.make(8, 8, origin=(0.0, 40.0, -1.0), look_at=(0.0, 0.0, 0.0),
                      lens_radius=0.0, view_fov=90.0)
    monkeypatch.setenv("POCA_PALLAS", "1")
    monkeypatch.setenv("POCA_KVARIANT", "mxu")

    def loss(refl, use_mega):
        monkeypatch.setenv("POCA_MEGA", "1" if use_mega else "0")
        s = dataclasses.replace(scene, reflectivity=refl)
        # depth 2 / spp 1 keeps the interpret-mode compile tractable; the
        # bounce-0 Bernoulli choice already drives bounce-1 radiance, so
        # the score term is exercised
        rad, _, _ = render_radiance(
            s, cam, SKY, spp=1, max_depth=2, seed=0, tex_stack=tex
        )
        return jnp.sum(rad * rad)

    g_flat = np.asarray(jax.jit(jax.grad(lambda r: loss(r, False)))(scene.reflectivity))
    g_mega = np.asarray(jax.jit(jax.grad(lambda r: loss(r, True)))(scene.reflectivity))
    assert np.abs(g_mega).sum() > 1e-4  # the gradient exists on the mega path
    np.testing.assert_allclose(g_mega, g_flat, rtol=2e-2, atol=1e-5)
