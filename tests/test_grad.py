"""Differentiability: material/emission/sky gradients vs finite differences
(BASELINE: gradients within 1e-4 of the reference integrator; here FD on
the very same deterministic estimator is the gold standard)."""

import numpy as np
import jax
import jax.numpy as jnp

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.types import MaterialType

SKY = jnp.asarray(procedural_sky(32, 32, seed=2))


def _scene():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.8, 0.8, 0.8))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.6, 0.3, 0.2), emission=0.3)
    b.add_sphere((3.5, 1.0, -1.0), 1.0, mat_type=MaterialType.GLASS, ior=1.5,
                 smoothness=4.0)
    return b.build()


def _cam():
    return Camera.make(12, 10, origin=(0.0, 4.0, -11.0), look_at=(0.0, 2.0, 0.0),
                       view_fov=40.0)


@jax.jit
def _loss(scene, sky):
    # jit'd: eager op-by-op execution rounds knife-edge hit decisions
    # differently than the compiled program, so an FD probe evaluated
    # eagerly can see a different branch realization of a grazing ray
    # than the traced gradient does — jit keeps FD and AD consistent.
    rad, _, _ = render_radiance(scene, _cam(), sky, spp=2, max_depth=3, seed=5)
    return jnp.sum(rad * jnp.asarray([0.3, 0.5, 0.2]))  # arbitrary projection


def _fd_check(get_loss, set_eps, grad_val, eps, tol):
    lp = float(get_loss(set_eps(+eps)))
    lm = float(get_loss(set_eps(-eps)))
    fd = (lp - lm) / (2 * eps)
    assert abs(fd - grad_val) <= tol * max(1.0, abs(fd)), (fd, grad_val)


def test_albedo_gradient_matches_fd():
    scene = _scene()

    def loss_of_kd(kd):
        import dataclasses

        return _loss(dataclasses.replace(scene, kd=kd), SKY)

    g = jax.grad(loss_of_kd)(scene.kd)
    kd0 = np.asarray(scene.kd)
    for obj, ch in [(0, 0), (1, 1), (1, 2)]:
        eps = 1e-3

        def set_eps(e, obj=obj, ch=ch):
            kd = kd0.copy()
            kd[obj, ch] += e
            return jnp.asarray(kd)

        _fd_check(loss_of_kd, set_eps, float(g[obj, ch]), eps, 1e-2)


def test_emission_gradient_matches_fd():
    scene = _scene()

    def loss_of_emit(emission):
        import dataclasses

        return _loss(dataclasses.replace(scene, emission=emission), SKY)

    g = jax.grad(loss_of_emit)(scene.emission)
    e0 = np.asarray(scene.emission)
    eps = 1e-3

    def set_eps(e):
        em = e0.copy()
        em[1] += e
        return jnp.asarray(em)

    _fd_check(loss_of_emit, set_eps, float(g[1]), eps, 1e-2)


def test_sky_gradient_matches_fd():
    scene = _scene()

    def loss_of_sky(sky):
        return _loss(scene, sky)

    g = jax.grad(loss_of_sky)(SKY)
    g = np.asarray(g)
    # pick the strongest-gradient texel for a well-conditioned FD probe
    flat = np.abs(g).sum(-1)
    iy, ix = np.unravel_index(np.argmax(flat), flat.shape)
    ch = int(np.argmax(np.abs(g[iy, ix])))
    sky0 = np.asarray(SKY)
    eps = 1e-2

    def set_eps(e):
        s = sky0.copy()
        s[iy, ix, ch] += e
        return jnp.asarray(s)

    _fd_check(loss_of_sky, set_eps, float(g[iy, ix, ch]), eps, 1e-2)


def test_ior_gradient_finite():
    scene = _scene()

    def loss_of_ior(ior):
        import dataclasses

        return _loss(dataclasses.replace(scene, ior=ior), SKY)

    g = jax.grad(loss_of_ior)(scene.ior)
    assert np.all(np.isfinite(np.asarray(g)))


def test_smoothness_gradient_finite():
    scene = _scene()

    def loss_of_s(s):
        import dataclasses

        return _loss(dataclasses.replace(scene, smoothness=s), SKY)

    g = jax.grad(loss_of_s)(scene.smoothness)
    assert np.all(np.isfinite(np.asarray(g)))


def test_camera_gradient_finite():
    scene = _scene()
    cam = _cam()

    def loss_of_origin(origin):
        c = cam.replace(origin=origin)
        rad, _, _ = render_radiance(scene, c, SKY, spp=1, max_depth=2, seed=0)
        return jnp.sum(rad)

    g = jax.grad(loss_of_origin)(cam.origin)
    assert np.all(np.isfinite(np.asarray(g)))


# ----------------------------------------------------------------------------
# Exact analytic gradients (acne-free constructions; 1e-4-tight)
# ----------------------------------------------------------------------------

def test_emission_gradient_analytic_depth1():
    # Camera inside a giant emissive sphere: every primary ray hits it and
    # radiance = emission * kd exactly at depth 1.
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 100.0, kd=(0.5, 0.25, 0.75), emission=1.3)
    scene = b.build()
    cam = Camera.make(6, 6, origin=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, 1.0),
                      lens_radius=0.0)

    def loss(emission):
        import dataclasses

        rad, _, _ = render_radiance(
            dataclasses.replace(scene, emission=emission), cam, SKY,
            spp=1, max_depth=1, seed=0,
        )
        return jnp.sum(rad)

    g = jax.grad(loss)(scene.emission)
    # dL/demission = n_pixels * sum(kd)
    want = 36 * (0.5 + 0.25 + 0.75)
    np.testing.assert_allclose(float(g[0]), want, rtol=1e-5)


def test_kd_gradient_analytic_depth1():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 100.0, kd=(0.5, 0.25, 0.75), emission=2.0)
    scene = b.build()
    cam = Camera.make(4, 4, origin=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, 1.0),
                      lens_radius=0.0)

    def loss(kd):
        import dataclasses

        rad, _, _ = render_radiance(
            dataclasses.replace(scene, kd=kd), cam, SKY, spp=1, max_depth=1, seed=0
        )
        return jnp.sum(rad)

    g = jax.grad(loss)(scene.kd)
    # radiance = emission * kd per channel -> dL/dkd[ch] = n_pix * emission
    np.testing.assert_allclose(np.asarray(g[0]), [32.0, 32.0, 32.0], rtol=1e-5)


def test_two_bounce_product_gradient_analytic():
    # Diffuse floor (emission 0) under an enclosing emissive dome:
    # every path is floor -> dome, radiance = kd_floor * emit * kd_dome.
    # No grazing hits, no sky, no branch thresholds -> exact product rule.
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.6, 0.6, 0.6))
    b.add_sphere((0.0, 0.0, 0.0), 1000.0, kd=(1.0, 1.0, 1.0), emission=1.0)
    scene = b.build()
    cam = Camera.make(5, 5, origin=(0.0, 8.0, -8.0), look_at=(0.0, 0.0, 4.0),
                      lens_radius=0.0, view_fov=25.0)

    def loss(kd):
        import dataclasses

        rad, _, _ = render_radiance(
            dataclasses.replace(scene, kd=kd), cam, SKY, spp=1, max_depth=2, seed=3
        )
        return jnp.sum(rad[:, 0])

    g = jax.grad(loss)(scene.kd)
    # every pixel: rad_r = kd_floor_r * 1.0 (above-horizon cosine sample
    # always hits the dome; attenuation kd selects apply) plus the dome's
    # own emission at bounce 2 is weighted by kd_floor too... restrict to
    # the direct term by checking against the loss value itself:
    # L = sum_p kd_floor_r * c_p  with c_p independent of kd_floor_r
    # -> dL/dkd_floor_r = L / kd_floor_r.
    lval = float(loss(scene.kd))
    np.testing.assert_allclose(float(g[0, 0]), lval / 0.6, rtol=1e-4)


# ----------------------------------------------------------------------------
# Score-function (REINFORCE) gradients for the detached Bernoulli branches
# (reflectivity; the Fresnel-probability part of IOR) + pathwise FD checks
# for smoothness — all against FD on the EXPECTED loss (many samples).
# ----------------------------------------------------------------------------

from cpppathtracer_tpu.ops import bsdf as _bsdf
from cpppathtracer_tpu.utils.rng import uniforms4 as _u4

_N_SCORE = 1 << 17


def _shade_setup(n=_N_SCORE):
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    in_dir = jnp.tile(
        jnp.asarray([[0.7071, 0.0, -0.7071]], jnp.float32), (n, 1)
    )
    u1, u2, u3, _ = _u4(9, jnp.arange(n), 0, 1)
    return normal, in_dir, u1, u2, u3


def _mats(n, mat_type, **kw):
    base = dict(
        kd=jnp.tile(jnp.asarray([[0.8, 0.6, 0.4]], jnp.float32), (n, 1)),
        emission=jnp.zeros((n,), jnp.float32),
        smoothness=jnp.full((n,), 2.0, jnp.float32),
        reflectivity=jnp.full((n,), 0.4, jnp.float32),
        ior=jnp.full((n,), 1.5, jnp.float32),
        mat_type=jnp.full((n,), int(mat_type), jnp.int32),
    )
    base.update({k: jnp.full((n,), v, jnp.float32) for k, v in kw.items()})
    return base


def _expected_loss(mat_type, field):
    normal, in_dir, u1, u2, u3 = _shade_setup()
    n = u1.shape[0]

    @jax.jit
    def loss(val):
        mats = _mats(n, mat_type)
        mats[field] = jnp.full((n,), val, jnp.float32)
        wo, att, _ = _bsdf.shade(mats, normal, in_dir, u1, u2, u3)
        # smooth functional of the bounce direction; att carries the
        # score surrogate weight
        h = jax.nn.sigmoid(3.0 * wo[:, 2] / jnp.linalg.norm(wo, axis=-1))
        return jnp.mean(att[:, 0] * h)

    return loss


def test_reflectivity_score_gradient_matches_fd():
    loss = _expected_loss(MaterialType.MIRROR, "reflectivity")
    r0 = 0.4
    g = float(jax.grad(loss)(jnp.float32(r0)))
    eps = 0.05
    fd = (float(loss(jnp.float32(r0 + eps))) - float(loss(jnp.float32(r0 - eps)))) / (2 * eps)
    assert abs(g) > 1e-4  # the gradient exists at all now
    assert abs(fd - g) <= 0.15 * max(abs(fd), abs(g)), (fd, g)


def test_ior_gradient_matches_fd_expected_loss():
    # AD = pathwise (refraction direction + Schlick) + score term for the
    # reflect-vs-refract choice; FD on the expected loss sees the total.
    loss = _expected_loss(MaterialType.GLASS, "ior")
    v0 = 1.5
    g = float(jax.grad(loss)(jnp.float32(v0)))
    eps = 0.02
    fd = (float(loss(jnp.float32(v0 + eps))) - float(loss(jnp.float32(v0 - eps)))) / (2 * eps)
    assert abs(fd - g) <= 0.15 * max(1e-3, abs(fd), abs(g)), (fd, g)


def test_smoothness_gradient_matches_fd_expected_loss():
    # smoothness is purely pathwise (lobe exponent reparameterization)
    loss = _expected_loss(MaterialType.METAL, "smoothness")
    v0 = 2.0
    g = float(jax.grad(loss)(jnp.float32(v0)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(v0 + eps))) - float(loss(jnp.float32(v0 - eps)))) / (2 * eps)
    assert abs(fd - g) <= 0.05 * max(1e-3, abs(fd), abs(g)), (fd, g)


def test_reflectivity_gradient_flows_in_integrator():
    # End-to-end: grad wrt reflectivity through the full render is finite
    # and nonzero for a scene whose MIRROR sphere is visible.
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.8, 0.8, 0.8))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, mat_type=MaterialType.MIRROR,
                 kd=(0.9, 0.9, 0.9), smoothness=2.0, reflectivity=0.5)
    scene = b.build()
    cam = Camera.make(8, 8, origin=(0.0, 4.0, -10.0), look_at=(0.0, 2.0, 0.0))

    def loss(refl):
        import dataclasses

        rad, _, _ = render_radiance(
            dataclasses.replace(scene, reflectivity=refl), cam, SKY,
            spp=4, max_depth=3, seed=2,
        )
        return jnp.sum(rad)

    g = np.asarray(jax.grad(loss)(scene.reflectivity))
    assert np.all(np.isfinite(g))
    assert abs(g[1]) > 0.0
