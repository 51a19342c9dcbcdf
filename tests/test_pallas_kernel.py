"""Pallas fused winner-index kernel vs the XLA fast path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpppathtracer_tpu.models.scene import demo_scene, SceneBuilder
from cpppathtracer_tpu.ops import fast
from cpppathtracer_tpu.types import Rays

RNG = np.random.RandomState(21)


def _rays(n):
    o = RNG.uniform(-100, 100, (n, 3)).astype(np.float32)
    o[:, 1] = RNG.uniform(0.5, 60, n)
    d = RNG.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(o, d.astype(np.float32))


@pytest.mark.parametrize("scene_fn", [lambda: demo_scene(seed=0).build()])
def test_pallas_winner_matches_xla(scene_fn):
    scene = scene_fn()
    gs = fast.group_scene(scene)
    rays = _rays(512)
    _, gidx_x = fast._winner_grouped_T(gs, rays)
    gidx_p = fast.winner_index_pallas(gs, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(gidx_x), np.asarray(gidx_p))


def test_pallas_full_intersect_matches_xla():
    scene = demo_scene(seed=0).build()
    gs = fast.group_scene(scene)
    rays = _rays(512)
    hit_x, mats_x = fast.intersect_and_gather(gs, rays, use_pallas=False)
    hit_p, mats_p = fast.intersect_and_gather(gs, rays, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(hit_x.hit), np.asarray(hit_p.hit))
    m = np.asarray(hit_x.hit)
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[m], np.asarray(hit_x.t)[m], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(hit_x.obj_idx), np.asarray(hit_p.obj_idx)
    )
    np.testing.assert_allclose(
        np.asarray(hit_p.normal)[m], np.asarray(hit_x.normal)[m], atol=1e-6
    )
    for k in ("mat_type", "kd", "emission", "smoothness", "reflectivity", "ior", "tex_id"):
        np.testing.assert_allclose(
            np.asarray(mats_p[k]), np.asarray(mats_x[k]), atol=1e-6, err_msg=k
        )


def test_pallas_small_scene_types():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    b.add_sphere((0.0, 3.0, 0.0), 3.0)
    b.add_sphere((5.0, 2.0, 1.0), -2.0)  # negative-radius shell
    b.add_cylinder((-5.0, 2.0, 0.0), 1.5, 4.0)
    scene = b.build()
    gs = fast.group_scene(scene)
    rays = _rays(256)
    hit_x, _ = fast.intersect_and_gather(gs, rays, use_pallas=False)
    hit_p, _ = fast.intersect_and_gather(gs, rays, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(hit_x.hit), np.asarray(hit_p.hit))
    m = np.asarray(hit_x.hit)
    np.testing.assert_allclose(np.asarray(hit_p.t)[m], np.asarray(hit_x.t)[m], rtol=1e-6)


def test_integrator_with_pallas_matches_default(monkeypatch):
    # Controlled scene (no grazing near-ties): the kernel's elementwise
    # inner products and XLA's dot_general round differently at ulp
    # scale, which can flip self-hit ties on the dense demo scene (the
    # acne-flip population quantified in test_integrator's golden test);
    # here equality must be exact through all bounces.
    import cpppathtracer_tpu.integrator as integ
    from cpppathtracer_tpu.models.camera import Camera
    from cpppathtracer_tpu.ops.texture import procedural_sky
    from cpppathtracer_tpu.types import MaterialType

    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.8, 0.8, 0.8))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.7, 0.3, 0.2))
    b.add_sphere((4.5, 1.5, 1.0), 1.5, mat_type=MaterialType.METAL, smoothness=0.8)
    b.add_cylinder((-4.5, 1.5, 0.0), 1.2, 3.0, mat_type=MaterialType.GLASS, ior=1.5)
    scene = b.build()
    cam = Camera.make(16, 12, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(16, 16))
    pix = jnp.arange(16 * 12, dtype=jnp.int32)
    rad_default, n_d, t_d = integ.render_sample(scene, cam, sky, pix, 0, 0, 6)

    monkeypatch.setenv("POCA_PALLAS", "1")
    rad_pallas, n_p, t_p = integ.render_sample(scene, cam, sky, pix, 0, 0, 6)
    np.testing.assert_allclose(
        np.asarray(rad_pallas), np.asarray(rad_default), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_d))


def test_mxu_variant_matches_vpu_up_to_ties(monkeypatch):
    # The MXU kernel computes the quadratic b/c coefficients via a
    # dot_general and hoists per-ray reciprocals, so its fp rounding
    # differs in final ulps from the VPU form; winners may flip only
    # where the two candidate t's are (near-)ties or at tangency.
    scene = demo_scene(seed=0).build()
    gs = fast.group_scene(scene)
    rays = _rays(512)
    monkeypatch.setenv("POCA_KVARIANT", "vpu")
    g_vpu = np.asarray(fast.winner_index_pallas(gs, rays, interpret=True))
    monkeypatch.setenv("POCA_KVARIANT", "mxu")
    g_mxu = np.asarray(fast.winner_index_pallas(gs, rays, interpret=True))
    mismatch = g_vpu != g_mxu
    # the vast majority must agree outright
    assert mismatch.mean() < 0.02, mismatch.mean()
    if mismatch.any():
        h_v, _ = fast._gather_epilogue(gs, rays, jnp.asarray(g_vpu))
        h_m, _ = fast._gather_epilogue(gs, rays, jnp.asarray(g_mxu))
        tv = np.asarray(h_v.t)[mismatch]
        tm = np.asarray(h_m.t)[mismatch]
        np.testing.assert_allclose(tm, tv, rtol=1e-3, atol=1e-3)
