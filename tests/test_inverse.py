"""Inverse rendering: the optimizer recovers a perturbed albedo; the
sharded train step agrees with the single-device one."""

import numpy as np
import jax
import jax.numpy as jnp

from cpppathtracer_tpu.inverse import (
    InverseConfig,
    fit,
    make_sharded_train_step,
    make_train_step,
)
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.parallel.mesh import make_tile_mesh

SKY = jnp.asarray(procedural_sky(32, 32, seed=4))


def _setup():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.8, 0.8, 0.8))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.7, 0.3, 0.2))
    scene = b.build()
    cam = Camera.make(16, 12, origin=(0.0, 4.0, -11.0), look_at=(0.0, 2.0, 0.0),
                      view_fov=40.0, lens_radius=0.0)
    return scene, cam


def test_albedo_recovery():
    import dataclasses

    scene_true, cam = _setup()
    cfg = InverseConfig(spp=2, max_depth=3, fields=("kd",), learning_rate=0.1,
                        fixed_samples=True)
    target, _, _ = __import__("cpppathtracer_tpu.integrator", fromlist=["render_radiance"]).render_radiance(
        scene_true, cam, SKY, spp=cfg.spp, max_depth=cfg.max_depth, seed=cfg.seed
    )
    # start from a wrong albedo on the sphere
    kd_wrong = np.asarray(scene_true.kd).copy()
    kd_wrong[1] = [0.3, 0.6, 0.6]
    scene0 = dataclasses.replace(scene_true, kd=jnp.asarray(kd_wrong))

    fitted, losses = fit(scene0, cam, SKY, np.asarray(target), cfg, steps=60)
    assert losses[-1] < losses[0] * 0.05, losses[::10]
    got = np.asarray(fitted.kd)[1]
    want = np.asarray(scene_true.kd)[1]
    np.testing.assert_allclose(got, want, atol=0.05)


def test_sharded_train_step_matches_single():
    import dataclasses

    scene, cam = _setup()
    cfg = InverseConfig(spp=1, max_depth=2, fields=("kd",), learning_rate=0.05)
    target = np.zeros((cam.height * cam.width, 3), np.float32)

    # single-device loss/grad
    from cpppathtracer_tpu.integrator import render_radiance

    def loss_single(kd):
        s = dataclasses.replace(scene, kd=kd)
        rad, _, _ = render_radiance(s, cam, SKY, spp=1, max_depth=2, seed=0)
        return jnp.mean((rad - target) ** 2)

    l1, g1 = jax.value_and_grad(loss_single)(scene.kd)

    mesh = make_tile_mesh(jax.devices()[:8])
    init, step = make_sharded_train_step(mesh, cam, cfg)
    params, opt_state, pix, tgt = init(scene, target)

    from cpppathtracer_tpu.parallel.render import make_sharded_loss

    loss_fn = make_sharded_loss(mesh, 1, 2, 0)
    # checkpointed scan bodies inside shard_map require jit around it
    l2, g2 = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(p, scene, cam, SKY, pix, tgt))
    )({"kd": scene.kd})
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2["kd"]), np.asarray(g1), rtol=1e-4, atol=1e-7)

    # one full optimizer step runs and is finite
    params2, opt_state2, loss = step(params, opt_state, scene, SKY, pix, tgt)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(params2["kd"])).all()
