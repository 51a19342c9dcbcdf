"""Inverse rendering: optimize scene/material/sky parameters from target
images (BASELINE config 4 — absent in the reference, which contributes only
the forward semantics the differentiable integrator must match).

The training step is the differentiable render -> L2 loss -> grads ->
optimizer update, jittable and shardable over the pixel-tile mesh
(parameter gradients psum'd across tiles by shard_map's backward — see
parallel/render.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.parallel.render import global_pixel_grid, make_sharded_loss
from cpppathtracer_tpu.parallel.mesh import image_sharding


@dataclasses.dataclass
class InverseConfig:
    spp: int = 4
    max_depth: int = 4
    seed: int = 0
    learning_rate: float = 5e-2
    optimize_sky: bool = False
    # which material fields to optimize (subset of Scene.material_params())
    fields: tuple = ("kd", "emission", "smoothness", "reflectivity", "ior")
    # True: every step re-uses the target's sample set (deterministic
    # estimator, loss can reach ~0); False: fresh samples per step
    # (decorrelated MC noise, loss floors at the noise level).
    fixed_samples: bool = False


def _split_params(scene, cfg: InverseConfig):
    full = scene.material_params()
    return {k: full[k] for k in cfg.fields}


def render_for_loss(scene, camera, sky_tex, cfg: InverseConfig, sample_offset=0):
    import jax as _jax

    rad, _, _ = render_radiance(
        scene,
        camera,
        sky_tex,
        spp=cfg.spp,
        max_depth=cfg.max_depth,
        seed=cfg.seed,
        sample_offset=sample_offset,
        # gradient path: unroll the bounce loop on TPU (see integrator.py)
        unroll=_jax.default_backend() == "tpu",
    )
    return rad


def make_train_step(camera, cfg: InverseConfig, optimizer=None):
    """Single-device train step: (params, opt_state, scene, sky, target) ->
    (params, opt_state, loss).  `target` is f32[H*W, 3] flat radiance."""
    optimizer = optimizer or optax.adam(cfg.learning_rate)

    def loss_fn(params, scene, sky_tex, target, step):
        scene = scene.with_material_params({**scene.material_params(), **params["mat"]})
        sky = params.get("sky", sky_tex)
        offset = 0 if cfg.fixed_samples else step * cfg.spp
        rad = render_for_loss(scene, camera, sky, cfg, sample_offset=offset)
        return jnp.mean((rad - target) ** 2)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, scene, sky_tex, target, step):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, sky_tex, target, step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(scene, sky_tex):
        params: dict[str, Any] = {"mat": _split_params(scene, cfg)}
        if cfg.optimize_sky:
            params["sky"] = jnp.asarray(sky_tex)
        return params, optimizer.init(params)

    return init, train_step


def fit(scene, camera, sky_tex, target, cfg: InverseConfig, steps: int = 100,
        optimizer=None, callback=None):
    """Run the optimization loop. Returns (optimized_scene, losses)."""
    init, train_step = make_train_step(camera, cfg, optimizer)
    params, opt_state = init(scene, sky_tex)
    target = jnp.asarray(target).reshape(-1, 3)
    losses = []
    for step in range(steps):
        params, opt_state, loss = train_step(
            params, opt_state, scene, sky_tex, target, jnp.int32(step)
        )
        losses.append(float(loss))
        if callback is not None:
            callback(step, losses[-1], params)
    out_scene = scene.with_material_params(
        {**scene.material_params(), **params["mat"]}
    )
    return out_scene, losses


def make_sharded_train_step(mesh, camera, cfg: InverseConfig, optimizer=None):
    """Mesh-sharded train step (BASELINE config 4 at scale): pixel tiles
    shard over ("ty","tx"); material-parameter grads are psum'd by
    shard_map's backward; optimizer state + params stay replicated."""
    optimizer = optimizer or optax.adam(cfg.learning_rate)
    loss_fn = make_sharded_loss(mesh, cfg.spp, cfg.max_depth, cfg.seed)

    @jax.jit
    def train_step(params, opt_state, scene, sky_tex, pix, target):
        def wrapped(p):
            return loss_fn(p, scene, camera, sky_tex, pix, target)

        loss, grads = jax.value_and_grad(wrapped)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    def init(scene, target_image):
        params = _split_params(scene, cfg)
        opt_state = optimizer.init(params)
        pix = jax.device_put(global_pixel_grid(camera, mesh), image_sharding(mesh))
        hp, wp = pix.shape
        h, w = camera.height, camera.width
        tgt = jnp.zeros((hp, wp, 3), jnp.float32).at[:h, :w].set(
            jnp.asarray(target_image).reshape(h, w, 3)
        )
        tgt = jax.device_put(tgt, image_sharding(mesh))
        return params, opt_state, pix, tgt

    return init, train_step
