"""Sharded rendering and the distributed inverse-rendering train step.

`shard_map` over the ("ty", "tx") pixel-tile mesh: every device integrates
its own tile (scene/camera/sky replicated, RNG keyed by *global* pixel ids
so the sharded render is bitwise identical to the single-device one), and
the only collective in training is the automatic psum of replicated-input
cotangents in shard_map's backward — scene/material/sky gradients
all-reduced over ICI while each device's backward bounce scan runs on its
own tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.parallel.mesh import image_sharding, pad_to_tiles


def _tile_render(scene, camera, sky_tex, pixel_idx_tile, spp, max_depth, seed,
                 unroll=None):
    """Render one device's pixel tile. pixel_idx_tile: i32[th, tw] of GLOBAL
    flat pixel indices (or -1 padding)."""
    th, tw = pixel_idx_tile.shape
    flat = pixel_idx_tile.reshape(-1)
    safe = jnp.maximum(flat, 0)
    rad, n0, t0 = render_radiance(
        scene, camera, sky_tex, spp=spp, max_depth=max_depth, seed=seed,
        pixel_idx=safe, unroll=unroll,
    )
    return (
        rad.reshape(th, tw, 3),
        n0.reshape(th, tw, 3),
        t0.reshape(th, tw),
    )


def global_pixel_grid(camera, mesh):
    """Global flat pixel indices [Hp, Wp] padded to the mesh tiling; padded
    entries are -1 (rendered at pixel 0, cropped/ignored)."""
    h, w = camera.height, camera.width
    hp, wp = pad_to_tiles(h, w, mesh)
    y = jnp.arange(hp)[:, None]
    x = jnp.arange(wp)[None, :]
    idx = (y * w + x).astype(jnp.int32)
    valid = (y < h) & (x < w)
    return jnp.where(valid, idx, -1)


def render_image_sharded(scene, camera, sky_tex, mesh, *, spp, max_depth, seed=0):
    """Full-frame sharded render -> (radiance, normal, depth) as global
    arrays of the *unpadded* size (still device-sharded; `jax.device_get`
    gathers to host — the reference's single D2H copy, path_tracer.cu:303)."""
    pix = global_pixel_grid(camera, mesh)
    pix = jax.device_put(pix, image_sharding(mesh))

    fn = shard_map(
        functools.partial(_tile_render, spp=spp, max_depth=max_depth, seed=seed),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("ty", "tx")),
        out_specs=(P("ty", "tx"), P("ty", "tx"), P("ty", "tx")),
    )
    rad, n0, t0 = jax.jit(fn)(scene, camera, sky_tex, pix)
    h, w = camera.height, camera.width
    return rad[:h, :w], n0[:h, :w], t0[:h, :w]


def make_sharded_loss(mesh, spp: int, max_depth: int, seed: int = 0):
    """Build loss(params, scene, camera, sky_tex, target) for sharded
    inverse rendering.

    `params` is the differentiable material sub-pytree
    (`Scene.material_params()`); `target` is the f32[Hp, Wp, 3] goal image
    (already padded/sharded).  The L2 loss is computed per tile and psum'd;
    shard_map's backward psums the replicated params' gradients over the
    mesh (the "parameter-gradient all-reduce" of BASELINE config 4)."""

    def tile_loss(params, scene, camera, sky_tex, pix_tile, target_tile):
        scene = scene.with_material_params(params)
        # gradient path: unroll the bounce loop on TPU (see integrator.py)
        rad, _, _ = _tile_render(
            scene, camera, sky_tex, pix_tile, spp, max_depth, seed,
            unroll=jax.default_backend() == "tpu",
        )
        valid = (pix_tile >= 0).astype(jnp.float32)[..., None]
        err = (rad - target_tile) * valid
        local = jnp.sum(err * err)
        local_n = jnp.sum(valid) * 3.0
        total = jax.lax.psum(local, ("ty", "tx"))
        n = jax.lax.psum(local_n, ("ty", "tx"))
        return total / n

    smapped = shard_map(
        tile_loss,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("ty", "tx"), P("ty", "tx")),
        out_specs=P(),
    )

    def loss_fn(params, scene, camera, sky_tex, pix, target):
        return smapped(params, scene, camera, sky_tex, pix, target)

    return loss_fn
