"""Surface UV parameterization for per-material albedo textures.

The reference unions each material's kd with a `cudaTextureObject_t`
(`include/material.h:21-25`) and fetches `GetKd(x, y)` in every hit shader
(`cuSrc/material.cu:11-18`) — but never plumbs hit UVs: `Object::ClosetHit`
calls `EvalAttenuationAndCreateRay` without the (x, y) arguments
(`cuSrc/object.cu:130-132`), so they default to (0, 0) and a textured
material samples one texel forever.  We keep the capability and fix the
plumbing: each primitive gets the natural parameterization below
(documented divergence — the reference's shipped scenes never set
`have_tex_` so no behavior it exercises changes).

  sphere    u = atan2(p.z - c.z, p.x - c.x)/(2 pi) + 0.5 ;
            v = asin(clamp((p.y - c.y)/r)) / pi + 0.5
  platform  u = p.x * 0.01 ; v = p.z * 0.01   (world-grid tiling)
  cylinder  u = atan2(z, x)/(2 pi) + 0.5 ; v = (p.y - y_bot)/height
"""

from __future__ import annotations

import jax.numpy as jnp

from cpppathtracer_tpu.types import PrimitiveType


def surface_uv_p(prim_type, center, radius, y_pos, height, pos):
    """Planar-layout twin of :func:`surface_uv` (identical formulas).

    center/pos are planar vec3 tuples of f32[R]; returns (u, v) f32[R].
    """
    cx, cy, cz = center
    px, py, pz = pos
    relx, rely, relz = px - cx, py - cy, pz - cz
    # sphere
    su = jnp.arctan2(relz, relx) / (2.0 * jnp.pi) + 0.5
    safe_r = jnp.where(radius == 0.0, 1.0, radius)
    sv = jnp.arcsin(jnp.clip(rely / safe_r, -1.0, 1.0)) / jnp.pi + 0.5
    # platform
    pu = px * 0.01
    pv = pz * 0.01
    # cylinder
    cu = jnp.arctan2(relz, relx) / (2.0 * jnp.pi) + 0.5
    safe_h = jnp.where(height == 0.0, 1.0, height)
    cv = (py - (cy - height / 2.0)) / safe_h

    is_sph = prim_type == PrimitiveType.SPHERE
    is_pla = prim_type == PrimitiveType.PLATFORM
    u = jnp.where(is_sph, su, jnp.where(is_pla, pu, cu))
    v = jnp.where(is_sph, sv, jnp.where(is_pla, pv, cv))
    return u, v


def surface_uv(prim_type, center, radius, y_pos, height, pos):
    """Per-ray hit UVs. All args gathered per-ray ([R] / [R,3])."""
    rel = pos - center
    # sphere
    su = jnp.arctan2(rel[..., 2], rel[..., 0]) / (2.0 * jnp.pi) + 0.5
    safe_r = jnp.where(radius == 0.0, 1.0, radius)
    sv = jnp.arcsin(jnp.clip(rel[..., 1] / safe_r, -1.0, 1.0)) / jnp.pi + 0.5
    # platform
    pu = pos[..., 0] * 0.01
    pv = pos[..., 2] * 0.01
    # cylinder
    cu = jnp.arctan2(rel[..., 2], rel[..., 0]) / (2.0 * jnp.pi) + 0.5
    safe_h = jnp.where(height == 0.0, 1.0, height)
    cv = (pos[..., 1] - (center[..., 1] - height / 2.0)) / safe_h

    is_sph = prim_type == PrimitiveType.SPHERE
    is_pla = prim_type == PrimitiveType.PLATFORM
    u = jnp.where(is_sph, su, jnp.where(is_pla, pu, cu))
    v = jnp.where(is_sph, sv, jnp.where(is_pla, pv, cv))
    return u, v
