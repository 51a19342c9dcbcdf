"""Core value types and constants.

Mirrors the *semantics* of the reference's plain structs
(`include/ray_tracing_common.h:11-40`): `Ray{origin, dir, tmin, tmax}` and
the tmin/tmax epsilons — re-designed as structure-of-arrays pytrees so a
whole wavefront of rays is one JAX value that vectorizes onto the TPU VPU.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

# Reference: include/ray_tracing_common.h:11-12
DEFAULT_RAY_TMAX = 1e30
BOUNCE_RAY_TMIN = 2e-5
# Reference: include/path_tracer.h:13
MAX_RECURSION_DEPTH_SET = 32


class PrimitiveType(enum.IntEnum):
    """Procedural primitive kinds (reference: include/object.h:7-15)."""

    SPHERE = 0
    PLATFORM = 1  # infinite plane perpendicular to y
    CYLINDER = 2  # y-axis-aligned capped cylinder


class MaterialType(enum.IntEnum):
    """BSDF kinds (reference: include/material.h:5-15).

    NOTE on naming: the reference's dispatch crosswires enum names and
    shader functions (`cuSrc/material.cu:147-163`): enum ``Metal`` runs the
    Phong-lobe glossy-reflection shader and enum ``Mirror`` runs the
    probabilistic reflect-or-diffuse shader.  The *behavior per enum value*
    is the spec we match:

      DIFFUSE -> cosine-weighted hemisphere
      METAL   -> Phong lobe (alpha = 1000**smoothness) around the mirror
                 reflection ("MirrorHitShader" in the reference)
      MIRROR  -> with prob `reflectivity` a Phong lobe around the
                 reflection, else a cosine hemisphere ("MetalHitShader")
      GLASS   -> Snell refraction + Schlick Fresnel + TIR fallback, with
                 Phong-lobe roughness perturbation
    """

    DIFFUSE = 0
    METAL = 1
    MIRROR = 2
    GLASS = 3
    # `Test` exists in the reference enum (include/material.h:13) with no
    # shader of its own: dispatch falls through to DiffuseHitShader
    # (cuSrc/material.cu:160-161).  All shade implementations here treat
    # ANY unknown mat_type as DIFFUSE to match.
    TEST = 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Rays:
    """A wavefront of rays, structure-of-arrays.

    origin: f32[..., 3]
    dir:    f32[..., 3]   (normalized by convention)
    tmin:   f32[...]
    tmax:   f32[...]
    """

    origin: jax.Array
    dir: jax.Array
    tmin: jax.Array
    tmax: jax.Array

    @staticmethod
    def make(origin, dir, tmin=None, tmax=None) -> "Rays":
        origin = jnp.asarray(origin, jnp.float32)
        dir = jnp.asarray(dir, jnp.float32)
        batch = origin.shape[:-1]
        if tmin is None:
            tmin = jnp.zeros(batch, jnp.float32)
        if tmax is None:
            tmax = jnp.full(batch, DEFAULT_RAY_TMAX, jnp.float32)
        return Rays(origin, dir, jnp.asarray(tmin, jnp.float32), jnp.asarray(tmax, jnp.float32))

    @property
    def batch_shape(self):
        return self.origin.shape[:-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Hit:
    """Intersection result for a wavefront (reference: IntersectionAttributes,
    include/ray_tracing_common.h:32-35, plus the hit object index).

    t:       f32[...]   hit distance (DEFAULT_RAY_TMAX where no hit)
    hit:     bool[...]  whether anything was hit
    pos:     f32[..., 3]
    normal:  f32[..., 3]
    obj_idx: i32[...]   index into the scene's object arrays (-1 on miss)
    """

    t: jax.Array
    hit: jax.Array
    pos: jax.Array
    normal: jax.Array
    obj_idx: jax.Array
