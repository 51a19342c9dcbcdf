"""BSDF sampling + shading, branchless over the material table.

Reference behavior per MaterialType (`cuSrc/material.cu:20-163`; see the
enum/shader crosswire note in `types.MaterialType`):

  DIFFUSE  cosine-weighted hemisphere around the normal
           (z = u1**(1/2)); attenuation kd above the horizon else 0.
  METAL    Phong lobe, alpha = 1000**smoothness, around the mirror
           reflection; attenuation kd above the horizon else 0.
  MIRROR   with prob `reflectivity` the METAL lobe, else the DIFFUSE
           lobe; attenuation kd above the horizon else 0.
  GLASS    Snell refraction vs Schlick Fresnel reflection (TIR -> always
           reflect), the chosen direction perturbed by the Phong lobe;
           attenuation kd ALWAYS (no horizon check, material.cu:140).

Every shader also emits `radiance = emit_intensity * kd` and all four
share the same local-lobe construction — the TPU design exploits this:
ONE `phong_lobe_local` + ONE `to_world` with per-lane (alpha, base-axis)
selects covers all materials with zero divergence.

Gradient estimator: reparameterized with detached discrete decisions.
Continuous parameter paths (kd, emission, smoothness via the lobe
exponent, IOR via the refracted direction and Fresnel) stay in the
autodiff graph; the Bernoulli branch choices (reflect-vs-diffuse,
reflect-vs-refract) compare against `stop_gradient`ed probabilities, so
albedo/emission/sky gradients are exact and roughness/IOR gradients are
the standard detached-sampling estimates.  The detached Bernoulli
decisions additionally carry a score-function (REINFORCE) surrogate
(:func:`_score_weight`) so `reflectivity` — and the Fresnel-probability
component of the IOR gradient — get unbiased likelihood-ratio gradients
with bit-identical forward values (disable with ``score_grad=False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpppathtracer_tpu.ops import mathx
from cpppathtracer_tpu.types import MaterialType


def shade(mat, normal, in_dir, u1, u2, u3, kd_override=None, score_grad=True):
    """Sample the bounce for a wavefront of hits.

    Args:
      mat: dict of per-ray gathered material params — mat_type i32[R],
        kd f32[R,3], emission f32[R], smoothness f32[R], reflectivity
        f32[R], ior f32[R].
      normal: f32[R,3] geometric normal at the hit.
      in_dir: f32[R,3] incoming ray direction (normalized).
      u1, u2, u3: f32[R] stateless uniforms for this bounce.
      kd_override: optional f32[R,3] replacing kd for the ATTENUATION only
        (the textured-albedo path, `Material::GetKd`, material.cu:11-18 —
        the reference's emission term reads the raw kd_ field).

    Returns:
      bounce_dir f32[R,3] (unnormalized — the integrator normalizes, like
      `path_tracer.cu:166`), attenuation f32[R,3], emitted f32[R,3].
    """
    mat_type = mat["mat_type"]
    kd = mat["kd"]
    smoothness = mat["smoothness"]
    reflectivity = mat["reflectivity"]
    ior = mat["ior"]

    is_metal = mat_type == MaterialType.METAL
    is_mirror = mat_type == MaterialType.MIRROR
    is_glass = mat_type == MaterialType.GLASS
    # Unknown types (incl. MaterialType::Test) dispatch to the diffuse
    # shader, matching the reference's `default:` case (material.cu:160-161).
    is_diffuse = ~(is_metal | is_mirror | is_glass)

    alpha_phong = jnp.power(jnp.float32(1000.0), smoothness)
    reflect_dir = mathx.reflect(in_dir, normal)

    # --- MIRROR's Bernoulli branch (material.cu:77-89), decision detached.
    mirror_reflects = u3 < jax.lax.stop_gradient(reflectivity)

    # --- GLASS Fresnel setup (material.cu:109-132).
    d_dot_n = mathx.dot(in_dir, normal)
    inside = d_dot_n > 0
    outward_n = jnp.where(inside[..., None], -normal, normal)
    ni_over_nt = jnp.where(inside, ior, 1.0 / jnp.where(ior == 0, 1.0, ior))
    cos_arg = 1.0 - ior * ior * (1.0 - d_dot_n * d_dot_n)
    # double-where guard: on TIR lanes (cos_arg <= 0) the Fresnel branch is
    # unselected (reflect_prob = 1), but sqrt must still be evaluated at a
    # positive dummy or its inf derivative poisons the backward pass.
    cos_in = jnp.sqrt(jnp.where(cos_arg > 0, cos_arg, 1.0))
    cos_in = jnp.where(cos_arg > 0, cos_in, 0.0)
    cosine = jnp.where(inside, cos_in, -d_dot_n)
    refracted, refract_ok = mathx.refract(in_dir, outward_n, ni_over_nt)
    reflect_prob = jnp.where(refract_ok, mathx.schlick(cosine, ior), 1.0)
    glass_reflects = u3 < jax.lax.stop_gradient(reflect_prob)

    # --- unified lobe: per-lane exponent and base axis.
    alpha = jnp.where(
        is_diffuse,
        2.0,
        jnp.where(is_mirror & ~mirror_reflects, 2.0, alpha_phong),
    )
    base = jnp.where(
        is_diffuse[..., None],
        normal,
        jnp.where(
            is_mirror[..., None],
            jnp.where(mirror_reflects[..., None], reflect_dir, normal),
            jnp.where(
                is_glass[..., None],
                jnp.where(glass_reflects[..., None], reflect_dir, refracted),
                reflect_dir,  # METAL
            ),
        ),
    )

    local = mathx.phong_lobe_local(u1, u2, alpha)
    bounce_dir = mathx.to_world(local, base)

    above_horizon = mathx.dot(normal, bounce_dir) > 0
    atten_on = is_glass | above_horizon
    atten_kd = kd if kd_override is None else kd_override
    attenuation = jnp.where(atten_on[..., None], atten_kd, jnp.zeros_like(atten_kd))
    if score_grad:
        w = _score_weight(
            is_mirror, mirror_reflects, reflectivity,
            is_glass, glass_reflects, reflect_prob,
        )
        attenuation = attenuation * w[..., None]
    emitted = mat["emission"][..., None] * kd
    return bounce_dir, attenuation, emitted


def _score_weight(is_mirror, mirror_reflects, reflectivity,
                  is_glass, glass_reflects, reflect_prob):
    """Score-function (REINFORCE) surrogate for the detached Bernoulli
    branch choices.

    Multiplying the attenuation by ``w = p_chosen / stop_grad(p_chosen)``
    leaves the forward value bit-identical (x/x == 1.0 exactly for any
    finite nonzero float) but contributes ``d log p/dtheta * downstream``
    to the backward — the standard likelihood-ratio estimator.  This
    recovers the `reflectivity` gradient (MIRROR's reflect-vs-diffuse
    choice, material.cu:77-89) and the Fresnel-probability part of the
    IOR gradient (GLASS's reflect-vs-refract choice, material.cu:133)
    that detached sampling alone drops.  All future contributions of the
    path (which are exactly the outcomes that depend on the decision)
    pick up the weight through the throughput product.

    Double-where guards: an unselected branch with probability 0 (e.g.
    reflectivity == 0, or TIR where reflect_prob == 1) must not evaluate
    0/0 — its lane divides by a dummy 1 instead.
    """
    def branch(took, p):
        p_det = jax.lax.stop_gradient(p)
        w_take = p / jnp.where(p_det > 0, p_det, 1.0)
        q = 1.0 - p
        q_det = jax.lax.stop_gradient(q)
        w_skip = q / jnp.where(q_det > 0, q_det, 1.0)
        return jnp.where(took, w_take, w_skip)

    one = jnp.ones_like(reflectivity)
    w = jnp.where(is_mirror, branch(mirror_reflects, reflectivity), one)
    return w * jnp.where(is_glass, branch(glass_reflects, reflect_prob), one)


def gather_materials(scene, obj_idx):
    """Gather per-ray material parameters from the scene table (the analog
    of the BVH leaf's embedded Material, `include/object.h:25-31`)."""
    take = lambda a: jnp.take(a, jnp.maximum(obj_idx, 0), axis=0)
    return {
        "mat_type": take(scene.mat_type),
        "kd": take(scene.kd),
        "emission": take(scene.emission),
        "smoothness": take(scene.smoothness),
        "reflectivity": take(scene.reflectivity),
        "ior": take(scene.ior),
        "tex_id": take(scene.tex_id),
        "_geom": (
            take(scene.prim_type),
            take(scene.center),
            take(scene.radius),
            take(scene.y_pos),
            take(scene.height),
        ),
    }
