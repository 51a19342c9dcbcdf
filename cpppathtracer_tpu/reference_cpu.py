"""CPU golden oracle: an independent scalar NumPy re-implementation of the
integrator spec (the reference's `SamplePixel` semantics,
`cuSrc/path_tracer.cu:124-175`, with deterministic counter-based RNG).

Deliberately written in per-ray scalar style — loops, no vectorization, no
shared code with the JAX integrator beyond the stateless RNG
(`utils/rng.py`, mirrored bitwise) and the texture decoder — so agreement
between this oracle and the TPU path is meaningful evidence of
correctness, not a shared bug.  All arithmetic stays in float32 (NumPy 2
weak promotion) so discrete branch decisions (Fresnel choices, t-window
tests, horizon checks) land on the same side as the fp32 TPU path.

Tests compare `render_sample` / `render_radiance` against this at <=1e-4
(BASELINE.md forward/gradient accuracy bar).  Keep images tiny — this is
O(pixels * spp * bounces * N) Python-loop slow, by design.
"""

from __future__ import annotations

import numpy as np

from cpppathtracer_tpu.ops.texture import sample_bilinear_np
from cpppathtracer_tpu.types import (
    BOUNCE_RAY_TMIN,
    DEFAULT_RAY_TMAX,
    MaterialType,
    PrimitiveType,
)
from cpppathtracer_tpu.utils.rng import uniforms4_np

F = np.float32
PI = F(np.pi)


def _normalize(v):
    v = v.astype(F)
    n2 = F(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    if n2 == 0:
        return np.zeros(3, F)
    return v / np.sqrt(n2)


def _dot(a, b):
    return F(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def _cross(a, b):
    return np.array(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        F,
    )


def _to_world(a, n):
    # ray_tracing_math.hpp:51-63
    if abs(n[0]) > abs(n[1]):
        inv = F(1.0) / np.sqrt(np.maximum(F(n[0] * n[0] + n[2] * n[2]), F(1e-12)))
        c = np.array([n[2] * inv, F(0.0), -n[0] * inv], F)
    else:
        inv = F(1.0) / np.sqrt(np.maximum(F(n[1] * n[1] + n[2] * n[2]), F(1e-12)))
        c = np.array([F(0.0), n[2] * inv, -n[1] * inv], F)
    b = _cross(c, n)
    return (a[0] * b + a[1] * c + a[2] * n).astype(F)


def _schlick(cosine, ref_idx):
    r0 = (F(1.0) - ref_idx) / (F(1.0) + ref_idx)
    r0 = F(r0 * r0)
    m = np.maximum(F(1.0) - cosine, F(0.0))
    return F(r0 + (F(1.0) - r0) * m * m * m * m * m)


def _refract(v, n, ni_over_nt):
    uv = _normalize(v)
    dt = _dot(uv, n)
    disc = F(1.0) - ni_over_nt * ni_over_nt * (F(1.0) - dt * dt)
    if disc > 0:
        return _normalize(ni_over_nt * (uv - n * dt) - n * np.sqrt(disc)), True
    return np.zeros(3, F), False


def _phong_local(u1, u2, alpha):
    # tanh-based -expm1 formulation, mirroring ops/mathx.phong_lobe_local
    # (same distribution as the reference's pow/sqrt, better conditioned).
    log_u = np.log(np.maximum(F(u1), F(1e-38)))
    inv_a = F(1.0) / F(alpha)
    z = np.exp(log_u * inv_a)
    y = F(2.0) * log_u * inv_a
    r = np.sqrt(np.maximum(-np.tanh(F(0.5) * y) * (np.exp(y) + F(1.0)), F(0.0)))
    phi = F(2.0) * PI * F(u2)
    return np.array([r * np.cos(phi), r * np.sin(phi), z], F)


# ----------------------------------------------------------------------------
# Intersection (object.cu semantics, scalar)
# ----------------------------------------------------------------------------

def _intersect_object(sc, i, o, d, tmin, tmax):
    """Returns (t, normal) of the best candidate for object i or None."""
    pt = int(sc["prim_type"][i])
    if pt == PrimitiveType.SPHERE:
        center = sc["center"][i]
        radius = F(sc["radius"][i])
        a_c = (o - center).astype(F)
        a = _dot(d, d)
        b = _dot(a_c, d)
        c = F(_dot(a_c, a_c) - radius * radius)
        disc = F(b * b - a * c)
        if disc > 0:
            sq = np.sqrt(disc)
            t = F((-b - sq) / a)
            if tmin < t < tmax:
                p = o + t * d
                return t, ((p - center) / radius).astype(F)
            t = F((-b + sq) / a)
            if tmin < t < tmax:
                p = o + t * d
                return t, _normalize(p - center)
        return None
    if pt == PrimitiveType.PLATFORM:
        y0 = F(sc["y_pos"][i])
        oy, dy = F(o[1]), F(d[1])
        if (oy < y0 and dy > 0) or (oy > y0 and dy < 0):
            t = F((y0 - oy) / dy)
            if tmin < t < tmax:
                return t, np.array([0.0, -np.sign(dy), 0.0], F)
        return None
    if pt == PrimitiveType.CYLINDER:
        center = sc["center"][i]
        radius = F(sc["radius"][i])
        height = F(sc["height"][i])
        best = None
        cur_tmax = F(tmax)
        y_top = F(center[1] + height / F(2.0))
        y_bot = F(center[1] - height / F(2.0))
        oy, dy = F(o[1]), F(d[1])
        for y_plane in (y_top, y_bot):
            if (oy < y_plane and dy > 0) or (oy > y_plane and dy < 0):
                t = F((y_plane - oy) / dy)
                p = o + t * d
                rr2 = F((p[0] - center[0]) ** 2 + (p[2] - center[2]) ** 2)
                if tmin < t < cur_tmax and radius > 0 and rr2 < radius * radius:
                    cur_tmax = t
                    best = (t, np.array([0.0, -np.sign(dy), 0.0], F))
        dx, dz = F(d[0]), F(d[2])
        cx = F(o[0] - center[0])
        cz = F(o[2] - center[2])
        a = F(dx * dx + dz * dz)
        b = F(cx * dx + cz * dz)
        c = F(cx * cx + cz * cz - radius * radius)
        disc = F(b * b - a * c)
        if disc > 0 and a != 0:
            sq = np.sqrt(disc)
            for t in (F((-b - sq) / a), F((-b + sq) / a)):
                p = o + t * d
                if tmin < t < cur_tmax and y_bot < p[1] < y_top:
                    cur_tmax = t
                    n = np.array([p[0] - center[0], 0.0, p[2] - center[2]], F)
                    best = (t, _normalize(n))
        return best
    return None


def intersect_scene_np(sc, o, d, tmin, tmax):
    """Closest hit across all objects (sequential tmax shrink, matching the
    reference's traversal-accumulated closest hit)."""
    best = None
    cur_tmax = tmax
    for i in range(len(sc["prim_type"])):
        if sc["prim_type"][i] < 0:
            continue
        res = _intersect_object(sc, i, o, d, tmin, cur_tmax)
        if res is not None:
            cur_tmax = res[0]
            best = (res[0], res[1], i)
    return best


# ----------------------------------------------------------------------------
# Shading (material.cu semantics, scalar)
# ----------------------------------------------------------------------------

def _shade(sc, i, normal, in_dir, u1, u2, u3):
    """Returns (bounce_dir, attenuation, emitted)."""
    mt = int(sc["mat_type"][i])
    kd = sc["kd"][i].astype(F)
    emitted = F(sc["emission"][i]) * kd
    smooth = F(sc["smoothness"][i])
    if mt not in (MaterialType.METAL, MaterialType.MIRROR, MaterialType.GLASS):
        # Unknown types (incl. MaterialType::Test) run the diffuse shader —
        # the reference's `default:` case (material.cu:160-161).
        mt = MaterialType.DIFFUSE
    if mt == MaterialType.DIFFUSE:
        local = _phong_local(u1, u2, F(2.0))
        wo = _to_world(local, normal)
        atten = kd if _dot(normal, wo) > 0 else np.zeros(3, F)
        return wo, atten, emitted
    if mt == MaterialType.METAL:
        alpha = np.power(F(1000.0), smooth)
        local = _phong_local(u1, u2, alpha)
        refl = in_dir - F(2.0) * _dot(in_dir, normal) * normal
        wo = _to_world(local, refl)
        atten = kd if _dot(normal, wo) > 0 else np.zeros(3, F)
        return wo, atten, emitted
    if mt == MaterialType.MIRROR:
        if u3 < F(sc["reflectivity"][i]):
            alpha = np.power(F(1000.0), smooth)
            local = _phong_local(u1, u2, alpha)
            refl = in_dir - F(2.0) * _dot(in_dir, normal) * normal
            wo = _to_world(local, refl)
        else:
            local = _phong_local(u1, u2, F(2.0))
            wo = _to_world(local, normal)
        atten = np.zeros(3, F) if _dot(wo, normal) < 0 else kd
        return wo, atten, emitted
    if mt == MaterialType.GLASS:
        ior = F(sc["ior"][i])
        alpha = np.power(F(1000.0), smooth)
        local = _phong_local(u1, u2, alpha)
        d_dot_n = _dot(in_dir, normal)
        if d_dot_n > 0:
            outward = -normal
            ni_over_nt = ior
            arg = F(1.0) - ior * ior * (F(1.0) - d_dot_n * d_dot_n)
            cosine = np.sqrt(np.maximum(arg, F(0.0)))
        else:
            outward = normal
            ni_over_nt = F(1.0) / ior
            cosine = -d_dot_n
        refracted, ok = _refract(in_dir, outward, ni_over_nt)
        reflect_prob = _schlick(cosine, ior) if ok else F(1.0)
        if u3 < reflect_prob:
            base = in_dir - F(2.0) * d_dot_n * normal
        else:
            base = refracted
        wo = _to_world(local, base)
        return wo, kd, emitted
    raise AssertionError(f"unreachable material {mt}")


# ----------------------------------------------------------------------------
# Integrator
# ----------------------------------------------------------------------------

def scene_to_np(scene):
    """Convert a `Scene` pytree to a plain numpy dict for the oracle."""
    return {
        "prim_type": np.asarray(scene.prim_type),
        "center": np.asarray(scene.center, F),
        "radius": np.asarray(scene.radius, F),
        "y_pos": np.asarray(scene.y_pos, F),
        "height": np.asarray(scene.height, F),
        "mat_type": np.asarray(scene.mat_type),
        "kd": np.asarray(scene.kd, F),
        "emission": np.asarray(scene.emission, F),
        "smoothness": np.asarray(scene.smoothness, F),
        "reflectivity": np.asarray(scene.reflectivity, F),
        "ior": np.asarray(scene.ior, F),
    }


def camera_to_np(camera):
    """Precompute the camera basis (GetCopy, motional_camera.cu:177-200)."""
    origin = np.asarray(camera.origin, F)
    look_at = np.asarray(camera.look_at, F)
    fov = F(camera.view_fov)
    width, height = camera.width, camera.height
    theta = fov * (PI / F(180.0))
    aspect = F(width) / F(height)
    half_h = np.tan(theta / F(2.0))
    half_w = F(aspect * half_h)
    vup = np.array([0.0, 1.0, 0.0], F)
    w = _normalize(origin - look_at)
    u = _normalize(_cross(vup, w))
    v = _cross(w, u)
    diff = (origin - look_at).astype(F)
    focus = np.sqrt(_dot(diff, diff))
    top_left = origin - half_w * focus * u + F(half_h) * focus * v - focus * w
    horizontal = F(2.0) * half_w * focus * u
    vertical = F(-2.0) * F(half_h) * focus * v
    return dict(
        origin=origin,
        u=u,
        v=v,
        top_left=top_left.astype(F),
        horizontal=horizontal.astype(F),
        vertical=vertical.astype(F),
        width=width,
        height=height,
        lens_radius=F(camera.lens_radius),
    )


def _ray_gen(cam, pixel, sample, seed):
    x = pixel % cam["width"]
    y = pixel // cam["width"]
    r1, r2, _, _ = uniforms4_np(seed, pixel, sample, 0)
    rd_x = cam["lens_radius"] * F(r1)
    rd_y = cam["lens_radius"] * F(r2)
    offset = rd_x * cam["u"] + rd_y * cam["v"]
    dx = F(x) / F(cam["width"])
    dy = F(y) / F(cam["height"])
    origin = (cam["origin"] + offset).astype(F)
    target = cam["top_left"] + dx * cam["horizontal"] + dy * cam["vertical"]
    direction = _normalize(target - cam["origin"] - offset)
    return origin, direction


def _sky(sky_tex, d):
    d = _normalize(d)
    dx = d[0] if d[0] != 0 else F(1e-30)
    v = F(np.arcsin(np.clip(d[2], F(-1.0), F(1.0))) / PI + F(0.5))
    u = F(np.arctan(d[1] / dx) / (F(2.0) * PI))
    return sample_bilinear_np(sky_tex, u, v).astype(F)


def render_pixel(sc, cam, sky_tex, pixel, sample, seed, max_depth,
                 selfhit_out=None):
    """One sample of one pixel. Returns (radiance[3], first_normal[3], first_t).

    `selfhit_out`: optional 1-element list; set to True when any bounce>=1
    accepts a hit with t < 1e-3 — a surface-acne self-hit whose
    acceptance against BOUNCE_RAY_TMIN (2e-5) is an fp32 rounding coin
    flip between implementations (the golden tests mask these pixels and
    demand exact agreement on the rest)."""
    origin, direction = _ray_gen(cam, pixel, sample, seed)
    tmin, tmax = F(0.0), F(DEFAULT_RAY_TMAX)
    radiance = np.zeros(3, F)
    throughput = np.ones(3, F)
    first_n = np.zeros(3, F)
    first_t = F(0.0)
    for bounce in range(max_depth):
        res = intersect_scene_np(sc, origin, direction, tmin, tmax)
        u1, u2, u3, _ = uniforms4_np(seed, pixel, sample, 1 + bounce)
        if res is not None:
            t, normal, i = res
            if selfhit_out is not None and bounce >= 1 and t < 1e-3:
                selfhit_out[0] = True
            pos = (origin + F(t) * direction).astype(F)
            wo, atten, emitted = _shade(sc, i, normal, direction, u1, u2, u3)
            radiance = (radiance + throughput * emitted).astype(F)
            throughput = (throughput * atten).astype(F)
            if bounce == 0:
                first_n = normal
                first_t = F(t)
            origin = pos
            direction = _normalize(wo)
            tmin, tmax = F(BOUNCE_RAY_TMIN), F(DEFAULT_RAY_TMAX)
        else:
            radiance = (radiance + throughput * _sky(sky_tex, direction)).astype(F)
            if bounce == 0:
                first_n = -direction
                first_t = F(DEFAULT_RAY_TMAX)
            break
    return radiance, first_n, first_t


def render_image_np(scene, camera, sky_tex, spp, max_depth, seed=0,
                    return_selfhit=False):
    """Full-frame oracle render. Returns (radiance [H,W,3], normal [H,W,3],
    depth [H,W]) — radiance is the mean over spp; aux from sample 0.
    With `return_selfhit`, appends an [H,W] bool acne mask: True where any
    sample's path accepted a bounce>=1 hit with t < 1e-3 (see
    render_pixel)."""
    sc = scene_to_np(scene)
    cam = camera_to_np(camera)
    h, w = cam["height"], cam["width"]
    sky_tex = np.asarray(sky_tex, F)
    rad = np.zeros((h * w, 3), F)
    nrm = np.zeros((h * w, 3), F)
    dep = np.zeros(h * w, F)
    acne = np.zeros(h * w, bool)
    for pixel in range(h * w):
        acc = np.zeros(3, F)
        for s in range(spp):
            sh = [False]
            r, n0, t0 = render_pixel(sc, cam, sky_tex, pixel, s, seed,
                                     max_depth, selfhit_out=sh)
            acne[pixel] |= sh[0]
            acc = (acc + r).astype(F)
            if s == 0:
                nrm[pixel] = n0
                dep[pixel] = t0
        rad[pixel] = acc / F(spp)
    out = (rad.reshape(h, w, 3), nrm.reshape(h, w, 3), dep.reshape(h, w))
    if return_selfhit:
        return out + (acne.reshape(h, w),)
    return out
