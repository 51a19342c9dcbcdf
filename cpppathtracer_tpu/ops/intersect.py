"""Ray–primitive intersection, dense and branchless.

The reference intersects one ray against one tagged-union object at a time
inside a divergent BVH traversal loop (`cuSrc/object.cu:10-128`,
`cuSrc/bvh.cu:167-205`).  TPU-native design: test a whole wavefront of R
rays against all N scene objects as dense [R, N] vector ops — the VPU has
no per-lane divergence, and for the reference's scene sizes (N <= ~128)
dense beats pointer-chasing by a wide margin.  The closest hit is an
argmin over the object axis; XLA fuses candidate generation into the
reduction so the [R, N] intermediates live only in VMEM tiles.

Semantics proven equivalent to the reference's sequential tmax-shrinking
loop: every sub-candidate (sphere near/far root, cylinder caps/lateral
near/far) is validated against the ray's ORIGINAL (tmin, tmax) window and
the minimum valid t wins.  Because near <= far always (a > 0) and a
candidate rejected by a *shrunk* tmax can never be the global minimum, the
dense argmin reproduces the reference result exactly.

Gradients: fully differentiable w.r.t. ray origin/direction and object
geometry (selects use safe-denominator double-where guards so no NaNs
leak through `jnp.where` in the backward pass).

Reference root/normal conventions matched exactly:
  * sphere near root: normal = (p - c) / radius  -> NEGATIVE radius gives
    an inverted normal (hollow glass shells), `object.cu:22-23`;
  * sphere far root: normal = normalize(p - c) — NOT radius-signed,
    `object.cu:30`;
  * platform: normal = (0, -sign(dir.y), 0), `object.cu:43`;
  * cylinder caps: same flat normal; lateral: radial in xz, `object.cu:62,97`.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpppathtracer_tpu.ops import mathx
from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX, Hit, PrimitiveType, Rays

_INF = jnp.float32(DEFAULT_RAY_TMAX)


def _safe_div(num, den):
    """num/den with zero-denominator guarded (caller masks the result)."""
    safe = jnp.where(den == 0.0, jnp.float32(1.0), den)
    return num / safe


def _sphere_candidates(o, d, center, radius, tmin, tmax):
    """Near/far quadratic roots (`object.cu:10-35`).

    All args broadcast; o, d are [..., 3]; center is [..., 3]; radius,
    tmin, tmax are [...].  Returns (t_near, near_valid, t_far, far_valid).
    """
    a_c = o - center
    a = jnp.sum(d * d, axis=-1)
    b = jnp.sum(a_c * d, axis=-1)
    c = jnp.sum(a_c * a_c, axis=-1) - radius * radius
    disc = b * b - a * c
    has = disc > 0
    # double-where: sqrt evaluated at a positive dummy on no-hit lanes so
    # sqrt'(0)=inf never meets a zero cotangent in the backward pass.
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    t_near = _safe_div(-b - sq, a)
    t_far = _safe_div(-b + sq, a)
    near_valid = has & (t_near < tmax) & (t_near > tmin)
    far_valid = has & (t_far < tmax) & (t_far > tmin)
    return t_near, near_valid, t_far, far_valid


def _platform_candidate(o, d, y_pos, tmin, tmax):
    """Infinite y-plane (`object.cu:37-48`)."""
    oy, dy = o[..., 1], d[..., 1]
    crossing = ((oy < y_pos) & (dy > 0.0)) | ((oy > y_pos) & (dy < 0.0))
    t = _safe_div(y_pos - oy, dy)
    valid = crossing & (t < tmax) & (t > tmin)
    return t, valid


def _cylinder_candidates(o, d, center, radius, height, tmin, tmax):
    """Caps + lateral surface (`object.cu:50-112`).

    Returns ((t, valid) x4): cap_top, cap_bot, lateral_near, lateral_far.
    """
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    y_top = cy + height / 2
    y_bot = cy - height / 2

    def cap(y_plane):
        crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
        t = _safe_div(y_plane - oy, dy)
        hx = ox + t * dx
        hz = oz + t * dz
        r2 = (hx - cx) ** 2 + (hz - cz) ** 2
        # reference compares sqrt(r2) < radius; for negative radius that is
        # always false, matched here by radius>0 &.
        in_disc = (radius > 0.0) & (r2 < radius * radius)
        valid = crossing & (t < tmax) & (t > tmin) & in_disc
        return t, valid

    t_top, v_top = cap(y_top)
    t_bot, v_bot = cap(y_bot)

    ax = dx * dx + dz * dz
    rx = ox - cx
    rz = oz - cz
    b = rx * dx + rz * dz
    c = rx * rx + rz * rz - radius * radius
    disc = b * b - ax * c
    has = disc > 0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))  # double-where, see above
    t_ln = _safe_div(-b - sq, ax)
    t_lf = _safe_div(-b + sq, ax)

    def lateral_valid(t):
        hy = oy + t * dy
        return has & (t < tmax) & (t > tmin) & (hy > y_bot) & (hy < y_top)

    return (t_top, v_top), (t_bot, v_bot), (t_ln, lateral_valid(t_ln)), (t_lf, lateral_valid(t_lf))


def _object_best_t(prim_type, center, radius, y_pos, height, o, d, tmin, tmax):
    """Best candidate t per (ray, object) pair, +INF when no hit.

    Shapes broadcast: o/d [..., 3] against per-object params [...].
    """
    t_sn, v_sn, t_sf, v_sf = _sphere_candidates(o, d, center, radius, tmin, tmax)
    # Reference picks the near root if valid, else the far root
    # (object.cu:18-32) — not min(near, far); matched with a select.
    t_sph = jnp.where(v_sn, t_sn, jnp.where(v_sf, t_sf, _INF))

    t_pl, v_pl = _platform_candidate(o, d, y_pos, tmin, tmax)
    t_plat = jnp.where(v_pl, t_pl, _INF)

    (t_ct, v_ct), (t_cb, v_cb), (t_ln, v_ln), (t_lf, v_lf) = _cylinder_candidates(
        o, d, center, radius, height, tmin, tmax
    )
    t_cyl = jnp.minimum(
        jnp.minimum(jnp.where(v_ct, t_ct, _INF), jnp.where(v_cb, t_cb, _INF)),
        jnp.minimum(jnp.where(v_ln, t_ln, _INF), jnp.where(v_lf, t_lf, _INF)),
    )

    t = jnp.where(
        prim_type == PrimitiveType.SPHERE,
        t_sph,
        jnp.where(
            prim_type == PrimitiveType.PLATFORM,
            t_plat,
            jnp.where(prim_type == PrimitiveType.CYLINDER, t_cyl, _INF),
        ),
    )
    return t


def _object_hit_attrs(prim_type, center, radius, y_pos, height, o, d, tmin, tmax):
    """(t, normal) for the single best candidate of each (ray, object) pair.

    Used in the winner-recompute pass: params are gathered per-ray ([R])
    so the full attribute math runs once per ray, not per (ray, object).
    """
    t_sn, v_sn, t_sf, v_sf = _sphere_candidates(o, d, center, radius, tmin, tmax)
    use_near = v_sn
    t_sph = jnp.where(use_near, t_sn, jnp.where(v_sf, t_sf, _INF))
    # Evaluate attribute math at a finite t on miss lanes so no inf/nan can
    # leak into the backward pass through unselected `where` branches.
    t_sph_safe = jnp.where(t_sph < _INF, t_sph, 0.0)
    p_sph = o + t_sph_safe[..., None] * d
    n_near = (p_sph - center) / jnp.where(radius == 0, 1.0, radius)[..., None]
    n_far = mathx.normalize(p_sph - center)
    n_sph = jnp.where(use_near[..., None], n_near, n_far)

    t_pl, v_pl = _platform_candidate(o, d, y_pos, tmin, tmax)
    t_plat = jnp.where(v_pl, t_pl, _INF)
    dy = d[..., 1]
    n_plat = jnp.stack(
        [jnp.zeros_like(dy), -jnp.sign(dy), jnp.zeros_like(dy)], axis=-1
    )

    (t_ct, v_ct), (t_cb, v_cb), (t_ln, v_ln), (t_lf, v_lf) = _cylinder_candidates(
        o, d, center, radius, height, tmin, tmax
    )
    t_cap = jnp.minimum(jnp.where(v_ct, t_ct, _INF), jnp.where(v_cb, t_cb, _INF))
    t_lat = jnp.minimum(jnp.where(v_ln, t_ln, _INF), jnp.where(v_lf, t_lf, _INF))
    t_cyl = jnp.minimum(t_cap, t_lat)
    # Caps are tested before the lateral surface in the reference
    # (object.cu:50-112); on an exact tie the cap's flat normal wins.
    is_cap = (t_cyl == t_cap) & (t_cap < _INF)
    t_cyl_safe = jnp.where(t_cyl < _INF, t_cyl, 0.0)
    p_cyl = o + t_cyl_safe[..., None] * d
    radial = jnp.stack(
        [p_cyl[..., 0] - center[..., 0], jnp.zeros_like(dy), p_cyl[..., 2] - center[..., 2]],
        axis=-1,
    )
    n_cyl = jnp.where(is_cap[..., None], n_plat, mathx.normalize(radial))

    is_sphere = prim_type == PrimitiveType.SPHERE
    is_plat = prim_type == PrimitiveType.PLATFORM
    is_cyl = prim_type == PrimitiveType.CYLINDER
    t = jnp.where(is_sphere, t_sph, jnp.where(is_plat, t_plat, jnp.where(is_cyl, t_cyl, _INF)))
    n = jnp.where(
        is_sphere[..., None],
        n_sph,
        jnp.where(is_plat[..., None], n_plat, n_cyl),
    )
    return t, n


def intersect(scene, rays: Rays) -> Hit:
    """Closest hit of each ray against the whole scene.

    Two-pass design: (1) dense [R, N] candidate t's -> argmin over objects
    (XLA fuses this into one reduction, intermediates stay in VMEM);
    (2) winner attributes (normal, position) recomputed per-ray from the
    gathered winner object — O(R) instead of O(R*N) attribute math.
    """
    o = rays.origin[..., None, :]  # [R,1,3]
    d = rays.dir[..., None, :]
    tmin = rays.tmin[..., None]
    tmax = rays.tmax[..., None]

    t_all = _object_best_t(
        scene.prim_type, scene.center, scene.radius, scene.y_pos, scene.height,
        o, d, tmin, tmax,
    )  # [R, N]
    obj_idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)

    take = lambda a: jnp.take(a, obj_idx, axis=0)
    t, normal = _object_hit_attrs(
        take(scene.prim_type),
        take(scene.center),
        take(scene.radius),
        take(scene.y_pos),
        take(scene.height),
        rays.origin,
        rays.dir,
        rays.tmin,
        rays.tmax,
    )
    hit = t < _INF
    pos = rays.origin + t[..., None] * rays.dir
    return Hit(
        t=t,
        hit=hit,
        pos=pos,
        normal=normal,
        obj_idx=jnp.where(hit, obj_idx, -1),
    )
