"""Planar (structure-of-planes) hot path: every 3-vector is three flat
f32[R] arrays instead of one f32[R, 3].

Why: profiling the fwd+bwd bench program (1024^2 x 64spp, v5e) showed the
dominant cost was NOT the intersection kernel but hundreds of elementwise
fusions whose operands were laid out as f32[R,1]{T(1,128)} and
f32[R,3]{T(4,128)} — trailing dims of 1 and 3 waste 8x / 2x of the
(8 sublane x 128 lane) vector registers.  Flat f32[R] arrays get the
perfect {T(1024)} tiling, so the same math runs at full VPU width.

This module mirrors the semantics of ops/mathx.py, ops/intersect.py
(`_object_hit_attrs`), ops/bsdf.py (`shade`) and ops/fast.py
(`_gather_epilogue`) exactly — the formulas are identical scalar ops,
only the array layout changes (stack/slice are value-preserving).  The
row-major [R, 3] API surface stays in those modules; the integrator's
bounce loop is the only planar caller.

Reference semantics citations live with the original implementations:
`cuSrc/object.cu:10-112` (primitives), `cuSrc/material.cu:20-163`
(BSDFs), `include/ray_tracing_math.hpp:43-80` (math helpers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpppathtracer_tpu.ops.intersect import _safe_div
from cpppathtracer_tpu.ops.mathx import EPS, schlick
from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX, MaterialType, PrimitiveType

# python float, not a jnp scalar: this module's functions are inlined
# into Pallas kernels (ops/pallas/mega_kernel.py), which reject captured
# array constants; np.float32 keeps the value bit-identical.
import numpy as _np

_INF = float(_np.float32(DEFAULT_RAY_TMAX))

# A planar vec3 is a tuple (x, y, z) of f32[R] arrays.


def v3(x, y, z):
    return (x, y, z)


def stack_v3(p):
    return jnp.stack(p, axis=-1)


def unstack_v3(a):
    return (a[..., 0], a[..., 1], a[..., 2])


def dot_p(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def scale_p(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def add_p(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub_p(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul_p(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def where_p(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]), jnp.where(c, a[2], b[2]))


def cross_p(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def normalize_p(v):
    """Zero-guarded normalize (identical to mathx.normalize)."""
    n2 = dot_p(v, v)
    inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, EPS)), 0.0)
    return scale_p(v, inv)


def reflect_p(i, n):
    s = 2.0 * dot_p(i, n)
    return (i[0] - s * n[0], i[1] - s * n[1], i[2] - s * n[2])


def to_world_p(ax, ay, az, n):
    """Planar `mathx.to_world` (ray_tracing_math.hpp:51-63)."""
    nx, ny, nz = n
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_len_x = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, EPS))
    inv_len_y = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, EPS))
    zero = jnp.zeros_like(nx)
    c = (
        jnp.where(use_x, nz * inv_len_x, zero),
        jnp.where(use_x, zero, nz * inv_len_y),
        jnp.where(use_x, -nx * inv_len_x, -ny * inv_len_y),
    )
    b = cross_p(c, n)
    return (
        ax * b[0] + ay * c[0] + az * n[0],
        ax * b[1] + ay * c[1] + az * n[1],
        ax * b[2] + ay * c[2] + az * n[2],
    )


def refract_p(v, n, ni_over_nt):
    """Planar `mathx.refract` (ray_tracing_math.hpp:71-80)."""
    uv = normalize_p(v)
    dt = dot_p(uv, n)
    disc = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc > 0
    safe_disc = jnp.where(ok, disc, 1.0)
    sq = jnp.sqrt(safe_disc)
    refr = normalize_p(
        (
            ni_over_nt * (uv[0] - n[0] * dt) - n[0] * sq,
            ni_over_nt * (uv[1] - n[1] * dt) - n[1] * sq,
            ni_over_nt * (uv[2] - n[2] * dt) - n[2] * sq,
        )
    )
    zero = jnp.zeros_like(dt)
    return where_p(ok, refr, (zero, zero, zero)), ok


def phong_lobe_p(u1, u2, alpha):
    """Planar `mathx.phong_lobe_local` — returns local (lx, ly, lz)."""
    log_u = jnp.log(jnp.maximum(u1, jnp.float32(1e-38)))
    inv_a = 1.0 / alpha
    z = jnp.exp(log_u * inv_a)
    # -expm1(y) via -tanh(y/2)*(e^y + 1): exact identity, same
    # conditioning, and Pallas-TPU-lowerable (see mathx.phong_lobe_local)
    y = 2.0 * log_u * inv_a
    r = jnp.sqrt(jnp.maximum(-jnp.tanh(0.5 * y) * (jnp.exp(y) + 1.0), 0.0))
    phi = (2.0 * jnp.pi) * u2
    return r * jnp.cos(phi), r * jnp.sin(phi), z


# ---------------------------------------------------------------------------
# shade (planar twin of ops/bsdf.shade)
# ---------------------------------------------------------------------------


def shade_p(mat, normal, in_dir, u1, u2, u3, kd_override=None, score_grad=True,
            with_score=False):
    """Planar BSDF sampling; see ops/bsdf.shade for the semantics contract.

    mat: dict with mat_type/emission/smoothness/reflectivity/ior f32[R]
    and kd as a planar vec3.  normal/in_dir planar vec3.
    Returns (bounce_dir vec3, attenuation vec3, emitted vec3); with
    `with_score` additionally returns the score-function weight w f32[R]
    (forward-exact 1.0; see ops/bsdf._score_weight) so callers that
    rebuild the attenuation elsewhere — the textured-albedo mega
    epilogue — can apply the same detached-branch estimator.
    """
    mat_type = mat["mat_type"]
    kd = mat["kd_p"]
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
    reflect_dir = reflect_p(in_dir, normal)

    mirror_reflects = u3 < jax.lax.stop_gradient(reflectivity)

    d_dot_n = dot_p(in_dir, normal)
    inside = d_dot_n > 0
    outward_n = where_p(inside, scale_p(normal, -1.0), normal)
    ni_over_nt = jnp.where(inside, ior, 1.0 / jnp.where(ior == 0, 1.0, ior))
    cos_arg = 1.0 - ior * ior * (1.0 - d_dot_n * d_dot_n)
    cos_in = jnp.sqrt(jnp.where(cos_arg > 0, cos_arg, 1.0))
    cos_in = jnp.where(cos_arg > 0, cos_in, 0.0)
    cosine = jnp.where(inside, cos_in, -d_dot_n)
    refracted, refract_ok = refract_p(in_dir, outward_n, ni_over_nt)
    reflect_prob = jnp.where(refract_ok, schlick(cosine, ior), 1.0)
    glass_reflects = u3 < jax.lax.stop_gradient(reflect_prob)

    alpha = jnp.where(
        is_diffuse,
        2.0,
        jnp.where(is_mirror & ~mirror_reflects, 2.0, alpha_phong),
    )
    base = where_p(
        is_diffuse,
        normal,
        where_p(
            is_mirror,
            where_p(mirror_reflects, reflect_dir, normal),
            where_p(
                is_glass,
                where_p(glass_reflects, reflect_dir, refracted),
                reflect_dir,  # METAL
            ),
        ),
    )

    lx, ly, lz = phong_lobe_p(u1, u2, alpha)
    bounce_dir = to_world_p(lx, ly, lz, base)

    above_horizon = dot_p(normal, bounce_dir) > 0
    atten_on = is_glass | above_horizon
    atten_kd = kd if kd_override is None else kd_override
    zero = jnp.zeros_like(u1)
    attenuation = where_p(atten_on, atten_kd, (zero, zero, zero))
    w = None
    if score_grad or with_score:
        # score-function surrogate for the detached branch choices —
        # forward-exact x/x == 1 weights; see ops/bsdf._score_weight.
        from cpppathtracer_tpu.ops.bsdf import _score_weight

        w = _score_weight(
            is_mirror, mirror_reflects, reflectivity,
            is_glass, glass_reflects, reflect_prob,
        )
        if score_grad:
            attenuation = scale_p(attenuation, w)
    emitted = scale_p(kd, mat["emission"])
    if with_score:
        return bounce_dir, attenuation, emitted, w
    return bounce_dir, attenuation, emitted


# ---------------------------------------------------------------------------
# winner hit attributes (planar twin of intersect._object_hit_attrs)
# ---------------------------------------------------------------------------


def object_hit_attrs_p(prim_type, center, radius, y_pos, height, o, d, tmin, tmax):
    """(t f32[R], normal vec3) of the best candidate per ray, given the
    winner object's gathered params.  center/o/d are planar vec3."""
    ox, oy, oz = o
    dx, dy, dz = d
    cx, cy, cz = center

    # --- sphere (object.cu:10-35)
    acx, acy, acz = ox - cx, oy - cy, oz - cz
    a = dx * dx + dy * dy + dz * dz
    b = acx * dx + acy * dy + acz * dz
    c = acx * acx + acy * acy + acz * acz - radius * radius
    disc = b * b - a * c
    has = disc > 0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    t_sn = _safe_div(-b - sq, a)
    t_sf = _safe_div(-b + sq, a)
    v_sn = has & (t_sn < tmax) & (t_sn > tmin)
    v_sf = has & (t_sf < tmax) & (t_sf > tmin)
    t_sph = jnp.where(v_sn, t_sn, jnp.where(v_sf, t_sf, _INF))
    t_sph_safe = jnp.where(t_sph < _INF, t_sph, 0.0)
    p_sph = (ox + t_sph_safe * dx, oy + t_sph_safe * dy, oz + t_sph_safe * dz)
    pc = sub_p(p_sph, center)
    inv_r = 1.0 / jnp.where(radius == 0, 1.0, radius)
    n_near = scale_p(pc, inv_r)
    n_far = normalize_p(pc)
    n_sph = where_p(v_sn, n_near, n_far)

    # --- platform (object.cu:37-48)
    crossing = ((oy < y_pos) & (dy > 0.0)) | ((oy > y_pos) & (dy < 0.0))
    t_pl = _safe_div(y_pos - oy, dy)
    v_pl = crossing & (t_pl < tmax) & (t_pl > tmin)
    t_plat = jnp.where(v_pl, t_pl, _INF)
    zero = jnp.zeros_like(dy)
    n_plat = (zero, -jnp.sign(dy), zero)

    # --- cylinder (object.cu:50-112)
    y_top = cy + height / 2
    y_bot = cy - height / 2

    def cap(y_plane):
        crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
        t = _safe_div(y_plane - oy, dy)
        hx = ox + t * dx
        hz = oz + t * dz
        r2 = (hx - cx) ** 2 + (hz - cz) ** 2
        in_disc = (radius > 0.0) & (r2 < radius * radius)
        return t, crossing & (t < tmax) & (t > tmin) & in_disc

    t_ct, v_ct = cap(y_top)
    t_cb, v_cb = cap(y_bot)
    axc = dx * dx + dz * dz
    rx = ox - cx
    rz = oz - cz
    bc = rx * dx + rz * dz
    cc = rx * rx + rz * rz - radius * radius
    disc_c = bc * bc - axc * cc
    has_c = disc_c > 0
    sq_c = jnp.sqrt(jnp.where(has_c, disc_c, 1.0))
    t_ln = _safe_div(-bc - sq_c, axc)
    t_lf = _safe_div(-bc + sq_c, axc)

    def lat_ok(t):
        hy = oy + t * dy
        return has_c & (t < tmax) & (t > tmin) & (hy > y_bot) & (hy < y_top)

    t_cap = jnp.minimum(jnp.where(v_ct, t_ct, _INF), jnp.where(v_cb, t_cb, _INF))
    t_lat = jnp.minimum(
        jnp.where(lat_ok(t_ln), t_ln, _INF), jnp.where(lat_ok(t_lf), t_lf, _INF)
    )
    t_cyl = jnp.minimum(t_cap, t_lat)
    is_cap = (t_cyl == t_cap) & (t_cap < _INF)
    t_cyl_safe = jnp.where(t_cyl < _INF, t_cyl, 0.0)
    radial = (ox + t_cyl_safe * dx - cx, zero, oz + t_cyl_safe * dz - cz)
    n_cyl = where_p(is_cap, n_plat, normalize_p(radial))

    is_sphere = prim_type == PrimitiveType.SPHERE
    is_plat = prim_type == PrimitiveType.PLATFORM
    is_cyl = prim_type == PrimitiveType.CYLINDER
    t = jnp.where(
        is_sphere, t_sph, jnp.where(is_plat, t_plat, jnp.where(is_cyl, t_cyl, _INF))
    )
    n = where_p(is_sphere, n_sph, where_p(is_plat, n_plat, n_cyl))
    return t, n


# ---------------------------------------------------------------------------
# winner record gather (planar twin of fast._gather_epilogue)
# ---------------------------------------------------------------------------


def gather_epilogue_p(gs, o, d, tmin, tmax, gidx, firewall=False):
    """Differentiable record fetch + hit attributes, planar layout.

    The packed record comes out TRANSPOSED — table_T[F, N] @ onehot[N, R]
    -> rec[F, R] — so each field slice rec[k] is a flat f32[R] row with
    perfect lane tiling (vs the [R, F] form whose minor dim is 17).

    `firewall=True` (the mega backward replay sets it) reshapes each
    record row to flat 1D behind an optimization_barrier: XLA lowers the
    one-hot dot to a gather whose [F, R] {T(8,128)} layout makes every
    row slice a {T(1,128)} value — 1/8 VPU width — and that narrow
    layout leaks into the replay's compare/power chains (profiled ~1
    ms/sample at 1024^2).  Off by default: the Pallas kernels never call
    this, but the XLA wavefront path does and fuses differently.
    """
    na = sum(gs.counts)
    r_n = gidx.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (na, r_n), 0) == gidx[None, :]
    ).astype(jnp.float32)
    dot = lambda tbl: jax.lax.dot_general(
        tbl[:na].T, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # two tables so kd/emission cotangents stay separable from the
    # geometric/sampling chains (see ops/fast.py table layout comment)
    rec = dot(gs.table_s)  # [F_S, R]
    rec_r = dot(gs.table_r)  # [F_R, R]
    if firewall:
        fw = lambda a: jax.lax.optimization_barrier(jnp.reshape(a, (-1,)))
        rec = tuple(fw(rec[k]) for k in range(rec.shape[0]))
        rec_r = tuple(fw(rec_r[k]) for k in range(rec_r.shape[0]))

    center = (rec[0], rec[1], rec[2])
    radius = rec[3]
    y_pos = rec[4]
    height = rec[5]
    prim_type = rec[6].astype(jnp.int32)
    t, normal = object_hit_attrs_p(
        prim_type, center, radius, y_pos, height, o, d, tmin, tmax
    )
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    pos = add_p(o, scale_p(d, t_safe))
    zero = jnp.zeros_like(t)
    mats = {
        "mat_type": rec[7].astype(jnp.int32),
        "kd_p": (rec_r[0], rec_r[1], rec_r[2]),
        "emission": rec_r[3],
        "smoothness": rec[8],
        "reflectivity": rec[9],
        "ior": rec[10],
        "tex_id": rec[11].astype(jnp.int32),
        "_geom_p": (prim_type, center, radius, y_pos, height),
    }
    hitrec = {
        "t": jnp.where(hit, t, _INF),
        "hit": hit,
        "pos": pos,
        "normal": where_p(hit, normal, (zero, zero, zero)),
        "obj_idx": jnp.where(hit, rec[12].astype(jnp.int32), -1),
    }
    return hitrec, mats
