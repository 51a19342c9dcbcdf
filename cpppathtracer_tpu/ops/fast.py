"""Speed-of-light intersection + material gather for the TPU hot path.

Profiling the XLA baseline on a v5e showed three dominant costs per
bounce (scripts/perf_micro.py): `jnp.take` gathers (TPU gathers are
scalar-ish; ~5x the candidate math), per-(ray,object) candidate math
computed for ALL THREE primitive types per object (3x waste), and
per-bounce sky-texture gathers.  This module removes the first two:

1. **Type-partitioned candidates.**  Objects are permuted into
   [spheres | platforms | cylinders | padding] order using the Scene's
   static `type_perm`/`type_counts` metadata, so each group runs ONLY its
   own analytic test — and scene padding costs nothing at all.

2. **Matmul-form quadratics.**  The sphere/cylinder quadratic
   coefficients factor into ray-terms and object-terms joined by inner
   products:  b = o.d - d.c  and  c = |o|^2 - 2 o.c + (|c|^2 - r^2),
   so the [R, N] cross terms are two tiny [R,3]x[3,N] matmuls on the MXU
   and the per-pair tail is ~a dozen VPU ops.  (Identical math to
   `object.cu:10-35` — only the evaluation order changes.)

3. **One-hot matmul gathers.**  The winner's geometry + material record
   is fetched with a single [R,N]@[N,F] matmul against a packed
   parameter table instead of 11 scalar gathers (f32 holds object ids
   exactly below 2^24).

Closest-hit semantics (validity windows, near-else-far root select,
cap-before-lateral priority, negative-radius behavior) are exactly those
of ops/intersect.py; the argmin tie-break differs only in object
*ordering* (grouped vs authored), which matters only for exactly-equal
hit distances.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from cpppathtracer_tpu.ops.intersect import _object_hit_attrs, _safe_div
from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX, Hit, Rays

_INF = jnp.float32(DEFAULT_RAY_TMAX)

# The per-object record is packed as TWO tables so that reverse-mode AD
# keeps their cotangent paths separable: with one fused table, the
# gather-transpose matmul produces cotangents for ALL columns at once, so
# the heavy geometric/sampling VJP chains (to_world/normalize/refract
# backward through every bounce) survive XLA DCE even when the loss only
# requests kd/emission gradients.  Split, a kd+emission-only loss prunes
# the entire geometry cotangent chain (measured ~1.4x fwd+bwd).
#
# sampling table column layout (F_S columns)
# 0:2 center.xyz | 3 radius | 4 y_pos | 5 height | 6 prim_type | 7 mat_type
# 8 smoothness | 9 reflectivity | 10 ior | 11 tex_id | 12 orig_idx
_F_S = 13
# radiometric table column layout (F_R columns): 0:2 kd | 3 emission
_F_R = 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroupedScene:
    """Scene repacked for the fast path (built once per trace)."""

    center: jax.Array  # f32[Ng,3] grouped
    radius: jax.Array  # f32[Ng]
    y_pos: jax.Array  # f32[Ng]
    height: jax.Array  # f32[Ng]
    table_s: jax.Array  # f32[Ng,F_S] sampling/geometry record
    table_r: jax.Array  # f32[Ng,F_R] radiometric record (kd, emission)
    counts: tuple = dataclasses.field(metadata=dict(static=True))
    # Optional skip-pointer BVH tables (Scene.with_bvh; grouped indices)
    bvh_meta: jax.Array | None = None
    bvh_aabb: jax.Array | None = None
    bvh_objs: jax.Array | None = None
    bvh_dims: tuple = dataclasses.field(default=(), metadata=dict(static=True))


def group_scene(scene) -> GroupedScene | None:
    """Repack a Scene using its static partition metadata. Returns None if
    the scene lacks metadata (hand-built pytree) — callers fall back to
    the generic dense path."""
    if not scene.type_perm or not scene.type_counts:
        return None
    perm = jnp.asarray(np.asarray(scene.type_perm, np.int32))
    g = lambda a: jnp.take(a, perm, axis=0)  # one-time N-sized gather
    center = g(scene.center)
    radius = g(scene.radius)
    y_pos = g(scene.y_pos)
    height = g(scene.height)
    table_s = jnp.concatenate(
        [
            center,
            radius[:, None],
            y_pos[:, None],
            height[:, None],
            g(scene.prim_type).astype(jnp.float32)[:, None],
            g(scene.mat_type).astype(jnp.float32)[:, None],
            g(scene.smoothness)[:, None],
            g(scene.reflectivity)[:, None],
            g(scene.ior)[:, None],
            g(scene.tex_id).astype(jnp.float32)[:, None],
            perm.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    table_r = jnp.concatenate(
        [g(scene.kd), g(scene.emission)[:, None]], axis=1
    )
    return GroupedScene(
        center=center,
        radius=radius,
        y_pos=y_pos,
        height=height,
        table_s=table_s,
        table_r=table_r,
        counts=tuple(scene.type_counts),
        bvh_meta=getattr(scene, "bvh_meta", None),
        bvh_aabb=getattr(scene, "bvh_aabb", None),
        bvh_objs=getattr(scene, "bvh_objs", None),
        bvh_dims=tuple(getattr(scene, "bvh_dims", ()) or ()),
    )


def _candidates_grouped(gs: GroupedScene, rays: Rays):
    """Candidate t per (ray, grouped-object), +INF when invalid.
    Returns f32[R, n_active]."""
    n_s, n_p, n_c = gs.counts
    o = rays.origin
    d = rays.dir
    tmin = rays.tmin[:, None]
    tmax = rays.tmax[:, None]
    oy = o[:, 1:2]
    dy = d[:, 1:2]

    parts = []

    if n_s:
        c_s = gs.center[:n_s]  # [Ns,3]
        r_s = gs.radius[:n_s]
        oc = jax.lax.dot_general(
            o, c_s.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH
        )  # [R,Ns]
        dc = jax.lax.dot_general(
            d, c_s.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH
        )
        od = jnp.sum(o * d, -1, keepdims=True)
        oo = jnp.sum(o * o, -1, keepdims=True)
        a = jnp.sum(d * d, -1, keepdims=True)
        cc = jnp.sum(c_s * c_s, -1) - r_s * r_s  # [Ns]
        b = od - dc
        c = oo - 2.0 * oc + cc[None, :]
        disc = b * b - a * c
        has = disc > 0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv_a = 1.0 / jnp.where(a == 0.0, 1.0, a)
        t_near = (-b - sq) * inv_a
        t_far = (-b + sq) * inv_a
        nv = has & (t_near < tmax) & (t_near > tmin)
        fv = has & (t_far < tmax) & (t_far > tmin)
        parts.append(jnp.where(nv, t_near, jnp.where(fv, t_far, _INF)))

    if n_p:
        y0 = gs.y_pos[n_s : n_s + n_p][None, :]  # [1,Np]
        crossing = ((oy < y0) & (dy > 0.0)) | ((oy > y0) & (dy < 0.0))
        t = _safe_div(y0 - oy, dy)
        v = crossing & (t < tmax) & (t > tmin)
        parts.append(jnp.where(v, t, _INF))

    if n_c:
        sl = slice(n_s + n_p, n_s + n_p + n_c)
        c_c = gs.center[sl]  # [Nc,3]
        r_c = gs.radius[sl]
        h_c = gs.height[sl]
        cx = c_c[:, 0][None, :]
        cy = c_c[:, 1][None, :]
        cz = c_c[:, 2][None, :]
        ox, oz = o[:, 0:1], o[:, 2:3]
        dx, dz = d[:, 0:1], d[:, 2:3]
        y_top = cy + h_c[None, :] / 2
        y_bot = cy - h_c[None, :] / 2
        rr = r_c[None, :]

        def cap(y_plane):
            crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
            t = _safe_div(y_plane - oy, dy)
            hx = ox + t * dx
            hz = oz + t * dz
            r2 = (hx - cx) ** 2 + (hz - cz) ** 2
            v = crossing & (t < tmax) & (t > tmin) & (rr > 0.0) & (r2 < rr * rr)
            return jnp.where(v, t, _INF)

        t_cap = jnp.minimum(cap(y_top), cap(y_bot))

        # lateral quadratic via 2D matmuls
        o2 = jnp.stack([o[:, 0], o[:, 2]], -1)  # [R,2]
        d2 = jnp.stack([d[:, 0], d[:, 2]], -1)
        c2 = jnp.stack([c_c[:, 0], c_c[:, 2]], -1)  # [Nc,2]
        oc2 = jax.lax.dot_general(
            o2, c2.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH
        )
        dc2 = jax.lax.dot_general(
            d2, c2.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH
        )
        od2 = jnp.sum(o2 * d2, -1, keepdims=True)
        oo2 = jnp.sum(o2 * o2, -1, keepdims=True)
        ax = jnp.sum(d2 * d2, -1, keepdims=True)
        cc2 = jnp.sum(c2 * c2, -1) - r_c * r_c
        b2 = od2 - dc2
        cq = oo2 - 2.0 * oc2 + cc2[None, :]
        disc = b2 * b2 - ax * cq
        has = disc > 0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv_ax = 1.0 / jnp.where(ax == 0.0, 1.0, ax)
        t_ln = (-b2 - sq) * inv_ax
        t_lf = (-b2 + sq) * inv_ax

        def lat_ok(t):
            hy = oy + t * dy
            return has & (t < tmax) & (t > tmin) & (hy > y_bot) & (hy < y_top)

        t_lat = jnp.minimum(
            jnp.where(lat_ok(t_ln), t_ln, _INF), jnp.where(lat_ok(t_lf), t_lf, _INF)
        )
        parts.append(jnp.minimum(t_cap, t_lat))

    if not parts:
        return jnp.full(rays.tmin.shape + (1,), _INF)
    return jnp.concatenate(parts, axis=1)


def _winner_grouped_T(gs: GroupedScene, rays: Rays):
    """Closest-hit winner (t_best f32[R], grouped index i32[R]) with the
    OBJECT axis on sublanes: every per-(object,ray) array is [Ng, R].

    Same math as :func:`_candidates_grouped` with the axes swapped.  Why:
    TPU vector registers are (8 sublanes x 128 lanes); an [R, Ng] array
    pads Ng to 128 *lanes*, so a 38-sphere group burns 128 lanes of VPU
    work per ray.  [Ng, R] pads Ng to 8 *sublanes* instead (38 -> 40),
    cutting candidate VPU work ~3-4x at demo-scene sizes.  The per-group
    min/argmin then combines across groups with [R]-sized selects — no
    [R, Na] concat ever materializes.  Tie-break matches the concat+argmin
    form: earlier grouped index wins on exactly-equal t."""
    n_s, n_p, n_c = gs.counts
    o = rays.origin  # [R,3]
    d = rays.dir
    tmin = rays.tmin[None, :]  # [1,R]
    tmax = rays.tmax[None, :]
    oy = o[:, 1][None, :]
    dy = d[:, 1][None, :]
    r_n = rays.tmin.shape[0]

    def rowmm(cols, vecs):
        # [Ng,3] x [R,3] -> [Ng,R]  (contract the coordinate axis; no
        # explicit transpose of the ray arrays is ever formed)
        return jax.lax.dot_general(
            cols, vecs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
        )

    best_t = jnp.full((r_n,), _INF)
    best_i = jnp.zeros((r_n,), jnp.int32)

    def combine(best_t, best_i, t_grp, base):
        # per-group reduction over the sublane axis
        t_g = jnp.min(t_grp, axis=0)
        i_g = jnp.argmin(t_grp, axis=0).astype(jnp.int32) + base
        better = t_g < best_t
        return jnp.where(better, t_g, best_t), jnp.where(better, i_g, best_i)

    if n_s:
        c_s = gs.center[:n_s]  # [Ns,3]
        r_s = gs.radius[:n_s]
        oc = rowmm(c_s, o)  # [Ns,R]
        dc = rowmm(c_s, d)
        od = jnp.sum(o * d, -1)[None, :]  # [1,R]
        oo = jnp.sum(o * o, -1)[None, :]
        a = jnp.sum(d * d, -1)[None, :]
        cc = (jnp.sum(c_s * c_s, -1) - r_s * r_s)[:, None]  # [Ns,1]
        b = od - dc
        c = oo - 2.0 * oc + cc
        disc = b * b - a * c
        has = disc > 0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv_a = 1.0 / jnp.where(a == 0.0, 1.0, a)
        t_near = (-b - sq) * inv_a
        t_far = (-b + sq) * inv_a
        nv = has & (t_near < tmax) & (t_near > tmin)
        fv = has & (t_far < tmax) & (t_far > tmin)
        t_sph = jnp.where(nv, t_near, jnp.where(fv, t_far, _INF))
        best_t, best_i = combine(best_t, best_i, t_sph, 0)

    if n_p:
        y0 = gs.y_pos[n_s : n_s + n_p][:, None]  # [Np,1]
        crossing = ((oy < y0) & (dy > 0.0)) | ((oy > y0) & (dy < 0.0))
        t = _safe_div(y0 - oy, dy)
        v = crossing & (t < tmax) & (t > tmin)
        best_t, best_i = combine(
            best_t, best_i, jnp.where(v, t, _INF), n_s
        )

    if n_c:
        sl = slice(n_s + n_p, n_s + n_p + n_c)
        c_c = gs.center[sl]  # [Nc,3]
        r_c = gs.radius[sl]
        h_c = gs.height[sl]
        cx = c_c[:, 0][:, None]  # [Nc,1]
        cy = c_c[:, 1][:, None]
        cz = c_c[:, 2][:, None]
        ox, oz = o[:, 0][None, :], o[:, 2][None, :]
        dx, dz = d[:, 0][None, :], d[:, 2][None, :]
        y_top = cy + h_c[:, None] / 2
        y_bot = cy - h_c[:, None] / 2
        rr = r_c[:, None]

        def cap(y_plane):
            crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
            t = _safe_div(y_plane - oy, dy)
            hx = ox + t * dx
            hz = oz + t * dz
            r2 = (hx - cx) ** 2 + (hz - cz) ** 2
            v = crossing & (t < tmax) & (t > tmin) & (rr > 0.0) & (r2 < rr * rr)
            return jnp.where(v, t, _INF)

        t_cap = jnp.minimum(cap(y_top), cap(y_bot))

        c2 = jnp.stack([c_c[:, 0], c_c[:, 2]], -1)  # [Nc,2]
        o2 = jnp.stack([o[:, 0], o[:, 2]], -1)  # [R,2]
        d2 = jnp.stack([d[:, 0], d[:, 2]], -1)
        oc2 = rowmm(c2, o2)  # [Nc,R]
        dc2 = rowmm(c2, d2)
        od2 = jnp.sum(o2 * d2, -1)[None, :]
        oo2 = jnp.sum(o2 * o2, -1)[None, :]
        ax = jnp.sum(d2 * d2, -1)[None, :]
        cc2 = (jnp.sum(c2 * c2, -1) - r_c * r_c)[:, None]
        b2 = od2 - dc2
        cq = oo2 - 2.0 * oc2 + cc2
        disc = b2 * b2 - ax * cq
        has = disc > 0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv_ax = 1.0 / jnp.where(ax == 0.0, 1.0, ax)
        t_ln = (-b2 - sq) * inv_ax
        t_lf = (-b2 + sq) * inv_ax

        def lat_ok(t):
            hy = oy + t * dy
            return has & (t < tmax) & (t > tmin) & (hy > y_bot) & (hy < y_top)

        t_lat = jnp.minimum(
            jnp.where(lat_ok(t_ln), t_ln, _INF), jnp.where(lat_ok(t_lf), t_lf, _INF)
        )
        best_t, best_i = combine(
            best_t, best_i, jnp.minimum(t_cap, t_lat), n_s + n_p
        )

    return best_t, best_i


def _pick_tile(r: int) -> int:
    """Largest supported ray-tile dividing R.  Bigger tiles amortize the
    kernel's per-grid-step fixed costs (MXU weight reload, loop
    bookkeeping): measured on v5e at 4M rays, tile 8192 is ~13% faster
    than 1024 (scripts/perf_kernel.py); 16384 regresses slightly."""
    for tile in (8192, 4096, 2048, 1024, 512, 256):
        if r % tile == 0:
            return tile
    return 8192 if r > 8192 else 256  # callers pad R up to the tile


def _winner_index_packed(gs: GroupedScene, rays_packed, interpret: bool = False):
    """Winner index from a pre-packed [8, R] ray matrix (fused Pallas
    kernel).  The kernel keeps every [N, R]-shaped intermediate in VMEM —
    it reads 8 f32 and writes 1 int32 per ray.  Same per-group
    math/tie-break as :func:`_winner_grouped_T`; the index is
    piecewise-constant so the kernel needs no autodiff (gradients flow
    through the epilogue).

    Kernel variant: "mxu" (quadratic coefficients via one MXU matmul,
    default on native TPU) or "vpu" (pure elementwise, bit-matches the
    XLA fallback; default under interpret).  Env POCA_KVARIANT overrides.
    """
    from cpppathtracer_tpu.ops.pallas.intersect_kernel import (
        build_geom_mxu,
        build_geom_rows,
        pallas_winner_index_v,
    )

    variant = os.environ.get("POCA_KVARIANT", "") or ("vpu" if interpret else "mxu")
    r = rays_packed.shape[1]
    tile = _pick_tile(r)
    r_pad = -(-r // tile) * tile
    if r_pad != r:
        rays_packed = jnp.pad(rays_packed, ((0, 0), (0, r_pad - r)))
    geom = build_geom_rows(gs)
    gmx = build_geom_mxu(gs)
    gidx = pallas_winner_index_v(
        jax.lax.stop_gradient(rays_packed), jax.lax.stop_gradient(geom),
        jax.lax.stop_gradient(gmx),
        counts=gs.counts, tile=tile, interpret=interpret, variant=variant,
    )
    return gidx[:r]


def winner_index_pallas(gs: GroupedScene, rays: Rays, interpret: bool = False):
    """Winner index via the fused Pallas kernel (row-major Rays entry)."""
    rays_packed = jnp.stack(
        [
            rays.origin[:, 0], rays.origin[:, 1], rays.origin[:, 2],
            rays.dir[:, 0], rays.dir[:, 1], rays.dir[:, 2],
            rays.tmin, rays.tmax,
        ]
    )  # [8, R]
    return _winner_index_packed(gs, rays_packed, interpret=interpret)


def _gather_epilogue(gs: GroupedScene, rays: Rays, gidx):
    """Differentiable record fetch + hit attributes from a winner index."""
    na = sum(gs.counts)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (na, rays.tmin.shape[0]), 0)
        == gidx[None, :]
    ).astype(jnp.float32)
    dot = lambda tbl: jax.lax.dot_general(
        onehot, tbl[:na], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rec = dot(gs.table_s)  # [R, F_S]
    rec_r = dot(gs.table_r)  # [R, F_R]

    center = rec[:, 0:3]
    radius = rec[:, 3]
    y_pos = rec[:, 4]
    height = rec[:, 5]
    prim_type = rec[:, 6].astype(jnp.int32)
    t, normal = _object_hit_attrs(
        prim_type, center, radius, y_pos, height,
        rays.origin, rays.dir, rays.tmin, rays.tmax,
    )
    hit = t < _INF
    t_safe = jnp.where(hit, t, 0.0)
    pos = rays.origin + t_safe[..., None] * rays.dir
    orig_idx = rec[:, 12].astype(jnp.int32)
    out = Hit(
        t=jnp.where(hit, t, _INF),
        hit=hit,
        pos=pos,
        normal=jnp.where(hit[..., None], normal, 0.0),
        obj_idx=jnp.where(hit, orig_idx, -1),
    )
    mats = {
        "mat_type": rec[:, 7].astype(jnp.int32),
        "kd": rec_r[:, 0:3],
        "emission": rec_r[:, 3],
        "smoothness": rec[:, 8],
        "reflectivity": rec[:, 9],
        "ior": rec[:, 10],
        "tex_id": rec[:, 11].astype(jnp.int32),
        # gathered geometry (for UV parameterization of albedo textures)
        "_geom": (prim_type, center, radius, y_pos, height),
    }
    return out, mats


def intersect_and_gather(gs: GroupedScene, rays: Rays, use_pallas: bool | None = None):
    """Closest hit + packed winner record in one pass.

    Returns (Hit, mats dict) where mats matches
    `bsdf.gather_materials`'s output (already per-ray).

    Winner selection runs as the fused Pallas kernel on TPU (default) or
    the XLA [N,R] fast path elsewhere; `use_pallas` (or env POCA_PALLAS=
    0/1) overrides.  Both produce identical indices
    (tests/test_pallas_kernel.py)."""
    if use_pallas is None:
        force = os.environ.get("POCA_PALLAS", "")
        if force == "1":
            use_pallas = True
        elif force == "0":
            use_pallas = False
        else:
            use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        gidx = winner_index_pallas(
            gs, rays, interpret=jax.default_backend() == "cpu"
        )
    else:
        _, gidx = _winner_grouped_T(gs, rays)  # [R]
    # Named so the remat policies (bounce body + per-sample) SAVE the
    # winner index: backward replays reconstruct the record from gidx and
    # the whole candidate computation is dead-code-eliminated.
    gidx = checkpoint_name(gidx, "hit_idx")
    return _gather_epilogue(gs, rays, gidx)


def _use_pallas_default(use_pallas):
    if use_pallas is None:
        force = os.environ.get("POCA_PALLAS", "")
        if force == "1":
            return True
        if force == "0":
            return False
        return jax.default_backend() == "tpu"
    return use_pallas


def intersect_and_gather_planar(gs: GroupedScene, o, d, tmin, tmax,
                                use_pallas: bool | None = None):
    """Planar-layout twin of :func:`intersect_and_gather`.

    o/d are planar vec3 tuples of f32[R]; returns the planar hit record
    + planar mats from :func:`planar.gather_epilogue_p`.  The Pallas
    winner kernel consumes the planar components directly (no [R, 3]
    restack); the XLA fallback stacks once per call."""
    from cpppathtracer_tpu.ops import planar

    if _use_pallas_default(use_pallas):
        interpret = jax.default_backend() == "cpu"
        use_bvh = (
            gs.bvh_meta is not None
            and os.environ.get("POCA_BVH", "1") != "0"
        )
        variant = os.environ.get("POCA_KVARIANT", "") or (
            "vpu" if interpret else "mxu"
        )
        if use_bvh:
            # large scene: skip-pointer BVH traversal kernel instead of
            # the dense O(R*N) winner (ops/pallas/bvh_kernel.py)
            from cpppathtracer_tpu.ops.pallas.bvh_kernel import (
                pallas_bvh_winner_index,
            )

            r = tmin.shape[0]
            tile = int(os.environ.get("POCA_BVH_TILE", "0")) or _pick_tile(r)
            # leaf evaluation holds ~15 live [K, tile] f32 intermediates
            # in scoped VMEM (~60*K*tile bytes): cap the tile so K*tile
            # stays <= 64Ki lanes (measured: K=32 x tile 8192 hits 19.5 MB
            # vs the 16 MB scoped limit; K=32 x 2048 and K=8 x 8192 fit)
            _, k_leaf = gs.bvh_dims
            cap = 1024
            while cap * 2 * max(k_leaf, 8) <= 65536:
                cap *= 2
            tile = min(tile, cap)
            r_pad = -(-r // tile) * tile
            sg = jax.lax.stop_gradient
            if r_pad != r:
                pad = lambda a: jnp.pad(a, (0, r_pad - r))
                # pad TMIN above the kernel's slab ceiling: zero-padded
                # rays have d=(0,0,0), which the slab test treats as
                # unconstrained on every axis (lo=-2·INF, hi=+2·INF), so
                # neither a tmax nor a tmin sentinel at ±INF can prune
                # them (r4 advisor: the old -INF tmax sentinel was a
                # no-op).  With tmin = 4·INF the overlap term
                # `hi >= tmin` is false at every node — pad lanes walk
                # only the O(depth) escape chain.
                padt = lambda a: jnp.pad(
                    a, (0, r_pad - r),
                    constant_values=4.0 * DEFAULT_RAY_TMAX,
                )
                o_in = tuple(pad(sg(c)) for c in o)
                d_in = tuple(pad(sg(c)) for c in d)
                tmin_in, tmax_in = padt(sg(tmin)), pad(sg(tmax))
            else:
                o_in = tuple(sg(c) for c in o)
                d_in = tuple(sg(c) for c in d)
                tmin_in, tmax_in = sg(tmin), sg(tmax)
            m, k = gs.bvh_dims
            gidx = pallas_bvh_winner_index(
                o_in, d_in, tmin_in, tmax_in,
                sg(gs.bvh_meta), sg(gs.bvh_aabb), sg(gs.bvh_objs),
                m=m, k=k, tile=tile, interpret=interpret,
            )[:r]
        elif variant == "mxu":
            # planar-I/O kernel: no [8, R] stack on the XLA side (a
            # stacked input's [1, R] operand layouts propagate backward
            # through the whole bounce body — see intersect_kernel.py)
            from cpppathtracer_tpu.ops.pallas.intersect_kernel import (
                build_geom_mxu,
                build_geom_rows,
                pallas_winner_index_planar,
            )

            r = tmin.shape[0]
            tile = _pick_tile(r)
            r_pad = -(-r // tile) * tile
            sg = jax.lax.stop_gradient
            if r_pad != r:
                pad = lambda a: jnp.pad(a, (0, r_pad - r))
                o_in = tuple(pad(sg(c)) for c in o)
                d_in = tuple(pad(sg(c)) for c in d)
                tmin_in, tmax_in = pad(sg(tmin)), pad(sg(tmax))
            else:
                o_in = tuple(sg(c) for c in o)
                d_in = tuple(sg(c) for c in d)
                tmin_in, tmax_in = sg(tmin), sg(tmax)
            gidx = pallas_winner_index_planar(
                o_in, d_in, tmin_in, tmax_in,
                sg(build_geom_rows(gs)), sg(build_geom_mxu(gs)),
                counts=gs.counts, tile=tile, interpret=interpret,
            )[:r]
        else:
            rays_packed = jnp.stack(
                [o[0], o[1], o[2], d[0], d[1], d[2], tmin, tmax]
            )
            gidx = _winner_index_packed(gs, rays_packed, interpret=interpret)
    else:
        rays = Rays(
            origin=jnp.stack(o, -1), dir=jnp.stack(d, -1), tmin=tmin, tmax=tmax
        )
        _, gidx = _winner_grouped_T(gs, rays)
    gidx = checkpoint_name(gidx, "hit_idx")
    return planar.gather_epilogue_p(gs, o, d, tmin, tmax, gidx)
