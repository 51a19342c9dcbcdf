"""Pallas TPU kernel: fused closest-hit winner selection.

One kernel invocation per ray tile computes, entirely in VMEM, candidate
t's for every (object, ray) pair — the same type-partitioned math as
ops/fast.py's `_winner_grouped_T`, in the same [objects, rays]
orientation (objects on sublanes, rays on lanes) — then reduces to the
per-ray argmin winner index.  Nothing [N, R]-shaped ever touches HBM:
the kernel reads 8 f32 per ray and writes 1 int32 per ray.

The kernel returns ONLY the winner index.  That is deliberate: argmin is
piecewise-constant (zero gradient), so the index needs no autodiff, while
the winner-record fetch and hit-attribute reconstruction stay in plain
XLA (ops/fast.py epilogue) where they are differentiable w.r.t. scene
parameters.  No custom_vjp is needed, and the `hit_idx` remat-name
policy (integrator.py) saves the kernel's output so no backward replay
re-enters the kernel.

Layout: each type group starts at an 8-sublane boundary (sphere rows
[0, n_s), platform rows [ns8, ns8+n_p), cylinder rows [ns8+np8, ..)), so
per-group slices are relayout-free; in-group padding rows are masked to
+INF by row-index iota.  The kernel maps the padded row index back to
the GroupedScene's dense grouped index before writing, so callers feed
the winner straight into the ops/fast.py record matmul.

Validated against fast._winner_grouped_T in tests/test_pallas_kernel.py
(interpret mode on CPU; native Mosaic on TPU).

Reference semantics matched (via fast.py): sphere/platform/cylinder
analytic tests of /root/reference/cuSrc/object.cu:10-112 with the
tmin/tmax window and near-else-far root selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX

# python float (not a jnp array) — pallas kernels must not capture tracers
_INF = float(np.float32(DEFAULT_RAY_TMAX))


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _winner_kernel(counts, rays_ref, geom_ref, out_ref):
    """One ray tile: per-group candidates -> argmin -> grouped index.

    rays_ref: f32[8, TR] rows = ox, oy, oz, dx, dy, dz, tmin, tmax.
    geom_ref: f32[N_rep, 8] lanes = cx, cy, cz, radius, y_pos, height,
      cc_minus_r2 (|c|^2 - r^2), cc2_minus_r2 (cx^2+cz^2 - r^2); rows in
      8-aligned group blocks [S*|P*|C*].
    out_ref: i32[1, TR] winner index in DENSE GROUPED coordinates.
    """
    n_s, n_p, n_c = counts
    ns8, np8, nc8 = _ceil8(n_s), _ceil8(n_p), _ceil8(n_c)

    ox = rays_ref[0:1, :]  # [1, TR]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    tr = rays_ref.shape[1]
    best_t = jnp.full((1, tr), _INF, jnp.float32)
    best_i = jnp.zeros((1, tr), jnp.int32)

    def combine(best_t, best_i, t_grp, n_real, base):
        # mask in-group padding rows, reduce over the sublane axis
        row = jax.lax.broadcasted_iota(jnp.int32, t_grp.shape, 0)
        t_grp = jnp.where(row < n_real, t_grp, _INF)
        t_g = jnp.min(t_grp, axis=0, keepdims=True)  # [1, TR]
        i_g = jnp.argmin(t_grp, axis=0).astype(jnp.int32)[None, :] + base
        better = t_g < best_t
        return jnp.where(better, t_g, best_t), jnp.where(better, i_g, best_i)

    if n_s:
        g = geom_ref[0:ns8, :]  # [Ns8, 8]
        cx, cy, cz = g[:, 0:1], g[:, 1:2], g[:, 2:3]  # [Ns8, 1]
        cc = g[:, 6:7]
        od = ox * dx + oy * dy + oz * dz  # [1, TR]
        oo = ox * ox + oy * oy + oz * oz
        a = dx * dx + dy * dy + dz * dz
        oc = cx * ox + cy * oy + cz * oz  # [Ns8, TR] rank-1 broadcasts
        dc = cx * dx + cy * dy + cz * dz
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
        best_t, best_i = combine(best_t, best_i, t_sph, n_s, 0)

    if n_p:
        g = geom_ref[ns8 : ns8 + np8, :]
        y0 = g[:, 4:5]  # [Np8, 1]
        crossing = ((oy < y0) & (dy > 0.0)) | ((oy > y0) & (dy < 0.0))
        t = (y0 - oy) / jnp.where(dy == 0.0, 1.0, dy)
        v = crossing & (t < tmax) & (t > tmin)
        best_t, best_i = combine(
            best_t, best_i, jnp.where(v, t, _INF), n_p, n_s
        )

    if n_c:
        g = geom_ref[ns8 + np8 : ns8 + np8 + nc8, :]
        cx, cy, cz = g[:, 0:1], g[:, 1:2], g[:, 2:3]
        radius = g[:, 3:4]
        height = g[:, 5:6]
        cc2 = g[:, 7:8]
        y_top = cy + height * 0.5
        y_bot = cy - height * 0.5

        def cap(y_plane):
            crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
            t = (y_plane - oy) / jnp.where(dy == 0.0, 1.0, dy)
            hx = ox + t * dx
            hz = oz + t * dz
            r2 = (hx - cx) ** 2 + (hz - cz) ** 2
            v = (
                crossing & (t < tmax) & (t > tmin)
                & (radius > 0.0) & (r2 < radius * radius)
            )
            return jnp.where(v, t, _INF)

        t_cap = jnp.minimum(cap(y_top), cap(y_bot))

        od2 = ox * dx + oz * dz
        oo2 = ox * ox + oz * oz
        ax = dx * dx + dz * dz
        oc2 = cx * ox + cz * oz
        dc2 = cx * dx + cz * dz
        b2 = od2 - dc2
        cq = oo2 - 2.0 * oc2 + cc2
        disc2 = b2 * b2 - ax * cq
        has2 = disc2 > 0
        sq2 = jnp.sqrt(jnp.where(has2, disc2, 1.0))
        inv_ax = 1.0 / jnp.where(ax == 0.0, 1.0, ax)
        t_ln = (-b2 - sq2) * inv_ax
        t_lf = (-b2 + sq2) * inv_ax

        def lat_ok(t):
            hy = oy + t * dy
            return has2 & (t < tmax) & (t > tmin) & (hy > y_bot) & (hy < y_top)

        t_lat = jnp.minimum(
            jnp.where(lat_ok(t_ln), t_ln, _INF),
            jnp.where(lat_ok(t_lf), t_lf, _INF),
        )
        best_t, best_i = combine(
            best_t, best_i, jnp.minimum(t_cap, t_lat), n_c, n_s + n_p
        )

    out_ref[:, :] = best_i


def _winner_kernel_mxu_planar(
    counts, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tmin_ref, tmax_ref, geom_ref, gmx_ref, out_ref,
):
    """Planar-I/O wrapper of :func:`_mxu_best_index`: the eight ray
    planes arrive as separate 1D f32[TR] refs with perfect {T(1024)}
    tiling and the winner index leaves as 1D i32[TR].

    Why: feeding the kernel a stacked f32[8, R] forces an XLA-side
    concatenate whose [1, R]{T(1,128)} operand layout propagates BACKWARD
    through the whole elementwise bounce body (shade, epilogue), running
    it at 1/8 VPU width (profiled ~47 ms/sample-loop at 1024^2).  Packing
    in-kernel keeps every XLA-side plane {T(1024)}; the 1D->2D relayouts
    here cost a few shuffles per vreg."""
    best_i = _mxu_best_index(
        counts,
        ox_ref[...][None, :], oy_ref[...][None, :], oz_ref[...][None, :],
        dx_ref[...][None, :], dy_ref[...][None, :], dz_ref[...][None, :],
        tmin_ref[...][None, :], tmax_ref[...][None, :],
        geom_ref[...], gmx_ref[...],
    )
    out_ref[...] = best_i[0]


def _winner_kernel_mxu(counts, rays_ref, geom_ref, gmx_ref, out_ref):
    """Packed-[8, R] entry of :func:`_mxu_best_index`."""
    out_ref[:, :] = _mxu_best_index(
        counts,
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
        rays_ref[6:7, :], rays_ref[7:8, :],
        geom_ref[...], gmx_ref[...],
    )


def _mxu_best_index(counts, ox, oy, oz, dx, dy, dz, tmin, tmax, geom, gmx):
    """Closest-hit winner index (MXU kernel core, value-level).

    All ray components are f32[1, TR] rows; geom f32[N_rep, 8]
    (:func:`build_geom_rows`), gmx f32[M, 11] (:func:`build_geom_mxu`).
    Returns i32[1, TR] in DENSE grouped coordinates.

    MXU trick: the quadratic coefficients b, c of every sphere and
    cylinder are affine in 11 per-ray features
      [ox oy oz dx dy dz 1 o.o o.d |o|2_xz (o.d)_xz]
    so ONE [M, 11] @ [11, TR] matmul produces them all on the MXU; the
    VPU tail per (object, ray) pair drops from ~33 to ~19 ops (spheres) /
    ~71 to ~45 (cylinders).  Per-ray reciprocals (1/a, 1/dy, 1/ax2) are
    hoisted to [1, TR] rows.  Same windows/tie-breaks as
    :func:`_winner_kernel`; fp rounding differs in final ulps (MXU f32
    passes + hoisted reciprocals), which can flip exact-tie/tangency
    winners — physically equivalent (tests/test_pallas_kernel.py checks
    index equality up to t-ties).
    """
    n_s, n_p, n_c = counts
    ns8, np8, nc8 = _ceil8(n_s), _ceil8(n_p), _ceil8(n_c)
    geom_ref = geom
    tr = ox.shape[1]
    best_t = jnp.full((1, tr), _INF, jnp.float32)
    best_i = jnp.zeros((1, tr), jnp.int32)

    ones = jnp.ones((1, tr), jnp.float32)
    oo = ox * ox + oy * oy + oz * oz
    od = ox * dx + oy * dy + oz * dz
    a = dx * dx + dy * dy + dz * dz
    oo2 = ox * ox + oz * oz
    od2 = ox * dx + oz * dz
    rm = jnp.concatenate(
        [ox, oy, oz, dx, dy, dz, ones, oo, od, oo2, od2], axis=0
    )  # [11, TR]
    bc = jax.lax.dot_general(
        gmx, rm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Mosaic's Pallas dot lowering supports only DEFAULT/HIGHEST —
        # Precision.HIGH raises NotImplementedError at compile (r3 regression).
        precision=jax.lax.Precision.HIGHEST,
    )  # [M, TR]: [b_s | c_s | b2_c | c2_c] blocks, 8-row aligned

    def combine(best_t, best_i, t_grp, n_real, base):
        row = jax.lax.broadcasted_iota(jnp.int32, t_grp.shape, 0)
        t_grp = jnp.where(row < n_real, t_grp, _INF)
        t_g = jnp.min(t_grp, axis=0, keepdims=True)
        i_g = jnp.argmin(t_grp, axis=0).astype(jnp.int32)[None, :] + base
        better = t_g < best_t
        return jnp.where(better, t_g, best_t), jnp.where(better, i_g, best_i)

    if n_s:
        b = bc[0:ns8, :]
        cq = bc[ns8 : 2 * ns8, :]
        disc = b * b - a * cq
        has = disc > 0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        inv_a = 1.0 / jnp.where(a == 0.0, 1.0, a)  # [1, TR]
        t_near = (-b - sq) * inv_a
        t_far = (-b + sq) * inv_a
        nv = has & (t_near < tmax) & (t_near > tmin)
        fv = has & (t_far < tmax) & (t_far > tmin)
        t_sph = jnp.where(nv, t_near, jnp.where(fv, t_far, _INF))
        best_t, best_i = combine(best_t, best_i, t_sph, n_s, 0)

    if n_p:
        g = geom_ref[ns8 : ns8 + np8, :]
        y0 = g[:, 4:5]  # [Np8, 1]
        crossing = ((oy < y0) & (dy > 0.0)) | ((oy > y0) & (dy < 0.0))
        t = (y0 - oy) / jnp.where(dy == 0.0, 1.0, dy)
        v = crossing & (t < tmax) & (t > tmin)
        best_t, best_i = combine(best_t, best_i, jnp.where(v, t, _INF), n_p, n_s)

    if n_c:
        g = geom_ref[ns8 + np8 : ns8 + np8 + nc8, :]
        cy = g[:, 1:2]
        radius = g[:, 3:4]
        height = g[:, 5:6]
        y_top = cy + height * 0.5
        y_bot = cy - height * 0.5
        inv_dy = 1.0 / jnp.where(dy == 0.0, 1.0, dy)  # [1, TR]
        dy_ok = dy != 0.0
        dy_pos = dy > 0.0

        m0 = 2 * ns8
        b2 = bc[m0 : m0 + nc8, :]
        cq2 = bc[m0 + nc8 : m0 + 2 * nc8, :]
        ax = dx * dx + dz * dz
        disc2 = b2 * b2 - ax * cq2
        has2 = disc2 > 0
        sq2 = jnp.sqrt(jnp.where(has2, disc2, 1.0))
        inv_ax = 1.0 / jnp.where(ax == 0.0, 1.0, ax)
        t_ln = (-b2 - sq2) * inv_ax
        t_lf = (-b2 + sq2) * inv_ax

        # Cap-plane crossing times double as the y-band expressed in
        # t-space: hy(t) in (y_bot, y_top) <=> t between the two cap
        # times, ordered by sign(dy) (exact algebra; dy == 0 degenerates
        # to the static oy-in-band test).  This replaces the hy
        # recomputation per lateral root AND the hx/hz/r2 evaluation per
        # cap (below) — ~15% fewer VPU ops per (cylinder, ray) pair.
        ty_b = (y_bot - oy) * inv_dy  # [Nc8, TR]
        ty_t = (y_top - oy) * inv_dy
        inband = (oy > y_bot) & (oy < y_top)
        t_band_lo = jnp.where(dy_pos, ty_b, ty_t)
        t_band_hi = jnp.where(dy_pos, ty_t, ty_b)
        t_band_lo = jnp.where(dy_ok, t_band_lo, jnp.where(inband, -_INF, _INF))
        t_band_hi = jnp.where(dy_ok, t_band_hi, jnp.where(inband, _INF, -_INF))

        def lat_ok(t):
            return (
                has2 & (t < tmax) & (t > tmin)
                & (t > t_band_lo) & (t < t_band_hi)
            )

        t_lat = jnp.minimum(
            jnp.where(lat_ok(t_ln), t_ln, _INF),
            jnp.where(lat_ok(t_lf), t_lf, _INF),
        )

        # Cap validity: r2 < r*r at the cap time <=> the lateral
        # quadratic is negative there <=> t strictly between its roots
        # (ax == 0 degenerates to cq2 < 0; ax > 0 with disc2 <= 0 means
        # never inside, and then cq2 = (b2^2 - disc2)/ax >= 0 so the
        # same cq2 < 0 fallback is correct).  crossing ≡ (t > 0) & dy_ok
        # and tmin >= 0 makes the window check subsume t > 0.
        cq2_neg = cq2 < 0.0
        cap_gate = dy_ok & (radius > 0.0)

        # (bool select spelled as and/or: Mosaic rejects i1 select_n)
        no_roots_inside = ~has2 & cq2_neg

        def cap_ok(t):
            between = (has2 & (t > t_ln) & (t < t_lf)) | no_roots_inside
            return cap_gate & (t < tmax) & (t > tmin) & between

        t_cap = jnp.minimum(
            jnp.where(cap_ok(ty_t), ty_t, _INF),
            jnp.where(cap_ok(ty_b), ty_b, _INF),
        )
        best_t, best_i = combine(
            best_t, best_i, jnp.minimum(t_cap, t_lat), n_c, n_s + n_p
        )

    return best_i


def build_geom_mxu(gs):
    """Coefficient matrix G[M, 11] for :func:`_winner_kernel_mxu`.

    Feature order: [ox oy oz dx dy dz 1 oo od oo2 od2].  Row blocks
    (each 8-aligned): sphere b rows [0, Ns8), sphere c rows [Ns8, 2Ns8),
    cylinder b2 rows [2Ns8, 2Ns8+Nc8), cylinder c2 rows [+Nc8, +2Nc8).
      b  = od  - c.d             c  = oo  - 2 o.c  + (|c|^2 - r^2)
      b2 = od2 - (cx dx + cz dz) c2 = oo2 - 2(cx ox + cz oz) + (cx^2+cz^2-r^2)
    """
    n_s, n_p, n_c = gs.counts
    ns8, nc8 = _ceil8(n_s), _ceil8(n_c)
    m = max(8, 2 * ns8 + 2 * nc8)
    # built with jnp (scene params may be traced for geometry gradients)
    gm = jnp.zeros((m, 11), jnp.float32)
    if n_s:
        c_s = gs.center[:n_s]
        r_s = gs.radius[:n_s]
        cc = jnp.sum(c_s * c_s, -1) - r_s * r_s
        b_rows = jnp.concatenate(
            [
                jnp.zeros((n_s, 3), jnp.float32), -c_s,
                jnp.zeros((n_s, 2), jnp.float32),
                jnp.ones((n_s, 1), jnp.float32),
                jnp.zeros((n_s, 2), jnp.float32),
            ], axis=1,
        )
        c_rows = jnp.concatenate(
            [
                -2.0 * c_s, jnp.zeros((n_s, 3), jnp.float32),
                cc[:, None],
                jnp.ones((n_s, 1), jnp.float32),
                jnp.zeros((n_s, 3), jnp.float32),
            ], axis=1,
        )
        gm = gm.at[0:n_s].set(b_rows)
        gm = gm.at[ns8 : ns8 + n_s].set(c_rows)
    if n_c:
        sl = slice(n_s + n_p, n_s + n_p + n_c)
        c_c = gs.center[sl]
        r_c = gs.radius[sl]
        zc = jnp.zeros((n_c, 1), jnp.float32)
        onec = jnp.ones((n_c, 1), jnp.float32)
        cc2 = c_c[:, 0] ** 2 + c_c[:, 2] ** 2 - r_c * r_c
        b2_rows = jnp.concatenate(
            [
                zc, zc, zc,
                -c_c[:, 0:1], zc, -c_c[:, 2:3],
                zc, zc, zc, zc, onec,
            ], axis=1,
        )
        c2_rows = jnp.concatenate(
            [
                -2.0 * c_c[:, 0:1], zc, -2.0 * c_c[:, 2:3],
                zc, zc, zc,
                cc2[:, None], zc, zc, onec, zc,
            ], axis=1,
        )
        m0 = 2 * ns8
        gm = gm.at[m0 : m0 + n_c].set(b2_rows)
        gm = gm.at[m0 + nc8 : m0 + nc8 + n_c].set(c2_rows)
    return gm


@functools.partial(
    jax.jit, static_argnames=("counts", "tile", "interpret")
)
def pallas_winner_index_planar(
    o, d, tmin, tmax, geom, gmx, *, counts, tile=1024, interpret=False
):
    """Winner index from planar ray components (o, d are tuples of f32[R]);
    returns i32[R].  R must be a multiple of `tile` (caller pads).  MXU
    kernel variant with planar in/out — see _winner_kernel_mxu_planar."""
    r = tmin.shape[0]
    assert r % tile == 0, (r, tile)
    n_rep = geom.shape[0]
    m = gmx.shape[0]
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_winner_kernel_mxu_planar, counts),
        grid=(r // tile,),
        in_specs=[spec1d] * 8 + [
            pl.BlockSpec((n_rep, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 11), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec1d,
        out_shape=jax.ShapeDtypeStruct((r,), jnp.int32),
        interpret=interpret,
    )(o[0], o[1], o[2], d[0], d[1], d[2], tmin, tmax, geom, gmx)


@functools.partial(
    jax.jit, static_argnames=("counts", "tile", "interpret", "variant")
)
def pallas_winner_index_v(
    rays_packed, geom, gmx, *, counts, tile=1024, interpret=False, variant="vpu"
):
    """Winner index with selectable kernel variant ("vpu" or "mxu")."""
    r = rays_packed.shape[1]
    assert r % tile == 0, (r, tile)
    n_rep = geom.shape[0]
    if variant == "mxu":
        m = gmx.shape[0]
        out = pl.pallas_call(
            functools.partial(_winner_kernel_mxu, counts),
            grid=(r // tile,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rep, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, 11), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, r), jnp.int32),
            interpret=interpret,
        )(rays_packed, geom, gmx)
        return out[0]
    return pallas_winner_index(
        rays_packed, geom, counts=counts, tile=tile, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("counts", "tile", "interpret"))
def pallas_winner_index(rays_packed, geom, *, counts, tile=1024, interpret=False):
    """Winner index (dense grouped coordinates) per ray.

    rays_packed: f32[8, R] rows ox..oz, dx..dz, tmin, tmax; R must be a
    multiple of `tile` (caller pads).  geom: f32[N_rep, 8] from
    :func:`build_geom_rows`.  Returns i32[R].
    """
    r = rays_packed.shape[1]
    assert r % tile == 0, (r, tile)
    n_rep = geom.shape[0]
    out = pl.pallas_call(
        functools.partial(_winner_kernel, counts),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rep, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.int32),
        interpret=interpret,
    )(rays_packed, geom)
    return out[0]


def build_geom_rows(gs):
    """Pack a GroupedScene's geometry into the kernel's [N_rep, 8] layout:
    each type group 8-row aligned ([S pad | P pad | C pad]), fields on
    lanes, plus the precomputed quadratic constants."""
    n_s, n_p, n_c = gs.counts
    ns8, np8, nc8 = _ceil8(n_s), _ceil8(n_p), _ceil8(n_c)
    n_rep = max(8, ns8 + np8 + nc8)
    cc = jnp.sum(gs.center * gs.center, -1) - gs.radius * gs.radius
    cc2 = gs.center[:, 0] ** 2 + gs.center[:, 2] ** 2 - gs.radius * gs.radius
    fields = jnp.stack(
        [
            gs.center[:, 0],
            gs.center[:, 1],
            gs.center[:, 2],
            gs.radius,
            gs.y_pos,
            gs.height,
            cc,
            cc2,
        ],
        axis=1,
    )  # [Ng, 8] dense grouped order
    geom = jnp.zeros((n_rep, 8), jnp.float32)
    geom = geom.at[0:n_s].set(fields[0:n_s])
    geom = geom.at[ns8 : ns8 + n_p].set(fields[n_s : n_s + n_p])
    geom = geom.at[ns8 + np8 : ns8 + np8 + n_c].set(
        fields[n_s + n_p : n_s + n_p + n_c]
    )
    return geom
