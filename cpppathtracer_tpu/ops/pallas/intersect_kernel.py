"""Pallas TPU kernel: fused closest-hit + winner-record fetch.

One kernel invocation per ray tile computes, entirely in VMEM:
  candidate t's for every (ray, object) pair (type-partitioned, the same
  matmul-form math as ops/fast.py) -> argmin over objects -> one-hot
  winner-record matmul against the packed parameter table.

Fusing these stages inside one kernel keeps the [TR, N] candidate matrix
and the one-hot matrix in VMEM for their whole lifetime — XLA's fusion
usually achieves the same for the elementwise chain but materializes the
argmin input and the one-hot separately; the kernel also gives explicit
control of the tile shape (TR x 128-padded objects).

Layout: rays enter as SoA columns [R] (padded to the tile grid); the
scene enters as padded [Np, 128]-friendly tables where Np = objects
rounded up to 8.  Object count is static (scene sizes are small); the
whole scene lives in VMEM (<= a few KB).

The kernel is forward-only; gradients route through the XLA fast path
via `jax.custom_vjp` recompute (see integrator wiring) — the backward
math is identical, so autodiff results are unchanged.

Validated against ops/fast.intersect_and_gather in
tests/test_pallas_kernel.py (interpret mode on CPU; native on TPU).
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


def _kernel(counts, n_pad, rays_ref, geom_ref, table_ref, rec_ref, t_ref):
    """One ray tile: candidates -> argmin -> record matmul.

    rays_ref: f32[TR, 8] columns = ox, oy, oz, dx, dy, dz, tmin, tmax.
    geom_ref: f32[8, n_pad] rows = cx, cy, cz, radius, y_pos, height,
      cc_minus_r2 (|c|^2 - r^2), cc2_minus_r2 (cx^2+cz^2 - r^2).
    table_ref: f32[n_pad, F] packed record table (fast.py layout).
    rec_ref: f32[TR, F] winner records.  t_ref: f32[TR, 1] winner t.
    """
    n_s, n_p, n_c = counts
    rays = rays_ref[:]
    ox = rays[:, 0:1]  # [TR, 1]
    oy = rays[:, 1:2]
    oz = rays[:, 2:3]
    dx = rays[:, 3:4]
    dy = rays[:, 4:5]
    dz = rays[:, 5:6]
    tmin = rays[:, 6:7]
    tmax = rays[:, 7:8]

    cx = geom_ref[0:1, :]  # [1, N]
    cy = geom_ref[1:2, :]
    cz = geom_ref[2:3, :]
    radius = geom_ref[3:4, :]
    y_pos = geom_ref[4:5, :]
    height = geom_ref[5:6, :]
    cc = geom_ref[6:7, :]
    cc2 = geom_ref[7:8, :]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # --- sphere candidates (object.cu:10-35, matmul-form) ---
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    a = dx * dx + dy * dy + dz * dz
    oc = ox * cx + oy * cy + oz * cz  # [TR, N] rank-1 broadcasts
    dc = dx * cx + dy * cy + dz * cz
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

    # --- platform candidates (object.cu:37-48) ---
    crossing = ((oy < y_pos) & (dy > 0.0)) | ((oy > y_pos) & (dy < 0.0))
    t_pl = (y_pos - oy) / jnp.where(dy == 0.0, 1.0, dy)
    pv = crossing & (t_pl < tmax) & (t_pl > tmin)
    t_plat = jnp.where(pv, t_pl, _INF)

    # --- cylinder candidates (object.cu:50-112) ---
    y_top = cy + height * 0.5
    y_bot = cy - height * 0.5

    def cap(y_plane):
        crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
        t = (y_plane - oy) / jnp.where(dy == 0.0, 1.0, dy)
        hx = ox + t * dx
        hz = oz + t * dz
        r2 = (hx - cx) ** 2 + (hz - cz) ** 2
        v = crossing & (t < tmax) & (t > tmin) & (radius > 0.0) & (r2 < radius * radius)
        return jnp.where(v, t, _INF)

    t_cap = jnp.minimum(cap(y_top), cap(y_bot))
    od2 = ox * dx + oz * dz
    oo2 = ox * ox + oz * oz
    ax = dx * dx + dz * dz
    oc2 = ox * cx + oz * cz
    dc2 = dx * cx + dz * cz
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
        jnp.where(lat_ok(t_ln), t_ln, _INF), jnp.where(lat_ok(t_lf), t_lf, _INF)
    )
    t_cyl = jnp.minimum(t_cap, t_lat)

    # --- select by type partition (grouped order: S | P | C | pad) ---
    t_all = jnp.where(
        col < n_s,
        t_sph,
        jnp.where(
            col < n_s + n_p,
            t_plat,
            jnp.where(col < n_s + n_p + n_c, t_cyl, _INF),
        ),
    )

    t_best = jnp.min(t_all, axis=1, keepdims=True)  # [TR, 1]
    gidx = jnp.argmin(t_all, axis=1).astype(jnp.int32)[:, None]  # [TR, 1]
    onehot = (col == gidx).astype(jnp.float32)  # [TR, N]
    rec_ref[:] = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)
    t_ref[:] = t_best


@functools.partial(jax.jit, static_argnames=("counts", "tile", "interpret"))
def pallas_intersect_records(origin, direction, tmin, tmax, geom, table, *,
                             counts, tile=1024, interpret=False):
    """Winner (record, t) per ray via the fused Pallas kernel.

    origin/direction: f32[R,3]; tmin/tmax: f32[R]; geom: f32[8, Np];
    table: f32[Np, F].  R must be a multiple of `tile` (caller pads).
    """
    r = origin.shape[0]
    assert r % tile == 0, (r, tile)
    n_pad = geom.shape[1]
    f = table.shape[1]
    rays_packed = jnp.concatenate(
        [origin, direction, tmin[:, None], tmax[:, None]], axis=1
    )  # [R, 8]
    full_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    rec, t = pl.pallas_call(
        functools.partial(_kernel, counts, n_pad),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full_spec((8, n_pad)),
            full_spec((n_pad, f)),
        ],
        out_specs=(
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, f), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        interpret=interpret,
    )(rays_packed, geom, table)
    return rec, t[:, 0]


def build_geom(gs):
    """Pack a GroupedScene's geometry into the kernel's [8, Np] layout
    (Np = objects padded to a multiple of 128 lanes)."""
    n = gs.center.shape[0]
    n_pad = max(128, -(-n // 128) * 128)
    pad1 = lambda x: jnp.pad(x, (0, n_pad - n))
    cc = jnp.sum(gs.center * gs.center, -1) - gs.radius * gs.radius
    cc2 = gs.center[:, 0] ** 2 + gs.center[:, 2] ** 2 - gs.radius * gs.radius
    geom = jnp.stack(
        [
            pad1(gs.center[:, 0]),
            pad1(gs.center[:, 1]),
            pad1(gs.center[:, 2]),
            pad1(gs.radius),
            pad1(gs.y_pos),
            pad1(gs.height),
            pad1(cc),
            pad1(cc2),
        ]
    )
    f = gs.table.shape[1]
    table = jnp.zeros((n_pad, f), jnp.float32).at[:n].set(gs.table)
    return geom, table
