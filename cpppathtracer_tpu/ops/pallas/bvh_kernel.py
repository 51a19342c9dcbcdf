"""Pallas TPU stackless BVH traversal kernel (tile-coherent skip-pointer
walk).

TPU re-design of `SceneBVH::TraceRay` (`cuSrc/bvh.cu:167-205`): the
reference gives every GPU thread its own 512-slot node stack and lets
threads diverge; TPU lanes cannot diverge, so instead ONE preorder node
walk is shared by a whole ray tile:

  node = 0
  while node < M:
      # inner scalar walk: slab-test nodes, descend on overlap, skip via
      # escape pointers, stop at the next any-lane-overlapping LEAF
      while internal(node) or not overlap(node): advance(node)
      test the leaf's K objects against all lanes (vector math),
      shrink best_t (the reference's ray.tmax shrink)
      node = escape(node)

Node metadata reads are UNIFORM scalars (SMEM — the Pallas
scalar-memory space), all per-ray work is full-width VPU vector math,
and leaf object rows are K=8 sublane-aligned so a leaf test is one
[K, TILE] vectorized candidate evaluation (the same analytic forms as
ops/fast.py's grouped winner, `object.cu:10-112`).  Rays in a tile are
pixel-coherent for primary rays, so the walk visits ~the union of the
per-ray traversals; the `local_tmin <= best_t` pruning tightens as hits
accumulate, like the reference's tmax shrink.

Returns the winner's GROUPED object index per ray (0 when nothing hit —
the differentiable gather epilogue recomputes t and decides `hit`, same
contract as intersect_kernel's winner).  Tie-break: first-found strictly
closer wins (traversal order), vs the dense path's lowest-index-on-equal
— identical except on exact float ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX, PrimitiveType

_INF = float(np.float32(DEFAULT_RAY_TMAX))


def _leaf_candidates(rows, o, d, tmin, tmax):
    """Candidate t [K, TR] for K packed object rows vs a ray tile.

    rows: f32[K, 8] (cx, cy, cz, radius, y_pos, height, prim_type, gidx);
    o, d planar vec3 of f32[TR]; tmin/tmax f32[TR] (tmax = current best).
    Same analytic forms and validity windows as ops/fast.py
    (`object.cu:10-112`); prim_type -1 padding rows never hit.
    """
    ox, oy, oz = o[0][None, :], o[1][None, :], o[2][None, :]
    dx, dy, dz = d[0][None, :], d[1][None, :], d[2][None, :]
    tn = tmin[None, :]
    tx = tmax[None, :]
    cx = rows[:, 0:1]
    cy = rows[:, 1:2]
    cz = rows[:, 2:3]
    rr = rows[:, 3:4]
    y0 = rows[:, 4:5]
    hh = rows[:, 5:6]
    pt = rows[:, 6:7].astype(jnp.int32)

    inv = lambda a: 1.0 / jnp.where(a == 0.0, 1.0, a)

    # sphere (object.cu:10-35)
    a = dx * dx + dy * dy + dz * dz
    b = (ox - cx) * dx + (oy - cy) * dy + (oz - cz) * dz
    c = (ox - cx) ** 2 + (oy - cy) ** 2 + (oz - cz) ** 2 - rr * rr
    disc = b * b - a * c
    has = disc > 0
    sq = jnp.sqrt(jnp.where(has, disc, 1.0))
    inv_a = inv(a)
    t_sn = (-b - sq) * inv_a
    t_sf = (-b + sq) * inv_a
    nv = has & (t_sn < tx) & (t_sn > tn)
    fv = has & (t_sf < tx) & (t_sf > tn)
    t_sph = jnp.where(nv, t_sn, jnp.where(fv, t_sf, _INF))

    # platform (object.cu:37-48)
    crossing = ((oy < y0) & (dy > 0.0)) | ((oy > y0) & (dy < 0.0))
    t_p = (y0 - oy) * inv(dy)
    v_p = crossing & (t_p < tx) & (t_p > tn)
    t_plat = jnp.where(v_p, t_p, _INF)

    # cylinder (object.cu:50-112)
    y_top = cy + hh * 0.5
    y_bot = cy - hh * 0.5

    def cap(y_plane):
        crossing = ((oy < y_plane) & (dy > 0.0)) | ((oy > y_plane) & (dy < 0.0))
        t = (y_plane - oy) * inv(dy)
        hx = ox + t * dx
        hz = oz + t * dz
        r2 = (hx - cx) ** 2 + (hz - cz) ** 2
        v = crossing & (t < tx) & (t > tn) & (rr > 0.0) & (r2 < rr * rr)
        return jnp.where(v, t, _INF)

    t_cap = jnp.minimum(cap(y_top), cap(y_bot))
    ax = dx * dx + dz * dz
    bc = (ox - cx) * dx + (oz - cz) * dz
    cc = (ox - cx) ** 2 + (oz - cz) ** 2 - rr * rr
    disc_c = bc * bc - ax * cc
    has_c = disc_c > 0
    sq_c = jnp.sqrt(jnp.where(has_c, disc_c, 1.0))
    inv_ax = inv(ax)
    t_ln = (-bc - sq_c) * inv_ax
    t_lf = (-bc + sq_c) * inv_ax

    def lat_ok(t):
        hy = oy + t * dy
        return has_c & (t < tx) & (t > tn) & (hy > y_bot) & (hy < y_top)

    t_lat = jnp.minimum(
        jnp.where(lat_ok(t_ln), t_ln, _INF), jnp.where(lat_ok(t_lf), t_lf, _INF)
    )
    t_cyl = jnp.minimum(t_cap, t_lat)

    t = jnp.where(
        pt == PrimitiveType.SPHERE,
        t_sph,
        jnp.where(
            pt == PrimitiveType.PLATFORM,
            t_plat,
            jnp.where(pt == PrimitiveType.CYLINDER, t_cyl, _INF),
        ),
    )
    return t


def _bvh_kernel(
    m, k,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
    meta_ref, aabb_ref, objs_ref,
    best_i_ref,
):
    # TWO-LEVEL walk (no `lax.cond`): an inner scalar-carry while advances
    # through internal/non-overlapping nodes with slab tests only, stopping
    # at the next any-lane-overlapping LEAF; the outer body then evaluates
    # that leaf's K candidates unconditionally.  Leaf math runs exactly
    # once per overlapping leaf — strictly less work than a single-level
    # loop — and, critically, Mosaic's layout inference crashes
    # (`Check failed: arr.size() >= layout_rank`, observed on v5e) when
    # values derived from a dynamically-sliced VMEM block flow out of a
    # `lax.cond` inside a `lax.while_loop`; unconditional leaf math inside
    # the loop body lowers fine.
    o = (ox_ref[...], oy_ref[...], oz_ref[...])
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    tmin = tmin_ref[...]
    tmax0 = tmax_ref[...]
    tr = tmin.shape[0]

    # slab-test precomputation: per-axis reciprocal with the d==0
    # unconstrained convention of the XLA traversal (ops/bvh.py:274-280)
    inv_d = tuple(1.0 / jnp.where(c == 0.0, 1.0, c) for c in d)
    dz_mask = tuple(c == 0.0 for c in d)

    def slab_meta(node, best_t):
        """(any-lane overlap, is_leaf, escape) for one node (uniform
        scalar SMEM reads + full-width slab test)."""
        lo = jnp.full((tr,), -2.0 * _INF)
        hi = jnp.full((tr,), 2.0 * _INF)
        for ax in range(3):
            mn = aabb_ref[node, ax]
            mx = aabb_ref[node, 3 + ax]
            t0 = (mn - o[ax]) * inv_d[ax]
            t1 = (mx - o[ax]) * inv_d[ax]
            alo = jnp.minimum(t0, t1)
            ahi = jnp.maximum(t0, t1)
            alo = jnp.where(dz_mask[ax], -2.0 * _INF, alo)
            ahi = jnp.where(dz_mask[ax], 2.0 * _INF, ahi)
            lo = jnp.maximum(lo, alo)
            hi = jnp.minimum(hi, ahi)
        overlap = (lo <= hi) & (lo <= best_t) & (hi >= tmin)
        return jnp.any(overlap), meta_ref[node, 1] >= 0, meta_ref[node, 0]

    def outer_body(state):
        node, best_t, best_i = state

        # inner: skip to the next overlapping leaf (or past the end).
        # Preorder position strictly increases (skip pointers point
        # forward), so this terminates.
        def ibody(s):
            nd, _ = s
            hit_any, is_leaf, esc = slab_meta(nd, best_t)
            stop_here = hit_any & is_leaf
            nxt = jnp.where(stop_here, nd, jnp.where(hit_any, nd + 1, esc))
            return nxt, stop_here | (nxt >= m)

        node, _ = jax.lax.while_loop(
            lambda s: ~s[1], ibody, (node, node >= m)
        )

        # unconditional leaf evaluation (node < m implies an overlapping
        # leaf; clamp reads so the node==m exit path stays in bounds)
        nd_safe = jnp.minimum(node, m - 1)
        leaf = jnp.maximum(meta_ref[nd_safe, 1], 0)
        valid = node < m
        # leaf rows via a leading-dim index of the [L, K, 8] view: the
        # 2D form `objs_ref[pl.ds(leaf * k, k), :]` SILENTLY READS THE
        # WRONG ROWS for k > 8 on real TPU (dynamic sublane slices wider
        # than one 8-row group; observed as fabricated closer hits on
        # 0.065% of primary rays at k=16/32 — interpret mode and k=8 are
        # unaffected)
        rows = objs_ref[leaf]  # [K, 8]
        t_cand = _leaf_candidates(rows, o, d, tmin, best_t)  # [K, TR]
        t_min = jnp.min(t_cand, axis=0)
        gidx = rows[:, 7:8].astype(jnp.int32)  # [K, 1]
        win = jnp.min(
            jnp.where(t_cand == t_min[None, :], gidx, jnp.int32(2**30)),
            axis=0,
        )
        better = (t_min < best_t) & valid
        best_t = jnp.where(better, t_min, best_t)
        best_i = jnp.where(better, win, best_i)
        node = jnp.where(valid, meta_ref[nd_safe, 0], m)  # leaf's escape
        return node, best_t, best_i

    _, _, best_i = jax.lax.while_loop(
        lambda st: st[0] < m, outer_body,
        (jnp.int32(0), tmax0, jnp.zeros((tr,), jnp.int32)),
    )
    best_i_ref[...] = best_i


@functools.partial(
    jax.jit, static_argnames=("m", "k", "tile", "interpret")
)
def pallas_bvh_winner_index(
    o, d, tmin, tmax, node_meta, node_aabb, leaf_objs,
    *, m, k, tile=1024, interpret=False,
):
    """Winner (grouped) object index per ray via the skip-pointer walk.

    o/d planar vec3 tuples of f32[R], R % tile == 0 (caller pads);
    node_meta i32[M, 2] / node_aabb f32[M, 8] live in SMEM (uniform
    scalar reads); leaf_objs f32[L*K, 8] in VMEM (passed to the kernel as
    the [L, K, 8] view — see the leaf-read comment in the kernel body).
    """
    r = tmin.shape[0]
    assert r % tile == 0, (r, tile)
    objs3 = leaf_objs.reshape(-1, k, 8)
    spec1d = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bvh_kernel, m, k),
        grid=(r // tile,),
        in_specs=[spec1d] * 8 + [smem, smem, whole(objs3.shape)],
        out_specs=spec1d,
        out_shape=jax.ShapeDtypeStruct((r,), jnp.int32),
        interpret=interpret,
    )(o[0], o[1], o[2], d[0], d[1], d[2], tmin, tmax,
      node_meta, node_aabb, objs3)
