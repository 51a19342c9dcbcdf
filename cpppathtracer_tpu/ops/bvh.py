"""BVH: host-side median-split build + vectorized device traversal.

Build reproduces the reference's algorithm (`SceneBVH::Divide`,
`cuSrc/bvh.cu:31-95`) on flat arrays: recursive median split on the
longest axis of the group AABB, objects sorted by AABB centroid, split at
the middle index; leaves reference one object.  Object AABBs match
`Object::GetAABBMin/Max` (`cuSrc/object.cu:134-170`) including the
BOUNCE_RAY_TMIN*5 tolerance and the platform's +-DEFAULT_RAY_TMAX*5 x/z
extent.  The build runs in the native C++ runtime when available
(native/poca_native, the analog of the reference's CPU build thread) with
a NumPy fallback; both produce identical arrays.

Traversal is a lock-step vectorized re-design of the reference's
per-thread explicit-stack loop (`SceneBVH::TraceRay`, `bvh.cu:167-205`):
every ray in the wavefront keeps its own short stack in a [R, DEPTH]
register array inside one `lax.while_loop`; each iteration pops one node
per ray, slab-tests it against the ray's *current best t* (the tmax-shrink
pruning of the reference), intersects leaves, and pushes children.  Rays
that finish early idle (masked) until the whole wavefront drains.

On TPU the dense all-pairs test (ops/intersect.py) wins for the
reference's scene sizes (N <= ~128: no gathers, no divergence, pure VPU);
the BVH path exists for API parity and for large scenes where O(R log N)
gathers beat O(R*N) math.  `intersect_auto` picks per scene size.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpppathtracer_tpu.ops.intersect import _object_best_t, _object_hit_attrs
from cpppathtracer_tpu.types import (
    BOUNCE_RAY_TMIN,
    DEFAULT_RAY_TMAX,
    Hit,
    PrimitiveType,
    Rays,
)

_INF = np.float32(DEFAULT_RAY_TMAX)


# ----------------------------------------------------------------------------
# Object AABBs (object.cu:134-170)
# ----------------------------------------------------------------------------

def object_aabbs(scene_np) -> tuple[np.ndarray, np.ndarray]:
    """AABB (min, max) per object, [N,3] f32 each."""
    n = len(scene_np["prim_type"])
    tol = np.float32(BOUNCE_RAY_TMIN * 5.0)
    big = np.float32(DEFAULT_RAY_TMAX * 5.0)  # overflows to inf in f32; matched
    mins = np.zeros((n, 3), np.float32)
    maxs = np.zeros((n, 3), np.float32)
    for i in range(n):
        pt = int(scene_np["prim_type"][i])
        c = scene_np["center"][i]
        r = abs(np.float32(scene_np["radius"][i]))
        if pt == PrimitiveType.SPHERE:
            mins[i] = c - r
            maxs[i] = c + r
        elif pt == PrimitiveType.PLATFORM:
            y = np.float32(scene_np["y_pos"][i])
            mins[i] = (-big, y - tol, -big)
            maxs[i] = (big, y + tol, big)
        elif pt == PrimitiveType.CYLINDER:
            h2 = np.float32(scene_np["height"][i]) / 2
            mins[i] = (c[0] - r, c[1] - h2 - tol, c[2] - r)
            maxs[i] = (c[0] + r, c[1] + h2 + tol, c[2] + r)
        else:  # inactive padding: empty box that never hits
            mins[i] = (np.inf, np.inf, np.inf)
            maxs[i] = (-np.inf, -np.inf, -np.inf)
    return mins, maxs


# ----------------------------------------------------------------------------
# Build (bvh.cu:31-95 algorithm, flat arrays)
# ----------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BVH:
    """Flat BVH node arrays (device-resident pytree).

    left/right: i32[M] child node ids (-1 at leaves);
    obj_idx: i32[M] object id at leaves (-1 internal);
    aabb_min/aabb_max: f32[M,3];
    depth: static upper bound on stack depth (python int).
    """

    left: jax.Array
    right: jax.Array
    obj_idx: jax.Array
    aabb_min: jax.Array
    aabb_max: jax.Array
    depth: int = dataclasses.field(metadata=dict(static=True))


def build_bvh_numpy(aabb_min: np.ndarray, aabb_max: np.ndarray):
    """Reference-algorithm median-split build. Returns dict of flat arrays."""
    n = aabb_min.shape[0]
    active = [i for i in range(n) if aabb_min[i, 0] <= aabb_max[i, 0]]
    order = list(active)
    cent = (aabb_min + aabb_max) * 0.5

    left, right, obj, amin, amax = [], [], [], [], []

    def divide(l, r):
        if l >= r:
            return -1
        idx = len(left)
        left.append(-1)
        right.append(-1)
        obj.append(-1)
        amin.append(None)
        amax.append(None)
        if l == r - 1:
            o = order[l]
            obj[idx] = o
            amin[idx] = aabb_min[o].copy()
            amax[idx] = aabb_max[o].copy()
            return idx
        group = order[l:r]
        gmin = aabb_min[group].min(axis=0)
        gmax = aabb_max[group].max(axis=0)
        span = gmax - gmin
        if span[0] >= span[1] and span[0] >= span[2]:
            axis = 0
        elif span[1] >= span[2]:
            axis = 1
        else:
            axis = 2
        group.sort(key=lambda o: float(cent[o, axis]))
        order[l:r] = group
        mid = (l + r) // 2
        li = divide(l, mid)
        ri = divide(mid, r)
        left[idx] = li
        right[idx] = ri
        amin[idx] = gmin
        amax[idx] = gmax
        return idx

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * len(active) + 100))
    try:
        divide(0, len(active))
    finally:
        sys.setrecursionlimit(old)

    if not left:  # no active objects: single dummy leaf that never hits
        return {
            "left": np.array([-1], np.int32),
            "right": np.array([-1], np.int32),
            "obj_idx": np.array([-1], np.int32),
            "aabb_min": np.full((1, 3), np.inf, np.float32),
            "aabb_max": np.full((1, 3), -np.inf, np.float32),
        }
    return {
        "left": np.asarray(left, np.int32),
        "right": np.asarray(right, np.int32),
        "obj_idx": np.asarray(obj, np.int32),
        "aabb_min": np.stack(amin).astype(np.float32),
        "aabb_max": np.stack(amax).astype(np.float32),
    }


def build_bvh(scene) -> BVH:
    """Build a BVH for a Scene (native C++ builder if available)."""
    from cpppathtracer_tpu.reference_cpu import scene_to_np

    sc = scene_to_np(scene)
    amin, amax = object_aabbs(sc)
    try:
        from cpppathtracer_tpu.utils import native

        arrays = native.build_bvh(amin, amax)
    except Exception:
        arrays = build_bvh_numpy(amin, amax)
    # max stack depth: tree depth bound; median split is balanced so
    # 2*ceil(log2(N))+4 is safe. Use a conservative bound from node count.
    m = len(arrays["left"])
    depth = 2 * int(np.ceil(np.log2(max(m, 2)))) + 4
    return BVH(
        left=jnp.asarray(arrays["left"]),
        right=jnp.asarray(arrays["right"]),
        obj_idx=jnp.asarray(arrays["obj_idx"]),
        aabb_min=jnp.asarray(arrays["aabb_min"]),
        aabb_max=jnp.asarray(arrays["aabb_max"]),
        depth=depth,
    )


def refit_bvh(bvh: BVH, scene) -> BVH:
    """Refit node AABBs to moved objects without rebuilding topology (the
    analog of `SceneBVH::UpdateObject` + parent-walk refit, bvh.cu:122-157,
    generalized to all leaves in one bottom-up pass)."""
    from cpppathtracer_tpu.reference_cpu import scene_to_np

    sc = scene_to_np(scene)
    amin, amax = object_aabbs(sc)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    obj = np.asarray(bvh.obj_idx)
    node_min = np.asarray(bvh.aabb_min).copy()
    node_max = np.asarray(bvh.aabb_max).copy()
    # children always have larger indices than parents (preorder build),
    # so a reverse sweep is a bottom-up refit.
    for i in range(len(left) - 1, -1, -1):
        if obj[i] >= 0:
            node_min[i] = amin[obj[i]]
            node_max[i] = amax[obj[i]]
        else:
            l, r = left[i], right[i]
            lo = [x for x in (l, r) if x >= 0]
            if lo:
                node_min[i] = np.min(node_min[lo], axis=0)
                node_max[i] = np.max(node_max[lo], axis=0)
    return dataclasses.replace(
        bvh, aabb_min=jnp.asarray(node_min), aabb_max=jnp.asarray(node_max)
    )


# ----------------------------------------------------------------------------
# Traversal (vectorized re-design of bvh.cu:167-205)
# ----------------------------------------------------------------------------

def intersect_bvh(scene, bvh: BVH, rays: Rays) -> Hit:
    """Closest hit via lock-step stack traversal. Returns the same Hit as
    ops.intersect.intersect."""
    batch = rays.tmin.shape
    r = int(np.prod(batch)) if batch else 1
    o_grad = rays.origin.reshape(r, 3)
    d_grad = rays.dir.reshape(r, 3)
    tmin_grad = rays.tmin.reshape(r)
    tmax0_grad = rays.tmax.reshape(r)
    # The traversal loop only SELECTS the winning object per ray (like the
    # dense path's argmin); gradients flow through the attribute recompute
    # below, never through the while_loop (reverse-mode undifferentiable).
    sg = jax.lax.stop_gradient
    o = sg(o_grad)
    d = sg(d_grad)
    tmin = sg(tmin_grad)
    tmax0 = sg(tmax0_grad)
    scene_sg = jax.tree_util.tree_map(sg, scene)

    max_stack = bvh.depth + 2

    def cond(state):
        _, _, _, top, _ = state
        return jnp.any(top > 0)

    def body(state):
        best_t, best_obj, stack, top, _ = state
        active = top > 0
        sp = jnp.maximum(top - 1, 0)
        node = jnp.take_along_axis(stack, sp[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)
        top = jnp.where(active, top - 1, top)

        nmin = jnp.take(bvh.aabb_min, node, axis=0)
        nmax = jnp.take(bvh.aabb_max, node, axis=0)
        n_left = jnp.take(bvh.left, node, axis=0)
        n_right = jnp.take(bvh.right, node, axis=0)
        n_obj = jnp.take(bvh.obj_idx, node, axis=0)

        # slab test on all 3 axes; zero direction components leave the
        # interval unconstrained (bvh.cu:182-199)
        safe_d = jnp.where(d == 0.0, 1.0, d)
        t0 = (nmin - o) / safe_d
        t1 = (nmax - o) / safe_d
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        lo = jnp.where(d == 0.0, -2.0 * _INF, lo)
        hi = jnp.where(d == 0.0, 2.0 * _INF, hi)
        local_tmin = jnp.max(lo, axis=-1)
        local_tmax = jnp.min(hi, axis=-1)
        overlap = (
            (local_tmin <= local_tmax)
            & (local_tmin <= best_t)
            & (local_tmax >= tmin)
        )

        is_leaf = n_obj >= 0
        # leaf: intersect the object, keep if strictly closer (tmax shrink)
        take = lambda a: jnp.take(a, jnp.maximum(n_obj, 0), axis=0)
        cand_t = _object_best_t(
            take(scene_sg.prim_type),
            take(scene_sg.center),
            take(scene_sg.radius),
            take(scene_sg.y_pos),
            take(scene_sg.height),
            o,
            d,
            tmin,
            best_t,
        )
        leaf_hit = active & is_leaf & overlap & (cand_t < best_t)
        best_t = jnp.where(leaf_hit, cand_t, best_t)
        best_obj = jnp.where(leaf_hit, n_obj, best_obj)

        # internal node with overlap: push children (one-hot scatter into
        # each ray's private stack column)
        push = active & overlap & ~is_leaf
        lanes = jnp.arange(max_stack)[None, :]
        for child in (n_left, n_right):
            do = push & (child >= 0)
            slot = lanes == jnp.minimum(top, max_stack - 1)[:, None]
            stack = jnp.where(do[:, None] & slot, child[:, None], stack)
            top = jnp.where(do, jnp.minimum(top + 1, max_stack), top)

        iters = state[4] + 1
        return best_t, best_obj, stack, top, iters

    stack0 = jnp.zeros((r, max_stack), jnp.int32)
    top0 = jnp.ones((r,), jnp.int32)  # root (node 0) pre-pushed
    best_t0 = tmax0
    best_obj0 = jnp.full((r,), -1, jnp.int32)
    best_t, best_obj, _, _, _ = jax.lax.while_loop(
        cond, body, (best_t0, best_obj0, stack0, top0, jnp.int32(0))
    )

    # winner attribute recompute (same two-pass trick as ops.intersect)
    takes = lambda a: jnp.take(a, jnp.maximum(best_obj, 0), axis=0)
    t, normal = _object_hit_attrs(
        takes(scene.prim_type),
        takes(scene.center),
        takes(scene.radius),
        takes(scene.y_pos),
        takes(scene.height),
        o_grad,
        d_grad,
        tmin_grad,
        tmax0_grad,
    )
    hit = best_obj >= 0
    t = jnp.where(hit, t, jnp.float32(DEFAULT_RAY_TMAX))
    pos = o_grad + jnp.where(t < _INF, t, 0.0)[..., None] * d_grad
    return Hit(
        t=t.reshape(batch),
        hit=hit.reshape(batch),
        pos=pos.reshape(batch + (3,)),
        normal=jnp.where(hit[..., None], normal, 0.0).reshape(batch + (3,)),
        obj_idx=jnp.where(hit, best_obj, -1).reshape(batch),
    )


def intersect_auto(scene, rays: Rays, bvh: BVH | None = None, dense_threshold: int = 192) -> Hit:
    """Pick dense all-pairs (small N: pure VPU, no gathers) or BVH
    traversal (large N: O(log N) nodes/ray)."""
    from cpppathtracer_tpu.ops.intersect import intersect as dense_intersect

    if bvh is None or scene.num_objects <= dense_threshold:
        return dense_intersect(scene, rays)
    return intersect_bvh(scene, bvh, rays)


# ----------------------------------------------------------------------------
# TPU skip-pointer BVH (tile-coherent stackless traversal)
# ----------------------------------------------------------------------------

def build_skip_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray,
                   leaf_size: int = 8):
    """Median-split BVH with K-object leaves, preorder nodes and ESCAPE
    indices ("skip pointers") for stackless traversal.

    This is the TPU-grade re-design of the reference's acceleration
    structure (`cuSrc/bvh.cu:31-95` build, `:167-205` traversal): the
    per-thread index stack becomes a single preorder node walk shared by
    a whole ray TILE — at each node the kernel slab-tests ALL rays in the
    tile; if any overlaps, it descends (node+1 in preorder), otherwise it
    jumps the whole subtree via `escape`.  Node fetches are therefore
    UNIFORM scalar reads (TPU-friendly) and all per-ray work is vector
    slab math; leaves hold K objects in contiguous, sublane-aligned rows
    so leaf tests are one [K, TILE] vectorized candidate evaluation.

    Returns dict:
      node_aabb  f32[M, 8]  (min.xyz, max.xyz, pad, pad)
      node_meta  i32[M, 2]  (escape, leaf_id or -1)
      leaf_objs  i32->rows: f32[L*K, 8] (cx, cy, cz, radius, y_pos,
                 height, prim_type (-1 pad), obj_index)
      order      i32[n_active] object permutation (leaf-contiguous)
    """
    n = aabb_min.shape[0]
    active = [i for i in range(n) if aabb_min[i, 0] <= aabb_max[i, 0]]
    order = list(active)
    cent = (aabb_min + aabb_max) * 0.5

    nodes = []  # dict(min, max, left, right, leaf_lr)

    def divide(l, r):
        idx = len(nodes)
        nodes.append({"left": -1, "right": -1, "leaf": None})
        group = order[l:r]
        gmin = aabb_min[group].min(axis=0)
        gmax = aabb_max[group].max(axis=0)
        nodes[idx]["min"] = gmin
        nodes[idx]["max"] = gmax
        if r - l <= leaf_size:
            nodes[idx]["leaf"] = (l, r)
            return idx
        span = gmax - gmin
        if span[0] >= span[1] and span[0] >= span[2]:
            axis = 0
        elif span[1] >= span[2]:
            axis = 1
        else:
            axis = 2
        group.sort(key=lambda o: float(cent[o, axis]))
        order[l:r] = group
        mid = (l + r) // 2
        nodes[idx]["left"] = divide(l, mid)
        nodes[idx]["right"] = divide(mid, r)
        return idx

    if active:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 4 * len(active) + 100))
        try:
            divide(0, len(active))
        finally:
            sys.setrecursionlimit(old)
    else:
        nodes.append({
            "left": -1, "right": -1, "leaf": (0, 0),
            "min": np.full(3, np.inf, np.float32),
            "max": np.full(3, -np.inf, np.float32),
        })

    m = len(nodes)
    escape = np.zeros(m, np.int32)

    def set_escape(idx, esc):
        escape[idx] = esc
        li, ri = nodes[idx]["left"], nodes[idx]["right"]
        if li >= 0:
            set_escape(li, ri)  # left's subtree exits into right (preorder)
            set_escape(ri, esc)

    set_escape(0, m)

    leaves = [i for i in range(m) if nodes[i]["leaf"] is not None]
    k = leaf_size
    leaf_objs = np.zeros((max(len(leaves), 1) * k, 8), np.float32)
    leaf_objs[:, 6] = -1.0  # padding rows: prim_type -1 never hits
    node_meta = np.full((m, 2), -1, np.int32)
    node_meta[:, 0] = escape
    node_aabb = np.zeros((m, 8), np.float32)
    for i, nd in enumerate(nodes):
        node_aabb[i, 0:3] = nd["min"]
        node_aabb[i, 3:6] = nd["max"]
    return {
        "node_aabb": node_aabb,
        "node_meta": node_meta,
        "leaf_objs": leaf_objs,
        "order": np.asarray(order, np.int32),
        "leaves": leaves,
        "leaf_size": k,
        "nodes": nodes,
    }


def skip_bvh_tables(scene_center, scene_radius, scene_y_pos, scene_height,
                    scene_prim_type, leaf_size: int = 8):
    """Build the skip-pointer BVH over GROUPED object arrays (numpy) and
    fill the leaf object table with the grouped indices the winner kernels
    return (so the gather epilogue is unchanged)."""
    n = len(scene_prim_type)
    sc = {
        "prim_type": np.asarray(scene_prim_type),
        "center": np.asarray(scene_center, np.float32),
        "radius": np.asarray(scene_radius, np.float32),
        "y_pos": np.asarray(scene_y_pos, np.float32),
        "height": np.asarray(scene_height, np.float32),
    }
    amin, amax = object_aabbs(sc)
    built = build_skip_bvh(amin, amax, leaf_size)
    k = built["leaf_size"]
    order = built["order"]
    leaf_objs = built["leaf_objs"]
    for leaf_id, node_i in enumerate(built["leaves"]):
        l, r = built["nodes"][node_i]["leaf"]
        built["node_meta"][node_i, 1] = leaf_id
        for j, oi in enumerate(order[l:r]):
            row = leaf_id * k + j
            leaf_objs[row, 0:3] = sc["center"][oi]
            leaf_objs[row, 3] = sc["radius"][oi]
            leaf_objs[row, 4] = sc["y_pos"][oi]
            leaf_objs[row, 5] = sc["height"][oi]
            leaf_objs[row, 6] = float(sc["prim_type"][oi])
            leaf_objs[row, 7] = float(oi)
    return {
        "node_aabb": built["node_aabb"],
        "node_meta": built["node_meta"],
        "leaf_objs": leaf_objs,
        "leaf_size": k,
    }


def refit_skip_tables(node_meta, node_aabb, leaf_objs, leaf_size,
                      center, radius, y_pos, height, prim_type):
    """Refit the skip-pointer tables to moved geometry WITHOUT a rebuild
    (the analog of `SceneBVH::UpdateObject`'s leaf-rewrite + ancestor
    AABB walk, `cuSrc/bvh.cu:122-157`, generalized to all leaves at
    once).  Topology (preorder layout, escape pointers, leaf
    assignment) is position-independent, so pure movement needs only:
      1. rewrite every leaf row's geometry columns from the stored
         grouped object index (col 7), and
      2. a reverse-preorder AABB pass — leaves from their K objects,
         internal nodes as the union of their two children, where
         left = i+1 and right = escape(left) (both recoverable from the
         meta table alone).
    Returns (node_aabb', leaf_objs') as new numpy arrays.  The refit
    tree's AABBs stay valid (they bound the moved objects exactly), so
    traversal winners match a full rebuild bit-for-bit — only pruning
    quality can degrade if objects drift far from their build-time
    clusters.
    """
    node_meta = np.asarray(node_meta)
    leaf_objs = np.array(leaf_objs, np.float32, copy=True)
    node_aabb = np.array(node_aabb, np.float32, copy=True)
    center = np.asarray(center, np.float32)
    radius = np.asarray(radius, np.float32)
    y_pos = np.asarray(y_pos, np.float32)
    height = np.asarray(height, np.float32)
    prim_type = np.asarray(prim_type)

    valid = leaf_objs[:, 6] >= 0
    oi = leaf_objs[:, 7].astype(np.int64)
    oi_v = oi[valid]
    leaf_objs[valid, 0:3] = center[oi_v]
    leaf_objs[valid, 3] = radius[oi_v]
    leaf_objs[valid, 4] = y_pos[oi_v]
    leaf_objs[valid, 5] = height[oi_v]

    sc = {
        "prim_type": prim_type, "center": center, "radius": radius,
        "y_pos": y_pos, "height": height,
    }
    amin, amax = object_aabbs(sc)

    m = node_meta.shape[0]
    k = leaf_size
    for i in range(m - 1, -1, -1):
        leaf_id = int(node_meta[i, 1])
        if leaf_id >= 0:
            rows = slice(leaf_id * k, (leaf_id + 1) * k)
            rv = valid[rows]
            if rv.any():
                ids = oi[rows][rv]
                node_aabb[i, 0:3] = amin[ids].min(axis=0)
                node_aabb[i, 3:6] = amax[ids].max(axis=0)
            else:
                node_aabb[i, 0:3] = np.inf
                node_aabb[i, 3:6] = -np.inf
        else:
            left = i + 1
            right = int(node_meta[left, 0])  # escape(left) == right child
            node_aabb[i, 0:3] = np.minimum(
                node_aabb[left, 0:3], node_aabb[right, 0:3]
            )
            node_aabb[i, 3:6] = np.maximum(
                node_aabb[left, 3:6], node_aabb[right, 3:6]
            )
    return node_aabb, leaf_objs
