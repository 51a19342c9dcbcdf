"""Scene representation: structure-of-arrays object + material tables.

The reference stores a tagged-union `Object` (sphere / platform / cylinder
fields + an embedded `Material`, `include/object.h:7-31`) in a CPU-built
BVH whose leaves embed objects by value.  The TPU-native design instead
keeps ONE flat SoA table of all objects — a pytree of f32/i32 arrays —
that (a) is a differentiable leaf container (albedo / roughness / IOR /
emission are arrays you can take gradients w.r.t.), (b) vectorizes the
dense ray×object intersection with zero divergence, and (c) is replicated
across the device mesh while pixel tiles shard.

Material parameter semantics follow `include/material.h:21-29`:
  kd            f32[N,3]  albedo (also scales emission)
  emission      f32[N]    emit_intensity_
  smoothness    f32[N]    Phong exponent is 1000**smoothness
  reflectivity  f32[N]    MIRROR-enum mix weight (reflect vs diffuse)
  ior           f32[N]    refractive_index_ for GLASS
  tex_id        i32[N]    optional albedo texture id (-1 = use kd); the
                          reference unions kd with a cudaTextureObject_t +
                          have_tex_ flag (material.h:21-25)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpppathtracer_tpu.types import MaterialType, PrimitiveType

# Dense-vs-BVH auto-attach point.  Measured on v5e (BVH_CROSSOVER.json):
# the dense matmul-form winner beats the traversal kernel at EVERY size
# it can compile (0.73-0.93x BVH/dense through 2048 objects) and
# VMEM-OOMs where the [M, TR] candidate block exceeds the 16 MB scoped
# limit.  r5 bisect: 2048 compiles, 2304 OOMs at 17.18 MB (interpolated
# ceiling ~2146), so the threshold sits at the largest VERIFIED compile
# — the r4 value of 3072 would have auto-picked a non-compiling dense
# path for 2305..3071-object scenes (r4 advisor, medium).
# scripts/bench_bvh.py refreshes the measurement.
AUTO_BVH_THRESHOLD = 2048


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    """Flat SoA scene. All arrays share leading dim N (padded objects have
    prim_type == -1 and never intersect)."""

    prim_type: jax.Array  # i32[N]: PrimitiveType, -1 = inactive padding
    center: jax.Array  # f32[N,3] (platform: center.y unused, see y_pos)
    radius: jax.Array  # f32[N]  (negative => inverted sphere normal)
    y_pos: jax.Array  # f32[N]  platform plane height
    height: jax.Array  # f32[N]  cylinder height
    mat_type: jax.Array  # i32[N]: MaterialType
    kd: jax.Array  # f32[N,3]
    emission: jax.Array  # f32[N]
    smoothness: jax.Array  # f32[N]
    reflectivity: jax.Array  # f32[N]
    ior: jax.Array  # f32[N]
    tex_id: jax.Array  # i32[N]
    # Static type-partition metadata for the matmul-form fast intersector
    # (ops/fast.py): `type_perm` permutes objects into
    # [spheres | platforms | cylinders | padding] order and `type_counts`
    # is (n_sphere, n_platform, n_cylinder).  Hashable python tuples so
    # jit caches key on them; empty tuple = unknown (generic path only).
    type_perm: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    type_counts: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # Optional skip-pointer BVH over the GROUPED object order (built
    # host-side by `with_bvh`, the analog of the reference's CPU build at
    # `PathTracer::InitPipeline`, cuSrc/bvh.cu:116-120).  None for small
    # scenes — the dense matmul-form intersector wins below the measured
    # crossover (ops/fast.py).  bvh_dims = (M nodes, K leaf size), static.
    bvh_meta: jax.Array | None = None  # i32[M,2] (escape, leaf_id)
    bvh_aabb: jax.Array | None = None  # f32[M,8] (min.xyz, max.xyz, pad)
    bvh_objs: jax.Array | None = None  # f32[L*K,8] leaf object rows
    bvh_dims: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def num_objects(self) -> int:
        return self.prim_type.shape[0]

    def with_bvh(self, leaf_size: int | None = None) -> "Scene":
        """Attach skip-pointer BVH tables (host-side build — call OUTSIDE
        jit, on concrete arrays; rebuild after geometry edits).

        leaf_size None = auto: K = max(32, ceil(N/256)).  The node-table
        ceiling (~511 nodes: the traversal kernel keeps meta/aabb in
        SMEM; M=1023 measured to overflow the scoped budget on v5e)
        forces K to grow with the scene; below it, K=32 measured fastest
        at every size (r5 leaf sweep at 512^2x2sppx4: 2048 objs
        127 ms K=32 vs 145 ms K=8 — the slab walk's per-node scalar
        overhead outweighs the extra leaf lanes).  Leaves stay multiples
        of 8 for sublane alignment."""
        from cpppathtracer_tpu.ops.bvh import skip_bvh_tables

        if not self.type_perm:
            raise ValueError("with_bvh needs type-partition metadata")
        if leaf_size is None:
            k = -(-self.num_objects // 256)  # node tables <= ~511
            leaf_size = max(32, -(-k // 8) * 8)
        perm = np.asarray(self.type_perm, np.int32)
        g = lambda a: np.asarray(a)[perm]
        tables = skip_bvh_tables(
            g(self.center), g(self.radius), g(self.y_pos), g(self.height),
            g(self.prim_type), leaf_size=leaf_size,
        )
        return dataclasses.replace(
            self,
            bvh_meta=jnp.asarray(tables["node_meta"]),
            bvh_aabb=jnp.asarray(tables["node_aabb"]),
            bvh_objs=jnp.asarray(tables["leaf_objs"]),
            bvh_dims=(int(tables["node_meta"].shape[0]), int(tables["leaf_size"])),
        )

    def refit_bvh(self) -> "Scene":
        """Refit attached BVH tables to MOVED geometry without a rebuild
        (host-side, concrete arrays; `SceneBVH::UpdateObject` semantics,
        `cuSrc/bvh.cu:122-157`).  Topology is reused, so this is O(N)
        instead of O(N log N) and winners match a full rebuild; call
        after editing center/radius/y_pos/height on an animated scene."""
        from cpppathtracer_tpu.ops.bvh import refit_skip_tables

        if self.bvh_meta is None:
            return self
        perm = np.asarray(self.type_perm, np.int32)
        g = lambda a: np.asarray(a)[perm]
        aabb, objs = refit_skip_tables(
            np.asarray(self.bvh_meta), np.asarray(self.bvh_aabb),
            np.asarray(self.bvh_objs), self.bvh_dims[1],
            g(self.center), g(self.radius), g(self.y_pos), g(self.height),
            g(self.prim_type),
        )
        return dataclasses.replace(
            self, bvh_aabb=jnp.asarray(aabb), bvh_objs=jnp.asarray(objs)
        )

    def with_geometry(self, **fields) -> "Scene":
        """Edit geometry fields (center/radius/y_pos/height) SAFELY: when
        BVH tables are attached they are refit to the new positions.
        Editing geometry via bare `dataclasses.replace` on a BVH scene
        leaves the traversal kernel reading stale AABBs/leaf rows —
        silently wrong winners (see `bvh_is_stale`)."""
        s = dataclasses.replace(self, **fields)
        return s.refit_bvh()

    def bvh_is_stale(self) -> bool:
        """True when attached BVH leaf rows disagree with the current
        geometry arrays (host-side check on concrete arrays; drivers call
        this before rendering a BVH scene)."""
        if self.bvh_meta is None:
            return False
        objs = np.asarray(self.bvh_objs)
        valid = objs[:, 6] >= 0
        oi = objs[:, 7].astype(np.int64)[valid]
        perm = np.asarray(self.type_perm, np.int32)
        g = lambda a: np.asarray(a)[perm]
        return not (
            np.array_equal(objs[valid, 0:3], g(self.center)[oi])
            and np.array_equal(objs[valid, 3], g(self.radius)[oi])
            and np.array_equal(objs[valid, 4], g(self.y_pos)[oi])
            and np.array_equal(objs[valid, 5], g(self.height)[oi])
        )

    def material_params(self):
        """The differentiable material parameter sub-pytree (the inverse
        rendering targets: albedo / roughness / IOR / emission)."""
        return {
            "kd": self.kd,
            "emission": self.emission,
            "smoothness": self.smoothness,
            "reflectivity": self.reflectivity,
            "ior": self.ior,
        }

    def with_material_params(self, params) -> "Scene":
        return dataclasses.replace(self, **params)


@dataclasses.dataclass
class _ObjSpec:
    prim_type: int
    center: tuple
    radius: float
    y_pos: float
    height: float
    mat_type: int
    kd: tuple
    emission: float
    smoothness: float
    reflectivity: float
    ior: float
    tex_id: int


class SceneBuilder:
    """Host-side incremental scene authoring (the analog of
    `PathTracer::AddObject` + `SceneBVH::AddObject`, `cuSrc/bvh.cu:22-29`),
    frozen into a `Scene` pytree with `build()`."""

    def __init__(self):
        self._objs: list[_ObjSpec] = []

    def __len__(self):
        return len(self._objs)

    def _add(self, **kw) -> int:
        idx = len(self._objs)
        self._objs.append(_ObjSpec(**kw))
        return idx

    def add_sphere(
        self,
        center,
        radius,
        mat_type=MaterialType.DIFFUSE,
        kd=(1.0, 1.0, 1.0),
        emission=0.0,
        smoothness=0.0,
        reflectivity=0.0,
        ior=1.5,
        tex_id=-1,
    ) -> int:
        """Negative radius gives the reference's hollow-glass-shell trick:
        the near-root normal is (p-c)/radius, i.e. inverted
        (`cuSrc/object.cu:22-23`, used by `cppSrc/video_renderer.cpp:94-98`)."""
        return self._add(
            prim_type=int(PrimitiveType.SPHERE),
            center=tuple(map(float, center)),
            radius=float(radius),
            y_pos=0.0,
            height=0.0,
            mat_type=int(mat_type),
            kd=tuple(map(float, kd)),
            emission=float(emission),
            smoothness=float(smoothness),
            reflectivity=float(reflectivity),
            ior=float(ior),
            tex_id=int(tex_id),
        )

    def add_platform(
        self,
        y_pos,
        mat_type=MaterialType.DIFFUSE,
        kd=(1.0, 1.0, 1.0),
        emission=0.0,
        smoothness=0.0,
        reflectivity=0.0,
        ior=1.5,
        tex_id=-1,
    ) -> int:
        """Infinite plane perpendicular to y (`cuSrc/object.cu:37-48`)."""
        return self._add(
            prim_type=int(PrimitiveType.PLATFORM),
            center=(0.0, 0.0, 0.0),
            radius=0.0,
            y_pos=float(y_pos),
            height=0.0,
            mat_type=int(mat_type),
            kd=tuple(map(float, kd)),
            emission=float(emission),
            smoothness=float(smoothness),
            reflectivity=float(reflectivity),
            ior=float(ior),
            tex_id=int(tex_id),
        )

    def add_cylinder(
        self,
        center,
        radius,
        height,
        mat_type=MaterialType.DIFFUSE,
        kd=(1.0, 1.0, 1.0),
        emission=0.0,
        smoothness=0.0,
        reflectivity=0.0,
        ior=1.5,
        tex_id=-1,
    ) -> int:
        """Y-aligned capped cylinder (`cuSrc/object.cu:50-112`)."""
        return self._add(
            prim_type=int(PrimitiveType.CYLINDER),
            center=tuple(map(float, center)),
            radius=float(radius),
            y_pos=0.0,
            height=float(height),
            mat_type=int(mat_type),
            kd=tuple(map(float, kd)),
            emission=float(emission),
            smoothness=float(smoothness),
            reflectivity=float(reflectivity),
            ior=float(ior),
            tex_id=int(tex_id),
        )

    def build(self, pad_to: int | None = None, bvh: bool | None = None) -> Scene:
        """Freeze to a `Scene`.  `pad_to` rounds N up (inactive padding
        objects, prim_type=-1) so jit caches stay warm across edits.

        `bvh`: attach skip-pointer BVH tables for the traversal kernel
        (None = auto at >= AUTO_BVH_THRESHOLD objects — the measured
        dense/BVH crossover, scripts/bench_bvh.py).

        HAZARD: the tables freeze build-time geometry.  Edit geometry
        through `with_geometry` (auto-refits) — a bare
        `dataclasses.replace` leaves the traversal kernel reading stale
        AABBs (use `bvh_is_stale` / `refit_bvh`; ProgressiveRenderer
        checks at construction)."""
        n = len(self._objs)
        m = n if pad_to is None else max(n, pad_to)
        if m == 0:
            raise ValueError("empty scene")

        def arr(field, dtype=np.float32, dim=None):
            shape = (m,) if dim is None else (m, dim)
            out = np.zeros(shape, dtype)
            for i, o in enumerate(self._objs):
                out[i] = getattr(o, field)
            return out

        prim_type = np.full(m, -1, np.int32)
        for i, o in enumerate(self._objs):
            prim_type[i] = o.prim_type
        order = np.concatenate(
            [np.where(prim_type == t)[0] for t in (0, 1, 2)]
            + [np.where(prim_type < 0)[0]]
        )
        counts = tuple(int((prim_type == t).sum()) for t in (0, 1, 2))
        scene = Scene(
            type_perm=tuple(int(i) for i in order),
            type_counts=counts,
            prim_type=jnp.asarray(prim_type),
            center=jnp.asarray(arr("center", dim=3)),
            radius=jnp.asarray(arr("radius")),
            y_pos=jnp.asarray(arr("y_pos")),
            height=jnp.asarray(arr("height")),
            mat_type=jnp.asarray(arr("mat_type", np.int32)),
            kd=jnp.asarray(arr("kd", dim=3)),
            emission=jnp.asarray(arr("emission")),
            smoothness=jnp.asarray(arr("smoothness")),
            reflectivity=jnp.asarray(arr("reflectivity")),
            ior=jnp.asarray(arr("ior")),
            tex_id=jnp.asarray(arr("tex_id", np.int32)),
        )
        if bvh is None:
            bvh = n >= AUTO_BVH_THRESHOLD
        return scene.with_bvh() if bvh else scene


def demo_scene(seed: int = 0, pad_to: int | None = None) -> SceneBuilder:
    """The reference's procedural demo scene, re-created with deterministic
    RNG (`cppSrc/video_renderer.cpp:39-118`): 20 random materials (index 0 a
    near-white diffuse floor material), a floor platform at y=0, and ~74
    objects alternating spheres/cylinders marching z in [-550, 550) step 15
    with random x in [-150,150] and radius 1..16.  Glass objects get a
    nested negative-radius sphere shell 50% of the time — the reference's
    un-memset inner objects are type 0 (= Sphere) for cylinders too
    (`video_renderer.cpp:108-115`)."""
    rng = np.random.RandomState(seed)
    rnd = lambda: float(rng.uniform())

    mats = []
    mats.append(dict(mat_type=MaterialType.DIFFUSE, kd=(0.95, 0.95, 0.95)))
    for _ in range(1, 20):
        kd = (rnd(), rnd(), rnd())
        kind = int(rnd() * 2048) % 4
        if kind == 1:
            mats.append(
                dict(
                    mat_type=MaterialType.METAL,
                    kd=kd,
                    smoothness=rnd() * 4 + 1.0,
                    reflectivity=rnd() * 0.8,
                )
            )
        elif kind == 2:
            mats.append(
                dict(
                    mat_type=MaterialType.MIRROR,
                    kd=(0.5 + 0.5 * rnd(), 0.5 + 0.5 * rnd(), 0.5 + 0.5 * rnd()),
                    smoothness=rnd() * 4 + 0.5,
                )
            )
        elif kind == 3:
            mats.append(
                dict(
                    mat_type=MaterialType.GLASS,
                    kd=(1.0, 1.0, 1.0),
                    smoothness=rnd() * 4 + 2.0,
                    ior=rnd() * 2 + 1.2,
                )
            )
        else:
            mats.append(dict(mat_type=MaterialType.DIFFUSE, kd=kd))

    b = SceneBuilder()
    b.add_platform(0.0, **mats[0])
    for z in range(-550, 550, 15):
        m = mats[rng.randint(20)]
        if int(rnd() * 2048) % 2 == 0:
            radius = rnd() * 15.0 + 1.0
            center = (rnd() * 300.0 - 150.0, radius, float(z))
            b.add_sphere(center, radius, **m)
            if m["mat_type"] == MaterialType.GLASS and rnd() > 0.5:
                b.add_sphere(center, 0.01 - radius, **m)
        else:
            radius = rnd() * 15.0 + 1.0
            height = radius / 2 + rnd() * 20.0
            center = (rnd() * 300.0 - 150.0, height / 2, float(z))
            b.add_cylinder(center, radius, height, **m)
            if m["mat_type"] == MaterialType.GLASS and rnd() > 0.5:
                # Reference quirk: the nested "inside" object is created
                # without memset and its type_ is value-initialized to 0,
                # i.e. a Sphere, even for cylinders.
                b.add_sphere(center, 0.01 - radius, **m)
    return b
