"""Thin-lens fly camera (functional re-design of `MotionalCamera`).

The reference couples mutable interactive state, a global mutex, and a
device RayGen in one class (`cuSrc/motional_camera.cu`,
`include/motional_camera.h`).  Here the camera is an immutable pytree;
motion ops return a new camera (JAX-functional, so the whole render step
including ray generation jits and differentiates), and `ray_gen` produces
a full wavefront of primary rays at once.

Numerics match `MotionalCamera::GetCopy` / `RayGen`
(`cuSrc/motional_camera.cu:177-213`):
  theta = fov * pi/180; half_h = tan(theta/2); half_w = aspect * half_h
  w = normalize(origin - look_at); u = normalize(cross(vup, w)); v = w × u
  focus = |origin - look_at|
  top_left  = origin - half_w*focus*u + half_h*focus*v - focus*w
  horizontal = 2*half_w*focus*u ;  vertical = -2*half_h*focus*v
  ray.origin = origin + lens_radius*(r1*u + r2*v)   (r in U[0,1)^2 — the
               reference jitters with uniform cube samples, not a disk)
  ray.dir = normalize(top_left + (x/W)*horizontal + (y/H)*vertical
                      - origin - offset)
There is NO sub-pixel jitter in the reference — anti-aliasing comes only
from the lens offset (lens_radius default 5e-4, motional_camera.h:18).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cpppathtracer_tpu.ops import mathx
from cpppathtracer_tpu.types import DEFAULT_RAY_TMAX, Rays
from cpppathtracer_tpu.utils import rng as prng

VUP = jnp.array([0.0, 1.0, 0.0], jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Immutable camera state. width/height are static ints (hashable via
    dataclasses metadata as static? — kept as f32 scalars is wrong; they
    stay Python ints marked static below)."""

    origin: jax.Array  # f32[3]
    look_at: jax.Array  # f32[3]
    view_fov: jax.Array  # f32[] degrees (default 30, motional_camera.h:16)
    lens_radius: jax.Array  # f32[] (default 5e-4, motional_camera.h:18)
    move_speed: jax.Array  # f32[] (default 50, motional_camera.h:19)
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    # ---------------- construction ----------------
    @staticmethod
    def make(width, height, origin=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, 1.0),
             view_fov=30.0, lens_radius=5e-4, move_speed=50.0) -> "Camera":
        return Camera(
            origin=jnp.asarray(origin, jnp.float32),
            look_at=jnp.asarray(look_at, jnp.float32),
            view_fov=jnp.asarray(view_fov, jnp.float32),
            lens_radius=jnp.asarray(lens_radius, jnp.float32),
            move_speed=jnp.asarray(move_speed, jnp.float32),
            width=int(width),
            height=int(height),
        )

    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)

    # ---------------- derived basis (GetCopy, motional_camera.cu:177-200) ----
    def basis(self):
        theta = self.view_fov * (jnp.pi / 180.0)
        aspect = jnp.float32(self.width) / jnp.float32(self.height)
        half_h = jnp.tan(theta / 2.0)
        half_w = aspect * half_h
        w = mathx.normalize(self.origin - self.look_at)
        u = mathx.normalize(jnp.cross(VUP, w))
        v = jnp.cross(w, u)
        focus = mathx.length(self.origin - self.look_at)
        top_left = self.origin - half_w * focus * u + half_h * focus * v - focus * w
        horizontal = 2.0 * half_w * focus * u
        vertical = -2.0 * half_h * focus * v
        return u, v, w, top_left, horizontal, vertical

    # ---------------- ray generation ----------------
    def ray_gen(self, pixel_idx, sample_idx, seed) -> Rays:
        """Primary rays for flat pixel indices `pixel_idx` (i32[...],
        row-major y*W+x) at sample `sample_idx`.  RNG draws are stateless
        per (seed, pixel, sample) — see utils/rng.py."""
        u, v, _w, top_left, horizontal, vertical = self.basis()
        x = (pixel_idx % self.width).astype(jnp.float32)
        y = (pixel_idx // self.width).astype(jnp.float32)
        r1, r2, _r3, _r4 = prng.uniforms4(seed, pixel_idx, sample_idx, prng.CTR_RAYGEN)
        rd_x = self.lens_radius * r1
        rd_y = self.lens_radius * r2
        offset = rd_x[..., None] * u + rd_y[..., None] * v
        dx = x / jnp.float32(self.width)
        dy = y / jnp.float32(self.height)
        origin = self.origin + offset
        target = top_left + dx[..., None] * horizontal + dy[..., None] * vertical
        direction = mathx.normalize(target - self.origin - offset)
        # tmin/tmax derive from the pixel coords (not fresh constants) so
        # they carry the right varying-manual-axes type under shard_map.
        zero = x * 0.0
        return Rays(
            origin=origin,
            dir=direction,
            tmin=zero,
            tmax=zero + jnp.float32(DEFAULT_RAY_TMAX),
        )

    def ray_gen_planar(self, pixel_idx, sample_idx, seed):
        """Planar-layout twin of :func:`ray_gen`: returns (o, d) as tuples
        of three flat f32[R] planes.

        Same per-component arithmetic as ray_gen (scalar basis components
        broadcast against flat planes), so values are bit-identical — but
        neither the forward nor its VJP ever materializes an [R, 1] or
        [R, 3] array.  This matters for the fused Pallas backward
        (ops/mega.py): a standalone ray_gen VJP program lays its
        [R, 1] broadcast-transpose intermediates out as {T(1,128)} —
        1/128th-width vector ops, profiled at ~40 ms/sample at 1024^2 on
        v5e — while the planar form is pure full-width [R] math.
        """
        u, v, _w, top_left, horizontal, vertical = self.basis()
        x = (pixel_idx % self.width).astype(jnp.float32)
        y = (pixel_idx // self.width).astype(jnp.float32)
        r1, r2, _r3, _r4 = prng.uniforms4(
            seed, pixel_idx, sample_idx, prng.CTR_RAYGEN
        )
        rd_x = self.lens_radius * r1
        rd_y = self.lens_radius * r2
        dx = x / jnp.float32(self.width)
        dy = y / jnp.float32(self.height)
        o = tuple(
            self.origin[c] + (rd_x * u[c] + rd_y * v[c]) for c in range(3)
        )
        t_rel = tuple(
            top_left[c] + dx * horizontal[c] + dy * vertical[c]
            - self.origin[c] - (rd_x * u[c] + rd_y * v[c])
            for c in range(3)
        )
        n2 = t_rel[0] * t_rel[0] + t_rel[1] * t_rel[1] + t_rel[2] * t_rel[2]
        from cpppathtracer_tpu.ops.mathx import EPS

        inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, EPS)), 0.0)
        d = tuple(t * inv for t in t_rel)
        return o, d

    # ---------------- interactive motion (motional_camera.cu:76-168) --------
    # Each op returns a NEW camera; the caller decides when to reset the
    # progressive accumulator (the reference's Refresh()).
    def _left(self):
        w = mathx.normalize(self.origin - self.look_at)
        return -mathx.normalize(jnp.cross(VUP, w))

    def move_left(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * self._left()
        return self.replace(origin=self.origin + d, look_at=self.look_at + d)

    def move_right(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * self._left()
        return self.replace(origin=self.origin - d, look_at=self.look_at - d)

    def _back(self):
        left = self._left()
        return -mathx.normalize(jnp.cross(left, VUP))

    def move_forward(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * self._back()
        return self.replace(origin=self.origin - d, look_at=self.look_at - d)

    def move_backward(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * self._back()
        return self.replace(origin=self.origin + d, look_at=self.look_at + d)

    def move_up(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * VUP
        return self.replace(origin=self.origin + d, look_at=self.look_at + d)

    def move_down(self, coefficient=1.0) -> "Camera":
        d = coefficient * self.move_speed * VUP
        return self.replace(origin=self.origin - d, look_at=self.look_at - d)

    def _rotate(self, delta_up, delta_left) -> "Camera":
        look = self.origin + mathx.normalize(self.look_at - self.origin)
        w = mathx.normalize(look - self.origin)
        left = mathx.normalize(jnp.cross(VUP, w))
        up = mathx.normalize(jnp.cross(w, left))
        look = look + delta_up * up + delta_left * left
        look = self.origin + mathx.normalize(look - self.origin)
        return self.replace(look_at=look)

    def rotate_up(self, dy) -> "Camera":
        return self._rotate(jnp.float32(dy), 0.0)

    def rotate_down(self, dy) -> "Camera":
        return self._rotate(-jnp.float32(dy), 0.0)

    def rotate_left(self, dx) -> "Camera":
        return self._rotate(0.0, jnp.float32(dx))

    def rotate_right(self, dx) -> "Camera":
        return self._rotate(0.0, -jnp.float32(dx))

    def scale_fov(self, d) -> "Camera":
        """ScaleFov adds d * pi/180 to the fov *in degrees*
        (`motional_camera.cu:166-168` — the reference mixes units; matched)."""
        return self.replace(view_fov=self.view_fov + jnp.float32(d) * jnp.pi / 180.0)

    def resize(self, width, height) -> "Camera":
        return self.replace(width=int(width), height=int(height))
