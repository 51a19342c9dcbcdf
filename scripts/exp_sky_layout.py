"""Isolate the sky-epilogue cost: gather + bilinear combine formulations.

The profiled fwd+bwd step shows the packed-sky gather at ~1.9 ms/sample
plus a 0.84 ms/sample pure relayout copy of the whole [R,16] gather
({1,0}->{0,1}: the planar combine slices columns).  Candidates keep the
combine in the gather's natural row-major layout so only the 4 quad
weights (16 MB) cross the planar/row-major boundary instead of the 64 MB
texel block.

Usage: python scripts/exp_sky_layout.py [R_log2] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cpppathtracer_tpu.ops import texture
from cpppathtracer_tpu.ops.planar import unstack_v3

R = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

sky = jnp.asarray(texture.procedural_sky(256, 256))
pt = texture.pack_bilinear(sky)

key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
thru = jnp.abs(dx)
missed = (dz > -2.0).astype(jnp.float32)


def _coords(ptex, u, v):
    h, w = ptex.shape
    xf = texture._fold_axis(u * w, w)
    yf = texture._fold_axis(v * h, h)
    xb = xf - 0.5
    yb = yf - 0.5
    x0 = jnp.floor(xb)
    y0 = jnp.floor(yb)
    fx = jnp.where(x0 < 0, 0.0, xb - x0)
    fy = jnp.where(y0 < 0, 0.0, yb - y0)
    xi = jnp.maximum(x0, 0.0).astype(jnp.int32)
    yi = jnp.maximum(y0, 0.0).astype(jnp.int32)
    return yi * w + xi, fx, fy


def combine_current(ptex, q, fx, fy):
    wide = jnp.take(ptex.data, q, axis=0)
    fx = fx[:, None]
    fy = fy[:, None]
    top = wide[:, 0:3] * (1.0 - fx) + wide[:, 3:6] * fx
    bot = wide[:, 6:9] * (1.0 - fx) + wide[:, 9:12] * fx
    return top * (1.0 - fy) + bot * fy


def combine_quadw(ptex, q, fx, fy):
    # weights stacked [R,4]; combine in row-major [R,4,4]
    wide = jnp.take(ptex.data, q, axis=0).reshape(-1, 4, 4)
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    w4 = jnp.stack([w00, w01, w10, w11], axis=-1)  # [R,4]
    out = jnp.sum(wide * w4[:, :, None], axis=1)  # [R,4]
    return out[:, 0:3]


def combine_matmul(ptex, q, fx, fy):
    # scale each quad's 4 floats by its weight, then a [16,3] 0/1 matmul
    wide = jnp.take(ptex.data, q, axis=0)
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    w4 = jnp.stack([w00, w01, w10, w11], axis=-1)  # [R,4]
    wq = jnp.repeat(w4, 4, axis=1)  # [R,16]
    sel = jnp.zeros((16, 3), jnp.float32)
    idx = [(0, 0), (1, 1), (2, 2), (3, 0), (4, 1), (5, 2),
           (6, 0), (7, 1), (8, 2), (9, 0), (10, 1), (11, 2)]
    sel = sel.at[tuple(zip(*idx))].set(1.0)
    return jax.lax.dot(wide * wq, sel,
                       precision=jax.lax.Precision.HIGHEST)


def make(fn):
    def run(ptex, dvec, thru_, missed_):
        u, v = texture.sky_uv(dvec, jnp)
        q, fx, fy = _coords(ptex, u, v)
        rgb = fn(ptex, q, fx, fy)
        # planar consumer, like the integrator's radiance epilogue
        r, g, b = unstack_v3(rgb)
        return (jnp.sum(r * thru_ * missed_) + jnp.sum(g * missed_)
                + jnp.sum(b))
    return jax.jit(run)


ref = None
for name, fn in [("current", combine_current), ("quadw", combine_quadw),
                 ("matmul", combine_matmul)]:
    run = make(fn)
    out = run(pt, d, thru, missed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(pt, d, thru, missed)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    if ref is None:
        ref = float(out)
    err = abs(float(out) - ref) / max(abs(ref), 1e-30)
    print(f"{name:10s} {dt*1e3:7.3f} ms   rel_err={err:.2e}")
