"""Micro-bench: the fused Pallas winner kernel alone at bench scale.

Usage: python scripts/perf_kernel.py [R] [tile]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops import fast
from cpppathtracer_tpu.ops.pallas.intersect_kernel import (
    build_geom_mxu,
    build_geom_rows,
    pallas_winner_index_planar,
)

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024 * 1024
tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

scene = demo_scene(seed=0).build()
gs = fast.group_scene(scene)
geom = jax.block_until_ready(build_geom_rows(gs))
gmx = jax.block_until_ready(build_geom_mxu(gs))

rng = np.random.RandomState(0)
o = tuple(jnp.asarray(rng.uniform(-100, 100, R).astype(np.float32)) for _ in range(3))
dn = rng.normal(size=(R, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
d = tuple(jnp.asarray(dn[:, i]) for i in range(3))
tmin = jnp.zeros(R, jnp.float32)
tmax = jnp.full(R, 1e30, jnp.float32)

fn = jax.jit(
    lambda o, d, tmin, tmax: pallas_winner_index_planar(
        o, d, tmin, tmax, geom, gmx, counts=gs.counts, tile=tile
    )
)
out = jax.block_until_ready(fn(o, d, tmin, tmax))
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    out = fn(o, d, tmin, tmax)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / iters
print(f"R={R} tile={tile}: {dt*1e3:.3f} ms/call, {R/dt/1e6:.1f} Mrays/s (winner only)")
