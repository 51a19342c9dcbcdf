"""Experiment: live-tile fraction after the split bounce (phase A).

Measures, on the demo scene at 1024^2, what fraction of ray tiles still
contain any alive ray after bounces [0, S) — under the standard row-major
pixel order and under a Z-order (Morton) pixel layout — for several tile
sizes.  This decides whether per-tile liveness skip can replace the
lax.sort survivor compaction (VERDICT r4 item 1).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops import fast
from cpppathtracer_tpu.ops.mega import _kernel_forward
from cpppathtracer_tpu.ops.pallas.mega_kernel import pallas_mega_trace, build_tables_T
from cpppathtracer_tpu.ops.pallas.intersect_kernel import build_geom_mxu, build_geom_rows


def morton_order(w, h):
    """Pixel indices in Z-order: pixel_idx[i] = row-major index of the i-th
    pixel along the Morton curve."""
    n = w * h
    xs = np.arange(w, dtype=np.uint64)
    ys = np.arange(h, dtype=np.uint64)

    def part1by1(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    mx = part1by1(xs)
    my = part1by1(ys)
    code = mx[None, :] | (my[:, None] << np.uint64(1))  # [h, w]
    flat = code.reshape(-1)
    order = np.argsort(flat, kind="stable")  # row-major idx sorted by code
    return order.astype(np.int32)


def main():
    W = H = 1024
    depth_split = 2
    scene = demo_scene(seed=0).build()
    camera = Camera.make(W, H, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
    gs = fast.group_scene(scene)

    geom = build_geom_rows(gs)
    gmx = build_geom_mxu(gs)
    ts, trt = build_tables_T(gs)

    on_tpu = jax.default_backend() == "tpu"

    def run(pixel_idx, sample_idx):
        samp = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32), pixel_idx.shape)
        o, d = camera.ray_gen_planar(pixel_idx, sample_idx, 0)
        outs = pallas_mega_trace(
            o, d, pixel_idx, samp, jnp.asarray(0, jnp.int32),
            geom, gmx, ts, trt,
            counts=gs.counts, depth=depth_split, tile=1024,
            interpret=not on_tpu,
        )
        return outs[3]  # missed f32[R]

    runj = jax.jit(run)

    orders = {
        "rowmajor": np.arange(W * H, dtype=np.int32),
        "morton": morton_order(W, H),
    }
    for name, order in orders.items():
        pix = jnp.asarray(order)
        alive_frac = []
        rows = []
        for s in range(4):
            missed = np.asarray(runj(pix, s))
            alive = missed == 0.0
            alive_frac.append(alive.mean())
            row = {}
            for tile in (256, 512, 1024, 2048):
                tiles = alive.reshape(-1, tile)
                live_tiles = tiles.any(axis=1)
                row[tile] = live_tiles.mean()
            rows.append(row)
        af = float(np.mean(alive_frac))
        print(f"[{name}] alive rays after bounce {depth_split}: {af:.3f}")
        for tile in (256, 512, 1024, 2048):
            lt = float(np.mean([r[tile] for r in rows]))
            print(f"  tile={tile:5d}: live-tile fraction {lt:.3f}")


if __name__ == "__main__":
    main()
