"""Morton-order row-granularity stats + honest row gather/scatter costs."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops import fast
from cpppathtracer_tpu.ops.pallas.mega_kernel import pallas_mega_trace, build_tables_T
from cpppathtracer_tpu.ops.pallas.intersect_kernel import build_geom_mxu, build_geom_rows

def morton_order(w, h):
    import numpy as _np
    def part1by1(v):
        v = v.astype(_np.uint64)
        v = (v | (v << 16)) & _np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & _np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & _np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & _np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & _np.uint64(0x5555555555555555)
        return v
    xs = _np.arange(w, dtype=_np.uint64); ys = _np.arange(h, dtype=_np.uint64)
    code = part1by1(xs)[None, :] | (part1by1(ys)[:, None] << _np.uint64(1))
    return _np.argsort(code.reshape(-1), kind="stable").astype(_np.int32)


def main():
    W = H = 1024
    scene = demo_scene(seed=0).build()
    camera = Camera.make(W, H, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
    gs = fast.group_scene(scene)
    geom = build_geom_rows(gs)
    gmx = build_geom_mxu(gs)
    ts, trt = build_tables_T(gs)
    on_tpu = jax.default_backend() == "tpu"

    def run(pixel_idx, sample_idx, depth):
        samp = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32), pixel_idx.shape)
        o, d = camera.ray_gen_planar(pixel_idx, sample_idx, 0)
        outs = pallas_mega_trace(
            o, d, pixel_idx, samp, jnp.asarray(0, jnp.int32),
            geom, gmx, ts, trt,
            counts=gs.counts, depth=depth, tile=1024, interpret=not on_tpu)
        return outs[3]
    runj = jax.jit(run, static_argnames=("depth",))

    for name, order in (("rowmajor", np.arange(W*H, dtype=np.int32)),
                        ("morton", morton_order(W, H))):
        pix = jnp.asarray(order)
        for depth in (1, 2, 3):
            stats = []
            for s in range(4):
                missed = np.asarray(runj(pix, s, depth))
                alive = missed == 0.0
                rows = alive.reshape(-1, 128)
                live_rows = rows.any(axis=1)
                occ = alive.sum() / max(live_rows.sum() * 128, 1)
                stats.append((alive.mean(), live_rows.mean(), occ))
            a, lr, oc = (float(np.mean([s[i] for s in stats])) for i in range(3))
            print(f"[{name}] after {depth} bounces: alive {a:.3f}, live-row(128) {lr:.3f}, occupancy-in-live {oc:.3f}")
main()

