"""Dense-vs-BVH crossover measurement (round-2 verdict item 2).

Times the forward render (non-mega wavefront path, which both winner
kernels plug into) at several scene sizes with the skip-pointer BVH
traversal kernel ON vs OFF, on whatever backend is live (TPU under
axon).  Writes BVH_CROSSOVER.json at the repo root.

Usage: python scripts/bench_bvh.py [--res 512] [--spp 2] [--depth 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cpppathtracer_tpu.integrator import render_radiance  # noqa: E402
from cpppathtracer_tpu.models.presets import big_camera, big_scene  # noqa: E402
from cpppathtracer_tpu.ops.texture import procedural_sky  # noqa: E402


def time_render(scene, cam, sky, spp, depth, iters=3):
    fn = jax.jit(lambda s, c, k: render_radiance(
        s, c, k, spp=spp, max_depth=depth, seed=0)[0])
    out = fn(scene, cam, sky)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(scene, cam, sky))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--sizes", default="64,256,1024,1536,2048,4096,8192,16384")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BVH_CROSSOVER.json"))
    args = ap.parse_args()

    sky = jnp.asarray(procedural_sky(128, 128, seed=1))
    rays = args.res * args.res * args.spp * args.depth
    rows = []
    # the mega path would bypass the per-bounce winner kernels — disable
    # so dense and BVH run through the same wavefront loop
    os.environ["POCA_MEGA"] = "0"
    for n in [int(x) for x in args.sizes.split(",")]:
        cam = big_camera(n, args.res, args.res)
        times = {}
        for mode in ("dense", "bvh"):
            os.environ["POCA_BVH"] = "1" if mode == "bvh" else "0"
            jax.clear_caches()
            scene = big_scene(n, bvh=(mode == "bvh"))
            try:
                times[mode] = time_render(scene, cam, sky, args.spp, args.depth)
            except Exception as e:
                # dense VMEM-OOMs past ~2146 objects (the [M, TR]
                # candidate block): record it and keep going — that is
                # the crossover's far wall
                times[mode] = None
                print(f"N={n} {mode}: FAILED "
                      f"({'VMEM OOM' if 'vmem' in str(e).lower() else str(e)[:80]})")
        rows.append({
            "n_objects": n,
            "dense_s": times["dense"],
            "bvh_s": times["bvh"],
            "dense_mrays_s": (rays / times["dense"] / 1e6
                              if times["dense"] else None),
            "bvh_mrays_s": (rays / times["bvh"] / 1e6
                            if times["bvh"] else None),
            "speedup": (times["dense"] / times["bvh"]
                        if times["dense"] and times["bvh"] else None),
        })
        dd = f"{times['dense']*1e3:8.1f} ms" if times["dense"] else "  VMEM-OOM"
        bb = f"{times['bvh']*1e3:8.1f} ms" if times["bvh"] else "  FAILED"
        sp = (f"{times['dense']/times['bvh']:5.2f}x"
              if times["dense"] and times["bvh"] else "  n/a")
        print(f"N={n:5d} dense={dd} bvh={bb} speedup={sp}")

    crossover = next((r["n_objects"] for r in rows
                      if r["speedup"] and r["speedup"] > 1.0), None)
    result = {
        "backend": jax.default_backend(),
        "config": {"res": args.res, "spp": args.spp, "depth": args.depth},
        "rows": rows,
        "crossover_n": crossover,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"crossover_n": crossover}))


if __name__ == "__main__":
    main()
