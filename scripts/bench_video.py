"""Config-5 record: motional-camera video throughput (BASELINE.json
config 5 — 120 frames at 1024^2 x 128spp sharded across hosts; this
harness runs a scaled-but-real orbit on whatever backend is live and
writes VIDEO_r5.json with fps, rays/s and per-frame checksums).

Usage: python scripts/bench_video.py [--frames 24] [--size 1024]
       [--spp 16] [--depth 8]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "VIDEO_r5.json"))
    args = ap.parse_args()

    from cpppathtracer_tpu.models.camera import Camera
    from cpppathtracer_tpu.models.scene import demo_scene
    from cpppathtracer_tpu.ops.texture import procedural_sky
    from cpppathtracer_tpu.video import orbit_path, render_video

    scene = demo_scene(seed=0).build()
    camera = Camera.make(args.size, args.size,
                         origin=(130.0, 103.0, 130.0),
                         look_at=(0.0, 0.0, 0.0))
    sky = jnp.asarray(procedural_sky(256, 256))
    cams = orbit_path(camera, args.frames, degrees=360.0)

    out_dir = tempfile.mkdtemp(prefix="poca_video_")
    # warm the compile on frame 0 (the per-frame program is shared)
    t0 = time.perf_counter()
    render_video(scene, cams[:1], sky, out_dir, spp=args.spp,
                 max_depth=args.depth, seed=0)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    paths = render_video(scene, cams, sky, out_dir, spp=args.spp,
                         max_depth=args.depth, seed=0)
    wall = time.perf_counter() - t0

    checksums = []
    for p in paths:
        with open(p, "rb") as f:
            checksums.append(hashlib.sha256(f.read()).hexdigest()[:16])

    rays = args.size * args.size * args.spp * args.depth * args.frames
    result = {
        "backend": jax.default_backend(),
        "config": {
            "frames": args.frames, "size": args.size,
            "spp": args.spp, "depth": args.depth,
            "scene": "demo (~93 objects)", "path": "orbit 90deg",
        },
        "wall_s": wall,
        "fps": args.frames / wall,
        "rays_per_s": rays / wall,
        "compile_s": compile_s,
        "frame_sha256_16": checksums,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({
        "fps": round(result["fps"], 3),
        "mrays_s": round(result["rays_per_s"] / 1e6, 1),
        "frames": args.frames,
    }))


if __name__ == "__main__":
    main()
