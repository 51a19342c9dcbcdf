"""CLI — the headless app layer replacing the reference's Win32 shell.

  python -m cpppathtracer_tpu render  --preset cornell --out out.png
  python -m cpppathtracer_tpu video   --preset material_zoo --frames 24 --out-dir frames/
  python -m cpppathtracer_tpu invert  --steps 100 --out-dir inverse_out/
  python -m cpppathtracer_tpu progressive --preset demo --frames 16 --out out.png
  python -m cpppathtracer_tpu bench   (same as bench.py)
"""

from __future__ import annotations

import argparse
import sys
import time


def _load_sky(path):
    import os

    import jax.numpy as jnp

    from cpppathtracer_tpu.ops.texture import load_texture, procedural_sky

    if path:
        return jnp.asarray(load_texture(path))
    # Default mirrors the reference's single hard-coded asset
    # (`textures/sky.png`, path_tracer.cu:47): the shipped 1280x1280
    # assets/sky.png, with the procedural generator as fallback.
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "sky.png",
    )
    if os.path.exists(default):
        return jnp.asarray(load_texture(default))
    return jnp.asarray(procedural_sky(512, 512))


def cmd_render(args):
    import jax
    import jax.numpy as jnp

    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.models.presets import PRESETS
    from cpppathtracer_tpu.ops.denoise import denoise
    from cpppathtracer_tpu.renderer import to_rgb8
    from cpppathtracer_tpu.utils.png import write_png
    from cpppathtracer_tpu.utils.obs import get_logger, RaysPerSecond

    log = get_logger()
    preset = PRESETS[args.preset]
    scene, camera = preset.build()
    if args.size:
        w, h = map(int, args.size.split("x"))
        camera = camera.resize(w, h)
    sky = _load_sky(args.sky)
    spp = args.spp or preset.spp
    depth = args.depth or preset.max_depth

    meter = RaysPerSecond()
    t0 = time.perf_counter()
    rad, n0, d0 = jax.jit(
        lambda s, c, sk: render_radiance(s, c, sk, spp=spp, max_depth=depth, seed=args.seed)
    )(scene, camera, sky)
    h, w = camera.height, camera.width
    rad = rad.reshape(h, w, 3)
    if not args.no_denoise:
        rad = denoise(rad, n0.reshape(h, w, 3), d0.reshape(h, w))
    rad = jax.block_until_ready(rad)
    dt = time.perf_counter() - t0
    meter.add(w, h, spp, depth, dt)
    log.info(
        "rendered %s %dx%d x%dspp depth %d in %.2fs (%.1f Mrays/s incl. compile)",
        args.preset, w, h, spp, depth, dt, meter.rays_per_sec / 1e6,
    )
    write_png(args.out, to_rgb8(jnp.clip(rad, 0, 1)))
    log.info("wrote %s", args.out)


def cmd_progressive(args):
    from cpppathtracer_tpu.models.presets import PRESETS
    from cpppathtracer_tpu.renderer import ProgressiveRenderer, RenderConfig, to_rgb8
    from cpppathtracer_tpu.utils.png import write_png
    from cpppathtracer_tpu.utils.obs import get_logger

    log = get_logger()
    preset = PRESETS[args.preset]
    scene, camera = preset.build()
    if args.size:
        w, h = map(int, args.size.split("x"))
        camera = camera.resize(w, h)
    sky = _load_sky(args.sky)
    cfg = RenderConfig(
        width=camera.width, height=camera.height,
        max_depth=args.depth or preset.max_depth, seed=args.seed,
    )
    r = ProgressiveRenderer(scene, camera, sky, cfg)
    t0 = time.perf_counter()
    for i in range(args.frames):
        r.step()
    frame = r.frame()
    log.info(
        "progressive %d frames in %.2fs (%.1f fps steady-state)",
        args.frames, time.perf_counter() - t0,
        args.frames / max(time.perf_counter() - t0, 1e-9),
    )
    write_png(args.out, to_rgb8(frame))
    log.info("wrote %s", args.out)


def cmd_video(args):
    from cpppathtracer_tpu.models.presets import PRESETS
    from cpppathtracer_tpu.video import orbit_path, render_video
    from cpppathtracer_tpu.utils.obs import get_logger

    log = get_logger()
    preset = PRESETS[args.preset]
    scene, camera = preset.build()
    if args.size:
        w, h = map(int, args.size.split("x"))
        camera = camera.resize(w, h)
    sky = _load_sky(args.sky)
    t0 = time.perf_counter()
    frames = render_video(
        scene, orbit_path(camera, args.frames), sky, args.out_dir,
        spp=args.spp or preset.spp, max_depth=args.depth or preset.max_depth,
        seed=args.seed,
    )
    log.info("wrote %d frames to %s in %.1fs", len(frames), args.out_dir,
             time.perf_counter() - t0)


def cmd_invert(args):
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.inverse import InverseConfig, fit
    from cpppathtracer_tpu.models.presets import PRESETS
    from cpppathtracer_tpu.renderer import to_rgb8
    from cpppathtracer_tpu.utils.png import write_png
    from cpppathtracer_tpu.utils.obs import get_logger, MetricsLog

    log = get_logger()
    preset = PRESETS[args.preset]
    scene_true, camera = preset.build()
    camera = camera.resize(args.res, args.res)
    sky = _load_sky(args.sky)
    cfg = InverseConfig(spp=args.spp, max_depth=args.depth, fields=("kd",),
                        learning_rate=args.lr,
                        fixed_samples=not args.fresh_samples)
    log.info("rendering target...")
    target, _, _ = render_radiance(
        scene_true, camera, sky, spp=cfg.spp, max_depth=cfg.max_depth, seed=0
    )
    rng = np.random.RandomState(1)
    kd0 = np.asarray(scene_true.kd).copy()
    kd0 = np.clip(kd0 + rng.uniform(-0.3, 0.3, kd0.shape), 0.05, 1.0).astype(np.float32)
    scene0 = dataclasses.replace(scene_true, kd=jnp.asarray(kd0))

    metrics = MetricsLog(f"{args.out_dir}/metrics.jsonl")

    def cb(step, loss, params):
        if step % 10 == 0:
            log.info("step %d loss %.3e", step, loss)
        metrics.log(step=step, loss=loss)

    import os

    os.makedirs(args.out_dir, exist_ok=True)
    fitted, losses = fit(scene0, camera, sky, np.asarray(target), cfg,
                         steps=args.steps, callback=cb)
    if losses:
        log.info("loss %.3e -> %.3e", losses[0], losses[-1])
    final, _, _ = render_radiance(
        fitted, camera, sky, spp=cfg.spp, max_depth=cfg.max_depth, seed=0
    )
    h, w = camera.height, camera.width
    write_png(f"{args.out_dir}/target.png", to_rgb8(np.asarray(target).reshape(h, w, 3)))
    write_png(f"{args.out_dir}/fitted.png", to_rgb8(np.asarray(final).reshape(h, w, 3)))
    log.info("wrote %s/{target,fitted}.png", args.out_dir)


def _size_arg(value: str) -> str:
    try:
        w, h = value.split("x")
        int(w), int(h)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected WxH (e.g. 640x480), got {value!r}"
        )
    return value


def cmd_interactive(args):
    from cpppathtracer_tpu.interactive import run
    from cpppathtracer_tpu.models.presets import PRESETS

    preset = PRESETS[args.preset]
    scene, camera = preset.build()
    if args.size:
        w, h = map(int, args.size.split("x"))
        camera = camera.resize(w, h)
    else:
        camera = camera.resize(128, 72)
    sky = _load_sky(args.sky)
    run(scene, camera, sky, max_depth=args.depth or 6, max_frames=args.frames)


def main(argv=None):
    from cpppathtracer_tpu.models.presets import PRESETS

    p = argparse.ArgumentParser(prog="cpppathtracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", default="cornell", choices=sorted(PRESETS))
        sp.add_argument("--size", default=None, type=_size_arg, help="WxH override")
        sp.add_argument("--sky", default=None, help="path to sky image (PNG)")
        sp.add_argument("--spp", type=int, default=None)
        sp.add_argument("--depth", type=int, default=None)
        sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser("render")
    common(sp)
    sp.add_argument("--out", default="render.png")
    sp.add_argument("--no-denoise", action="store_true")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("progressive")
    common(sp)
    sp.add_argument("--frames", type=int, default=16)
    sp.add_argument("--out", default="progressive.png")
    sp.set_defaults(fn=cmd_progressive)

    sp = sub.add_parser("video")
    common(sp)
    sp.add_argument("--frames", type=int, default=24)
    sp.add_argument("--out-dir", default="frames")
    sp.set_defaults(fn=cmd_video)

    sp = sub.add_parser("invert")
    sp.add_argument("--preset", default="material_zoo")
    sp.add_argument("--sky", default=None)
    sp.add_argument("--res", type=int, default=128)
    sp.add_argument("--spp", type=int, default=4)
    sp.add_argument("--depth", type=int, default=4)
    sp.add_argument("--lr", type=float, default=0.05)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--fresh-samples", action="store_true",
                    help="decorrelate MC samples per step (noisier loss)")
    sp.add_argument("--out-dir", default="inverse_out")
    sp.set_defaults(fn=cmd_invert)

    sp = sub.add_parser("interactive")
    common(sp)
    sp.add_argument("--frames", type=int, default=None,
                    help="stop after N frames (default: run until ESC)")
    sp.set_defaults(fn=cmd_interactive)

    sp = sub.add_parser("bench")
    sp.set_defaults(fn=lambda a: __import__("bench").main())

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
