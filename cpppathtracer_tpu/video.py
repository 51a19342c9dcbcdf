"""Animated-camera video driver (BASELINE config 5) — the headless
replacement for the reference's Win32 interactive loop (`cppSrc/main_wnd.cpp`
paint pump + WASD/mouse handlers): a camera path is a list of functional
camera states; frames render on-device (optionally sharded over the mesh)
and stream to disk as PNGs through the async frame sink.

The reference's pipeline-thread/semaphore machinery (`path_tracer.cu:256-319`)
maps to: JAX's async dispatch queues the next frame while the host encodes
the previous one; the native C++ frame sink (native/, when built) or a
Python writer thread handles IO off the critical path.
"""

from __future__ import annotations

import os
import queue
import threading
from collections.abc import Iterable, Sequence

import jax
import numpy as np

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.renderer import to_rgb8
from cpppathtracer_tpu.utils.png import write_png


def orbit_path(camera: Camera, frames: int, degrees: float = 360.0) -> list[Camera]:
    """A simple orbit of the camera origin around its look-at point."""
    out = []
    origin = np.asarray(camera.origin, np.float32)
    look = np.asarray(camera.look_at, np.float32)
    rel = origin - look
    for i in range(frames):
        ang = np.deg2rad(degrees) * i / frames
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([rel[0] * c + rel[2] * s, rel[1], -rel[0] * s + rel[2] * c], np.float32)
        out.append(camera.replace(origin=jax.numpy.asarray(look + rot)))
    return out


def fly_path(camera: Camera, frames: int, keys: str = "w") -> list[Camera]:
    """A path from repeated key-style motion (the WASDQE semantics of
    `VideoRenderer::OnKeyDown`, normalized diagonal speed included)."""
    out = []
    cam = camera
    for _ in range(frames):
        l_r = keys.count("a") - keys.count("d")
        f_b = keys.count("w") - keys.count("s")
        u_d = keys.count("q") - keys.count("e")
        div = max(np.sqrt(float(l_r**2 + f_b**2 + u_d**2)), 1.0)
        if l_r:
            cam = cam.move_left(l_r / div * 0.02)
        if f_b:
            cam = cam.move_forward(f_b / div * 0.02)
        if u_d:
            cam = cam.move_up(u_d / div * 0.02)
        out.append(cam)
    return out


class AsyncFrameSink:
    """Writer thread: frames queue here and encode to PNG off the render
    path (the role of the reference's OnFrameCallback -> UI thread copy)."""

    def __init__(self, out_dir: str, prefix: str = "frame"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.prefix = prefix
        self._q: queue.Queue = queue.Queue(maxsize=8)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            idx, img = item
            # device arrays fetch HERE, off the render thread: the D2H
            # copy + PNG encode overlap the next frame's dispatch (the
            # reference's callback/UI-thread copy, video_renderer.cpp:129)
            img = np.asarray(img)
            write_png(os.path.join(self.out_dir, f"{self.prefix}_{idx:05d}.png"), img)

    def put(self, idx: int, image: np.ndarray):
        self._q.put((idx, image))

    def close(self):
        self._q.put(None)
        self._thread.join()


def render_video(
    scene,
    cameras: Sequence[Camera] | Iterable[Camera],
    sky_tex,
    out_dir: str,
    *,
    spp: int = 8,
    max_depth: int = 8,
    seed: int = 0,
    mesh=None,
    denoise_frames: bool = True,
) -> list[str]:
    """Render a camera path to PNG frames. With `mesh`, each frame shards
    over the pixel-tile mesh (config 5's multi-host mode)."""
    import jax.numpy as jnp

    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.ops.denoise import denoise
    from cpppathtracer_tpu.parallel.render import render_image_sharded

    sky_tex = jnp.asarray(sky_tex, jnp.float32)
    sink = AsyncFrameSink(out_dir)
    paths = []

    @jax.jit
    def _denoise(rad, n0, t0):
        return denoise(rad, n0, t0)

    # ONE compiled frame program reused across the path (camera pytrees
    # and the seed are dynamic args): rendering each frame eagerly costs
    # per-op dispatch — seconds per frame through a remote-TPU tunnel.
    # The program is the WHOLE frame — integrate + denoise + rgb8 pack —
    # so the render thread only dispatches and enqueues device arrays;
    # the reference pays three kernel launches with device syncs between
    # them plus a host-side byte pack per frame (path_tracer.cu:278-303).
    import functools as _ft

    @_ft.partial(
        jax.jit, static_argnames=("spp", "max_depth", "use_denoise")
    )
    def _frame_rgb8(scene, cam, sky_tex, seed, *, spp, max_depth,
                    use_denoise):
        rad, n0, t0 = render_radiance(
            scene, cam, sky_tex, spp=spp, max_depth=max_depth, seed=seed
        )
        h, w = cam.height, cam.width
        rad = rad.reshape(h, w, 3)
        frame = (
            denoise(rad, n0.reshape(h, w, 3), t0.reshape(h, w))
            if use_denoise else rad
        )
        return (255.99 * jnp.clip(frame, 0.0, 1.0)).astype(jnp.uint8)

    try:
        for i, cam in enumerate(cameras):
            h, w = cam.height, cam.width
            if mesh is not None:
                rad, n0, t0 = render_image_sharded(
                    scene, cam, sky_tex, mesh, spp=spp, max_depth=max_depth, seed=seed + i
                )
                frame = _denoise(rad, n0, t0) if denoise_frames else rad
                img = to_rgb8(frame)
            else:
                # async dispatch; the sink thread blocks on the bytes
                img = _frame_rgb8(
                    scene, cam, sky_tex, seed + i, spp=spp,
                    max_depth=max_depth, use_denoise=denoise_frames,
                )
            sink.put(i, img)
            paths.append(os.path.join(out_dir, f"frame_{i:05d}.png"))
    finally:
        sink.close()
    return paths
