"""Interactive viewer: scripted key loop, ANSI frame encoding."""

import io

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.interactive import apply_key, frame_to_ansi, run
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.renderer import ProgressiveRenderer, RenderConfig


def _setup(w=16, h=10):
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.6, 0.3, 0.3))
    scene = b.build()
    cam = Camera.make(w, h, origin=(0.0, 4.0, -12.0), look_at=(0.0, 2.0, 0.0))
    return scene, cam


def test_frame_to_ansi_shape():
    img = np.random.RandomState(0).uniform(0, 1, (10, 16, 3)).astype(np.float32)
    s = frame_to_ansi(img)
    assert s.count("\n") == 4  # 10 rows -> 5 lines, 4 newlines
    assert "▀" in s and "\x1b[38;2;" in s


def test_scripted_session_moves_camera_and_renders():
    scene, cam = _setup()
    sky = procedural_sky(16, 16)
    keys = iter(["w", "i", "r", "d"])
    out = io.StringIO()
    frames = run(scene, cam, sky, max_depth=2, max_frames=6,
                 key_source=keys, out=out)
    assert frames == 5  # 1 initial + one per key, then StopIteration
    text = out.getvalue()
    assert "spp" in text and "▀" in text


def test_apply_key_motion_refreshes():
    scene, cam = _setup()
    r = ProgressiveRenderer(scene, cam, procedural_sky(16, 16),
                            RenderConfig(width=cam.width, height=cam.height, max_depth=2))
    r.step()
    assert int(r.state.sample_idx) == 1
    assert apply_key("w", r)
    assert int(r.state.sample_idx) == 0  # refreshed
    assert not np.allclose(np.asarray(r.camera.origin), np.asarray(cam.origin))
    assert apply_key("\x1b", r) is False


def test_apply_key_fov():
    scene, cam = _setup()
    r = ProgressiveRenderer(scene, cam, procedural_sky(16, 16),
                            RenderConfig(width=cam.width, height=cam.height, max_depth=2))
    f0 = float(r.camera.view_fov)
    apply_key("+", r)
    assert float(r.camera.view_fov) > f0
