"""Video driver: camera paths and frame rendering to PNG."""

import os

import numpy as np

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.video import fly_path, orbit_path, render_video

SKY = procedural_sky(16, 16, seed=0)


def _scene():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.6, 0.2, 0.2))
    return b.build()


def test_orbit_path_lengths():
    cam = Camera.make(8, 8, origin=(10.0, 5.0, 0.0), look_at=(0.0, 0.0, 0.0))
    path = orbit_path(cam, 12)
    assert len(path) == 12
    for c in path:
        d = np.linalg.norm(np.asarray(c.origin - c.look_at))
        np.testing.assert_allclose(d, np.sqrt(125.0), rtol=1e-5)


def test_fly_path_moves():
    cam = Camera.make(8, 8, origin=(0.0, 5.0, -10.0), look_at=(0.0, 0.0, 0.0))
    path = fly_path(cam, 5, keys="w")
    assert len(path) == 5
    assert not np.allclose(np.asarray(path[-1].origin), np.asarray(cam.origin))


def test_render_video_writes_frames(tmp_path):
    scene = _scene()
    cam = Camera.make(12, 8, origin=(0.0, 4.0, -10.0), look_at=(0.0, 2.0, 0.0))
    frames = render_video(
        scene, orbit_path(cam, 3, degrees=30.0), SKY, str(tmp_path),
        spp=1, max_depth=2,
    )
    assert len(frames) == 3
    for f in frames:
        assert os.path.exists(f), f
    from PIL import Image

    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (8, 12, 3)
