"""Progressive renderer: Mix accumulation semantics, refresh, packing."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.renderer import (
    AccumulatorState,
    ProgressiveRenderer,
    RenderConfig,
    to_bgra8,
    to_rgb8,
)

SKY = procedural_sky(32, 32, seed=1)


def _renderer(w=12, h=8, denoise=True):
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.6, 0.3, 0.3))
    scene = b.build()
    cam = Camera.make(w, h, origin=(0.0, 4.0, -12.0), look_at=(0.0, 2.0, 0.0))
    cfg = RenderConfig(width=w, height=h, max_depth=3, denoise=denoise)
    return ProgressiveRenderer(scene, cam, SKY, cfg)


def test_first_frame_is_clamped_frame():
    r = _renderer()
    img1 = np.asarray(r.step())
    assert img1.shape == (8, 12, 3)
    assert img1.min() >= 0.0 and img1.max() <= 1.0
    assert int(r.state.sample_idx) == 1


def test_running_average_converges():
    r = _renderer()
    frames = [np.asarray(r.step()) for _ in range(6)]
    # variance of successive frame deltas must shrink as 1/k
    d1 = np.abs(frames[1] - frames[0]).mean()
    d5 = np.abs(frames[5] - frames[4]).mean()
    assert d5 <= d1 + 1e-6


def test_mix_lerp_semantics():
    # second frame: mix = mix + (clamp(f2) - mix)/2
    r = _renderer(denoise=False)
    r.step()
    m1 = np.asarray(r.state.mix).copy()
    r.step()
    m2 = np.asarray(r.state.mix)
    # m2 must lie between m1 and the clamped frame, elementwise midpointish
    assert np.all(m2 <= np.maximum(m1, 1.0) + 1e-6)
    assert int(r.state.sample_idx) == 2


def test_camera_motion_refreshes_accumulator():
    r = _renderer()
    r.step()
    r.step()
    assert int(r.state.sample_idx) == 2
    from cpppathtracer_tpu.models.camera import Camera

    r.move_camera(Camera.move_forward, 0.01)
    assert int(r.state.sample_idx) == 0
    assert np.all(np.asarray(r.state.mix) == 0)


def test_resize():
    r = _renderer()
    r.step()
    r.resize(16, 10)
    assert r.camera.width == 16 and r.camera.height == 10
    img = np.asarray(r.step())
    assert img.shape == (10, 16, 3)


def test_packing():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1.0, 0.5, 0.25]
    bgra = to_bgra8(img)
    assert bgra.shape == (2, 2, 4)
    assert list(bgra[0, 0]) == [63, 127, 255, 255]  # B,G,R,A
    rgb = to_rgb8(img)
    assert list(rgb[0, 0]) == [255, 127, 63]


def test_accumulator_checkpoint_roundtrip(tmp_path):
    from cpppathtracer_tpu.utils import checkpoint

    r = _renderer()
    r.step()
    r.step()
    path = str(tmp_path / "acc.npz")
    checkpoint.save(path, r.state, {"note": "test"})
    like = AccumulatorState.create(r.camera.height, r.camera.width)
    restored, meta = checkpoint.restore(path, like)
    assert meta["note"] == "test"
    np.testing.assert_array_equal(np.asarray(restored.mix), np.asarray(r.state.mix))
    assert int(restored.sample_idx) == 2
    # resuming continues identically
    r2 = _renderer()
    r2.state = AccumulatorState(
        mix=jnp.asarray(restored.mix), sample_idx=jnp.asarray(restored.sample_idx)
    )
    a = np.asarray(r.step())
    b = np.asarray(r2.step())
    np.testing.assert_array_equal(a, b)
