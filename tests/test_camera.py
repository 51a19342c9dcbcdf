"""Camera: ray generation vs oracle; motion ops reference semantics."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.models.camera import Camera


def _cam(w=32, h=24):
    return Camera.make(w, h, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))


def test_ray_gen_matches_oracle():
    cam = _cam()
    cam_np = ref.camera_to_np(cam)
    pix = jnp.arange(cam.width * cam.height, dtype=jnp.int32)
    rays = cam.ray_gen(pix, 0, 42)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.dir)
    for p in range(0, cam.width * cam.height, 37):
        oo, dd = ref._ray_gen(cam_np, p, np.uint32(0), np.uint32(42))
        np.testing.assert_allclose(o[p], oo, atol=1e-4)
        np.testing.assert_allclose(d[p], dd, atol=1e-5)


def test_rays_normalized_and_tmax():
    cam = _cam()
    rays = cam.ray_gen(jnp.arange(cam.width * cam.height, dtype=jnp.int32), 3, 0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.dir), axis=-1), 1.0, atol=1e-5
    )
    assert float(rays.tmax[0]) == float(np.float32(1e30))
    assert float(rays.tmin[0]) == 0.0


def test_move_forward_keeps_y():
    # MoveEyeForward moves in the horizontal plane (motional_camera.cu:92-99).
    cam = _cam()
    moved = cam.move_forward(1.0)
    np.testing.assert_allclose(float(moved.origin[1]), float(cam.origin[1]), atol=1e-4)
    d_old = np.asarray(cam.look_at - cam.origin)
    d_new = np.asarray(moved.look_at - moved.origin)
    np.testing.assert_allclose(d_old, d_new, atol=1e-4)


def test_move_left_right_inverse():
    cam = _cam()
    back = cam.move_left(0.7).move_right(0.7)
    np.testing.assert_allclose(np.asarray(back.origin), np.asarray(cam.origin), atol=1e-3)


def test_rotate_normalizes_lookat_distance():
    cam = _cam()
    rot = cam.rotate_right(0.1)
    dist = np.linalg.norm(np.asarray(rot.look_at - rot.origin))
    np.testing.assert_allclose(dist, 1.0, atol=1e-5)


def test_scale_fov_unit_quirk():
    # ScaleFov adds d*pi/180 to fov-in-degrees (motional_camera.cu:166-168).
    cam = _cam()
    z = cam.scale_fov(180.0)
    np.testing.assert_allclose(float(z.view_fov) - float(cam.view_fov), np.pi, atol=1e-5)
