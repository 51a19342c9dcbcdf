"""Sharding invariance: an 8-device pixel-tile mesh render must equal the
single-device render bitwise (stateless RNG keyed on global pixel ids)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.parallel.mesh import make_tile_mesh, pad_to_tiles
from cpppathtracer_tpu.parallel.render import render_image_sharded
from cpppathtracer_tpu.types import MaterialType

SKY = jnp.asarray(procedural_sky(32, 32, seed=9))


def _scene():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.85, 0.85, 0.85))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.7, 0.2, 0.2))
    b.add_sphere((-3.0, 1.0, 2.0), 1.0, mat_type=MaterialType.METAL, kd=(0.9, 0.9, 0.5),
                 smoothness=2.0)
    return b.build()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_tile_mesh(jax.devices()[:8])


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("ty", "tx")


def test_pad_to_tiles(mesh):
    assert pad_to_tiles(10, 10, mesh) == (10, 12)
    assert pad_to_tiles(8, 8, mesh) == (8, 8)


def test_sharded_equals_single_device(mesh):
    scene = _scene()
    cam = Camera.make(20, 14, origin=(0.0, 4.0, -12.0), look_at=(0.0, 2.0, 0.0))
    rad_s, n_s, t_s = render_image_sharded(
        scene, cam, SKY, mesh, spp=2, max_depth=3, seed=4
    )
    rad_1, n_1, t_1 = render_radiance(scene, cam, SKY, spp=2, max_depth=3, seed=4)
    h, w = cam.height, cam.width
    np.testing.assert_array_equal(np.asarray(rad_s), np.asarray(rad_1).reshape(h, w, 3))
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_1).reshape(h, w, 3))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_1).reshape(h, w))


def test_sharded_output_is_sharded(mesh):
    scene = _scene()
    cam = Camera.make(16, 16, origin=(0.0, 4.0, -12.0), look_at=(0.0, 2.0, 0.0))
    rad, _, _ = render_image_sharded(scene, cam, SKY, mesh, spp=1, max_depth=2, seed=0)
    assert rad.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(rad)).all()
