"""Native C++ runtime: BVH build parity with NumPy, packing, PNG IO."""

import numpy as np
import pytest

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.models.scene import demo_scene
from cpppathtracer_tpu.ops.bvh import build_bvh_numpy, object_aabbs
from cpppathtracer_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_bvh_build_matches_numpy():
    scene = demo_scene(seed=0).build()
    sc = ref.scene_to_np(scene)
    amin, amax = object_aabbs(sc)
    want = build_bvh_numpy(amin, amax)
    got = native.build_bvh(amin, amax)
    for k in ("left", "right", "obj_idx"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    for k in ("aabb_min", "aabb_max"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_bvh_build_matches_numpy_random():
    rng = np.random.RandomState(4)
    n = 257
    c = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    r = rng.uniform(0.5, 5, (n, 1)).astype(np.float32)
    amin, amax = (c - r), (c + r)
    want = build_bvh_numpy(amin, amax)
    got = native.build_bvh(amin, amax)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_pack_bgra8():
    img = np.array([[[1.0, 0.5, 0.25], [0.0, 2.0, -1.0]]], np.float32)
    out = native.pack_bgra8(img)
    assert out.shape == (1, 2, 4)
    assert list(out[0, 0]) == [63, 127, 255, 255]
    assert list(out[0, 1]) == [0, 255, 0, 255]


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    p = tmp_path / "t.png"
    native.write_png(str(p), img)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_python_png_writer_roundtrip(tmp_path):
    from cpppathtracer_tpu.utils.png import read_image, write_png

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    p = tmp_path / "u.png"
    write_png(str(p), img)
    back = (read_image(str(p)) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back, img)
