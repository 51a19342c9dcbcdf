"""Counter-based RNG: determinism, NumPy/JAX bitwise agreement, uniformity."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.utils.rng import uniforms4, uniforms4_np


def test_jax_numpy_bitwise_equal():
    pixels = np.arange(4096, dtype=np.uint32)
    for sample in (0, 1, 17):
        for ctr in (0, 1, 5):
            j = uniforms4(7, jnp.asarray(pixels), sample, ctr)
            n = uniforms4_np(np.uint32(7), pixels, np.uint32(sample), np.uint32(ctr))
            for a, b in zip(j, n):
                np.testing.assert_array_equal(np.asarray(a), b)


def test_range_and_uniformity():
    pixels = np.arange(1 << 16, dtype=np.uint32)
    a, b, c, d = uniforms4_np(np.uint32(3), pixels, np.uint32(0), np.uint32(1))
    for u in (a, b, c, d):
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(np.var(u) - 1.0 / 12.0) < 0.005


def test_distinct_keys_decorrelated():
    pixels = np.arange(1024, dtype=np.uint32)
    a0, *_ = uniforms4_np(np.uint32(0), pixels, np.uint32(0), np.uint32(0))
    a1, *_ = uniforms4_np(np.uint32(0), pixels, np.uint32(1), np.uint32(0))
    b0, *_ = uniforms4_np(np.uint32(1), pixels, np.uint32(0), np.uint32(0))
    assert abs(np.corrcoef(a0, a1)[0, 1]) < 0.1
    assert abs(np.corrcoef(a0, b0)[0, 1]) < 0.1
    assert not np.array_equal(a0, a1)
    assert not np.array_equal(a0, b0)


def test_deterministic():
    x = uniforms4_np(np.uint32(5), np.uint32(123), np.uint32(4), np.uint32(2))
    y = uniforms4_np(np.uint32(5), np.uint32(123), np.uint32(4), np.uint32(2))
    for a, b in zip(x, y):
        np.testing.assert_array_equal(a, b)
