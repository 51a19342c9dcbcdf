"""Math substrate vs the independent scalar oracle."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.ops import mathx
from cpppathtracer_tpu import reference_cpu as ref

RNG = np.random.RandomState(42)


def _rand_unit(n):
    v = RNG.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True).astype(np.float32)


def test_to_world_matches_oracle():
    a = _rand_unit(256)
    n = _rand_unit(256)
    got = np.asarray(mathx.to_world(jnp.asarray(a), jnp.asarray(n)))
    want = np.stack([ref._to_world(a[i], n[i]) for i in range(256)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_to_world_preserves_z_alignment():
    # local +z must map to the given axis.
    n = _rand_unit(128)
    z = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (128, 1))
    got = np.asarray(mathx.to_world(jnp.asarray(z), jnp.asarray(n)))
    np.testing.assert_allclose(got, n, atol=1e-5)


def test_to_world_is_orthonormal_rotation():
    a = _rand_unit(128)
    n = _rand_unit(128)
    got = np.asarray(mathx.to_world(jnp.asarray(a), jnp.asarray(n)))
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones(128), atol=1e-4
    )


def test_schlick_matches_oracle():
    cos = RNG.uniform(0, 1, 64).astype(np.float32)
    ior = RNG.uniform(1.0, 3.0, 64).astype(np.float32)
    got = np.asarray(mathx.schlick(jnp.asarray(cos), jnp.asarray(ior)))
    want = np.array([ref._schlick(cos[i], ior[i]) for i in range(64)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_refract_matches_oracle():
    v = _rand_unit(256)
    n = _rand_unit(256)
    # flip normals against v like a surface normal
    flip = (np.sum(v * n, -1) > 0)[:, None]
    n = np.where(flip, -n, n).astype(np.float32)
    eta = RNG.uniform(0.4, 2.5, 256).astype(np.float32)
    got_d, got_ok = mathx.refract(jnp.asarray(v), jnp.asarray(n), jnp.asarray(eta))
    got_d, got_ok = np.asarray(got_d), np.asarray(got_ok)
    for i in range(256):
        want_d, want_ok = ref._refract(v[i], n[i], eta[i])
        assert got_ok[i] == want_ok, i
        if want_ok:
            np.testing.assert_allclose(got_d[i], want_d, atol=1e-5)


def test_reflect():
    v = _rand_unit(64)
    n = _rand_unit(64)
    got = np.asarray(mathx.reflect(jnp.asarray(v), jnp.asarray(n)))
    want = v - 2 * np.sum(v * n, -1, keepdims=True) * n
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_phong_lobe_cosine_distribution():
    # alpha=2 is the cosine-weighted hemisphere: E[z] = 2/3.
    from cpppathtracer_tpu.utils.rng import uniforms4

    u1, u2, _, _ = uniforms4(0, jnp.arange(1 << 14), 0, 0)
    local = np.asarray(mathx.phong_lobe_local(u1, u2, jnp.float32(2.0)))
    assert abs(local[:, 2].mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.linalg.norm(local, axis=-1), 1.0, atol=1e-4)
