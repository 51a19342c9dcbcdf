"""Texture sampling: JAX vs NumPy mirror, CUDA mirror-addressing semantics."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.ops import texture

RNG = np.random.RandomState(11)


def test_bilinear_jax_vs_np():
    tex = RNG.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    u = RNG.uniform(-2, 2, 512).astype(np.float32)
    v = RNG.uniform(-2, 2, 512).astype(np.float32)
    got = np.asarray(texture.sample_bilinear(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v)))
    want = texture.sample_bilinear_np(tex, u, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_texel_centers_exact():
    tex = RNG.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    # texel centers: u = (i + 0.5)/W
    for i in (0, 3, 7):
        for j in (0, 5):
            u = np.float32((i + 0.5) / 8)
            v = np.float32((j + 0.5) / 8)
            got = np.asarray(texture.sample_bilinear(jnp.asarray(tex), u, v))
            np.testing.assert_allclose(got, tex[j, i], atol=1e-6)


def test_mirror_addressing():
    tex = RNG.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    # u slightly below 0 mirrors back into the first texel
    got_neg = np.asarray(
        texture.sample_bilinear(jnp.asarray(tex), jnp.float32(-0.0625), jnp.float32(0.125))
    )
    got_pos = np.asarray(
        texture.sample_bilinear(jnp.asarray(tex), jnp.float32(0.0625), jnp.float32(0.125))
    )
    np.testing.assert_allclose(got_neg, got_pos, atol=1e-6)


def test_sky_uv_mapping():
    # v = asin(d.z)/pi + 0.5, u = atan(d.y/d.x)/(2 pi)  (path_tracer.cu:119)
    d = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], np.float32)
    u, v = texture.sky_uv(jnp.asarray(d), jnp)
    u, v = np.asarray(u), np.asarray(v)
    np.testing.assert_allclose(v[0], 0.5, atol=1e-6)  # horizon
    np.testing.assert_allclose(u[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(v[1], 1.0, atol=1e-6)  # +z pole
    np.testing.assert_allclose(u[2], 0.25, atol=1e-4)  # +y -> atan(+inf)/2pi


def test_procedural_sky_deterministic():
    a = texture.procedural_sky(32, 32, seed=1)
    b = texture.procedural_sky(32, 32, seed=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)
    assert a.min() >= 0 and a.max() <= 1


def test_packed_bilinear_matches_4tap():
    from cpppathtracer_tpu.ops.texture import pack_bilinear, sample_packed

    tex = RNG.uniform(0, 1, (19, 31, 3)).astype(np.float32)
    u = RNG.uniform(-1.5, 1.5, 2048).astype(np.float32)
    v = RNG.uniform(-1.5, 1.5, 2048).astype(np.float32)
    want = np.asarray(texture.sample_bilinear(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v)))
    pt = pack_bilinear(jnp.asarray(tex))
    got = np.asarray(sample_packed(pt, jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_packed_sky_matches_sky():
    from cpppathtracer_tpu.ops.texture import pack_bilinear, sample_sky_packed

    tex = RNG.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    d = RNG.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    want = np.asarray(texture.sample_sky(jnp.asarray(tex), jnp.asarray(d)))
    got = np.asarray(sample_sky_packed(pack_bilinear(jnp.asarray(tex)), jnp.asarray(d)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_packed_bilinear_differentiable():
    import jax
    from cpppathtracer_tpu.ops.texture import pack_bilinear, sample_packed

    tex = jnp.asarray(RNG.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    u = jnp.asarray(RNG.uniform(0, 1, 64).astype(np.float32))
    v = jnp.asarray(RNG.uniform(0, 1, 64).astype(np.float32))

    def f(t):
        return jnp.sum(sample_packed(pack_bilinear(t), u, v))

    g = np.asarray(jax.grad(f)(tex))
    assert np.isfinite(g).all()
    # bilinear weights sum to 1 per sample
    np.testing.assert_allclose(g.sum(), 64 * 3, rtol=1e-4)
