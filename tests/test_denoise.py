"""Denoiser: JAX vs scalar oracle; edge preservation behavior."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.ops.denoise import denoise, denoise_np

RNG = np.random.RandomState(3)


def test_denoise_matches_oracle():
    h, w = 12, 16
    rad = RNG.uniform(0, 1, (h, w, 3)).astype(np.float32)
    nrm = RNG.normal(size=(h, w, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    dep = RNG.uniform(1, 50, (h, w)).astype(np.float32)
    got = np.asarray(denoise(jnp.asarray(rad), jnp.asarray(nrm), jnp.asarray(dep)))
    want = denoise_np(rad, nrm, dep)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_constant_image_unchanged():
    h, w = 8, 8
    rad = np.full((h, w, 3), 0.37, np.float32)
    nrm = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (h, w, 1))
    dep = np.full((h, w), 5.0, np.float32)
    got = np.asarray(denoise(jnp.asarray(rad), jnp.asarray(nrm), jnp.asarray(dep)))
    np.testing.assert_allclose(got, rad, atol=1e-6)


def test_edges_preserved_by_normal_weight():
    # Two flat regions with opposite normals: the filter must not blur the
    # radiance across the normal discontinuity much.
    h, w = 8, 16
    rad = np.zeros((h, w, 3), np.float32)
    rad[:, w // 2 :] = 1.0
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[:, : w // 2, 1] = 1.0
    nrm[:, w // 2 :, 0] = 1.0
    dep = np.full((h, w), 5.0, np.float32)
    dep[:, w // 2 :] = 500.0
    got = np.asarray(denoise(jnp.asarray(rad), jnp.asarray(nrm), jnp.asarray(dep)))
    # interior of each region keeps its value closely
    assert got[:, : w // 2 - 2].max() < 0.2
    assert got[:, w // 2 + 2 :].min() > 0.8
