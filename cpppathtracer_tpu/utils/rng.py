"""Counter-based, stateless RNG for Monte-Carlo sampling.

The reference seeds a persistent per-pixel `curandState` from the host
wall clock (`cuSrc/path_tracer.cu:107`, `include/ray_tracing_math.hpp:88-92`)
— non-reproducible by design.  Golden tests and sharding-invariant
rendering need the opposite: every uniform draw is a *pure function* of
``(seed, pixel_index, sample_index, counter)``, so

  * the NumPy CPU oracle, the JAX integrator, and Pallas kernels produce
    bit-identical streams,
  * a render sharded over N devices equals the single-device render
    bitwise (keys depend on global pixel ids, not device-local ones), and
  * checkpoint/resume needs no RNG state beyond the integer counters.

Hash: PCG4D (M. Jarzynski & M. Olano, "Hash Functions for GPU Rendering",
JCGT 2020) — a well-studied 4×32-bit mix with good avalanche behaviour,
cheap on the VPU (integer mul/add/xor/shift only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Counter-space layout: draw counter for camera/lens sampling, then one
# 4-wide draw per bounce.
CTR_RAYGEN = 0


def _pcg4d_jnp(x, y, z, w):
    """One PCG4D evaluation; inputs/outputs are uint32 arrays."""
    x = x.astype(jnp.uint32)
    y = y.astype(jnp.uint32)
    z = z.astype(jnp.uint32)
    w = w.astype(jnp.uint32)
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    w = w * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _pcg4d_np(x, y, z, w):
    """NumPy mirror of :func:`_pcg4d_jnp` (bitwise identical)."""
    with np.errstate(over="ignore"):
        x = np.uint32(x)
        y = np.uint32(y)
        z = np.uint32(z)
        w = np.uint32(w)
        mul = np.uint32(1664525)
        add = np.uint32(1013904223)
        x = np.uint32(x * mul + add)
        y = np.uint32(y * mul + add)
        z = np.uint32(z * mul + add)
        w = np.uint32(w * mul + add)
        x = np.uint32(x + y * w)
        y = np.uint32(y + z * x)
        z = np.uint32(z + x * y)
        w = np.uint32(w + y * z)
        x = np.uint32(x ^ (x >> np.uint32(16)))
        y = np.uint32(y ^ (y >> np.uint32(16)))
        z = np.uint32(z ^ (z >> np.uint32(16)))
        w = np.uint32(w ^ (w >> np.uint32(16)))
        x = np.uint32(x + y * w)
        y = np.uint32(y + z * x)
        z = np.uint32(z + x * y)
        w = np.uint32(w + y * z)
    return x, y, z, w


# 2**-24: top 24 bits of each word -> float32 uniform in [0, 1).
_INV_2_24 = float(2.0**-24)


def uniforms4(seed, pixel, sample, ctr):
    """Four independent U[0,1) floats per (seed, pixel, sample, ctr) key.

    All arguments broadcast; returns a tuple of four f32 arrays with the
    broadcast shape.  JAX/TPU implementation.
    """
    pixel = jnp.asarray(pixel)
    shape = jnp.broadcast_shapes(
        jnp.shape(seed), jnp.shape(pixel), jnp.shape(sample), jnp.shape(ctr)
    )
    x = jnp.broadcast_to(jnp.asarray(pixel, jnp.uint32), shape)
    y = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), shape)
    z = jnp.broadcast_to(jnp.asarray(ctr, jnp.uint32), shape)
    w = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), shape)
    a, b, c, d = _pcg4d_jnp(x, y, z, w)
    to_f = lambda v: (v >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(_INV_2_24)
    return to_f(a), to_f(b), to_f(c), to_f(d)


def uniforms4_np(seed, pixel, sample, ctr):
    """NumPy mirror of :func:`uniforms4` — bitwise identical draws."""
    a, b, c, d = _pcg4d_np(pixel, sample, ctr, seed)
    to_f = lambda v: np.float32(np.float64(v >> np.uint32(8)) * _INV_2_24)
    return to_f(a), to_f(b), to_f(c), to_f(d)
