"""Vector-math substrate (batched, branchless).

Reproduces the semantics of the reference's math helpers
(`include/ray_tracing_math.hpp:43-80` and the vendored float3 operators)
for whole wavefronts at once.  All functions take f32[..., 3] arrays and
are differentiable; conditionals are expressed as `jnp.where` selects so
XLA vectorizes them onto the VPU with no divergence.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a, b):
    """Batched 3-vector dot product -> f32[...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(v):
    """Normalize like CUDA's `normalize` (rsqrt of the squared length).

    Guarded against zero-length inputs (returns 0 there) so gradients stay
    finite; the reference would produce inf/nan in that measure-zero case.
    """
    n2 = dot(v, v)
    inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, EPS)), 0.0)
    return v * inv[..., None]


def reflect(i, n):
    """CUDA helper_math `reflect`: i - 2*dot(i,n)*n."""
    return i - 2.0 * dot(i, n)[..., None] * n


def to_world(a, n):
    """Transform local direction `a` (z-up) into the frame around `n`.

    Matches `include/ray_tracing_math.hpp:51-63` exactly: the tangent C is
    built from the larger of |N.x|, |N.y| (branch -> select), B = C × N,
    result = a.x*B + a.y*C + a.z*N.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_len_x = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, EPS))
    c_x = jnp.stack([nz * inv_len_x, jnp.zeros_like(nx), -nx * inv_len_x], axis=-1)
    inv_len_y = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, EPS))
    c_y = jnp.stack([jnp.zeros_like(nx), nz * inv_len_y, -ny * inv_len_y], axis=-1)
    c = jnp.where(use_x[..., None], c_x, c_y)
    b = cross(c, n)
    return (
        a[..., 0:1] * b + a[..., 1:2] * c + a[..., 2:3] * n
    )


def schlick(cosine, ref_idx):
    """Schlick Fresnel approximation (`ray_tracing_math.hpp:65-69`)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    m = jnp.maximum(1.0 - cosine, 0.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def refract(v, n, ni_over_nt):
    """Snell refraction (`ray_tracing_math.hpp:71-80`).

    Returns (refracted_dir f32[...,3], ok bool[...]).  Where total internal
    reflection occurs (discriminant <= 0) `ok` is False and the direction is
    a zero vector; callers must select on `ok`.
    """
    uv = normalize(v)
    dt = dot(uv, n)
    disc = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc > 0
    # double-where: evaluate sqrt at a strictly positive dummy on TIR lanes
    # so sqrt'(0)=inf never meets the zero cotangent (0*inf = NaN in vjp).
    safe_disc = jnp.where(ok, disc, 1.0)
    refr = normalize(
        ni_over_nt[..., None] * (uv - n * dt[..., None]) - n * jnp.sqrt(safe_disc)[..., None]
    )
    return jnp.where(ok[..., None], refr, jnp.zeros_like(refr)), ok


def phong_lobe_local(u1, u2, alpha):
    """Sample the reference's Phong-style lobe in local (z-up) coords.

    z = u1**(1/alpha), r = sqrt(1-z^2), phi = 2*pi*u2 — the shared sampling
    block of every hit shader (`cuSrc/material.cu:23-26,44-47` et al.).
    alpha=2 gives the cosine-weighted hemisphere used by Diffuse.

    Computed as z = exp(log(u1)/alpha) and r^2 = -expm1(2*log(u1)/alpha):
    identical distribution but avoids the reference's catastrophic
    cancellation in 1 - z^2 when alpha is huge (z -> 1), where fp32
    `pow` rounding flips r by up to 50%.  -expm1(y) is spelled through
    the exact identity -tanh(y/2)*(e^y + 1) — equally well-conditioned
    at y -> 0, and lowerable in Pallas TPU kernels (expm1 is not); the
    planar and NumPy-oracle twins use the same form.
    """
    log_u = jnp.log(jnp.maximum(u1, jnp.float32(1e-38)))
    inv_a = 1.0 / alpha
    z = jnp.exp(log_u * inv_a)
    y = 2.0 * log_u * inv_a
    neg_expm1 = -jnp.tanh(0.5 * y) * (jnp.exp(y) + 1.0)
    r = jnp.sqrt(jnp.maximum(neg_expm1, 0.0))
    phi = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
