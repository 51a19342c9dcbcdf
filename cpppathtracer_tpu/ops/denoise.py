"""Edge-avoiding denoiser — single-pass 5x5 à-trous-style filter.

Matches `Denoising` (`cuSrc/path_tracer.cu:177-239`): fixed 5x5 Gaussian
tap weights, per-tap edge-stopping weight = product of color / normal /
depth similarity terms `min(exp(-dist^2 / pi), 1)`, output =
sum(w*k*c) / sum(w*k).  The reference's `stepwidth` parameter is accepted
but unused (taps fixed at +-2, `path_tracer.cu:189-190`); we support it as
an actual à-trous step for multi-pass use (stepwidth=1 == reference).

Boundary handling: the reference bounds-checks the *linear* offset
(`path_tracer.cu:216`), which zero-weights taps past the top/bottom edges
but wraps rows horizontally.  We zero-weight all out-of-image taps in 2D —
a deliberate fix (documented divergence; the wrap is an artifact, not a
feature).

Implementation: 25 statically-unrolled shifted adds over the padded image
— pure VPU elementwise work that XLA fuses into one pass; no gather, no
divergence.  Differentiable (used inside inverse-rendering loss pipelines).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# path_tracer.cu:191-197
KERNEL_5X5 = np.array(
    [
        [1.0, 4.0, 7.0, 4.0, 1.0],
        [4.0, 16.0, 26.0, 16.0, 4.0],
        [7.0, 26.0, 41.0, 26.0, 7.0],
        [4.0, 16.0, 26.0, 16.0, 4.0],
        [1.0, 4.0, 7.0, 4.0, 1.0],
    ],
    np.float32,
)


def denoise(radiance, normal, depth, stepwidth: int = 1):
    """Filter one frame.

    radiance: f32[H,W,3]; normal: f32[H,W,3]; depth: f32[H,W].
    Returns f32[H,W,3].
    """
    h, w, _ = radiance.shape
    r = 2 * stepwidth
    pad2 = lambda a: jnp.pad(a, ((r, r), (r, r)) + ((0, 0),) * (a.ndim - 2))
    rad_p = pad2(radiance)
    nrm_p = pad2(normal)
    dep_p = pad2(depth)
    valid_p = pad2(jnp.ones((h, w), jnp.float32))

    inv_pi = jnp.float32(1.0 / np.pi)
    num = jnp.zeros_like(radiance)
    den = jnp.zeros((h, w, 1), jnp.float32)
    for i in range(5):
        for j in range(5):
            dy = (j - 2) * stepwidth  # j indexes the y offset (cu:212)
            dx = (i - 2) * stepwidth
            k = jnp.float32(KERNEL_5X5[i, j])
            sl = lambda a: a[r + dy : r + dy + h, r + dx : r + dx + w]
            ctmp = sl(rad_p)
            ntmp = sl(nrm_p)
            ptmp = sl(dep_p)
            vtmp = sl(valid_p)
            cd = radiance - ctmp
            c_w = jnp.exp(-jnp.sum(cd * cd, -1) * inv_pi)
            nd = normal - ntmp
            n_w = jnp.exp(-jnp.sum(nd * nd, -1) * inv_pi)
            pd = depth - ptmp
            p_w = jnp.exp(-(pd * pd) * inv_pi)
            wgt = (c_w * n_w * p_w * vtmp * k)[..., None]
            num = num + wgt * ctmp
            den = den + wgt
    return num / den


def denoise_np(radiance, normal, depth, stepwidth: int = 1):
    """Scalar NumPy oracle of :func:`denoise` (independent loops)."""
    radiance = np.asarray(radiance, np.float32)
    normal = np.asarray(normal, np.float32)
    depth = np.asarray(depth, np.float32)
    h, w, _ = radiance.shape
    out = np.zeros_like(radiance)
    for y in range(h):
        for x in range(w):
            s = np.zeros(3, np.float64)
            cum = 0.0
            cval = radiance[y, x]
            nval = normal[y, x]
            pval = depth[y, x]
            for i in range(5):
                for j in range(5):
                    u = x + (i - 2) * stepwidth
                    v = y + (j - 2) * stepwidth
                    if u < 0 or u >= w or v < 0 or v >= h:
                        continue
                    ctmp = radiance[v, u]
                    c_w = min(np.exp(-float(np.sum((cval - ctmp) ** 2)) / np.pi), 1.0)
                    ntmp = normal[v, u]
                    n_w = min(np.exp(-float(np.sum((nval - ntmp) ** 2)) / np.pi), 1.0)
                    ptmp = depth[v, u]
                    p_w = min(np.exp(-float((pval - ptmp) ** 2) / np.pi), 1.0)
                    wgt = c_w * n_w * p_w * float(KERNEL_5X5[i, j])
                    s += wgt * ctmp
                    cum += wgt
            out[y, x] = (s / cum).astype(np.float32)
    return out
