"""Texture sampling + environment (sky) map.

Reimplements the reference texture subsystem's *observable semantics*
(`cuSrc/textures.cu`): images are sampled with normalized coordinates,
bilinear filtering, mirror addressing, and uchar->[0,1] normalized reads
(`textures.cu:44-50`: addressMode=Mirror by default, filterMode=Linear,
readMode=NormalizedFloat, normalizedCoords=1).  The device fetch is
`tex2D<float4>(u, v)` (`textures.cu:68-71`).

CUDA linear filtering samples at unnormalized coordinate (u*W - 0.5,
v*H - 0.5) and lerps the 2x2 texel neighbourhood, with each texel index
wrapped by the address mode.  Mirror addressing reflects at every integer
boundary: index i maps to m = i mod 2N; m >= N -> 2N-1-m.

The sky miss shader maps direction d -> (u, v) as
  v = asin(d.z)/pi + 0.5 ;  u = atan(d.y / d.x) / (2*pi)
(`cuSrc/path_tracer.cu:117-122`) — note plain atan (not atan2), so u lies
in (-0.25, 0.25) and negative u relies on mirror addressing.

Differentiable w.r.t. the texture image (the sky texture is an inverse
rendering target), NOT w.r.t. the coordinates (gather indices detached,
bilinear weights attached — standard differentiable-bilinear behaviour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mirror_index(i, n):
    """CUDA mirror address mode on integer texel index i (JAX).

    numpy-style modulo with a positive divisor is already non-negative."""
    m = i % (2 * n)
    return jnp.where(m >= n, 2 * n - 1 - m, m)


def sample_bilinear(tex, u, v):
    """Bilinear fetch with mirror addressing (JAX).

    tex: f32[H, W, C] in [0,1]; u, v: f32[...] normalized coords.
    Returns f32[..., C].
    """
    h, w = tex.shape[0], tex.shape[1]
    xb = u * w - 0.5
    yb = v * h - 0.5
    x0f = jnp.floor(xb)
    y0f = jnp.floor(yb)
    fx = (xb - x0f)[..., None]
    fy = (yb - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0m = _mirror_index(x0, w)
    x1m = _mirror_index(x0 + 1, w)
    y0m = _mirror_index(y0, h)
    y1m = _mirror_index(y0 + 1, h)
    t00 = tex[y0m, x0m]
    t01 = tex[y0m, x1m]
    t10 = tex[y1m, x0m]
    t11 = tex[y1m, x1m]
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_bilinear_np(tex, u, v):
    """NumPy mirror of :func:`sample_bilinear` for the CPU oracle."""
    tex = np.asarray(tex, np.float32)
    h, w = tex.shape[0], tex.shape[1]
    xb = np.float32(u) * w - np.float32(0.5)
    yb = np.float32(v) * h - np.float32(0.5)
    x0f = np.floor(xb)
    y0f = np.floor(yb)
    fx = np.float32(xb - x0f)[..., None]
    fy = np.float32(yb - y0f)[..., None]
    x0 = x0f.astype(np.int64)
    y0 = y0f.astype(np.int64)

    def mirror(i, n):
        m = np.mod(i, 2 * n)
        return np.where(m >= n, 2 * n - 1 - m, m)

    t00 = tex[mirror(y0, h), mirror(x0, w)]
    t01 = tex[mirror(y0, h), mirror(x0 + 1, w)]
    t10 = tex[mirror(y0 + 1, h), mirror(x0, w)]
    t11 = tex[mirror(y0 + 1, h), mirror(x0 + 1, w)]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sky_uv(dir_xyz, np_mod=jnp):
    """Direction -> env-map UV, matching `Miss` (`path_tracer.cu:117-122`).

    v = asin(d.z)/pi + 0.5 ; u = atan(d.y/d.x)/(2 pi), with the 0/0 case at
    d = ±y guarded (the reference produces NaN there; we clamp the ratio)."""
    d = dir_xyz
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    safe_dx = np_mod.where(dx == 0, np_mod.float32(1e-30), dx)
    v = np_mod.arcsin(np_mod.clip(dz, -1.0, 1.0)) / np_mod.pi + 0.5
    u = np_mod.arctan(dy / safe_dx) / (2.0 * np_mod.pi)
    return u.astype(np_mod.float32), v.astype(np_mod.float32)


def sample_sky(tex, dir_xyz):
    """Sky radiance for (normalized) directions — JAX path."""
    u, v = sky_uv(dir_xyz, jnp)
    return sample_bilinear(tex, u, v)


def sample_sky_np(tex, dir_xyz):
    u, v = sky_uv(np.asarray(dir_xyz, np.float32), np)
    return sample_bilinear_np(tex, u, v)


# ----------------------------------------------------------------------------
# Asset helpers
# ----------------------------------------------------------------------------

def load_texture(path) -> np.ndarray:
    """Load an image file to f32[H,W,3] in [0,1] (the analog of
    `PocaTextureUtils::AddTexByFile`, `textures.cu:14-62`, without the
    OpenCV dependency)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def procedural_sky(height: int = 256, width: int = 256, seed: int = 0) -> np.ndarray:
    """Deterministic built-in sky texture (gradient + sun disc + soft
    clouds) used as the default environment when no file is given; the
    reference hard-codes `textures/sky.png` (`path_tracer.cu:47`)."""
    rng = np.random.RandomState(seed)
    y = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None]
    x = np.linspace(0.0, 1.0, width, dtype=np.float32)[None, :]
    horizon = np.array([0.9, 0.85, 0.75], np.float32)
    zenith = np.array([0.25, 0.45, 0.85], np.float32)
    t = np.abs(y - 0.5) * 2.0
    base = horizon * (1 - t[..., None]) + zenith * t[..., None]
    # sun disc
    sun_u, sun_v = 0.1, 0.75
    d2 = (x - sun_u) ** 2 + (y - sun_v) ** 2
    sun = np.exp(-d2 / 0.002)[..., None] * np.array([3.0, 2.7, 2.2], np.float32)
    # low-frequency clouds
    clouds = np.zeros((height, width), np.float32)
    for k in range(1, 5):
        ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
        clouds += np.sin(2 * np.pi * k * x + ph1) * np.sin(2 * np.pi * k * y + ph2) / k
    clouds = np.clip(clouds, 0, None)[..., None] * 0.15
    out = np.clip(base + sun + clouds, 0.0, 1.0)
    return out.astype(np.float32)


# ----------------------------------------------------------------------------
# Quad-packed single-gather bilinear sampling (TPU fast path)
# ----------------------------------------------------------------------------
#
# TPU dynamic gathers pay per-row overhead, so the standard 4-tap bilinear
# fetch costs ~4x a single wide fetch.  `pack_bilinear` precomputes, per
# texel, its 2x2 clamped neighborhood as one 16-float row ([t00 t01 t10
# t11 pad]); `sample_packed` then needs ONE row gather per sample.
#
# Mirror addressing is folded into the *continuous* coordinate first:
# mirror-filtered sampling equals sampling the reflected texture, so
# xf = fold(u*W) into [0, W] followed by clamp-to-edge bilinear is exactly
# CUDA's mirror+linear (with fx forced to 0 on the x0 = -1 boundary strip,
# where both true taps are texel 0).  Verified against sample_bilinear in
# tests/test_texture.py.

import dataclasses as _dataclasses

import jax as _jax


@_jax.tree_util.register_dataclass
@_dataclasses.dataclass
class PackedTexture:
    data: object  # f32[ceil(H*W/FOLD), FOLD*16] — FOLD quads per row
    shape: tuple = _dataclasses.field(metadata=dict(static=True))  # (H, W)


# The quad table folds FOLD consecutive quads into one wide row (the
# sampler gathers the row and where-selects the quad — exact, bit-
# identical to a direct fetch).  Tuning is config-dependent: with the r4
# one-hot-reduce select, FOLD=4 measured best (218.2 vs 215.0 Mrays/s at
# the bench config), but that formulation forced a [R, FOLD*16] relayout
# copy; with the r5 where-chain select the copy is gone and FOLD=1 wins
# (288.3 vs 275.7 FOLD=4 / 282.3 FOLD=2, 1024^2 x 64spp fwd+bwd, v5e).
# Override with POCA_SKY_FOLD to re-tune (read once at import).
import os as _os

_FOLD = int(_os.environ.get("POCA_SKY_FOLD", "0")) or 1


def pack_bilinear(tex) -> PackedTexture:
    """Precompute the quad-packed table for f32[H,W,3] (jit-safe)."""
    tex = jnp.asarray(tex, jnp.float32)
    h, w = tex.shape[0], tex.shape[1]
    xn = jnp.minimum(jnp.arange(w) + 1, w - 1)
    yn = jnp.minimum(jnp.arange(h) + 1, h - 1)
    t00 = tex
    t01 = tex[:, xn]
    t10 = tex[yn, :]
    t11 = tex[yn][:, xn]
    pad = jnp.zeros((h, w, 4), jnp.float32)
    packed = jnp.concatenate([t00, t01, t10, t11, pad], axis=-1).reshape(h * w, 16)
    n = h * w
    n_rows = -(-n // _FOLD)
    if n_rows * _FOLD != n:
        packed = jnp.concatenate(
            [packed, jnp.zeros((n_rows * _FOLD - n, 16), jnp.float32)], axis=0
        )
    return PackedTexture(
        data=packed.reshape(n_rows, _FOLD * 16), shape=(h, w)
    )


def _fold_axis(coord, n):
    """Reflect a continuous texel coordinate into [0, n] (mirror period 2n)."""
    m = coord % (2.0 * n)
    return jnp.where(m > n, 2.0 * n - m, m)


def sample_packed(pt: PackedTexture, u, v):
    """Bilinear fetch with mirror addressing — one gather per sample."""
    h, w = pt.shape
    xf = _fold_axis(u * w, w)
    yf = _fold_axis(v * h, h)
    xb = xf - 0.5
    yb = yf - 0.5
    x0 = jnp.floor(xb)
    y0 = jnp.floor(yb)
    fx = jnp.where(x0 < 0, 0.0, xb - x0)[..., None]
    fy = jnp.where(y0 < 0, 0.0, yb - y0)[..., None]
    xi = jnp.maximum(x0, 0.0).astype(jnp.int32)
    yi = jnp.maximum(y0, 0.0).astype(jnp.int32)
    q = yi * w + xi
    # mode="clip" (a no-op: xf/yf land in [0,w]x[0,h], so q < H*W by
    # construction) — the default mode="fill" emits an out-of-bounds
    # select over the whole [R, FOLD*16] gather, and THAT select is what
    # XLA lays out column-major, dragging a full relayout copy of the
    # gather with it (0.84 ms/sample at 1024^2 on v5e).
    wide = jnp.take(pt.data, q // _FOLD, axis=0, mode="clip")
    # exact quad select: a where-chain over the FOLD in-row quads picks
    # exact values (bit-identical to a direct fetch) and — unlike the
    # previous one-hot multiply-reduce — consumes the gather's natural
    # {1,0} layout: the reduce formulation made XLA materialize a
    # transposed copy of the whole [R, FOLD*16] gather (1.2 ms/sample of
    # pure relayout at 1024^2 on v5e).
    qm = q % _FOLD
    row = wide[:, 0:16]
    for f in range(1, _FOLD):
        row = jnp.where(
            (qm == f)[..., None], wide[:, f * 16:(f + 1) * 16], row
        )  # [R,16]
    top = row[..., 0:3] * (1.0 - fx) + row[..., 3:6] * fx
    bot = row[..., 6:9] * (1.0 - fx) + row[..., 9:12] * fx
    return top * (1.0 - fy) + bot * fy


def sample_sky_packed(pt: PackedTexture, dir_xyz):
    u, v = sky_uv(dir_xyz, jnp)
    return sample_packed(pt, u, v)
