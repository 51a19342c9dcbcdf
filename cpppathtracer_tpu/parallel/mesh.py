"""Device mesh construction and sharding layouts.

The reference is single-GPU with no distribution (SURVEY.md §2.3).  The
TPU design scales by sharding the *pixel-tile* axes of the image across a
2D device mesh (the rendering analog of data/sequence parallelism):

  - mesh axes ("ty", "tx"): image rows shard over "ty", columns over "tx";
  - the scene, materials, camera and sky texture are replicated (they are
    tiny — O(objects) — and every tile needs all of them);
  - spp accumulation happens per tile locally (no communication at all in
    the forward render: rays never cross tiles);
  - inverse rendering psums scene/material/sky gradients over the whole
    mesh — the only collective in the training step.

Collectives therefore ride ICI only and scale ~perfectly, which is how the
>=90% multi-host efficiency target (BASELINE.md) is met by construction.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tile_mesh(devices=None, shape: tuple[int, int] | None = None) -> Mesh:
    """Build a 2D ("ty", "tx") mesh over the given (or all) devices.

    With no explicit shape, picks the most-square factorization of the
    device count so both image axes shard (better tile locality than 1D)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        ty = int(math.isqrt(n))
        while n % ty != 0:
            ty -= 1
        shape = (ty, n // ty)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("ty", "tx"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """f32[H, W, ...] image sharding: rows over ty, cols over tx."""
    return NamedSharding(mesh, P("ty", "tx"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_tiles(h: int, w: int, mesh: Mesh) -> tuple[int, int]:
    """Round image dims up so they divide evenly over the mesh (tiles must
    be equal-shaped for pjit; the renderer crops the pad off afterwards)."""
    ty, tx = mesh.devices.shape
    return (-(-h // ty) * ty, -(-w // tx) * tx)
