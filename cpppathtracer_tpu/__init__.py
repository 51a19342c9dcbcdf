"""cpppathtracer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DearPoca/CppPathTracer (a C++17/CUDA 11.7 interactive progressive path
tracer): procedural sphere/platform/cylinder geometry, four BSDFs
(Diffuse / Metal / Mirror / Glass), a sky-sphere environment map, BVH
acceleration, an edge-avoiding denoiser, progressive sample accumulation,
and a thin-lens fly camera — plus, beyond the reference: full
differentiability (pixel + material + sky-texture gradients), counter-based
deterministic RNG, and multi-chip sharding over a `jax.sharding.Mesh`.

Architecture (idiomatic TPU, *not* a translation):
  - structure-of-arrays ray batches, `lax.scan` over bounces (wavefront);
  - dense vectorized ray×scene intersection (no per-lane divergence);
  - branchless BSDF dispatch via masked selects over a material table;
  - stateless PCG4D RNG keyed by (pixel, sample, bounce) — bitwise equal
    on CPU oracle / TPU / Pallas, and sharding-invariant;
  - `shard_map` over a 2D pixel-tile mesh with psum'd parameter gradients.
"""

from cpppathtracer_tpu.types import (
    BOUNCE_RAY_TMIN,
    DEFAULT_RAY_TMAX,
    MAX_RECURSION_DEPTH_SET,
    MaterialType,
    PrimitiveType,
    Rays,
)
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import Scene, SceneBuilder
from cpppathtracer_tpu.integrator import render_radiance, render_sample
from cpppathtracer_tpu.renderer import ProgressiveRenderer, RenderConfig

__version__ = "0.1.0"

__all__ = [
    "BOUNCE_RAY_TMIN",
    "DEFAULT_RAY_TMAX",
    "MAX_RECURSION_DEPTH_SET",
    "MaterialType",
    "PrimitiveType",
    "Rays",
    "Camera",
    "Scene",
    "SceneBuilder",
    "render_radiance",
    "render_sample",
    "ProgressiveRenderer",
    "RenderConfig",
]
