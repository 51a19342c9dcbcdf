"""Megakernel path (ops/mega.py + ops/pallas/mega_kernel.py) vs the
default bounce-loop path — forward and gradient equivalence.

Runs the kernel in interpret mode on CPU.  On a controlled scene with no
grazing tangencies the two paths must agree tightly; on the dense demo
scene the backward replay may honestly diverge on the ~1% of rays whose
near-tangent hits land on different FMA-contraction roundings (see
ops/mega.py docstring), so aggregate gradient agreement is asserted.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpppathtracer_tpu.integrator import render_radiance
from cpppathtracer_tpu.models.camera import Camera
from cpppathtracer_tpu.models.scene import SceneBuilder, demo_scene
from cpppathtracer_tpu.ops.texture import procedural_sky
from cpppathtracer_tpu.types import MaterialType


def _controlled_scene():
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.8, 0.8, 0.8))
    b.add_sphere((0.0, 2.0, 0.0), 2.0, kd=(0.7, 0.3, 0.2))
    b.add_sphere(
        (4.5, 1.5, 1.0), 1.5, mat_type=MaterialType.METAL, smoothness=0.8
    )
    b.add_cylinder(
        (-4.5, 1.5, 0.0), 1.2, 3.0, mat_type=MaterialType.GLASS, ior=1.5
    )
    b.add_sphere((2.0, 1.0, -3.0), 1.0, kd=(1.0, 0.9, 0.7), emission=2.0)
    return b.build()


def _render_loss(scene, camera, sky, spp, depth):
    def loss(params, scene, sky_tex):
        scene = scene.with_material_params(
            {**scene.material_params(), **params}
        )
        rad, n0, t0 = render_radiance(
            scene, camera, sky_tex, spp=spp, max_depth=depth, seed=0
        )
        return jnp.sum(rad * rad), (rad, n0, t0)

    return loss


@pytest.fixture
def _mega_env(monkeypatch):
    def set_mega(on):
        monkeypatch.setenv("POCA_MEGA", "1" if on else "0")
        # the mega fwd and the baseline must pick the same winner variant
        monkeypatch.setenv("POCA_PALLAS", "1")
        monkeypatch.setenv("POCA_KVARIANT", "mxu")

    return set_mega


def test_mega_forward_matches_default(_mega_env):
    scene = _controlled_scene()
    cam = Camera.make(16, 12, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(16, 16))
    loss = _render_loss(scene, cam, sky, spp=2, depth=4)
    params = {"kd": scene.kd, "emission": scene.emission}

    _mega_env(False)
    (l0, (rad0, n0_0, t0_0)) = loss(params, scene, sky)
    _mega_env(True)
    (l1, (rad1, n0_1, t0_1)) = loss(params, scene, sky)
    # 5e-5: the mega path generates primaries in planar layout
    # (Camera.ray_gen_planar) whose reduction order differs from the
    # row-major ray_gen by final-ulp on ~14% of directions — a handful of
    # pixels land visibly off at depth 4 (values, not winners)
    np.testing.assert_allclose(np.asarray(rad1), np.asarray(rad0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(n0_1), np.asarray(n0_0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(t0_1), np.asarray(t0_0), rtol=5e-5)


def test_mega_grads_match_default_controlled(_mega_env):
    # 12x8 x spp2 x depth3: eager per-op dispatch through the interpret
    # kernel is the runtime driver, so hold tolerances and shrink pixels
    scene = _controlled_scene()
    cam = Camera.make(12, 8, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(16, 16))
    loss = _render_loss(scene, cam, sky, spp=2, depth=3)
    params = {"kd": scene.kd, "emission": scene.emission}

    grad = jax.grad(lambda p, s, k: loss(p, s, k)[0])
    _mega_env(False)
    g0 = grad(params, scene, sky)
    _mega_env(True)
    g1 = grad(params, scene, sky)
    for k in ("kd", "emission"):
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )


def test_mega_sky_and_camera_grads(_mega_env):
    # kept SMALL (8x6, depth 2): interpret-mode kernel VJPs cost minutes
    # at the previous 16x12 x depth-3 size (round-2 verdict item 7)
    scene = _controlled_scene()
    cam = Camera.make(8, 6, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(8, 8))

    def loss_sky(sky_tex, origin):
        c = cam.replace(origin=origin)
        rad, _, _ = render_radiance(scene, c, sky_tex, spp=1, max_depth=2, seed=0)
        return jnp.sum(rad * rad)

    _mega_env(False)
    gs0, go0 = jax.jit(jax.grad(loss_sky, argnums=(0, 1)))(sky, cam.origin)
    _mega_env(True)
    gs1, go1 = jax.jit(jax.grad(loss_sky, argnums=(0, 1)))(sky, cam.origin)
    assert float(jnp.linalg.norm(gs0)) > 0  # sky grads actually flow
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(go1), np.asarray(go0), rtol=1e-2, atol=1e-2)


def test_mega_demo_scene_aggregate_grads(_mega_env):
    # Dense demo scene: individual entries may differ where replayed
    # chains honestly diverge at tangencies; aggregates must agree.
    # kept SMALL (12x8, 1 spp, depth 3): see round-2 verdict item 7
    scene = demo_scene(seed=0).build()
    cam = Camera.make(8, 6, origin=(130.0, 103.0, 130.0), look_at=(0.0, 0.0, 0.0))
    sky = jnp.asarray(procedural_sky(16, 16))
    loss = _render_loss(scene, cam, sky, spp=1, depth=3)
    params = {"kd": scene.kd, "emission": scene.emission}
    grad = jax.grad(lambda p, s, k: loss(p, s, k)[0])
    _mega_env(False)
    g0 = grad(params, scene, sky)
    _mega_env(True)
    g1 = grad(params, scene, sky)
    for k in ("kd", "emission"):
        a = np.asarray(g0[k]).ravel()
        b = np.asarray(g1[k]).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, (k, cos)
        assert abs(np.linalg.norm(b) / np.linalg.norm(a) - 1) < 5e-3, k


@pytest.mark.slow
def test_mega_pallas_bwd_matches_xla_replay(_mega_env, monkeypatch):
    # The fused Pallas VJP kernel (ops/pallas/mega_bwd_kernel.py) must
    # produce the same gradients as the plain-XLA replay it replaces.
    scene = _controlled_scene()
    cam = Camera.make(8, 6, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(8, 8))
    _mega_env(True)

    def loss(kd, emission, origin, sky_tex):
        import dataclasses

        s = dataclasses.replace(scene, kd=kd, emission=emission)
        c = cam.replace(origin=origin)
        rad, n0, t0 = render_radiance(s, c, sky_tex, spp=1, max_depth=2, seed=0)
        return jnp.sum(rad * rad) + 0.1 * jnp.sum(n0) + 1e-6 * jnp.sum(t0)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))
    monkeypatch.setenv("POCA_MEGA_BWD", "xla")
    g0 = grad(scene.kd, scene.emission, cam.origin, sky)
    monkeypatch.setenv("POCA_MEGA_BWD", "pallas")
    g1 = grad(scene.kd, scene.emission, cam.origin, sky)
    for a, b, name in zip(g0, g1, ("kd", "emission", "origin", "sky")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_mega_split_compaction_matches_unsplit(_mega_env, monkeypatch):
    # The survivor-compaction split (phase A + stream-compaction partition
    # + guarded phase B + static-prefix ladder, ops/mega.py +
    # ops/pallas/compact_kernel.py) must be radiance- and
    # hit-plane-identical to the single-kernel trace: per-ray RNG keys
    # make the result permutation-invariant.  Small CPU tests never
    # reach the split (r_pad < 4 tiles), so this one renders 64x64 and
    # forces the ladder on.  NOTE max_depth=4: the split needs
    # depth - split >= 2 bounces in phase B (depth 3 + split 2 silently
    # disables it).
    _mega_env(True)
    scene = _controlled_scene()
    cam = Camera.make(48, 48, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(8, 8))

    def render(spp=1, spp_chunk=1):
        rad, n0, t0 = render_radiance(
            scene, cam, sky, spp=spp, max_depth=4, seed=3,
            spp_chunk=spp_chunk,
        )
        return np.asarray(rad), np.asarray(n0), np.asarray(t0)

    # The traced paths (hit planes, normals, depths) are bitwise
    # permutation-invariant; RADIANCE is compared at 1 ulp because the
    # unfolded sky epilogue's bilinear math fuses into the split and
    # unsplit programs with different FMA contractions (r5, sky FOLD=1).
    ulp = dict(atol=5e-7, rtol=5e-7)
    monkeypatch.setenv("POCA_MEGA_SPLIT", "0")
    rad0, n0_0, t0_0 = render()
    monkeypatch.setenv("POCA_MEGA_SPLIT", "2")
    monkeypatch.setenv("POCA_MEGA_LADDER", "1")
    rad1, n0_1, t0_1 = render()
    np.testing.assert_allclose(rad1, rad0, **ulp)
    np.testing.assert_array_equal(n0_1, n0_0)
    np.testing.assert_array_equal(t0_1, t0_0)

    # the r4 lax.sort fallback agrees, exercised with an EXPLICIT
    # pixel_idx so its non-iota payload branch (iota_rn=0) is covered in
    # the same render (the pallas path always carries pix/samp, so only
    # the sort fallback distinguishes the iota construction)
    monkeypatch.setenv("POCA_MEGA_COMPACT", "sort")
    pix = jnp.arange(48 * 48, dtype=jnp.int32)
    rad1s, _, _ = [np.asarray(a) for a in render_radiance(
        scene, cam, sky, spp=1, max_depth=4, seed=3, pixel_idx=pix
    )]
    np.testing.assert_allclose(rad1s, rad0, **ulp)
    monkeypatch.delenv("POCA_MEGA_COMPACT")

    # spp_chunk > 1 (ADVICE r4): the [C*R] ray batch with per-ray sample
    # indices must survive the split partition bit-for-bit.  (Chunked vs
    # UNchunked is only ulp-close on CPU — the r vs C*r shapes fuse
    # differently — so that pair gets allclose; the split property itself
    # is exact.)
    monkeypatch.setenv("POCA_MEGA_SPLIT", "0")
    rad4_0c, _, _ = render(spp=2, spp_chunk=2)
    monkeypatch.setenv("POCA_MEGA_SPLIT", "2")
    rad4_1c, _, _ = render(spp=2, spp_chunk=2)
    np.testing.assert_allclose(rad4_1c, rad4_0c, **ulp)


@pytest.mark.slow
def test_mega_split_backward_matches_full(_mega_env, monkeypatch):
    # The survivor-compacted backward replay (_replay_split_outputs:
    # bounces >= split differentiate at quarter width through the
    # custom-vjp permutation ops) must produce the same gradients as the
    # full-width replay — up to fp summation grouping, since the compacted
    # chain accumulates per-ray contributions in a different association.
    _mega_env(True)
    monkeypatch.setenv("POCA_MEGA_SPLIT", "2")
    scene = _controlled_scene()
    cam = Camera.make(48, 48, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(8, 8))
    loss = _render_loss(scene, cam, sky, spp=1, depth=4)
    params = {"kd": scene.kd, "emission": scene.emission}

    monkeypatch.setenv("POCA_MEGA_BWD_SPLIT", "0")
    (l0, _), g0 = jax.value_and_grad(loss, has_aux=True)(params, scene, sky)
    monkeypatch.setenv("POCA_MEGA_BWD_SPLIT", "1")
    (l1, _), g1 = jax.value_and_grad(loss, has_aux=True)(params, scene, sky)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6, err_msg=k)


def test_replay_trusts_kernel_hit_decision(_mega_env):
    # Grazing-tangency consistency (r4 advisor / verdict item 7): when
    # FMA-contraction ulps make the replay's recomputed t disagree with
    # the kernel's saved sign-encoded decision, the KERNEL must win — the
    # forward value (and the textured epilogue, which gates on enc >= 0)
    # came from the kernel's chain, so the backward must differentiate
    # the same lane population.  Simulate the disagreement outright: feed
    # the replay a hit plane claiming a hit the recompute can never
    # reproduce (a ray that misses every object) and assert the bounce is
    # counted, outputs stay finite, and gradients carry no NaNs.
    from cpppathtracer_tpu.ops import fast
    from cpppathtracer_tpu.ops.mega import _replay_outputs

    _mega_env(True)
    scene = _controlled_scene()
    gs = fast.group_scene(scene)
    cam = Camera.make(8, 8, origin=(0.0, 50.0, 0.0), look_at=(0.0, 100.0, 0.0))
    pix = jnp.arange(64, dtype=jnp.int32)
    depth = 2
    # rays point straight up from y=50: they miss everything
    fake_hit = [jnp.ones((64,), jnp.int32), jnp.full((64,), -1, jnp.int32)]

    def run(gs_):
        rad, md, mt, missed, fn, ft = _replay_outputs(
            gs_, cam, pix, 0, 0, fake_hit, depth
        )
        return rad, missed

    rad, missed = run(gs)
    assert np.isfinite(np.asarray(rad)).all()
    # the claimed hit at bounce 0 keeps every lane alive there; the miss
    # at bounce 1 then ends the path -> every lane counts as missed
    np.testing.assert_array_equal(np.asarray(missed), 1.0)

    g = jax.grad(lambda gs_: jnp.sum(planar_stack(run(gs_)[0])))(gs)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves
               if np.asarray(l).dtype.kind == "f")


def planar_stack(rad_p):
    import jax.numpy as _jnp

    return _jnp.stack(rad_p, axis=-1)


def test_mega_nested_split_matches_unsplit(_mega_env, monkeypatch):
    # Second-level survivor compaction (ops/mega.py run_b_nested: bounces
    # [S, S+2) at quarter width, re-pack, remaining bounces on a static
    # half-of-quarter prefix) needs depth - split >= 4 to engage; the
    # traced paths must match the unsplit kernel exactly and radiance to
    # fp-regrouping ulps.
    _mega_env(True)
    scene = _controlled_scene()
    cam = Camera.make(64, 64, origin=(0.0, 4.0, -14.0), look_at=(0.0, 1.5, 0.0))
    sky = jnp.asarray(procedural_sky(8, 8))

    def render():
        r, n, t = render_radiance(scene, cam, sky, spp=1, max_depth=6, seed=3)
        return np.asarray(r), np.asarray(n), np.asarray(t)

    monkeypatch.setenv("POCA_MEGA_SPLIT", "0")
    r0, n0, t0 = render()
    monkeypatch.setenv("POCA_MEGA_SPLIT", "2")
    monkeypatch.setenv("POCA_MEGA_LADDER", "1")
    monkeypatch.setenv("POCA_MEGA_SPLIT2", "1")
    r1, n1, t1 = render()
    np.testing.assert_allclose(r1, r0, atol=5e-7, rtol=5e-7)
    np.testing.assert_array_equal(n1, n0)
    np.testing.assert_array_equal(t1, t0)
    # static half-of-quarter prefix + spill cond (non-default since the
    # full-domain tile-skip measured faster; kept env-gated)
    monkeypatch.setenv("POCA_MEGA_PREFIX2", "1")
    r2, n2, t2 = render()
    np.testing.assert_array_equal(r2, r1)
    np.testing.assert_array_equal(n2, n1)
    np.testing.assert_array_equal(t2, t1)
