"""BVH: build validity, traversal == dense intersection, refit, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from cpppathtracer_tpu import reference_cpu as ref
from cpppathtracer_tpu.models.scene import SceneBuilder, demo_scene
from cpppathtracer_tpu.ops.bvh import (
    build_bvh,
    build_bvh_numpy,
    intersect_bvh,
    object_aabbs,
    refit_bvh,
)
from cpppathtracer_tpu.ops.intersect import intersect
from cpppathtracer_tpu.types import Rays

RNG = np.random.RandomState(13)


def _scene(n=40, seed=0):
    rng = np.random.RandomState(seed)
    b = SceneBuilder()
    b.add_platform(0.0, kd=(0.9, 0.9, 0.9))
    for _ in range(n):
        c = rng.uniform(-60, 60, 3)
        c[1] = rng.uniform(1, 20)
        if rng.rand() < 0.7:
            b.add_sphere(c, rng.uniform(1, 5))
        else:
            h = rng.uniform(2, 10)
            c[1] = h / 2
            b.add_cylinder(c, rng.uniform(1, 4), h)
    return b.build()


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-80, 80, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 40, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(o, d.astype(np.float32))


def test_build_structure():
    scene = _scene(25)
    sc = ref.scene_to_np(scene)
    amin, amax = object_aabbs(sc)
    arrays = build_bvh_numpy(amin, amax)
    n_obj = 26
    left, right, obj = arrays["left"], arrays["right"], arrays["obj_idx"]
    # leaves = one per object, each object exactly once
    leaves = sorted(int(o) for o in obj if o >= 0)
    assert leaves == list(range(n_obj))
    # internal nodes have two children; children AABBs inside parent
    for i in range(len(left)):
        if obj[i] < 0:
            l, r = left[i], right[i]
            assert l >= 0 and r >= 0
            for ch in (l, r):
                assert np.all(arrays["aabb_min"][ch] >= arrays["aabb_min"][i] - 1e-6)
                assert np.all(arrays["aabb_max"][ch] <= arrays["aabb_max"][i] + 1e-6)


def test_bvh_matches_dense():
    scene = _scene(40)
    bvh = build_bvh(scene)
    rays = _rays(512)
    dense = intersect(scene, rays)
    via_bvh = intersect_bvh(scene, bvh, rays)
    d_hit = np.asarray(dense.hit)
    b_hit = np.asarray(via_bvh.hit)
    np.testing.assert_array_equal(d_hit, b_hit)
    d_t = np.asarray(dense.t)[d_hit]
    b_t = np.asarray(via_bvh.t)[d_hit]
    np.testing.assert_allclose(b_t, d_t, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(dense.obj_idx)[d_hit], np.asarray(via_bvh.obj_idx)[d_hit]
    )
    np.testing.assert_allclose(
        np.asarray(via_bvh.normal)[d_hit], np.asarray(dense.normal)[d_hit], atol=1e-6
    )


def test_bvh_demo_scene():
    scene = demo_scene(seed=0).build()
    bvh = build_bvh(scene)
    rays = _rays(256, seed=5)
    dense = intersect(scene, rays)
    via_bvh = intersect_bvh(scene, bvh, rays)
    np.testing.assert_array_equal(np.asarray(dense.hit), np.asarray(via_bvh.hit))
    m = np.asarray(dense.hit)
    np.testing.assert_allclose(
        np.asarray(via_bvh.t)[m], np.asarray(dense.t)[m], rtol=1e-6, atol=1e-6
    )


def test_refit_after_move():
    import dataclasses

    scene = _scene(20)
    bvh = build_bvh(scene)
    center = np.asarray(scene.center).copy()
    center[3] += [5.0, 2.0, -4.0]
    moved = dataclasses.replace(scene, center=jnp.asarray(center))
    bvh2 = refit_bvh(bvh, moved)
    rays = _rays(256, seed=2)
    dense = intersect(moved, rays)
    via = intersect_bvh(moved, bvh2, rays)
    np.testing.assert_array_equal(np.asarray(dense.hit), np.asarray(via.hit))
    m = np.asarray(dense.hit)
    np.testing.assert_allclose(
        np.asarray(via.t)[m], np.asarray(dense.t)[m], rtol=1e-6, atol=1e-6
    )


def test_bvh_traversal_is_differentiable_through_recompute():
    import dataclasses

    scene = _scene(10)
    bvh = build_bvh(scene)
    # aim rays at the object centers so sphere/cylinder hits (with nonzero
    # radius-gradient) actually occur
    centers = np.asarray(scene.center)[1:11]
    eye = np.array([0.0, 30.0, -200.0], np.float32)
    d = centers - eye
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays = Rays.make(np.tile(eye, (10, 1)), d)

    def f(radius):
        s = dataclasses.replace(scene, radius=radius)
        hit = intersect_bvh(s, bvh, rays)
        return jnp.sum(jnp.where(hit.hit, hit.t, 0.0))

    g = jax.grad(f)(scene.radius)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


# ----------------------------------------------------------------------------
# Skip-pointer BVH + Pallas traversal kernel (TPU re-design)
# ----------------------------------------------------------------------------

def test_skip_bvh_kernel_matches_dense_winner():
    # The traversal kernel must select the same closest-hit object as the
    # dense grouped winner (exact index match away from float ties).
    from cpppathtracer_tpu.models.presets import big_scene
    from cpppathtracer_tpu.ops import fast
    from cpppathtracer_tpu.ops.bvh import skip_bvh_tables
    from cpppathtracer_tpu.ops.pallas.bvh_kernel import pallas_bvh_winner_index

    scene = big_scene(200, bvh=True)
    gs = fast.group_scene(scene)
    rng = np.random.RandomState(3)
    r = 512
    o = rng.uniform(-120, 120, (r, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(2, 60, r)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays.make(o, d)
    t_dense, i_dense = fast._winner_grouped_T(gs, rays)
    t_dense, i_dense = np.asarray(t_dense), np.asarray(i_dense)
    m, k = scene.bvh_dims
    gi = pallas_bvh_winner_index(
        tuple(jnp.asarray(o[:, i]) for i in range(3)),
        tuple(jnp.asarray(d[:, i]) for i in range(3)),
        jnp.asarray(rays.tmin), jnp.asarray(rays.tmax),
        scene.bvh_meta, scene.bvh_aabb, scene.bvh_objs,
        m=m, k=k, tile=256, interpret=True,
    )
    gi = np.asarray(gi)
    hits = t_dense < 1e29
    assert hits.sum() > r // 4
    np.testing.assert_array_equal(gi[hits], i_dense[hits])


def _bvh_vs_dense_render(monkeypatch, spp, depth):
    from cpppathtracer_tpu.integrator import render_radiance
    from cpppathtracer_tpu.models.presets import big_camera, big_scene
    from cpppathtracer_tpu.ops.texture import procedural_sky

    sky = jnp.asarray(procedural_sky(16, 16, seed=1))
    cam = big_camera(220, 24, 16)
    monkeypatch.setenv("POCA_MEGA", "0")
    monkeypatch.setenv("POCA_PALLAS", "1")

    monkeypatch.setenv("POCA_BVH", "0")
    out0 = render_radiance(big_scene(220, bvh=False), cam, sky,
                           spp=spp, max_depth=depth, seed=0)

    monkeypatch.setenv("POCA_BVH", "1")
    scene_b = big_scene(220, bvh=True)
    assert scene_b.bvh_meta is not None
    out1 = render_radiance(scene_b, cam, sky, spp=spp, max_depth=depth, seed=0)
    return [np.asarray(a) for a in out0], [np.asarray(a) for a in out1]


def test_bvh_render_path_matches_dense_primary(monkeypatch):
    # depth 1 = primary rays only: no acne population, the traversal
    # kernel and the dense winner must agree EXACTLY.
    (rad0, n0, t0), (rad1, n1, t1) = _bvh_vs_dense_render(monkeypatch, 2, 1)
    np.testing.assert_array_equal(rad1, rad0)
    np.testing.assert_array_equal(n1, n0)
    np.testing.assert_array_equal(t1, t0)


def test_bvh_render_path_matches_dense_bounced(monkeypatch):
    # Multi-bounce: bounce rays originate ON surfaces, where the dense
    # matmul-form winner and the BVH's direct-form leaf test (the
    # reference's per-object formulas, object.cu:10-112) honestly diverge
    # at the t ~ tmin knife edge — the same ulp class the mega replay
    # documents (ops/mega.py).  Matched pixels must be EXACT; the
    # diverging acne fraction stays small.
    (rad0, _, _), (rad1, _, _) = _bvh_vs_dense_render(monkeypatch, 2, 3)
    diff = np.abs(rad1 - rad0).max(axis=-1)
    mism = diff > 1e-6
    assert mism.mean() < 0.10, mism.mean()
    np.testing.assert_array_equal(rad1[~mism], rad0[~mism])


def test_auto_bvh_threshold():
    from cpppathtracer_tpu.models.presets import big_scene
    from cpppathtracer_tpu.models.scene import AUTO_BVH_THRESHOLD

    small = big_scene(32)
    assert small.bvh_meta is None
    big = big_scene(AUTO_BVH_THRESHOLD + 16)
    assert big.bvh_meta is not None
    m, k = big.bvh_dims
    # auto leaf size: K = ceil(N/256) rounded up to a multiple of 8,
    # keeping the SMEM node tables bounded (~512 nodes) at any scene size
    assert m >= 3 and k % 8 == 0 and k >= 8
    assert m <= 1024, m  # node tables must stay SMEM-resident


def test_skip_bvh_refit_matches_rebuild():
    # Move objects, refit the skip tables (reference UpdateObject
    # semantics, bvh.cu:122-157) — traversal winners must equal a full
    # rebuild's (closest-hit is topology-independent; only pruning
    # quality differs).
    import dataclasses

    import jax.numpy as jnp

    from cpppathtracer_tpu.models.presets import big_scene
    from cpppathtracer_tpu.ops import fast
    from cpppathtracer_tpu.types import Rays

    scene = big_scene(96, bvh=True)
    rng = np.random.RandomState(5)
    new_center = np.asarray(scene.center) + rng.uniform(
        -5, 5, scene.center.shape
    ).astype(np.float32)
    moved = dataclasses.replace(scene, center=jnp.asarray(new_center))
    assert moved.bvh_is_stale()

    refit = moved.refit_bvh()
    assert not refit.bvh_is_stale()
    rebuilt = moved.with_bvh()

    r = 256
    o = np.zeros((r, 3), np.float32)
    o[:, 1] = 50.0
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        origin=jnp.asarray(o), dir=jnp.asarray(d),
        tmin=jnp.zeros((r,), jnp.float32),
        tmax=jnp.full((r,), 1e30, jnp.float32),
    )

    def winners(s):
        gs = fast.group_scene(s)
        hit, _ = fast.intersect_and_gather_planar(
            gs, tuple(rays.origin.T), tuple(rays.dir.T), rays.tmin, rays.tmax
        )
        return np.asarray(hit["obj_idx"]), np.asarray(hit["t"])

    i_refit, t_refit = winners(refit)
    i_reb, t_reb = winners(rebuilt)
    np.testing.assert_array_equal(i_refit, i_reb)
    np.testing.assert_allclose(t_refit, t_reb, rtol=1e-6)

    # with_geometry is the safe one-step edit API
    safe = scene.with_geometry(center=jnp.asarray(new_center))
    assert not safe.bvh_is_stale()
    i_safe, _ = winners(safe)
    np.testing.assert_array_equal(i_safe, i_reb)
