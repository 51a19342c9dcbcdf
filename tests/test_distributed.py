"""Distributed helpers: tile ownership math, frame gather (single proc),
checkpoint-recovery loop."""

import numpy as np
import jax.numpy as jnp

from cpppathtracer_tpu.parallel.distributed import (
    gather_frame,
    host_tile_rows,
    render_with_recovery,
)


def test_host_tile_rows_cover_and_disjoint():
    for h, n in [(720, 4), (100, 8), (7, 3), (8, 8), (5, 8)]:
        rows = [host_tile_rows(h, n, i) for i in range(n)]
        covered = []
        for lo, hi in rows:
            assert 0 <= lo <= hi <= h
            covered.extend(range(lo, hi))
        assert covered == list(range(h))


def test_gather_frame_single_process():
    img = jnp.arange(24.0).reshape(2, 4, 3)
    out = gather_frame(img)
    np.testing.assert_array_equal(out, np.asarray(img))


def test_render_with_recovery_checkpoints_and_resumes(tmp_path):
    path = str(tmp_path / "state.npz")
    calls = {"n": 0}

    def step(state, i):
        calls["n"] += 1
        # inject one failure at step 5 after a checkpoint at step 4
        if i == 5 and calls["n"] == 6:
            raise RuntimeError("injected")
        return {"acc": state["acc"] + 1.0}

    state = {"acc": jnp.zeros(())}
    gen = render_with_recovery(
        step, state, checkpoint_path=path, checkpoint_every=2, max_retries=2
    )
    out = None
    for i, st in gen:
        out = st
        if i >= 8:
            break
    # 8 successful increments despite the injected failure
    assert float(out["acc"]) == 8.0


def test_render_with_recovery_gives_up(tmp_path):
    path = str(tmp_path / "s.npz")

    def step(state, i):
        raise RuntimeError("always")

    gen = render_with_recovery(
        step, {"acc": jnp.zeros(())}, checkpoint_path=path, max_retries=1
    )
    try:
        next(gen)
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_render_with_recovery_restores_initial_state_before_first_ckpt(tmp_path):
    # A failure BEFORE the first checkpoint must retry from the ENTRY
    # state, not the mutated in-flight state.
    path = str(tmp_path / "none.npz")
    calls = {"n": 0}

    def step(state, i):
        calls["n"] += 1
        if calls["n"] == 2:  # fail on the second call (i=1, no ckpt yet)
            raise RuntimeError("injected-early")
        return {"acc": state["acc"] + 1.0}

    gen = render_with_recovery(
        step, {"acc": jnp.zeros(())}, checkpoint_path=path,
        checkpoint_every=100, max_retries=2,
    )
    out = None
    for i, st in gen:
        out = st
        if i >= 3:
            break
    # i restarts from 0 after the failure; each success adds exactly 1
    assert float(out["acc"]) == 3.0
