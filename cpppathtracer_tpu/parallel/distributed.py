"""Multi-host driver: initialization, failure surface, frame collection.

The reference is strictly single-process (SURVEY.md §2.3).  Multi-host
rendering here follows the standard jax.distributed recipe:

  * every host calls :func:`initialize` (coordinator address via env or
    args) and then builds the SAME global mesh over all devices;
  * the render/train step is the same `shard_map` program as single-host —
    pixel tiles shard over the global ("ty","tx") mesh, scene replicated,
    parameter-gradient psums ride ICI within a slice and DCN across
    slices;
  * each host materializes only its addressable shards;
    :func:`gather_frame` assembles the full frame on host 0 (the analog of
    the reference's single D2H frame copy, path_tracer.cu:303);
  * failures surface as distributed-runtime errors on every healthy host;
    :func:`render_with_recovery` turns them into checkpoint-resume loops
    (progressive accumulation state is a plain pytree — see
    utils/checkpoint.py).

Single-chip CI cannot exercise real multi-host paths; the tile/ownership
math is pure and unit-tested, and `dryrun_multichip` validates the full
sharded step on a virtual device mesh.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from cpppathtracer_tpu.utils.obs import get_logger


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op when single-process / already up)."""
    if jax.process_count() > 1:
        return
    addr = coordinator_address or os.environ.get("POCA_COORDINATOR")
    if addr is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    get_logger().info(
        "distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_tile_rows(height: int, n_hosts: int, host: int) -> tuple[int, int]:
    """Row range [lo, hi) a host owns under row-major ty sharding."""
    rows = -(-height // n_hosts)
    lo = min(host * rows, height)
    hi = min(lo + rows, height)
    return lo, hi


def gather_frame(global_image) -> np.ndarray | None:
    """Assemble a fully-addressable numpy frame on process 0; other
    processes return None.  Uses jax's multihost collection for globally
    sharded arrays."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(jax.device_get(global_image))
    gathered = multihost_utils.process_allgather(global_image, tiled=True)
    if jax.process_index() != 0:
        return None
    return np.asarray(gathered)


def render_with_recovery(step_fn, state, *, checkpoint_path: str,
                         checkpoint_every: int = 32, max_retries: int = 3,
                         metadata=None):
    """Run an iterative render/train loop with checkpoint-based recovery.

    `step_fn(state, i) -> state` is one accumulation step; state is a
    pytree.  On any distributed-runtime failure the loop restores the last
    checkpoint and retries (the reference logs CUDA errors and hopes,
    path_tracer.cu:279-299; SURVEY.md §5 requires actual recovery)."""
    from cpppathtracer_tpu.utils import checkpoint

    log = get_logger()
    i = 0
    if os.path.exists(checkpoint_path):
        state, meta = checkpoint.restore(checkpoint_path, state)
        i = int(meta.get("step", 0))
        log.info("resumed from %s at step %d", checkpoint_path, i)
    # JAX arrays are immutable, so holding the entry-state pytree is a
    # free snapshot: a failure BEFORE the first checkpoint restarts from
    # here rather than retrying with the mutated in-flight state.
    initial_state, initial_i = state, i
    retries = 0
    while True:
        try:
            state = step_fn(state, i)
            i += 1
            if i % checkpoint_every == 0:
                jax.block_until_ready(state)
                checkpoint.save(
                    checkpoint_path, state,
                    {**(metadata or {}), "step": i, "t": time.time()},
                )
            retries = 0
            yield i, state
        except StopIteration:
            return
        except Exception as e:  # noqa: BLE001 — surface-then-retry by design
            retries += 1
            log.error("step %d failed (%s); retry %d/%d", i, e, retries, max_retries)
            if retries > max_retries:
                raise
            if os.path.exists(checkpoint_path):
                state, meta = checkpoint.restore(checkpoint_path, state)
                i = int(meta.get("step", i))
            else:
                state, i = initial_state, initial_i
