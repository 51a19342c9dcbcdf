"""Multi-device scaling harness (BASELINE: >=90% multi-host efficiency).

Times the sharded inverse-rendering fwd+bwd step (`make_sharded_loss`,
the BASELINE config-4 "parameter-gradient all-reduce" program) on 1/2/4/8
devices and reports weak-scaling efficiency: per-device work is held
constant (one pixel tile per device), so ideal scaling is flat step time
and efficiency_N = t_1 / t_N.

On real multi-chip hardware this measures ICI collective overhead
directly.  On this pod there is ONE physical TPU chip, so the 8-device
mesh is `xla_force_host_platform_device_count` virtual CPU devices that
OVERSUBSCRIBE the host's physical cores — the harness therefore also
reports `cores`, and computes a core-adjusted SIMULATION BOUND that normalizes
by the core-oversubscription factor min(1, cores / n_devices).  The
communication term it isolates is real either way: the only collective in
the step is the psum of the (tiny, O(objects)) parameter cotangents —
measured below as `comm_bytes` per step, which at ICI bandwidths
(~4.5e10 B/s/link on v5e) costs microseconds against a multi-ms step,
i.e. >=90% efficiency by construction on real hardware
(`parallel/mesh.py` docstring walks the layout argument).

The r5 harness additionally measures, per device count:
  - comm_step_s: a jitted shard_map step that ONLY psums the parameter
    cotangent pytree over the mesh (the step's sole collective)
  - dispatch_s: a jitted near-empty sharded program (fixed dispatch cost)
and a single-core-PINNED n=1 baseline (taskset -c 0): with n=1, XLA CPU
parallelizes one device's program across all host cores, so the unpinned
t1 under-reports per-device step time and raw t1/tN misleads — the r4
"n=2 raw 0.77 anomaly" is exactly this (VERDICT r4 item 5).

Usage: python scripts/bench_scaling.py [--tile 256] [--spp 2] [--depth 4]
Writes SCALING_r5.json at the repo root and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Must be set before importing jax: virtual CPU mesh (SURVEY.md §4).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpppathtracer_tpu.models.camera import Camera  # noqa: E402
from cpppathtracer_tpu.models.scene import demo_scene  # noqa: E402
from cpppathtracer_tpu.ops.texture import procedural_sky  # noqa: E402
from cpppathtracer_tpu.parallel.mesh import make_tile_mesh  # noqa: E402
from cpppathtracer_tpu.parallel.render import (  # noqa: E402
    global_pixel_grid,
    make_sharded_loss,
)


def _step_time(fn, args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256, help="pixels per device side")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_r5.json"))
    ap.add_argument("--single-core-probe", action="store_true",
                    help="measure n=1 only and print one JSON line")
    args = ap.parse_args()

    devices = jax.devices()
    cores = os.cpu_count() or 1
    scene = demo_scene(seed=0).build()
    sky = jnp.asarray(procedural_sky(64, 64, seed=1))
    params_all = scene.material_params()
    params = {k: params_all[k] for k in ("kd", "emission")}

    counts = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    if args.single_core_probe:
        counts = [1]
    rows = []
    for n in counts:
        mesh = make_tile_mesh(devices[:n])
        ty, tx = mesh.devices.shape
        h, w = args.tile * ty, args.tile * tx  # weak scaling: tile/device const
        cam = Camera.make(w, h, origin=(130.0, 103.0, 130.0),
                          look_at=(0.0, 0.0, 0.0))
        pix = global_pixel_grid(cam, mesh)
        target = jnp.zeros(pix.shape + (3,), jnp.float32)
        loss_fn = make_sharded_loss(mesh, spp=args.spp, max_depth=args.depth)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        t, (lval, g) = _step_time(
            grad_fn, (params, scene, cam, sky, pix, target)
        )
        comm_bytes = sum(
            int(np.prod(v.shape)) * 4 for v in jax.tree_util.tree_leaves(g)
        )
        # decomposition: the step's only collective is the parameter-
        # cotangent psum -> time it alone over the same mesh, plus a
        # near-empty sharded program for the fixed dispatch cost
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        rep = NamedSharding(mesh, P())

        @jax.jit
        def psum_only(g_):
            f = shard_map(
                lambda x: jax.tree.map(
                    lambda v: jax.lax.psum(v, ("ty", "tx")), x
                ),
                mesh=mesh, in_specs=P(), out_specs=P(),
            )
            return f(g_)

        g_rep = jax.device_put(g, rep)
        t_comm, _ = _step_time(psum_only, (g_rep,), iters=10)

        @jax.jit
        def near_empty(x):
            f = shard_map(
                lambda v: v + 1.0, mesh=mesh,
                in_specs=P("ty", "tx"), out_specs=P("ty", "tx"),
            )
            return f(x)

        tiny = jax.device_put(
            jnp.zeros((ty * 8, tx * 128), jnp.float32),
            NamedSharding(mesh, P("ty", "tx")),
        )
        t_disp, _ = _step_time(near_empty, (tiny,), iters=10)

        rays = h * w * args.spp * args.depth
        rows.append({
            "n_devices": n, "mesh": [ty, tx], "image": [h, w],
            "step_s": t, "rays_per_s": rays / t,
            "loss": float(lval), "comm_bytes": comm_bytes,
            "comm_step_s": t_comm, "dispatch_s": t_disp,
            "compute_s_est": t - t_comm,
        })
        print(f"n={n} mesh={ty}x{tx} image={h}x{w} step={t*1e3:.1f} ms "
              f"rays/s={rays/t:.3g} comm={comm_bytes}B "
              f"comm_step={t_comm*1e3:.2f}ms dispatch={t_disp*1e3:.2f}ms")

    if args.single_core_probe:
        print(json.dumps({"t1_pinned_s": rows[0]["step_s"]}))
        return

    # single-core-pinned n=1 baseline (see module docstring)
    t1_pinned = None
    if jax.default_backend() == "cpu":
        import subprocess

        try:
            out = subprocess.run(
                ["taskset", "-c", "0", sys.executable,
                 os.path.abspath(__file__), "--single-core-probe",
                 "--tile", str(args.tile), "--spp", str(args.spp),
                 "--depth", str(args.depth)],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "PYTHONPATH": ""},
            )
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    t1_pinned = json.loads(line).get("t1_pinned_s")
        except Exception as e:  # pragma: no cover - probe is best-effort
            print(f"single-core probe failed: {e}", file=sys.stderr)

    t1 = rows[0]["step_s"]
    for r in rows:
        n = r["n_devices"]
        # PRIMARY metric: raw weak-scaling efficiency (t_1 / t_n at
        # constant per-device work).  On this single host the N virtual
        # CPU "devices" oversubscribe `cores` physical cores, so raw
        # efficiency is bounded above by cores/N — the core-adjusted
        # figure divides that bound out as a HOST-CPU-SIMULATION BOUND
        # ONLY.  It can exceed what real ICI hardware would deliver
        # (no network cost is simulated); the >=90% BASELINE claim is
        # deferred to a real multi-chip run.
        r["efficiency"] = t1 / r["step_s"]
        r["efficiency_core_adjusted_simulation_bound"] = (
            (t1 / r["step_s"]) / min(1.0, cores / n)
        )
        if t1_pinned is not None:
            # per-core weak scaling: ideal t_n on this host is the pinned
            # single-core per-device time, times the time-slicing factor
            # n/cores once devices outnumber cores
            r["efficiency_vs_pinned_core"] = (
                t1_pinned * max(1.0, n / cores) / r["step_s"]
            )

    result = {
        "backend": jax.default_backend(),
        "n_devices_available": len(devices),
        "host_cores": cores,
        "t1_pinned_single_core_s": t1_pinned,
        "config": {"tile": args.tile, "spp": args.spp, "depth": args.depth},
        "mode": "weak-scaling (constant per-device tile)",
        "primary_metric": "efficiency (raw t1/tn; core-oversubscribed)",
        "note": (
            "virtual CPU mesh on one host: raw efficiency is bounded by "
            "host_cores/n_devices; the *_simulation_bound column removes "
            "that bound and is NOT evidence for the >=90% multi-host "
            "BASELINE target, which needs a real multi-chip run"
        ),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"scaling": [
        {"n": r["n_devices"], "eff": round(r["efficiency"], 3),
         "eff_sim_bound": round(r["efficiency_core_adjusted_simulation_bound"], 3)}
        for r in rows
    ]}))


if __name__ == "__main__":
    main()
