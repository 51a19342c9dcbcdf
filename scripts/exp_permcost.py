"""Measure REAL in-context costs of permutation-apply primitives: chained
iterations with data dependencies (step k consumes step k-1's output) so
nothing can be cached, hoisted, or deduped.

Decides the replacement for the two multi-payload lax.sorts in ops/mega.py:
  A) keep sorts (baseline)
  B) key-only sort + gathers
  C) no sort: cumsum -> analytic inverse permutation, scatters + gathers
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R = 1 << 20
ITERS = 8


def run(name, build_body, n_planes):
    key = jax.random.PRNGKey(0)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (R,), jnp.float32)
              for i in range(n_planes)]
    dead = (jax.random.uniform(jax.random.fold_in(key, 99), (R,)) < 0.802)
    dead_i = dead.astype(jnp.int32)

    @jax.jit
    def prog(c0, dead_i, *planes):
        def body(c, _):
            return build_body(c, dead_i, planes), None
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    c0 = jnp.float32(0.0)
    out = jax.block_until_ready(prog(c0, dead_i, *planes))
    t0 = time.perf_counter()
    out = jax.block_until_ready(prog(c0 + 1.0, dead_i, *planes))
    t1 = time.perf_counter()
    out2 = jax.block_until_ready(prog(c0 + 2.0, dead_i, *planes))
    t2 = time.perf_counter()
    dt = min(t1 - t0, t2 - t1) / ITERS * 1e3
    print(f"{name:55s} {dt:7.3f} ms/iter", flush=True)
    return dt


def main():
    iota = jnp.arange(R, dtype=jnp.int32)

    # perturb: make data step-dependent via the carry
    def mix(c, p):
        return p + c

    # A) baseline: stable 2-key... actually full payload sorts as today
    def dead_of(c, planes):
        # ~80% dead, varies with the carry (defeats hoisting/dedup)
        return (jnp.sin(planes[0] * 7.0 + c) > -0.85).astype(jnp.int32)

    def body_sorts(c, dead_i, planes):
        ps = tuple(mix(c, p) for p in planes[:9])
        outs = jax.lax.sort((dead_of(c, planes), iota) + ps,
                            num_keys=1, is_stable=True)
        src_s = outs[1]
        outs2 = jax.lax.sort((src_s,) + outs[2:] + (outs[2], outs[3], outs[4]),
                             num_keys=1, is_stable=False)
        return c + outs2[1][0] + outs2[-1][1]

    run("A: partition sort(11) + inverse sort(13)", body_sorts, 9)

    # B) key-only fused sort + 9 gathers + inv scatter + 13 gathers
    def body_keysort(c, dead_i, planes):
        ps = tuple(mix(c, p) for p in planes[:9])
        keyv = (dead_of(c, planes) << 21) | iota
        (key_s,) = jax.lax.sort((keyv,), num_keys=1, is_stable=False)
        src_s = key_s & ((1 << 21) - 1)
        g = tuple(jnp.take(p, src_s) for p in ps)
        inv = jnp.zeros((R,), jnp.int32).at[src_s].set(iota)
        back = tuple(jnp.take(x, inv) for x in (g + g[:4]))
        return c + g[0][0] + back[0][1] + back[-1][2]

    run("B: key-sort + 9 gathers + scatter-inv + 13 gathers", body_keysort, 9)

    # C) cumsum analytic inv-perm, 9 scatters + 13 gathers
    def body_cumsum(c, dead_i, planes):
        ps = tuple(mix(c, p) for p in planes[:9])
        di = dead_of(c, planes)
        d_cum = jnp.cumsum(di)
        n_alive = R - d_cum[-1]
        inv = jnp.where(di > 0, n_alive + d_cum - 1, iota - d_cum)
        scat = tuple(jnp.zeros((R,), jnp.float32).at[inv].set(p) for p in ps)
        back = tuple(jnp.take(x, inv) for x in (scat + scat[:4]))
        return c + scat[0][0] + back[0][1] + back[-1][2]

    run("C: cumsum inv-perm + 9 scatters + 13 gathers", body_cumsum, 9)

    # C-parts: individual costs
    def body_cumsum_only(c, dead_i, planes):
        di = dead_of(c, planes)
        d_cum = jnp.cumsum(di)
        n_alive = R - d_cum[-1]
        inv = jnp.where(di > 0, n_alive + d_cum - 1, iota - d_cum)
        return c + inv[0].astype(jnp.float32) + inv[-1].astype(jnp.float32)

    run("C1: cumsum + inv-perm only", body_cumsum_only, 1)

    def body_gather1(c, dead_i, planes):
        p = mix(c, planes[0])
        idx = (iota + (c).astype(jnp.int32)) % R
        g = jnp.take(p, idx)
        return c + g[0] + g[-1]

    run("G1: one [1M] gather (shifted iota idx)", body_gather1, 1)

    key = jax.random.PRNGKey(3)
    perm_const = jax.random.permutation(key, R).astype(jnp.int32)

    def body_gatherrand(c, dead_i, planes):
        p = mix(c, planes[0])
        idx = (perm_const + (c).astype(jnp.int32)) % R
        g = jnp.take(p, idx)
        return c + g[0] + g[-1]

    run("G2: one [1M] gather (random perm idx)", body_gatherrand, 1)

    def body_gatherrand6(c, dead_i, planes):
        idx = (perm_const + (c).astype(jnp.int32)) % R
        gs = tuple(jnp.take(mix(c, p), idx) for p in planes[:6])
        return c + sum(g[0] for g in gs)

    run("G6: six [1M] gathers (random perm idx)", body_gatherrand6, 6)

    def body_scatterrand(c, dead_i, planes):
        p = mix(c, planes[0])
        idx = (perm_const + (c).astype(jnp.int32)) % R
        s = jnp.zeros((R,), jnp.float32).at[idx].set(p)
        return c + s[0] + s[-1]

    run("S1: one [1M] scatter (random perm idx)", body_scatterrand, 1)

    def body_sort1(c, dead_i, planes):
        keyv = (dead_of(c, planes) << 21) | iota
        (key_s,) = jax.lax.sort((keyv,), num_keys=1, is_stable=False)
        return c + key_s[0].astype(jnp.float32) + key_s[-1].astype(jnp.float32)

    run("K1: single-array [1M] i32 sort", body_sort1, 1)


if __name__ == "__main__":
    main()
