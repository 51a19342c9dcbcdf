"""Primitive benchmarks v2 — defeat any execution caching by varying the
inputs each iteration (fold an iteration counter into the data inside jit).
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


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(jnp.int32(0), *args))
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(jnp.int32(i + 1), *args))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (R,), jnp.float32)
              for i in range(12)]
    dead = (jax.random.uniform(jax.random.fold_in(key, 99), (R,)) < 0.8)
    dead_i = dead.astype(jnp.int32)
    perm = jax.random.permutation(jax.random.fold_in(key, 7), R).astype(jnp.int32)

    for k in (1, 3, 6, 9, 12):
        f = jax.jit(lambda it, d, *ps: jax.lax.sort(
            (d + it * 0,) + tuple(p + it.astype(jnp.float32) for p in ps),
            num_keys=1, is_stable=True))
        ms = timeit(f, dead_i, *planes[:k])
        print(f"sort 1key+{k:2d} payloads: {ms:7.3f} ms", flush=True)

    f = jax.jit(lambda it, a, i: jnp.take(a + it.astype(jnp.float32), i))
    ms = timeit(f, planes[0], perm)
    print(f"element gather [1M]: {ms:7.3f} ms", flush=True)

    f = jax.jit(lambda it, i, *ps: tuple(
        jnp.take(p + it.astype(jnp.float32), i) for p in ps))
    ms = timeit(f, perm, *planes[:6])
    print(f"element gather x6 planes: {ms:7.3f} ms", flush=True)

    rows10 = [p.reshape(8192, 128) for p in planes[:10]]
    row_idx = jax.random.permutation(jax.random.fold_in(key, 8), 8192)
    row_idx = row_idx.astype(jnp.int32)
    f = jax.jit(lambda it, i, *ps: tuple(
        jnp.take(p + it.astype(jnp.float32), i, axis=0) for p in ps))
    ms = timeit(f, row_idx, *rows10)
    print(f"row gather x10 planes [8192,128]: {ms:7.3f} ms", flush=True)

    wide = jnp.concatenate(rows10, axis=1)  # [8192, 1280]
    f = jax.jit(lambda it, a, i: jnp.take(a + it.astype(jnp.float32), i, axis=0))
    ms = timeit(f, wide, row_idx)
    print(f"row gather [8192,1280]: {ms:7.3f} ms", flush=True)

    f = jax.jit(lambda it, a, i: jnp.zeros((8192, 128), jnp.float32)
                .at[i].set(a + it.astype(jnp.float32)))
    ms = timeit(f, rows10[0], row_idx)
    print(f"row scatter [8192,128]: {ms:7.3f} ms", flush=True)

    f = jax.jit(lambda it, d: jnp.cumsum(d + it))
    ms = timeit(f, dead_i)
    print(f"cumsum i32 [1M]: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
