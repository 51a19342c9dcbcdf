"""Benchmark data-movement primitives on TPU for the compaction redesign:
sort-with-payloads vs element gather vs row gather/scatter vs cumsum.
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


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R,), jnp.float32)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (R,), jnp.float32)
              for i in range(12)]
    dead = (jax.random.uniform(jax.random.fold_in(key, 99), (R,)) < 0.8)
    dead_i = dead.astype(jnp.int32)
    perm = jax.random.permutation(jax.random.fold_in(key, 7), R)
    perm = perm.astype(jnp.int32)

    # 1. sort: 1 key + k payloads
    for k in (1, 3, 6, 9, 12):
        f = jax.jit(lambda d, *ps: jax.lax.sort((d,) + ps, num_keys=1,
                                                is_stable=True))
        ms = timeit(f, dead_i, *planes[:k])
        print(f"sort 1key+{k:2d} payloads: {ms:7.3f} ms")

    # 1b. unstable single fused key
    f = jax.jit(lambda d, *ps: jax.lax.sort((d,) + ps, num_keys=1,
                                            is_stable=False))
    key_fused = dead_i * (1 << 21) + jnp.arange(R, dtype=jnp.int32)
    ms = timeit(f, key_fused, *planes[:9])
    print(f"sort fusedkey+9 payloads (unstable): {ms:7.3f} ms")

    # 2. element gather
    f = jax.jit(lambda a, i: jnp.take(a, i))
    ms = timeit(f, x, perm)
    print(f"element gather [1M]: {ms:7.3f} ms")

    # 2b. 6-plane element gather (shared indices)
    f = jax.jit(lambda i, *ps: tuple(jnp.take(p, i) for p in ps))
    ms = timeit(f, perm, *planes[:6])
    print(f"element gather x6 planes: {ms:7.3f} ms")

    # 2c. gather stacked as [R, 6] rows (minor-dim slice gather)
    stacked = jnp.stack(planes[:6], axis=1)  # [R, 6]
    f = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    ms = timeit(f, stacked, perm)
    print(f"row gather [1M, 6]: {ms:7.3f} ms")

    # 3. row gather on [8192, 128]
    rows = x.reshape(8192, 128)
    row_idx = jax.random.permutation(jax.random.fold_in(key, 8), 8192)
    row_idx = row_idx.astype(jnp.int32)
    f = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    ms = timeit(f, rows, row_idx)
    print(f"row gather [8192,128] by [8192]: {ms:7.3f} ms")

    # 3b. 10-plane row gather
    rows10 = [p.reshape(8192, 128) for p in planes[:10]]
    f = jax.jit(lambda i, *ps: tuple(jnp.take(p, i, axis=0) for p in ps))
    ms = timeit(f, row_idx, *rows10)
    print(f"row gather x10 planes [8192,128]: {ms:7.3f} ms")

    # 3c. wide-row gather: [8192, 128*10] one plane-concat
    wide = jnp.concatenate(rows10, axis=1)  # [8192, 1280]
    f = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    ms = timeit(f, wide, row_idx)
    print(f"row gather [8192,1280]: {ms:7.3f} ms")

    # 3d. row scatter [8192,128]
    f = jax.jit(lambda a, i: jnp.zeros((8192, 128), jnp.float32).at[i].set(a))
    ms = timeit(f, rows, row_idx)
    print(f"row scatter [8192,128]: {ms:7.3f} ms")

    # 4. cumsum i32 [1M]
    f = jax.jit(lambda d: jnp.cumsum(d))
    ms = timeit(f, dead_i)
    print(f"cumsum i32 [1M]: {ms:7.3f} ms")

    # 5. cumsum of row counts [8192]
    rc = dead_i.reshape(8192, 128).sum(axis=1)
    f = jax.jit(lambda d: jnp.cumsum(d))
    ms = timeit(f, rc)
    print(f"cumsum i32 [8192]: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
