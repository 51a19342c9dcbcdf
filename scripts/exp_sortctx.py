"""Replicate the in-context partition/inverse sorts standalone, then
progressively add context (spp scan, surrounding pallas calls) to find
what makes them cost ~4.5/6.9 ms in the bench program.
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
    outs = [fn(jnp.int32(i + 1), *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    planes = [jax.random.normal(jax.random.fold_in(key, i), (R,), jnp.float32)
              for i in range(12)]
    dead = (jax.random.uniform(jax.random.fold_in(key, 99), (R,)) < 0.802)
    dead_i = dead.astype(jnp.int32)
    src = jnp.arange(R, dtype=jnp.int32)

    # exact partition sort: key=0/1 i32, payloads src + 9 f32, stable
    def part(it, d, s, *ps):
        return jax.lax.sort((d + it * 0, s) + ps, num_keys=1, is_stable=True)

    ms = timeit(jax.jit(part), dead_i, src, *planes[:9])
    print(f"partition sort (0/1 key, src + 9 f32, stable): {ms:7.3f} ms", flush=True)

    # exact inverse sort: key=permutation i32, 10 f32 + 3 i32 payloads, unstable
    perm = jax.random.permutation(jax.random.fold_in(key, 7), R).astype(jnp.int32)
    packed = [(dead_i << 16) | (i + 1) for i in range(3)]

    def inv(it, p, *ps):
        return jax.lax.sort((p + it * 0,) + ps, num_keys=1, is_stable=False)

    ms = timeit(jax.jit(inv), perm, *(planes[:10] + packed))
    print(f"inverse sort (perm key, 10 f32 + 3 i32, unstable): {ms:7.3f} ms", flush=True)

    # both sorts chained (inverse consumes partition output), in a scan of 8
    def chained(it, d, s, *ps):
        def body(c, _):
            outs = jax.lax.sort((d + c * 0 + it * 0, s) + ps, num_keys=1,
                                is_stable=True)
            src_s = outs[1]
            outs2 = jax.lax.sort((src_s,) + outs[2:], num_keys=1,
                                 is_stable=False)
            return c + 1, (outs2[1][0] + outs2[2][1])
        _, ys = jax.lax.scan(body, jnp.int32(0), None, length=8)
        return ys

    ms = timeit(jax.jit(chained), dead_i, src, *planes[:9], iters=3)
    print(f"chained partition+inverse x8 in scan: {ms:7.3f} ms (/8 = {ms/8:.3f})", flush=True)


if __name__ == "__main__":
    main()
