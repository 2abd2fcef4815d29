"""Micro-benchmark: lax.sort + searchsorted cost at binning-relevant sizes.

Decomposes the bin/shadow stage cost on the attached TPU: the camera-view
pair sort is ~4.7M i32 keys, each shadow cascade ~5.2M (T*span +
big_cap*n_tiles); the shadow_max_span/shadow_big_cap knobs shrink these.
Honest protocol per docs/PERF.md.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def main():
    key = jax.random.PRNGKey(0)

    def run(n):
        keys = jax.device_put(
            jax.random.randint(key, (n,), 0, 2**30, jnp.int32))

        @jax.jit
        def f(k):
            s = jax.lax.sort(k)
            return s[0] + s[-1]

        jax.block_until_ready(f(keys))
        float(f(keys))                          # honest sync
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            v = f(keys)
        jax.block_until_ready(v)
        float(v)
        dt = (time.perf_counter() - t0) / reps
        print(f"sort {n/1e6:5.2f}M i32: {dt*1e3:8.2f} ms "
              f"({dt/n*1e9:5.2f} ns/key)", flush=True)

    for n in (1_000_000, 2_000_000, 4_000_000, 5_200_000, 8_000_000,
              16_000_000):
        run(n)


if __name__ == "__main__":
    main()
