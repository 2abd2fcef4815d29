"""Micro-benchmark: row-gather cost vs row WIDTH on the attached TPU.

Decides the mega-row G-buffer design: if a 24-40-wide row gather costs
about the same per index as an 8-wide one, the per-pixel interpolation
inputs (edge planes + 3 corners' attributes + material row) can be packed
into ONE per-triangle row table gathered ONCE per pixel, replacing ~6
narrow row gathers (see docs/PERF.md values-per-pixel budget).

Honest protocol (docs/PERF.md): warm up, pull one scalar (switches the
tunneled process to synchronous dispatch), then time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_rows = 300_000          # ~ bench-scene triangle count
    n_idx = 2_073_600         # 1080p pixels

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_idx,), 0, n_rows, jnp.int32)
    idx = jax.device_put(idx)

    def run(width):
        tbl = jax.device_put(jnp.ones((n_rows, width), jnp.float32))

        @jax.jit
        def f(tbl, idx):
            return tbl[idx].sum()

        jax.block_until_ready(f(tbl, idx))
        float(f(tbl, idx))                      # honest sync
        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            v = f(tbl, idx)
        jax.block_until_ready(v)
        float(v)
        dt = (time.perf_counter() - t0) / reps
        print(f"width {width:3d}: {dt*1e3:8.2f} ms  "
              f"{dt/n_idx*1e9:6.2f} ns/index  "
              f"{dt/n_idx/width*1e9:5.2f} ns/value", flush=True)

    # flat-take baseline
    flat = jax.device_put(jnp.ones((n_rows,), jnp.float32))

    @jax.jit
    def g(flat, idx):
        return jnp.take(flat, idx).sum()

    jax.block_until_ready(g(flat, idx))
    float(g(flat, idx))
    t0 = time.perf_counter()
    for _ in range(6):
        v = g(flat, idx)
    jax.block_until_ready(v)
    float(v)
    dt = (time.perf_counter() - t0) / 6
    print(f"flat take : {dt*1e3:8.2f} ms  {dt/n_idx*1e9:6.2f} ns/index",
          flush=True)

    for w in (2, 4, 8, 12, 16, 24, 32, 40, 48):
        run(w)


if __name__ == "__main__":
    main()
