"""Micro-benchmark: compact_mask (stream compaction) variants on TPU.

bench_masked.py measured compact_mask at 35 ms for a 2M-pixel mask —
and the masked accept ladder runs ~28 of them per frame (~1 s!).  The
cumsum is ~20 log-passes over 8 MB (~theoretical 2 ms); the suspect is
the 2M-update scatter.  This tool times each ingredient and several
alternative formulations to pick a fast exact replacement.

Run: python tools/bench_compact.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=5):
    out = jax.block_until_ready(f(*args))
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return 1e3 * ts[len(ts) // 2]


def main():
    n = 2_073_600
    cap = (n * 2) // 3
    key = jax.random.PRNGKey(0)
    mask = jax.device_put(jax.random.uniform(key, (n,)) < 0.49)

    # honest sync
    float(jnp.zeros(()) + 1)

    # ingredient: cumsum alone
    @jax.jit
    def cumsum_only(flat):
        return jnp.cumsum(flat.astype(jnp.int32))[-1]

    print(f"cumsum 1-D:            {timed(cumsum_only, mask):8.2f} ms",
          flush=True)

    @jax.jit
    def cumsum_2d(flat):
        b = flat.reshape(-1, 512).astype(jnp.int32)
        rows = jnp.cumsum(b.sum(axis=1))
        within = jnp.cumsum(b, axis=1)
        return rows[-1] + within[-1, -1]

    print(f"cumsum blocked:        {timed(cumsum_2d, mask):8.2f} ms",
          flush=True)

    # ingredient: the scatter alone (positions precomputed)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = jax.device_put(jax.block_until_ready(pos))

    @jax.jit
    def scatter_only(flat, pos):
        tgt = jnp.where(flat & (pos < cap), pos, cap)
        return jnp.full((cap,), -1, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")

    print(f"scatter plain:         {timed(scatter_only, mask, pos):8.2f} ms",
          flush=True)

    @jax.jit
    def scatter_unique(flat, pos):
        idx = jnp.arange(n, dtype=jnp.int32)
        tgt = jnp.where(flat & (pos < cap), pos, cap + idx)
        return jnp.full((cap,), -1, jnp.int32).at[tgt].set(
            idx, mode="drop", unique_indices=True)

    print(f"scatter unique:        {timed(scatter_unique, mask, pos):8.2f} ms",
          flush=True)

    @jax.jit
    def scatter_unique_sorted(flat, pos):
        idx = jnp.arange(n, dtype=jnp.int32)
        # selected targets are nondecreasing; dropped ones all == cap
        # (monotone tail merged) -> claim sorted too
        tgt = jnp.where(flat & (pos < cap), pos, cap)
        return jnp.full((cap,), -1, jnp.int32).at[tgt].set(
            idx, mode="drop", unique_indices=True, indices_are_sorted=True)

    print(f"scatter unique+sorted: "
          f"{timed(scatter_unique_sorted, mask, pos):8.2f} ms", flush=True)

    # full variants
    from vk_renderer_tpu.ops.common import compact_mask

    @jax.jit
    def current(mask):
        return compact_mask(mask, cap)

    print(f"compact_mask current:  {timed(current, mask):8.2f} ms",
          flush=True)

    @jax.jit
    def via_nonzero(mask):
        return jnp.nonzero(mask, size=cap, fill_value=-1)[0]

    print(f"jnp.nonzero(size=):    {timed(via_nonzero, mask):8.2f} ms",
          flush=True)

    @jax.jit
    def full_unique_sorted(mask):
        flat = mask.reshape(-1)
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        idx = jnp.arange(n, dtype=jnp.int32)
        tgt = jnp.where(flat & (pos < cap), pos, cap + idx)
        sel = jnp.full((cap,), -1, jnp.int32).at[tgt].set(
            idx, mode="drop", unique_indices=True)
        total = pos[-1] + 1
        return sel, jnp.maximum(total - cap, 0)

    print(f"compact unique:        {timed(full_unique_sorted, mask):8.2f} ms",
          flush=True)

    # correctness cross-check
    a = np.asarray(current(mask)[0])
    b = np.asarray(full_unique_sorted(mask)[0])
    c = np.asarray(via_nonzero(mask))
    print(f"agree: unique+sorted={np.array_equal(a, b)} "
          f"nonzero={np.array_equal(a, c)}", flush=True)

    # smaller-cap scaling (the tier ladder's caps)
    for cap_s in (8192, 86400, 259200, 691200):
        @jax.jit
        def cur_s(mask, cap_s=cap_s):
            return compact_mask(mask, cap_s)

        @jax.jit
        def fus_s(mask, cap_s=cap_s):
            flat = mask.reshape(-1)
            pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
            idx = jnp.arange(n, dtype=jnp.int32)
            tgt = jnp.where(flat & (pos < cap_s), pos, cap_s + idx)
            sel = jnp.full((cap_s,), -1, jnp.int32).at[tgt].set(
                idx, mode="drop", unique_indices=True)
            return sel, jnp.maximum(pos[-1] + 1 - cap_s, 0)

        print(f"cap {cap_s:7d}: current {timed(cur_s, mask):8.2f} ms   "
              f"unique+sorted {timed(fus_s, mask):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
