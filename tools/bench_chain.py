"""Chained in-jit micro-benchmarks: TRUE per-op device costs.

Every standalone dispatch through the tunneled TPU carries ~10-30 ms of
round-trip overhead, which poisoned the round-3/4 cost model's absolute
numbers (a 2M cumsum, a 2M scatter, and a 2M 24-wide row gather all
"measured" ~15 ns/element — suspiciously identical).  Here each
primitive is CHAINED K times inside ONE jitted program with data
dependencies (no CSE), so cost = (t_K - t_1) / (K - 1) with the
dispatch overhead cancelled.

Run: python tools/bench_chain.py
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


def chain_cost(make_step, init, k=12, iters=5, label=""):
    """Median ms of one step: chain k data-dependent steps in one jit."""

    def build(k):
        @jax.jit
        def f(x):
            for i in range(k):
                x = make_step(x, i)
            return x
        return f

    t1 = timed(build(1), init, iters=iters)
    tk = timed(build(k), init, iters=iters)
    per = (tk - t1) / (k - 1)
    print(f"{label:<42} {per:8.2f} ms/op   (1x={t1:7.2f} kx={tk:8.2f})",
          flush=True)
    return per


def main():
    n = 2_073_600
    cap = (n * 2) // 3
    key = jax.random.PRNGKey(0)
    mask = jax.device_put(jax.random.uniform(key, (n,)) < 0.49)
    float(jnp.zeros(()) + 1)          # honest sync

    # perturb the input each step via a cheap dependency
    def dep(x, i):
        return x ^ (i % 2 == 0)

    # ---- cumsum
    chain_cost(lambda m, i: dep(m, i) ^ (jnp.cumsum(
        dep(m, i).astype(jnp.int32)) % 2 == 0), mask,
        label="cumsum 2M (+xor dep)")

    # ---- full compact_mask
    from vk_renderer_tpu.ops.common import compact_mask

    def step_compact(m, i):
        sel, ov = compact_mask(dep(m, i), cap)
        return m ^ ((sel.sum() + ov) % 2 == 0)

    chain_cost(step_compact, mask, label=f"compact_mask 2M cap={cap}")

    def step_compact_small(m, i):
        sel, ov = compact_mask(dep(m, i), 8192)
        return m ^ ((sel.sum() + ov) % 2 == 0)

    chain_cost(step_compact_small, mask, label="compact_mask 2M cap=8192")

    # ---- scatter alone (pos fixed)
    pos = jax.device_put(jax.block_until_ready(
        jnp.cumsum(mask.astype(jnp.int32)) - 1))
    idx0 = jax.device_put(jnp.arange(n, dtype=jnp.int32))

    def step_scatter(x, i):
        tgt = jnp.where(mask & (pos < cap), pos, cap)
        sel = jnp.full((cap,), -1, jnp.int32).at[tgt].set(x, mode="drop")
        return x ^ (sel.sum() % 2)

    chain_cost(step_scatter, idx0, label="scatter 2M->cap")

    # ---- flat take 2M
    tblf = jax.device_put(jnp.ones((300_000,), jnp.float32))
    idx = jax.device_put(jax.random.randint(key, (n,), 0, 300_000,
                                            jnp.int32))

    def step_take(x, i):
        v = jnp.take(tblf, x)
        return x ^ (v > 2.0)

    chain_cost(step_take, idx, label="flat take 2M over [300k]")

    # ---- row gathers, widths 8 / 24 / 48
    for wdt in (4, 8, 24, 48):
        tbl = jax.device_put(jnp.ones((300_000, wdt), jnp.float32))

        def step_row(x, i, tbl=tbl):
            v = tbl[x]
            return x ^ (v[:, 0] + v[:, -1] > 3.0)

        chain_cost(step_row, idx, label=f"row gather 2M over [300k,{wdt}]")

    # ---- tile-granular compact + gather + scatter (masked accept shape)
    rows_t, cols_t, th, tw = 34, 15, 32, 128
    g = rows_t * cols_t
    tcap = 384
    payload = jax.device_put(jax.random.randint(key, (g, th * tw),
                                                0, 1 << 20, jnp.int32))

    def step_tile(x, i):
        tiles = x.reshape(g, th * tw)
        any_t = (tiles & 1).any(axis=1)
        pos_t = jnp.cumsum(any_t.astype(jnp.int32)) - 1
        tgt = jnp.where(any_t & (pos_t < tcap), pos_t, tcap)
        tsel = jnp.full((tcap,), -1, jnp.int32).at[tgt].set(
            jnp.arange(g, dtype=jnp.int32), mode="drop")
        gath = tiles[jnp.maximum(tsel, 0)]
        r = gath ^ 1
        out = x.reshape(g, th * tw).at[
            jnp.where(tsel >= 0, tsel, g)].set(r, mode="drop")
        return out

    chain_cost(step_tile, payload,
               label=f"tile compact+gather+scatter [{tcap},4096]")

    # ---- the masked accept evals at full compact width (state vs tri)
    # stand-ins with the same gather structure
    ptbl = jax.device_put(jnp.ones((300_000, 24), jnp.float32))
    heap = jax.device_put(jnp.ones((8_000_000,), jnp.int32))
    states = jax.device_put(jnp.ones((200_000,), jnp.int32))

    def step_state_eval(x, i):
        r = ptbl[x]                                   # 24-row
        ci = (x * 7 + i) % 200_000
        st = (jnp.take(states, ci) >> ((ci & 7) * 4)) & 3
        return x ^ (st + r[:, 0].astype(jnp.int32) > 2)

    chain_cost(step_state_eval, idx, label="state eval (24row + take)")

    def step_tri_eval(x, i):
        r = ptbl[x]                                   # 24-row
        q0 = jnp.take(heap, (x * 13 + i) % 8_000_000)
        q1 = jnp.take(heap, (x * 29 + i) % 8_000_000)
        return x ^ ((q0 + q1 + r[:, 0].astype(jnp.int32)) > 2)

    chain_cost(step_tri_eval, idx, label="tri eval (24row + 2 takes)")


if __name__ == "__main__":
    main()
