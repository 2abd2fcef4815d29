"""Triangle -> screen-tile binning.

The TPU analog of the GPU's internal tile binner: each framebuffer tile
gets a fixed-capacity list of overlapping triangle ids.  Overflow beyond
the cap is *counted and surfaced* (SURVEY.md names silent bin overflow the
scariest correctness trap) via the returned ``overflow`` scalar.

Implementation is sort-based (TPU scatters are slow; sorts are fast):
1. every triangle emits up to ``max_span`` (tile, tri) pairs from its tile
   bbox; triangles spanning more tiles go to a small global "big list",
2. stable-sort pairs by tile id (stability preserves ascending triangle
   order == the reference's submission draw order,
   vk_engine_run.cpp:284-311),
3. per-tile offsets via searchsorted, bins via gather,
4. the big list is appended to every tile's slots (these are the handful
   of screen-filling triangles; their ordering relative to small ones only
   matters for exact-depth ties).

Returns bins filled with ``T`` (sentinel, one past the last triangle) in
empty slots — callers pad per-triangle arrays with a zero sentinel row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import cdiv


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "cap", "max_span", "big_cap"))
def bin_triangles(bbox, valid: jax.Array, width: int, height: int,
                  tile_w: int = 128, tile_h: int = 32, cap: int = 2048,
                  max_span: int = 32, big_cap: int = 256, chunk: int = 0):
    """bbox: (x0, y0, x1, y1) planar over T (a 2-D [T, 4] array is also
    accepted).  Returns (bins i32[rows, cols, cap + big_cap],
    counts i32[rows, cols], overflow i32).  ``chunk`` is accepted for API
    compatibility (unused)."""
    del chunk
    if not isinstance(bbox, (tuple, list)):
        bbox = [bbox[:, c] for c in range(4)]
    bx0, by0, bx1, by1 = bbox
    n_tris = bx0.shape[0]
    rows = cdiv(height, tile_h)
    cols = cdiv(width, tile_w)
    n_tiles = rows * cols
    sentinel = n_tris

    tx0 = jnp.clip(jnp.floor(bx0 / tile_w), 0, cols - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(by0 / tile_h), 0, rows - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil(bx1 / tile_w) - 1, 0, cols - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil(by1 / tile_h) - 1, 0, rows - 1).astype(jnp.int32)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    span = nx * ny

    small = valid & (span <= max_span)
    big = valid & (span > max_span)

    # ---- small triangles: pair enumeration + stable sort by tile
    k = jnp.arange(max_span, dtype=jnp.int32)[None, :]
    dx = k % nx[:, None]
    dy = k // nx[:, None]
    tile_id = (ty0[:, None] + dy) * cols + (tx0[:, None] + dx)
    pair_ok = small[:, None] & (k < span[:, None])
    keys = jnp.where(pair_ok, tile_id, n_tiles).reshape(-1)
    tris = jnp.broadcast_to(
        jnp.arange(n_tris, dtype=jnp.int32)[:, None], (n_tris, max_span)
    ).reshape(-1)
    keys_s, tris_s = jax.lax.sort((keys, tris), num_keys=1, is_stable=True)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    offsets = jnp.searchsorted(keys_s, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(keys_s, tile_range, side="right").astype(jnp.int32)
    counts = ends - offsets

    # ---- big triangles: packed global list, placed at the FRONT of every
    # tile's slots so the dynamic chunk bound (ceil(max_counts/chunk))
    # always covers them with no sentinel gaps
    big_i = jnp.cumsum(big.astype(jnp.int32)) - 1
    big_total = jnp.sum(big.astype(jnp.int32))
    big_eff = jnp.minimum(big_total, big_cap)
    big_list = jnp.full((big_cap,), sentinel, jnp.int32)
    big_pos = jnp.where(big & (big_i < big_cap), big_i, big_cap)
    big_list = big_list.at[big_pos].set(
        jnp.arange(n_tris, dtype=jnp.int32), mode="drop", unique_indices=True)

    counts_small = jnp.minimum(counts, cap)
    slot = jnp.arange(cap + big_cap, dtype=jnp.int32)[None, :]
    is_big = slot < big_eff
    small_slot = slot - big_eff
    gather_idx = jnp.clip(offsets[:, None] + small_slot, 0, keys_s.shape[0] - 1)
    small_ok = (small_slot >= 0) & (small_slot < counts_small[:, None])
    bins = jnp.where(
        is_big, big_list[jnp.clip(slot, 0, big_cap - 1)],
        jnp.where(small_ok, tris_s[gather_idx], sentinel))

    overflow = (jnp.sum(jnp.maximum(counts - cap, 0))
                + jnp.maximum(big_total - big_cap, 0) * n_tiles)
    counts_total = counts_small + big_eff
    return (bins.reshape(rows, cols, cap + big_cap),
            counts_total.reshape(rows, cols), overflow)
