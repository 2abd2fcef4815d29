"""Triangle -> screen-tile binning (XLA path).

The TPU analog of the GPU's internal tile binner: each framebuffer tile
gets a fixed-capacity list of overlapping triangle ids, built with a
masked-cumsum scatter (static shapes, jit-friendly).  Overflow beyond the
cap is *counted and surfaced* (SURVEY.md names silent bin overflow the
scariest correctness trap) via the returned ``overflow`` scalar.

Bins are filled in ascending triangle order, preserving the reference's
draw order within a tile (submission order, vk_engine_run.cpp:284-311).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import cdiv


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "cap", "chunk"))
def bin_triangles(bbox: jax.Array, valid: jax.Array, width: int, height: int,
                  tile_w: int = 128, tile_h: int = 32, cap: int = 2048,
                  chunk: int = 32768):
    """Returns (bins i32[rows, cols, cap], counts i32[rows, cols], overflow i32).

    Empty slots hold ``T`` (one past the last triangle) — callers pad their
    per-triangle arrays with a zero sentinel row so gathers at ``T`` are
    harmless no-ops.
    """
    n_tris = bbox.shape[0]
    rows = cdiv(height, tile_h)
    cols = cdiv(width, tile_w)
    n_tiles = rows * cols
    sentinel = n_tris

    # tile index ranges per triangle
    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / tile_w), 0, cols - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / tile_h), 0, rows - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil(bbox[:, 2] / tile_w) - 1, 0, cols - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil(bbox[:, 3] / tile_h) - 1, 0, rows - 1).astype(jnp.int32)

    tile_r = (jnp.arange(n_tiles, dtype=jnp.int32) // cols)
    tile_c = (jnp.arange(n_tiles, dtype=jnp.int32) % cols)

    n_chunks = cdiv(n_tris, chunk)
    pad = n_chunks * chunk - n_tris

    def pad1(x, value):
        return jnp.concatenate([x, jnp.full((pad,), value, x.dtype)]) if pad else x

    tx0p, ty0p = pad1(tx0, 1), pad1(ty0, 1)
    tx1p, ty1p = pad1(tx1, 0), pad1(ty1, 0)      # empty range for padding
    validp = pad1(valid, False)

    bins0 = jnp.full((n_tiles * cap,), sentinel, dtype=jnp.int32)
    counts0 = jnp.zeros((n_tiles,), dtype=jnp.int32)

    def body(carry, ck):
        bins, counts = carry
        base = ck * chunk
        tids = base + jnp.arange(chunk, dtype=jnp.int32)
        ov = (validp[tids]
              & (tile_c[:, None] >= tx0p[None, tids])
              & (tile_c[:, None] <= tx1p[None, tids])
              & (tile_r[:, None] >= ty0p[None, tids])
              & (tile_r[:, None] <= ty1p[None, tids]))          # [n_tiles, chunk]
        pos = counts[:, None] + jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1
        flat = jnp.where(ov & (pos < cap),
                         (jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * cap + pos),
                         n_tiles * cap)                          # drop target
        bins = bins.at[flat.reshape(-1)].set(
            jnp.broadcast_to(tids[None, :], ov.shape).reshape(-1),
            mode="drop", unique_indices=True)
        counts = counts + jnp.sum(ov, axis=1, dtype=jnp.int32)
        return (bins, counts), None

    (bins, counts), _ = jax.lax.scan(body, (bins0, counts0),
                                     jnp.arange(n_chunks, dtype=jnp.int32))
    overflow = jnp.sum(jnp.maximum(counts - cap, 0))
    counts = jnp.minimum(counts, cap)
    return bins.reshape(rows, cols, cap), counts.reshape(rows, cols), overflow
