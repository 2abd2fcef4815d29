"""Gather helpers tuned to the TPU's honest cost model.

Measured on v5e (honest protocol, 2026-08-17, 2M indices):
- plain flat ``jnp.take``:          ~7.5 ns / index (1 value)
- explicit slice_sizes=(2,) gather: ~8.5 ns / index (2 values)
- ROW gather ``tbl[M, k][idx]``:    ~2.5-5.5 ns / index for k = 2..8
  (the row width rides ~free — the cheapest bytes/index form by 3-6x)
- ``take_along_axis`` on a minor dim is itself a slow gather (~30 ns/idx);
  in-row dynamic selection must be a where-chain (elementwise, fuses free).

``take2`` below exploits this: a consecutive-pair fetch (the bilinear
x-pair) via TWO row-4 gathers + free select chains — ~2.4x cheaper than
four plain takes for a full bilinear tap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_pairs(flat: jax.Array, start: jax.Array):
    """Gather 2 contiguous elements per index from a 1-D array.
    Returns (flat[start], flat[start+1]) with clip-mode bounds handling.
    (Legacy form — prefer take2, ~2x cheaper per value.)"""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(start.ndim,), collapsed_slice_dims=(),
        start_index_map=(0,))
    out = jax.lax.gather(flat, start[..., None].astype(jnp.int32), dnums,
                         slice_sizes=(2,),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out[..., 0], out[..., 1]


def _sel8(v8, off):
    """v8: list of 8 planes; off in [0, 8): where-chain select (elementwise,
    fuses into the gather consumers — take_along_axis would be a gather)."""
    out = v8[0]
    for k in range(1, 8):
        out = jnp.where(off == k, v8[k], out)
    return out


def take2(flat: jax.Array, g: jax.Array):
    """(flat[g], flat[g+1]) — the bilinear x-pair — via two row-4 gathers.

    The flat table is viewed as [N//4, 4] rows (a free bitcast); rows
    r = g>>2 and r+1 cover flat[g & ~3 .. g+7] which always contains the
    pair.  Cost: 2 row-gather index-units (~11 ns) vs 2 plain takes
    (~15 ns) per pair — and callers fetching two pairs from nearby rows
    still pay only per index.

    ``g+1`` must be a valid element index (callers guarantee this: texture
    rows are wrap-padded, shadow pairs are clamp-based); the r+1 ROW may
    fall off the table end and is clipped (its values are then never
    selected)."""
    if flat.shape[0] % 4 != 0:
        # 4-misaligned tables (pad at build time to get the fast path)
        return jnp.take(flat, g), jnp.take(flat, g + 1)
    n4 = flat.shape[0] // 4
    t4 = flat.reshape(n4, 4)
    r = (g >> 2).astype(jnp.int32)
    a = t4[jnp.clip(r, 0, n4 - 1)]
    b = t4[jnp.clip(r + 1, 0, n4 - 1)]
    v8 = [a[..., 0], a[..., 1], a[..., 2], a[..., 3],
          b[..., 0], b[..., 1], b[..., 2], b[..., 3]]
    off = (g & 3).astype(jnp.int32)
    return _sel8(v8, off), _sel8(v8, off + 1)
