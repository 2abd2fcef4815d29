"""Gather helpers tuned to the TPU's cost model.

Measured on v5e: XLA gathers cost ~11ns per INDEX, independent of the
sliced width (up to 8 elements) and of element dtype — so the fast shape
for any lookup is "few indices, wide rows".  These helpers expose the
width-N contiguous gather ("row pair") used by the bilinear samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_pairs(flat: jax.Array, start: jax.Array):
    """Gather 2 contiguous elements per index from a 1-D array.
    Returns (flat[start], flat[start+1]) with clip-mode bounds handling.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(start.ndim,), collapsed_slice_dims=(),
        start_index_map=(0,))
    out = jax.lax.gather(flat, start[..., None].astype(jnp.int32), dnums,
                         slice_sizes=(2,),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out[..., 0], out[..., 1]
