"""Post/background kernels: gradient clear and Reinhard tonemap.

These replace the reference's two compute shaders:
- shaders/gradient_color.comp:16-31 — vertical ``mix(top, bottom, y/H)``
  written to the draw image (the pass doubles as the clear when enabled,
  src/vk_engine_run.cpp:146-147,248).
- shaders/tonemap.comp:9-22 — Reinhard ``c/(c+1)`` then gamma ``x^(1/2.2)``.

Each op has an XLA implementation (reference semantics, runs anywhere, and
is what the NumPy/CPU tests check against) and a fused Pallas kernel used on
TPU.  Images are planar ``f32[3, H, W]`` (see ops/common.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import LANE, SUBLANE, cdiv, on_tpu

INV_GAMMA = 1.0 / 2.2  # tonemap.comp:18


# ----------------------------------------------------------------------------
# gradient background
# ----------------------------------------------------------------------------

def gradient_xla(h: int, w: int, top: jax.Array, bottom: jax.Array,
                 extent_h: int | None = None) -> jax.Array:
    """Vertical gradient image, f32[3, h, w].

    ``blend = y / extent_h`` (gradient_color.comp:27 divides by the full
    image height, not height-1).  ``extent_h`` defaults to ``h`` — pass the
    unpadded height when the framebuffer is padded.
    """
    extent_h = h if extent_h is None else extent_h
    blend = (jnp.arange(h, dtype=jnp.float32) / extent_h)[None, :, None]
    top = top[:3].astype(jnp.float32).reshape(3, 1, 1)
    bottom = bottom[:3].astype(jnp.float32).reshape(3, 1, 1)
    return jnp.broadcast_to(top * (1.0 - blend) + bottom * blend, (3, h, w))


def _gradient_kernel(params_ref, out_ref):
    # params: [2, 8] rows = top/bottom rgb + inv_h (padded to lane width 8)
    i = pl.program_id(1)
    c = pl.program_id(0)
    bh = out_ref.shape[0]
    top = params_ref[0, c]
    bottom = params_ref[1, c]
    inv_h = params_ref[0, 3]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, out_ref.shape[1]), 0)
    y = i.astype(jnp.float32) * bh + rows.astype(jnp.float32)
    blend = y * inv_h
    out_ref[:, :] = top * (1.0 - blend) + bottom * blend


def gradient_pallas(h: int, w: int, top: jax.Array, bottom: jax.Array,
                    extent_h: int | None = None, *, block_h: int = 64,
                    interpret: bool = False) -> jax.Array:
    extent_h = h if extent_h is None else extent_h
    params = jnp.stack([
        jnp.concatenate([top[:3].astype(jnp.float32),
                         jnp.array([1.0 / extent_h], jnp.float32),
                         jnp.zeros(4, jnp.float32)]),
        jnp.concatenate([bottom[:3].astype(jnp.float32), jnp.zeros(5, jnp.float32)]),
    ])
    block_h = min(block_h, h)
    grid = (3, cdiv(h, block_h))
    return pl.pallas_call(
        _gradient_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((None, block_h, w), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        interpret=interpret,
    )(params)


def gradient(h: int, w: int, top: jax.Array, bottom: jax.Array,
             extent_h: int | None = None) -> jax.Array:
    if on_tpu():
        return gradient_pallas(h, w, top, bottom, extent_h)
    return gradient_xla(h, w, top, bottom, extent_h)


# ----------------------------------------------------------------------------
# Reinhard tonemap
# ----------------------------------------------------------------------------

def tonemap_xla(color: jax.Array) -> jax.Array:
    """Reinhard + gamma 2.2 (tonemap.comp:16-19)."""
    mapped = color / (color + 1.0)
    return jnp.power(mapped, INV_GAMMA)


def _tonemap_kernel(in_ref, out_ref):
    c = in_ref[:, :]
    mapped = c / (c + 1.0)
    out_ref[:, :] = jnp.exp(jnp.log(mapped) * INV_GAMMA)


def tonemap_pallas(color: jax.Array, *, block_h: int = 64,
                   interpret: bool = False) -> jax.Array:
    _, h, w = color.shape
    block_h = min(block_h, h)
    grid = (3, cdiv(h, block_h))
    return pl.pallas_call(
        _tonemap_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((None, block_h, w), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, block_h, w), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(color.shape, jnp.float32),
        interpret=interpret,
    )(color)


def tonemap(color: jax.Array) -> jax.Array:
    if on_tpu():
        return tonemap_pallas(color)
    return tonemap_xla(color)
