"""Shared op-layer utilities: backend detection, tiling helpers, layout.

Framebuffer layout convention (TPU-first): color images are planar
``f32[3, H, W]`` (channels first so the lane dimension is W, a multiple of
128 after padding), depth is ``f32[H, W]``.  This replaces the reference's
RGBA16F draw image (src/vk_engine_init.cpp:101); alpha is implicitly 1
everywhere the reference writes it (mesh_pbr.frag:225, tonemap.comp:21).

``H``/``W`` are padded up to VPU tile multiples (8, 128) at allocation and
cropped on readback — the analog of the reference's draw-extent clamp
(src/vk_engine_run.cpp:89-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SUBLANE = 8
LANE = 128

# TPU matmul/einsum default precision is bfloat16 — catastrophic for vertex
# transforms and interpolation (bf16 clip coords quantize screen positions
# by ~1/256).  Every contraction in the compute path must use this.
einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_hw(h: int, w: int) -> tuple[int, int]:
    """Padded framebuffer extent (VPU tile aligned)."""
    return round_up(h, SUBLANE), round_up(w, LANE)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather from a SMALL 2-D table via per-column flat takes.

    XLA's TPU lowering of row gathers from small tables (offset dims) is
    pathologically slow (~27 ms for 2M 16-float rows from a 4-row table);
    flat 1-D takes run at memory speed.  Returns idx.shape + (table.shape[1],).
    """
    cols = [jnp.take(table[:, c], idx) for c in range(table.shape[1])]
    return jnp.stack(cols, axis=-1)
