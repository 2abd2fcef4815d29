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


def compact_mask(mask: jax.Array, cap: int):
    """Pack the flat indices of True pixels into a static [cap] list
    (-1 padded), in raster order; True entries beyond ``cap`` are counted
    in the returned overflow scalar (never silently dropped).

    The sparse-shading primitive: per-pixel gather cost dominates shading,
    so restricting expensive per-pixel work (peel shading, shadow
    filtering) to a compacted active set makes it coverage-proportional."""
    flat = mask.reshape(-1)
    n = flat.shape[0]
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    tgt = jnp.where(flat & (pos < cap), pos, cap)
    sel = jnp.full((cap,), -1, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    total = pos[-1] + 1
    return sel, jnp.maximum(total - cap, 0)
