"""Skybox pass — per-pixel ray-direction cubemap sampling (planar).

The reference rasterizes the 2x2x2 cube with the view's rotation only and
``gl_Position = pos.xyww`` so depth==1 everywhere (shaders/skybox.vert:8-17),
drawn after opaque geometry with LESS_OR_EQUAL so it fills exactly the
pixels whose depth is still at the clear value (vk_engine_run.cpp:313-332).

Because perspective-correct interpolation of the cube-surface position is
the point where the eye ray hits the cube, the sampled direction equals the
per-pixel eye ray in rotation-only world space — so the TPU-native version
needs no geometry at all: unproject each pixel, rotate by view^T, flip y
(skybox.vert:11), sample the cubemap.  Pixel-exact equivalent of the
rasterized cube (the cube covers the full frame from inside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import texture as tex
from .interp import pixel_centers


def skybox_colors_at(cubemap: jax.Array, view: jax.Array, proj: jax.Array,
                     px, py, width: int, y_offset=0.0,
                     full_height: int = 1):
    """(r, g, b) cubemap colors at explicit pixel centers ``px``/``py``
    (any shape — dense [H, W] grids or a compacted 1-D list).
    ``y_offset``/``full_height`` locate a horizontal strip within the full
    frame (the multi-chip sharding path)."""
    ndc_x = px * (2.0 / width) - 1.0
    ndc_y = (py + y_offset) * (2.0 / full_height) - 1.0
    # view-space ray: clip.x = P00*xv, clip.y = P11*yv, w = -zv
    rx = ndc_x / proj[0, 0]
    ry = ndc_y / proj[1, 1]
    # world dir = R @ d_view = view[:3,:3]^T @ d_view (orthonormal camera)
    rot = view[:3, :3]
    dx = rot[0, 0] * rx + rot[1, 0] * ry - rot[2, 0]
    dy = rot[0, 1] * rx + rot[1, 1] * ry - rot[2, 1]
    dz = rot[0, 2] * rx + rot[1, 2] * ry - rot[2, 2]
    return tex.sample_cubemap(cubemap, dx, -dy, dz)   # UVW y flip


def skybox_colors(cubemap: jax.Array, view: jax.Array, proj: jax.Array,
                  height: int, width: int, y_offset=0.0,
                  full_height: int | None = None):
    """(r, g, b) planar [H, W] cubemap colors for every pixel."""
    full_height = height if full_height is None else full_height
    px, py = pixel_centers(height, width)
    return skybox_colors_at(cubemap, view, proj, px, py, width, y_offset,
                            full_height)


def composite_skybox(color, depth: jax.Array, cubemap: jax.Array,
                     view: jax.Array, proj: jax.Array, y_offset=0.0,
                     full_height: int | None = None,
                     sparse_cap: int | None = None):
    """Overwrite pixels still at clear depth (==1.0) with the skybox
    (depth LESS_OR_EQUAL at z=1, write off).  color: (r, g, b) planar.
    Returns (color, overflow).

    With ``sparse_cap``, the sky pixels are compacted first and only they
    pay the 4 cubemap gathers — sky coverage is usually a small fraction
    of the frame (interiors) while the dense path gathers 4 words for
    every pixel.  EXACT FOR EVERY CAMERA: when the sky exceeds the cap
    (open view, looking up), a ``lax.cond`` falls back to the dense
    sampler — slower, never wrong.  The returned scalar counts sky pixels
    beyond cap (a cap-sizing signal; the image never deviates)."""
    h, w = depth.shape
    full_height = h if full_height is None else full_height
    mask = depth >= 1.0
    if sparse_cap is None:
        sky = skybox_colors(cubemap, view, proj, h, w, y_offset, full_height)
        return (tuple(jnp.where(mask, s, c) for s, c in zip(sky, color)),
                jnp.int32(0))
    from .common import compact_mask

    def sparse_path(args, cap):
        color, depth, mask = args
        sel, _ = compact_mask(mask, cap)
        selc = jnp.maximum(sel, 0)
        px = (selc % w).astype(jnp.float32) + 0.5
        py = (selc // w).astype(jnp.float32) + 0.5
        sky = skybox_colors_at(cubemap, view, proj, px, py, w, y_offset,
                               full_height)
        tgt = jnp.where(sel >= 0, sel, h * w)   # pads routed out of bounds
        return tuple(c.reshape(-1).at[tgt].set(s, mode="drop").reshape(h, w)
                     for c, s in zip(color, sky))

    def dense_path(args):
        color, depth, mask = args
        sky = skybox_colors(cubemap, view, proj, h, w, y_offset, full_height)
        return tuple(jnp.where(mask, s, c) for s, c in zip(sky, color))

    # compact-list gather cost is CAP-proportional, so the cap is tiered
    # by the live sky count: interiors with the floor/ceiling fixed leave
    # only a handful of uncovered pixels (the bench camera measures 2 —
    # tools/measure_sparse.py), so the ladder starts at a tiny tier; the
    # big cap and the dense path are the open-view fallbacks
    cap_tiny = min(sparse_cap, 8192)
    cap_small = min(sparse_cap, max(8192, sparse_cap // 4))
    n_sky = jnp.sum(mask.astype(jnp.int32))
    out = jax.lax.cond(
        n_sky <= cap_tiny,
        lambda a: sparse_path(a, cap_tiny),
        lambda a: jax.lax.cond(
            n_sky <= cap_small,
            lambda b: sparse_path(b, cap_small),
            lambda b: jax.lax.cond(n_sky <= sparse_cap,
                                   lambda c: sparse_path(c, sparse_cap),
                                   dense_path, b),
            a),
        (color, depth, mask))
    return out, jnp.maximum(n_sky - sparse_cap, 0)
