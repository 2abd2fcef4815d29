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


def skybox_colors(cubemap: jax.Array, view: jax.Array, proj: jax.Array,
                  height: int, width: int, y_offset=0.0,
                  full_height: int | None = None):
    """(r, g, b) planar [H, W] cubemap colors for every pixel.  ``y_offset``/
    ``full_height`` locate a horizontal strip within the full frame (the
    multi-chip sharding path)."""
    full_height = height if full_height is None else full_height
    px, py = pixel_centers(height, width)
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


def composite_skybox(color, depth: jax.Array, cubemap: jax.Array,
                     view: jax.Array, proj: jax.Array, y_offset=0.0,
                     full_height: int | None = None):
    """Overwrite pixels still at clear depth (==1.0) with the skybox
    (depth LESS_OR_EQUAL at z=1, write off).  color: (r, g, b) planar."""
    h, w = depth.shape
    sky = skybox_colors(cubemap, view, proj, h, w, y_offset, full_height)
    mask = depth >= 1.0
    return tuple(jnp.where(mask, s, c) for s, c in zip(sky, color))
