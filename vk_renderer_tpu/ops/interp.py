"""Per-pixel attribute interpolation from the visibility buffer.

The deferred replacement for fixed-function varying interpolation
(SURVEY.md F3): given the winning triangle per pixel, recompute the three
inside-positive edge functions at the pixel center and normalize — the
2DH identity makes ``e_i / sum(e)`` exactly the perspective-correct
barycentric weights.  Attribute derivatives for texture LOD come from the
closed-form quotient rule on the same coefficients (the hardware computes
per-quad finite differences instead; the analytic form is smoother and
avoids helper-lane artifacts — documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import einsum


def pixel_centers(height: int, width: int):
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    return px, py


def interpolation_weights(tri_id: jax.Array, setup_padded: dict):
    """Perspective-correct weights + the raw plane values needed for
    derivatives.

    Returns dict with ``lam`` f32[H,W,3], ``coef`` f32[H,W,3,3] (gathered
    edge rows), ``esum`` f32[H,W].
    """
    edge_padded = setup_padded["edge"]
    anchor_padded = setup_padded["anchor"]
    h, w = tri_id.shape
    sentinel = edge_padded.shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)
    coef = edge_padded[ids]                       # [H, W, 3, 3]
    anc = anchor_padded[ids]                      # [H, W, 2]
    px, py = pixel_centers(h, w)
    pxa = px - anc[..., 0]
    pya = py - anc[..., 1]
    e = (coef[..., 0] * pxa[..., None] + coef[..., 1] * pya[..., None]
         + coef[..., 2])                          # [H, W, 3]
    esum = jnp.sum(e, axis=-1)
    esafe = jnp.where(esum != 0.0, esum, 1.0)
    lam = e / esafe[..., None]
    return {"lam": lam, "coef": coef, "esum": esafe}


def gather_corners(vals: jax.Array, tris_padded: jax.Array,
                   tri_id: jax.Array) -> jax.Array:
    """vals f32[V, C] -> per-pixel corner values f32[H, W, 3, C]."""
    sentinel = tris_padded.shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)
    vidx = tris_padded[ids]                       # [H, W, 3]
    return vals[vidx]


def interpolate(corners: jax.Array, lam: jax.Array) -> jax.Array:
    """[H, W, 3, C] x [H, W, 3] -> [H, W, C]."""
    return einsum("hwkc,hwk->hwc", corners, lam)


def interpolate_with_derivs(corners: jax.Array, weights: dict):
    """Interpolated value plus d/dx, d/dy (quotient rule over the linear
    numerator/denominator planes).  corners: [H, W, 3, C]."""
    lam, coef, esum = weights["lam"], weights["coef"], weights["esum"]
    val = einsum("hwkc,hwk->hwc", corners, lam)
    # N(p) = sum_i u_i e_i;  D(p) = sum_i e_i
    nx = einsum("hwkc,hwk->hwc", corners, coef[..., 0])   # dN/dx
    ny = einsum("hwkc,hwk->hwc", corners, coef[..., 1])
    dx_den = jnp.sum(coef[..., 0], axis=-1)                   # dD/dx
    dy_den = jnp.sum(coef[..., 1], axis=-1)
    inv = 1.0 / esum
    ddx = (nx - val * dx_den[..., None]) * inv[..., None]
    ddy = (ny - val * dy_den[..., None]) * inv[..., None]
    return val, ddx, ddy
