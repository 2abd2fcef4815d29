"""Per-pixel attribute interpolation from the visibility buffer (planar).

The deferred replacement for fixed-function varying interpolation
(SURVEY.md F3): given the winning triangle per pixel, recompute the three
inside-positive edge functions at the pixel center and normalize — the
2DH identity makes ``e_i / sum(e)`` exactly the perspective-correct
barycentric weights.  Attribute derivatives for texture LOD come from the
closed-form quotient rule on the same coefficients (the hardware computes
per-quad finite differences instead; the analytic form is smoother and
avoids helper-lane artifacts — documented deviation).

All per-pixel quantities are planar [H, W] arrays (see ops/texture.py for
the layout rationale); per-triangle tables are gathered with per-column
flat takes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_centers(height: int, width: int):
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    return px, py


def interpolation_weights(tri_id: jax.Array, setup_padded: dict):
    """Perspective-correct weights + plane coefficients for derivatives.

    Returns dict with:
    - ``lam``: tuple of 3 planar [H, W] weights
    - ``a``/``b``: tuples of 3 planar edge gradients (for the quotient rule)
    - ``esum``, ``inv_esum``: planar
    """
    h, w = tri_id.shape
    edge = setup_padded["edge"]                       # 9 planes over T+1
    anchor = setup_padded["anchor"]                   # 2 planes
    sentinel = edge[0].shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)

    px, py = pixel_centers(h, w)
    ax = jnp.take(anchor[0], ids)
    ay = jnp.take(anchor[1], ids)
    pxa = px - ax
    pya = py - ay

    a, b, e = [], [], []
    for i in range(3):
        ai = jnp.take(edge[3 * i + 0], ids)
        bi = jnp.take(edge[3 * i + 1], ids)
        ci = jnp.take(edge[3 * i + 2], ids)
        a.append(ai)
        b.append(bi)
        e.append(ai * pxa + bi * pya + ci)
    esum = e[0] + e[1] + e[2]
    esafe = jnp.where(esum != 0.0, esum, 1.0)
    inv = 1.0 / esafe
    lam = tuple(ei * inv for ei in e)
    return {"lam": lam, "a": tuple(a), "b": tuple(b), "esum": esafe,
            "inv_esum": inv, "ids": ids}


def corner_indices(tris_padded, ids: jax.Array):
    """Per-pixel vertex indices, one planar [H, W] array per corner.
    tris_padded: (i0, i1, i2) planar over T+1 (2-D [T+1, 3] also accepted)."""
    if not isinstance(tris_padded, (tuple, list)):
        tris_padded = tuple(tris_padded[:, k] for k in range(3))
    return tuple(jnp.take(tris_padded[k], ids) for k in range(3))


def interp_channel(vals: jax.Array, vidx, lam) -> jax.Array:
    """Interpolate one per-vertex scalar channel: vals f32[V]."""
    return (jnp.take(vals, vidx[0]) * lam[0]
            + jnp.take(vals, vidx[1]) * lam[1]
            + jnp.take(vals, vidx[2]) * lam[2])


def interp_channel_with_derivs(vals: jax.Array, vidx, weights: dict):
    """Channel value + d/dx, d/dy via the quotient rule on the linear
    numerator/denominator planes."""
    v0 = jnp.take(vals, vidx[0])
    v1 = jnp.take(vals, vidx[1])
    v2 = jnp.take(vals, vidx[2])
    lam, a, b, inv = weights["lam"], weights["a"], weights["b"], weights["inv_esum"]
    val = v0 * lam[0] + v1 * lam[1] + v2 * lam[2]
    nx = v0 * a[0] + v1 * a[1] + v2 * a[2]       # dN/dx
    ny = v0 * b[0] + v1 * b[1] + v2 * b[2]       # dN/dy
    dax = a[0] + a[1] + a[2]                     # dD/dx
    day = b[0] + b[1] + b[2]
    ddx = (nx - val * dax) * inv
    ddy = (ny - val * day) * inv
    return val, ddx, ddy
