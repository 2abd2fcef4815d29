"""Vertex transform and clipless triangle setup (XLA, feeds the rasterizer).

Replaces the vertex stage (shaders/mesh.vert:14-24) and the fixed-function
primitive assembly/clipping of the Vulkan pipeline (SURVEY.md F1) with a
TPU-idiomatic formulation: 2D-homogeneous triangle setup (Olano & Greer).
No data-dependent clipping — triangles crossing w=0 are handled by the
sign tests plus a per-pixel interpolated-w>0 mask, which keeps every shape
static under jit.

Per-triangle outputs (all dense SoA over T):
- ``edge`` f32[T, 3, 3]: cofactor rows of the homogeneous screen matrix,
  sign-normalized so inside is all-positive; ``e_i(p) = edge[t,i] . (px,py,1)``.
  ``sum_i e_i(p) > 0`` doubles as the interpolated ``1/w > 0`` test that
  rejects the mirror region of w-crossing triangles.
- ``zlin`` f32[T, 3]:    screen-linear depth coefficients;
  ``z_ndc(p) = zlin[t] . (px,py,1)`` exactly (identity:
  ``sum_i w_i e_i(p) == det``, so the division by det is folded in at setup
  and depth needs no per-pixel divide — the hardware's screen-linear z).
- ``bbox`` f32[T, 4]:    (x0, y0, x1, y1) pixel-space conservative bounds.
- ``valid`` bool[T].

Vulkan front-face convention: the spec's signed area carries a leading
negation (y-down compensation), so FRONT_FACE_COUNTER_CLOCKWISE ==
``det(M) < 0`` here (verified against the oracle in tests/test_raster.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import einsum, take_rows

CULL_NONE = 0
CULL_BACK = 1   # keep front faces (geometry pass, vk_engine_init.cpp:536)
CULL_FRONT = 2  # keep back faces (shadow/skybox, vk_engine_init.cpp:441,626)


def _gather_world_rows(obj_world: jax.Array, vert_obj: jax.Array):
    """Per-vertex world matrix rows via flat takes (small-table row gathers
    are slow on TPU, see ops/common.take_rows)."""
    flat = obj_world.reshape(-1, 16)
    return take_rows(flat, vert_obj)                          # [V, 16]


def transform_vertices(positions: jax.Array, vert_obj: jax.Array,
                       obj_world: jax.Array, viewproj: jax.Array):
    """World + clip transform for all vertices (mesh.vert:16,22).

    Returns (world_pos f32[V,3], clip f32[V,4]).
    """
    m = _gather_world_rows(obj_world, vert_obj)               # [V, 16]
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    world = jnp.stack([
        m[:, 0] * x + m[:, 1] * y + m[:, 2] * z + m[:, 3],
        m[:, 4] * x + m[:, 5] * y + m[:, 6] * z + m[:, 7],
        m[:, 8] * x + m[:, 9] * y + m[:, 10] * z + m[:, 11],
    ], axis=-1)
    clip = einsum("ij,vj->vi", viewproj[:, :3], world) + viewproj[:, 3]
    # viewproj[:, :3] @ world + viewproj[:, 3] is (viewproj @ [world, 1])
    return world, clip


def transform_normals(normals: jax.Array, vert_obj: jax.Array,
                      obj_world: jax.Array) -> jax.Array:
    """World-space normals: mat3(world) @ n (mesh.vert:18, not normalized
    until the fragment stage)."""
    m = _gather_world_rows(obj_world, vert_obj)
    x, y, z = normals[:, 0], normals[:, 1], normals[:, 2]
    return jnp.stack([
        m[:, 0] * x + m[:, 1] * y + m[:, 2] * z,
        m[:, 4] * x + m[:, 5] * y + m[:, 6] * z,
        m[:, 8] * x + m[:, 9] * y + m[:, 10] * z,
    ], axis=-1)


def cull_objects(obj_world: jax.Array, obj_bounds: jax.Array,
                 planes: jax.Array) -> jax.Array:
    """Sphere-vs-frustum visibility per render object
    (vk_engine_run.cpp:461-480): world center, radius scaled by the largest
    basis-column length, visible unless fully outside any plane."""
    centers = einsum("oij,oj->oi", obj_world[:, :3, :3], obj_bounds[:, :3]) \
        + obj_world[:, :3, 3]
    col_scale = jnp.linalg.norm(obj_world[:, :3, :3], axis=1)   # per-column lengths
    radius = obj_bounds[:, 3] * jnp.max(col_scale, axis=-1)
    dist = einsum("pk,ok->op", planes[:, :3], centers) + planes[None, :, 3]
    return jnp.all(dist >= -radius[:, None], axis=1)


@partial(jax.jit, static_argnames=("width", "height", "cull"))
def triangle_setup(clip: jax.Array, tris: jax.Array, tri_valid: jax.Array,
                   width: int, height: int, cull: int = CULL_BACK):
    """Clipless 2DH setup for all triangles.  ``tri_valid`` folds in the
    frustum-cull mask (and bucket masks).

    All per-corner quantities are PLANAR [T] arrays internally (minor-dim-3
    layouts are pathologically slow on TPU; see ops/texture.py)."""
    # per-corner planar gathers of clip components (flat takes)
    cx, cy, cz, cw = clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 3]
    vi = [tris[:, k] for k in range(3)]
    x = [jnp.take(cx, i) for i in vi]
    y = [jnp.take(cy, i) for i in vi]
    z = [jnp.take(cz, i) for i in vi]
    w = [jnp.take(cw, i) for i in vi]

    # fold the viewport transform into homogeneous screen coords
    X = [(x[k] + w[k]) * (0.5 * width) for k in range(3)]
    Y = [(y[k] + w[k]) * (0.5 * height) for k in range(3)]

    # Precision: evaluate everything in per-triangle anchored coordinates
    # (homogeneous translation by a point near the triangle).  This keeps
    # cofactor magnitudes proportional to the triangle's screen extent, not
    # the screen size — without it f32 depth error reaches ~1e-3, larger
    # than the 5e-4 shadow bias.  Anchor = projected bbox center (viewport
    # center for w-crossing triangles).
    sx = [X[k] / jnp.where(jnp.abs(w[k]) > 1e-12, w[k], 1e-12) for k in range(3)]
    sy = [Y[k] / jnp.where(jnp.abs(w[k]) > 1e-12, w[k], 1e-12) for k in range(3)]
    all_w_pos = (w[0] > 1e-12) & (w[1] > 1e-12) & (w[2] > 1e-12)
    sx_min = jnp.minimum(jnp.minimum(sx[0], sx[1]), sx[2])
    sx_max = jnp.maximum(jnp.maximum(sx[0], sx[1]), sx[2])
    sy_min = jnp.minimum(jnp.minimum(sy[0], sy[1]), sy[2])
    sy_max = jnp.maximum(jnp.maximum(sy[0], sy[1]), sy[2])
    ax = jnp.clip(jnp.where(all_w_pos, 0.5 * (sx_min + sx_max), 0.5 * width),
                  0.0, width)
    ay = jnp.clip(jnp.where(all_w_pos, 0.5 * (sy_min + sy_max), 0.5 * height),
                  0.0, height)
    X = [X[k] - ax * w[k] for k in range(3)]
    Y = [Y[k] - ay * w[k] for k in range(3)]

    # Per-vertex magnitude normalization conditions the f32 cofactors.
    # CAREFUL: plain per-vertex scaling is invariant for coverage and depth
    # but NOT for attribute interpolation (lambda_i = e_i / sum e assumes
    # true clip w), so cofactor row i is rescaled by its own vertex's
    # factor afterwards — restoring a common per-triangle factor
    # S = s0*s1*s2 that cancels in every ratio.
    s = [1.0 / jnp.maximum(jnp.maximum(jnp.abs(X[k]),
                                       jnp.maximum(jnp.abs(Y[k]),
                                                   jnp.abs(w[k]))), 1e-12)
         for k in range(3)]
    Xn = [X[k] * s[k] for k in range(3)]
    Yn = [Y[k] * s[k] for k in range(3)]
    wn = [w[k] * s[k] for k in range(3)]

    # cofactor rows of M = [[X0,Y0,w0],[X1,Y1,w1],[X2,Y2,w2]]; each edge is
    # (a, b, c) planar
    def cof(j, k, si):
        return (( Yn[j] * wn[k] - Yn[k] * wn[j]) * si,
                ( wn[j] * Xn[k] - wn[k] * Xn[j]) * si,
                ( Xn[j] * Yn[k] - Xn[k] * Yn[j]) * si)

    e0 = cof(1, 2, s[0])
    e1 = cof(2, 0, s[1])
    e2 = cof(0, 1, s[2])
    # sum_i w_i e_i == (0, 0, det) identically; read det from the c-term
    det = w[0] * e0[2] + w[1] * e1[2] + w[2] * e2[2]

    front = det < 0.0   # Vulkan CCW front face (see module docstring)
    if cull == CULL_BACK:
        keep_facing = front
    elif cull == CULL_FRONT:
        keep_facing = ~front
    else:
        keep_facing = jnp.ones_like(front)

    valid = (tri_valid & keep_facing & (det != 0.0)
             & ~((w[0] <= 0.0) & (w[1] <= 0.0) & (w[2] <= 0.0)))

    # conservative pixel bbox; triangles crossing w<=0 get the full viewport
    x0 = jnp.clip(jnp.where(all_w_pos, sx_min, 0.0), 0.0, width)
    x1 = jnp.clip(jnp.where(all_w_pos, sx_max, float(width)), 0.0, width)
    y0 = jnp.clip(jnp.where(all_w_pos, sy_min, 0.0), 0.0, height)
    y1 = jnp.clip(jnp.where(all_w_pos, sy_max, float(height)), 0.0, height)
    # degenerate bbox -> invalid (fully off-screen)
    valid = valid & (x1 > x0) & (y1 > y0)

    # orient edges inside-positive (e_i(vertex_i) == det -> flip by
    # sign(det)); invalid triangles get all-zero edges (e==0 everywhere
    # fails the top-left rule, so the rasterizer needs no extra mask)
    sgn = jnp.where(valid, jnp.where(det < 0, -1.0, 1.0), 0.0)
    planes = [c * sgn for e in (e0, e1, e2) for c in e]        # 9 planar

    # screen-linear depth: z(p) = (sum_i z_i e~_i(p)) / |det|
    inv_absdet = 1.0 / jnp.where(det != 0.0, jnp.abs(det), 1.0)
    zlin = [(z[0] * planes[c] + z[1] * planes[3 + c] + z[2] * planes[6 + c])
            * inv_absdet for c in range(3)]

    edge = jnp.stack(planes, axis=-1).reshape(-1, 3, 3)
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    anchor = jnp.stack([ax, ay], axis=-1)
    return {"edge": edge, "zlin": jnp.stack(zlin, axis=-1), "bbox": bbox,
            "valid": valid, "anchor": anchor}
