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


def build_tri_rows(setup_padded: dict, tris_p, tri_mat_p):
    """Pack everything per-pixel interpolation needs into two [T+1, 8] row
    tables, so the per-pixel lookup is TWO row-gathers instead of ~14
    element takes (XLA TPU gathers cost ~11ns per INDEX regardless of the
    slice width up to 8).

    row1 = a0 b0 c0 a1 b1 c1 a2 b2
    row2 = c2 ax ay mat_id i0 i1 i2 pad   (ids as f32, exact below 2^24)
    """
    e = setup_padded["edge"]
    anc = setup_padded["anchor"]
    f = jnp.float32
    row1 = jnp.stack([e[0], e[1], e[2], e[3], e[4], e[5], e[6], e[7]], axis=-1)
    row2 = jnp.stack([e[8], anc[0], anc[1], tri_mat_p.astype(f),
                      tris_p[0].astype(f), tris_p[1].astype(f),
                      tris_p[2].astype(f), jnp.zeros_like(e[8])], axis=-1)
    return row1, row2


def interpolation_weights_rows(tri_id: jax.Array, row1: jax.Array,
                               row2: jax.Array, px=None, py=None):
    """Row-gather variant of interpolation_weights; additionally returns
    per-pixel ``mat_id`` and corner vertex indices ``vidx`` for free.

    ``px``/``py``: explicit pixel-center coordinates matching
    ``tri_id``'s shape — pass them for SPARSE (compacted-pixel) shading;
    defaults to the dense [H, W] grid."""
    sentinel = row1.shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)
    r1 = row1[ids]                                   # [..., 8]
    r2 = row2[ids]

    if px is None:
        h, w = tri_id.shape
        px, py = pixel_centers(h, w)
    pxa = px - r2[..., 1]
    pya = py - r2[..., 2]

    a = (r1[..., 0], r1[..., 3], r1[..., 6])
    b = (r1[..., 1], r1[..., 4], r1[..., 7])
    c = (r1[..., 2], r1[..., 5], r2[..., 0])
    e = tuple(a[i] * pxa + b[i] * pya + c[i] for i in range(3))
    esum = e[0] + e[1] + e[2]
    esafe = jnp.where(esum != 0.0, esum, 1.0)
    inv = 1.0 / esafe
    lam = tuple(ei * inv for ei in e)
    mat_id = r2[..., 3].astype(jnp.int32)
    vidx = tuple(r2[..., 4 + k].astype(jnp.int32) for k in range(3))
    return {"lam": lam, "a": a, "b": b, "esum": esafe, "inv_esum": inv,
            "ids": ids, "mat_id": mat_id, "vidx": vidx}


PACKED_COLS = 48                      # 6 x 8-lane registers


def build_packed_rows(setup_padded: dict, tris_p, tri_mat_p,
                      vattr: jax.Array, mat_rows: jax.Array) -> jax.Array:
    """ONE [T+1, 48] per-triangle row carrying EVERY per-pixel
    interpolation input, so the dense G-buffer (and the masked alpha
    probes) pay ONE wide row-gather per pixel instead of ~6 narrow ones
    (tri row pair + 3 corner rows + material row).

    Column layout (colorless 8-wide vattr = nx ny nz u v wx wy wz):
      0:9    edge planes a0 b0 c0 a1 b1 c1 a2 b2 c2
      9:11   anchor ax ay
      11:19  corner-0 attribute row
      19:27  corner-1 attribute row
      27:35  corner-2 attribute row
      35:35+K  material scalars + texture meta (mat_rows[tri_mat];
               K <= 13 — cols 7:11 are i32-bitcast texture descriptors,
               see frame.build_ptbl)
      ..48   zero pad

    HAZARD: mat_rows columns 7:11 hold i32 descriptors bitcast into f32
    lanes.  TPU vector moves FLUSH DENORMAL patterns (measured — round 5
    found plain sub-2^23 integers zeroed by the stack/gather chain
    itself), so every such value MUST carry the ops/texture.F32_GUARD_BIT
    exponent-bit encoding (packed_meta_cols does) and must only ever MOVE
    (stack / gather / slice) until the consumer bitcasts it back; any
    arithmetic or dtype promotion on these columns corrupts them.

    Built per frame from per-TRIANGLE gathers (3 vattr row-gathers + one
    material row-gather over T+1 rows — ~8x fewer indices than a single
    per-pixel gather at 1080p); whether the wide per-pixel row is a net
    win over the narrow-row path is a measured question
    (tools/bench_rowgather.py) — FrameConfig.packed_rows flips it."""
    e = setup_padded["edge"]
    anc = setup_padded["anchor"]
    c0, c1, c2 = (vattr[tris_p[0]], vattr[tris_p[1]], vattr[tris_p[2]])
    mats = mat_rows[tri_mat_p]                       # [T+1, K]
    cols = [e[i] for i in range(9)] + [anc[0], anc[1]]
    for ck in (c0, c1, c2):
        cols += [ck[:, j] for j in range(8)]
    cols += [mats[:, j] for j in range(mats.shape[1])]
    zero = jnp.zeros_like(e[0])
    cols += [zero] * (PACKED_COLS - len(cols))
    return jnp.stack(cols, axis=-1)


ALPHA_COLS = 24                       # 3 x 8-lane registers


def build_alpha_rows(setup_padded: dict, tris_p, vattr: jax.Array,
                     mat_alpha: jax.Array) -> jax.Array:
    """[T+1, 24] per-triangle rows carrying ONLY what the masked alpha
    probe needs (frame._winner_alpha): edge planes, anchor, the three
    corners' (u, v), and the albedo texture's meta descriptor — half the
    48-wide packed row's gather transactions for the peel loop's
    ~2-3M alpha evaluations per frame.

    cols 0:9 edges | 9:11 anchor | 11:17 uv0 uv1 uv2 | 17:17+K meta_a
    (i32 base/pack/state-base bitcast into f32 lanes — bit-preserving
    moves only, see build_packed_rows' HAZARD note) | ..24 zero pad.

    ``vattr`` must be the colorless 8-wide layout (u, v at cols 3, 4);
    ``mat_alpha``: [M, K<=7] i32-bitcast albedo meta columns."""
    e = setup_padded["edge"]
    anc = setup_padded["anchor"]
    cols = [e[i] for i in range(9)] + [anc[0], anc[1]]
    for k in range(3):
        ck = vattr[tris_p[k]]
        cols += [ck[:, 3], ck[:, 4]]
    cols += [mat_alpha[:, j] for j in range(mat_alpha.shape[1])]
    zero = jnp.zeros_like(e[0])
    cols += [zero] * (ALPHA_COLS - len(cols))
    return jnp.stack(cols, axis=-1)


def alpha_weights_and_uv(ptbl_a: jax.Array, tri_id: jax.Array, px, py,
                         n_meta: int = 2):
    """packed_weights_and_corners' alpha-row counterpart: one 24-wide
    row-gather yields (weights, uv corner pairs, meta cols)."""
    sentinel = ptbl_a.shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)
    r = ptbl_a[ids]
    if px is None:
        h, w = tri_id.shape
        px, py = pixel_centers(h, w)
    pxa = px - r[..., 9]
    pya = py - r[..., 10]
    a = (r[..., 0], r[..., 3], r[..., 6])
    b = (r[..., 1], r[..., 4], r[..., 7])
    c = (r[..., 2], r[..., 5], r[..., 8])
    e = tuple(a[i] * pxa + b[i] * pya + c[i] for i in range(3))
    esum = e[0] + e[1] + e[2]
    esafe = jnp.where(esum != 0.0, esum, 1.0)
    inv = 1.0 / esafe
    lam = tuple(ei * inv for ei in e)
    weights = {"lam": lam, "a": a, "b": b, "esum": esafe, "inv_esum": inv,
               "ids": ids}
    corners = (r[..., 11:13], r[..., 13:15], r[..., 15:17])
    return weights, corners, tuple(r[..., 17 + j] for j in range(n_meta))


def packed_weights_and_corners(ptbl: jax.Array, tri_id: jax.Array,
                               px=None, py=None, n_mat: int = 11):
    """The packed-row counterpart of interpolation_weights_rows +
    gather_corners: one row-gather yields (weights, corners, matvals)."""
    sentinel = ptbl.shape[0] - 1
    ids = jnp.where(tri_id < 0, sentinel, tri_id)
    r = ptbl[ids]                                    # [..., 48]
    if px is None:
        h, w = tri_id.shape
        px, py = pixel_centers(h, w)
    pxa = px - r[..., 9]
    pya = py - r[..., 10]
    a = (r[..., 0], r[..., 3], r[..., 6])
    b = (r[..., 1], r[..., 4], r[..., 7])
    c = (r[..., 2], r[..., 5], r[..., 8])
    e = tuple(a[i] * pxa + b[i] * pya + c[i] for i in range(3))
    esum = e[0] + e[1] + e[2]
    esafe = jnp.where(esum != 0.0, esum, 1.0)
    inv = 1.0 / esafe
    lam = tuple(ei * inv for ei in e)
    weights = {"lam": lam, "a": a, "b": b, "esum": esafe, "inv_esum": inv,
               "ids": ids}
    corners = (r[..., 11:19], r[..., 19:27], r[..., 27:35])
    matvals = tuple(r[..., 35 + j] for j in range(n_mat))
    return weights, corners, matvals


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


def gather_corners(vrows: jax.Array, vidx):
    """The three per-corner row-gathers of a [V, C] attribute table —
    gather ONCE and feed both interp_from_corners and
    derivs_from_corners (round-1 gathered the same rows twice)."""
    return vrows[vidx[0]], vrows[vidx[1]], vrows[vidx[2]]


def interp_from_corners(corners, lam):
    """Interpolate every channel of pre-gathered corner rows."""
    c0, c1, c2 = corners
    n = c0.shape[-1]
    return tuple(c0[..., k] * lam[0] + c1[..., k] * lam[1]
                 + c2[..., k] * lam[2] for k in range(n))


def derivs_from_corners(corners, channels, weights: dict):
    """(value, d/dx, d/dy) for the requested channels of pre-gathered
    corner rows (quotient rule on the linear numerator/denominator)."""
    c0, c1, c2 = corners
    lam, a, b, inv = (weights["lam"], weights["a"], weights["b"],
                      weights["inv_esum"])
    dax = a[0] + a[1] + a[2]
    day = b[0] + b[1] + b[2]
    out = []
    for k in channels:
        v0, v1, v2 = c0[..., k], c1[..., k], c2[..., k]
        val = v0 * lam[0] + v1 * lam[1] + v2 * lam[2]
        nx = v0 * a[0] + v1 * a[1] + v2 * a[2]
        ny = v0 * b[0] + v1 * b[1] + v2 * b[2]
        out.append((val, (nx - val * dax) * inv, (ny - val * day) * inv))
    return out


def interp_rows(vrows: jax.Array, vidx, lam):
    """Interpolate a [V, C<=8] row table of per-vertex attributes with ONE
    row-gather per corner.  Returns a tuple of C planar channels."""
    return interp_from_corners(gather_corners(vrows, vidx), lam)


def interp_rows_with_derivs(vrows: jax.Array, channels, weights: dict):
    """Like interp_rows but also returns d/dx, d/dy for the requested
    channel positions (quotient rule; see interp_channel_with_derivs)."""
    vidx = weights["vidx"]
    lam, a, b, inv = weights["lam"], weights["a"], weights["b"], weights["inv_esum"]
    c0 = vrows[vidx[0]]
    c1 = vrows[vidx[1]]
    c2 = vrows[vidx[2]]
    dax = a[0] + a[1] + a[2]
    day = b[0] + b[1] + b[2]
    out = []
    for k in channels:
        v0, v1, v2 = c0[..., k], c1[..., k], c2[..., k]
        val = v0 * lam[0] + v1 * lam[1] + v2 * lam[2]
        nx = v0 * a[0] + v1 * a[1] + v2 * a[2]
        ny = v0 * b[0] + v1 * b[1] + v2 * b[2]
        out.append((val, (nx - val * dax) * inv, (ny - val * day) * inv))
    return out


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
