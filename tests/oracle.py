"""NumPy oracle rasterizer — slow, float64, per-pixel loop semantics.

This is the executable specification the JAX/Pallas rasterizer is tested
against.  It implements Vulkan's basic polygon rasterization rules
(pixel-center sampling at +0.5, top-left fill rule, LESS_OR_EQUAL depth,
depth clip to [0,1], perspective-correct interpolation) for triangles with
all w > 0 (the oracle does geometric near-clipping by simply skipping
triangles with any w <= 0; tests that exercise w<=0 use the production
rasterizer's clipless path against analytically-known expected coverage).
"""

from __future__ import annotations

import numpy as np


def rasterize_oracle(clip: np.ndarray, tris: np.ndarray, width: int, height: int,
                     cull: str = "back"):
    """clip: f64[V, 4] clip-space positions; tris: i64[T, 3].

    Returns (depth f64[H, W], tri_id i64[H, W] with -1 for empty,
    bary f64[H, W, 3] perspective-correct barycentrics).
    """
    clip = np.asarray(clip, dtype=np.float64)
    depth = np.full((height, width), 1.0)
    tri_id = np.full((height, width), -1, dtype=np.int64)
    bary_out = np.zeros((height, width, 3))

    for t, (i0, i1, i2) in enumerate(np.asarray(tris, dtype=np.int64)):
        v = clip[[i0, i1, i2]]
        if np.any(v[:, 3] <= 1e-9):
            continue  # oracle limitation: no near-plane-crossing triangles
        ndc = v[:, :3] / v[:, 3:4]
        sx = (ndc[:, 0] + 1.0) * 0.5 * width
        sy = (ndc[:, 1] + 1.0) * 0.5 * height
        z = ndc[:, 2]
        inv_w = 1.0 / v[:, 3]

        # shoelace in framebuffer coords; Vulkan area = -1/2 * shoelace,
        # front-facing (FRONT_FACE_COUNTER_CLOCKWISE) iff area > 0
        shoelace = (sx[0] * (sy[1] - sy[2]) + sx[1] * (sy[2] - sy[0])
                    + sx[2] * (sy[0] - sy[1]))
        area = -0.5 * shoelace
        if area == 0.0:
            continue
        front = area > 0
        if cull == "back" and not front:
            continue
        if cull == "front" and front:
            continue

        # edge functions, inside-positive
        sgn = -1.0 if front else 1.0  # make e_i >= 0 inside
        edges = []
        for (a, b) in ((1, 2), (2, 0), (0, 1)):
            A = sy[a] - sy[b]
            B = sx[b] - sx[a]
            C = sx[a] * sy[b] - sx[b] * sy[a]
            edges.append((A * sgn, B * sgn, C * sgn))

        x0 = max(int(np.floor(min(sx))), 0)
        x1 = min(int(np.ceil(max(sx))), width - 1)
        y0 = max(int(np.floor(min(sy))), 0)
        y1 = min(int(np.ceil(max(sy))), height - 1)

        for py in range(y0, y1 + 1):
            for px in range(x0, x1 + 1):
                cx, cy = px + 0.5, py + 0.5
                e = [A * cx + B * cy + C for (A, B, C) in edges]
                ok = True
                for (A, B, C), ev in zip(edges, e):
                    if ev > 0:
                        continue
                    if ev < 0:
                        ok = False
                        break
                    # top-left rule (y-down): top edge has A==0, B>0;
                    # left edge has A>0
                    if not (A > 0 or (A == 0 and B > 0)):
                        ok = False
                        break
                if not ok:
                    continue
                esum = e[0] + e[1] + e[2]
                if esum == 0:
                    continue
                lam_screen = np.array(e) / esum          # screen-space bary
                zi = lam_screen @ z                       # z is screen-linear
                if not (0.0 <= zi <= 1.0):
                    continue
                if zi <= depth[py, px]:
                    depth[py, px] = zi
                    tri_id[py, px] = t
                    # perspective-correct barycentrics
                    pw = lam_screen * inv_w
                    bary_out[py, px] = pw / pw.sum()
    return depth, tri_id, bary_out


def interpolate_oracle(attr: np.ndarray, tris: np.ndarray, tri_id: np.ndarray,
                       bary: np.ndarray) -> np.ndarray:
    """Perspective-correct attribute interpolation from oracle outputs."""
    h, w = tri_id.shape
    out = np.zeros((h, w, attr.shape[1]))
    mask = tri_id >= 0
    ids = tri_id[mask]
    corners = attr[np.asarray(tris)[ids]]        # [N, 3, C]
    out[mask] = np.einsum("nk,nkc->nc", bary[mask], corners)
    return out
