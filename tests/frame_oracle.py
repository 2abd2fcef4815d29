"""Independent full-frame NumPy oracle — float64, loop/vector semantics.

VERDICT r3 Weak #3 / task 4: the golden images are produced by the
renderer itself, and the TPU-vs-XLA parity line only proves backend
parity.  This module is a from-scratch float64 port of the REFERENCE
shading semantics (shaders/mesh_pbr.frag:185-226 + the shadow filter
library :37-156 + tonemap.comp:9-22 + skybox.vert/frag + the fixed
function between them), written against the GLSL/SURVEY spec — NOT
against ops/*.py — so a transcription error in the production shading
path shows up as a frame difference here even if the goldens were
regenerated after the error.

Shared-with-production pieces are limited to STORED REPRESENTATIONS
(the RGBA8 texture heap, 16-bit quantized shadow maps, RGB9E5 cubemap)
and the host-side scene-data math (camera/CSM matrices) — the inputs,
not the per-pixel code under test.

Scope: small frames (the per-pixel Python/NumPy loops are O(H*W*taps)),
well-behaved geometry (no near-plane crossers — tests/oracle.py skips
w <= 0 triangles), one node-level world transform per object.
"""

from __future__ import annotations

import numpy as np

from oracle import rasterize_oracle

PI = 3.14159265359
SHADOW_BIAS = 0.0005
NEAR_PLANE = 0.1
LIGHT_SIZE_UV = 2.0 / 200.0
POISSON_DISK = [
    (-0.94201624, -0.39906216), (0.94558609, -0.76890725),
    (-0.094184101, -0.92938870), (0.34495938, 0.29387760),
    (-0.91588581, 0.45771432), (-0.81544232, -0.87912464),
    (-0.38277543, 0.27676845), (0.97484398, 0.75648379),
    (0.44323325, -0.97511554), (0.53742981, -0.47373420),
    (-0.26496911, -0.41893023), (0.79197514, 0.19090188),
    (-0.24188840, 0.99706507), (-0.81409955, 0.91437590),
    (0.19984126, 0.78641367), (0.14383161, -0.14100790)]


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def _world_and_clip(scene, viewproj):
    """Per-vertex world position and clip position, float64."""
    pos = np.asarray(scene.positions, np.float64)
    ow = np.asarray(scene.obj_world, np.float64)
    vo = np.asarray(scene.vert_obj)
    m = ow[vo]                                       # [V, 4, 4]
    p4 = np.concatenate([pos, np.ones((pos.shape[0], 1))], axis=1)
    world = np.einsum("vij,vj->vi", m, p4)
    clip = world @ np.asarray(viewproj, np.float64).T
    return world[:, :3], clip


def _world_normals(scene):
    nrm = np.asarray(scene.normals, np.float64)
    ow = np.asarray(scene.obj_world, np.float64)
    vo = np.asarray(scene.vert_obj)
    return np.einsum("vij,vj->vi", ow[vo][:, :3, :3], nrm)


def _edge_planes(clip, tri, width, height):
    """Screen-space edge planes of one triangle (float64): returns
    (edges[3] of (A, B, C), z[3] screen-linear NDC depth, inv_w[3]) or
    None for degenerate/culled-by-w triangles."""
    v = clip[tri]
    if np.any(v[:, 3] <= 1e-12):
        return None
    ndc = v[:, :3] / v[:, 3:4]
    sx = (ndc[:, 0] + 1.0) * 0.5 * width
    sy = (ndc[:, 1] + 1.0) * 0.5 * height
    shoelace = (sx[0] * (sy[1] - sy[2]) + sx[1] * (sy[2] - sy[0])
                + sx[2] * (sy[0] - sy[1]))
    area = -0.5 * shoelace
    if area == 0.0:
        return None
    sgn = -1.0 if area > 0 else 1.0
    edges = []
    for (a, b) in ((1, 2), (2, 0), (0, 1)):
        A = (sy[a] - sy[b]) * sgn
        B = (sx[b] - sx[a]) * sgn
        C = (sx[a] * sy[b] - sx[b] * sy[a]) * sgn
        edges.append((A, B, C))
    return edges, ndc[:, 2], 1.0 / v[:, 3], area > 0


def _bary_and_derivs(edges, inv_w, px, py):
    """Perspective-correct barycentrics + their screen derivatives at
    (px, py) arrays: the 2DH identity — e_i scaled by inv_w_i over the
    screen-space edge functions; quotient rule for d/dx, d/dy."""
    e = [A * px + B * py + C for (A, B, C) in edges]
    # perspective weights: numerators n_i = e_i * inv_w_i... equivalently
    # screen bary lam_s = e/sum(e); pw = lam_s*inv_w; bary = pw/sum(pw)
    n = [e[i] * inv_w[i] for i in range(3)]
    den = n[0] + n[1] + n[2]
    den = np.where(den == 0.0, 1.0, den)
    lam = [ni / den for ni in n]
    # derivatives: dn_i/dx = A_i*inv_w_i, etc.
    na = [edges[i][0] * inv_w[i] for i in range(3)]
    nb = [edges[i][1] * inv_w[i] for i in range(3)]
    da = na[0] + na[1] + na[2]
    db = nb[0] + nb[1] + nb[2]
    dlam_dx = [(na[i] - lam[i] * da) / den for i in range(3)]
    dlam_dy = [(nb[i] - lam[i] * db) / den for i in range(3)]
    return lam, dlam_dx, dlam_dy


# ---------------------------------------------------------------------------
# texture sampling (from the production heap REPRESENTATION, independent code)
# ---------------------------------------------------------------------------

def _srgb_to_linear(v):
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def _wrap_oracle(i, n, wmode):
    """Vulkan address modes per texel index (spec 16.3.1):
    0 REPEAT, 1 CLAMP_TO_EDGE, 2 MIRRORED_REPEAT."""
    i = np.asarray(i, np.int64)
    if wmode == 1:
        return np.clip(i, 0, n - 1)
    if wmode == 2:
        m = np.mod(i, 2 * n)
        return np.where(m >= n, 2 * n - 1 - m, m)
    return np.mod(i, n)


def _texel_fetch(tex, tid, level, x, y, wrap_s=0, wrap_t=0):
    """One texel (r, g, b, a) f64 in [0, 1], decoded per-texel (sRGB for
    RGB channels of sRGB textures), wrapped per the sampler's address
    modes (REPEAT default)."""
    off = int(tex.mip_offsets[tid, level])
    w, h = int(tex.mip_sizes[tid, level, 0]), int(tex.mip_sizes[tid, level, 1])
    xi = _wrap_oracle(x, w, wrap_s)
    yi = _wrap_oracle(y, h, wrap_t)
    # quad-interleaved heap: word 4*i is the texel's own value
    word = np.asarray(tex.texels, np.uint32).reshape(-1, 4)[off + yi * w + xi, 0]
    out = []
    srgb = bool(tex.srgb_flags[tid])
    for c in range(4):
        v = ((word >> (8 * c)) & 0xFF).astype(np.float64) / 255.0
        if c < 3 and srgb:
            v = _srgb_to_linear(v)
        out.append(v)
    return out


def _bilinear(tex, tid, level, u, v, mode=0):
    """One filtered fetch at a level: bilinear, or NEAREST when the
    sampler mode's filter bit applies (folded as fx=fy=0 on the nearest
    texel floor(u*w) — no half-texel shift, Vulkan 16.6)."""
    w = float(tex.mip_sizes[tid, level, 0])
    h = float(tex.mip_sizes[tid, level, 1])
    wrap_s = (mode >> 3) & 3
    wrap_t = (mode >> 5) & 3
    nearest = bool(mode & 1)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    if nearest:
        x0, y0 = np.floor(u * w), np.floor(v * h)
        fx = fy = 0.0
    else:
        x = u * w - 0.5
        y = v * h - 0.5
        x0, y0 = np.floor(x), np.floor(y)
        fx, fy = x - x0, y - y0
    t00 = _texel_fetch(tex, tid, level, x0, y0, wrap_s, wrap_t)
    t10 = _texel_fetch(tex, tid, level, x0 + 1, y0, wrap_s, wrap_t)
    t01 = _texel_fetch(tex, tid, level, x0, y0 + 1, wrap_s, wrap_t)
    t11 = _texel_fetch(tex, tid, level, x0 + 1, y0 + 1, wrap_s, wrap_t)
    return [(a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy
            for a, b, c, d in zip(t00, t10, t01, t11)]


def sample_trilinear(tex, tid, u, v, dudx, dvdx, dudy, dvdy):
    """Vulkan sampler in float64: isotropic LOD, trilinear by default;
    honors the per-slot sampler mode bits (TextureTable.sampler_modes —
    mag/min NEAREST, mipmap NEAREST, clamp/mirror wrap) when present."""
    w0 = float(tex.mip_sizes[tid, 0, 0])
    h0 = float(tex.mip_sizes[tid, 0, 1])
    max_level = int(tex.n_mips[tid]) - 1
    smode = (int(tex.sampler_modes[tid])
             if getattr(tex, "sampler_modes", None) is not None else 0)
    rho = np.maximum(np.sqrt((dudx * w0) ** 2 + (dvdx * h0) ** 2),
                     np.sqrt((dudy * w0) ** 2 + (dvdy * h0) ** 2))
    lam = np.clip(np.log2(np.maximum(rho, 1e-12)), 0.0, max_level)
    # filter = magFilter where lambda <= 0, else minFilter
    near_px = np.where(lam <= 0.0, bool(smode & 1), bool(smode & 2))
    if smode & 4:                      # mipmap mode NEAREST
        d = np.clip(np.ceil(lam + 0.5).astype(np.int64) - 1, 0, max_level)
        l0, l1 = d, d
        frac = np.zeros_like(lam)
    else:
        l0 = np.floor(lam).astype(np.int64)
        l1 = np.minimum(l0 + 1, max_level)
        frac = lam - l0
    out = [np.zeros_like(np.asarray(u, np.float64)) for _ in range(4)]
    for lv in np.unique(l0):
        for near in (False, True):
            m = (l0 == lv) & (near_px == near)
            if not m.any():
                continue
            lmode = (smode & ~1) | (1 if near else 0)
            c0 = _bilinear(tex, tid, int(lv), np.asarray(u)[m],
                           np.asarray(v)[m], lmode)
            c1 = _bilinear(tex, tid, int(min(lv + 1, max_level)),
                           np.asarray(u)[m], np.asarray(v)[m], lmode)
            f = frac[m]
            for ch in range(4):
                out[ch][m] = c0[ch] + (c1[ch] - c0[ch]) * f
    return out


# ---------------------------------------------------------------------------
# shadow maps + filter library (mesh_pbr.frag:37-156)
# ---------------------------------------------------------------------------

def render_shadow_maps(scene, light_viewproj, size, n_cascades):
    """Depth-only front-culled raster of ALL triangles per cascade
    (vk_engine_run.cpp:334-382; no alpha test), 16-bit quantized like the
    production pack (a documented storage deviation both sides share)."""
    pos = np.asarray(scene.positions, np.float64)
    ow = np.asarray(scene.obj_world, np.float64)
    vo = np.asarray(scene.vert_obj)
    p4 = np.concatenate([pos, np.ones((pos.shape[0], 1))], axis=1)
    world4 = np.einsum("vij,vj->vi", ow[vo], p4)
    maps = np.ones((n_cascades, size, size), np.float64)
    for c in range(n_cascades):
        clip = world4 @ np.asarray(light_viewproj[c], np.float64).T
        d, _, _ = rasterize_oracle(clip, scene.tris, size, size, cull="front")
        maps[c] = d
    return np.round(np.clip(maps, 0.0, 1.0) * 65535.0) / 65535.0


def _shadow_tap(maps, layer, u, v):
    """Bilinear tap, clamp-to-border white (scalar u, v)."""
    size = maps.shape[-1]
    x = u * size - 0.5
    y = v * size - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def t(xi, yi):
        if xi < 0 or xi >= size or yi < 0 or yi >= size:
            return 1.0
        return maps[layer, yi, xi]

    top = t(x0, y0) * (1 - fx) + t(x0 + 1, y0) * fx
    bot = t(x0, y0 + 1) * (1 - fx) + t(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def shadow_factor(maps, world, view_z, scene_data, mode, rastered_cascades):
    """calcShadow (mesh_pbr.frag:127-156) for ONE pixel."""
    dists = np.asarray(scene_data["cascade_distances"], np.float64)
    n = dists.shape[0]
    layer = n - 1
    for i in range(n - 1, -1, -1):
        if abs(view_z) < dists[i]:
            layer = i
    if mode < 3:
        layer = 0
    m = np.asarray(scene_data["light_viewproj"], np.float64)[layer]
    p = m @ np.array([world[0], world[1], world[2], 1.0])
    su = p[0] * 0.5 + p[3] * 0.5
    sv = p[1] * 0.5 + p[3] * 0.5
    sz = p[2]
    layer = min(layer, rastered_cascades - 1)

    if mode == 0:                                    # Hard
        d = _shadow_tap(maps, layer, su, sv)
        return 1.0 if d + SHADOW_BIAS < sz else 0.0
    if mode == 1:                                    # PCF 3x3
        texel = 1.0 / maps.shape[-1]
        acc = 0.0
        for i in (-1, 0, 1):
            for j in (-1, 0, 1):
                d = _shadow_tap(maps, layer, su + i * texel, sv + j * texel)
                acc += 1.0 if sz - SHADOW_BIAS > d else 0.0
        return acc / 9.0
    # PCSS (modes 2 and 3; 3 differs only in cascade selection)
    search_w = LIGHT_SIZE_UV * (sz - NEAR_PLANE) / sz
    blocker_sum, n_blockers = 0.0, 0
    for (ox, oy) in POISSON_DISK:
        z = _shadow_tap(maps, layer, su + ox * search_w, sv + oy * search_w)
        if z + SHADOW_BIAS < sz:
            blocker_sum += z
            n_blockers += 1
    if n_blockers == 0:
        return 0.0
    zb = blocker_sum / n_blockers
    penumbra = (sz - zb) / zb
    radius = penumbra * LIGHT_SIZE_UV * NEAR_PLANE / sz
    acc = 0.0
    for (ox, oy) in POISSON_DISK:
        d = _shadow_tap(maps, layer, su + ox * radius, sv + oy * radius)
        acc += 1.0 if sz - SHADOW_BIAS > d else 0.0
    return acc / len(POISSON_DISK)


# ---------------------------------------------------------------------------
# cubemap (RGB9E5 representation, independent decode per the EXT spec)
# ---------------------------------------------------------------------------

def _decode_rgb9e5(word):
    e = (word >> 27) & 0x1F
    scale = 2.0 ** (e.astype(np.float64) - 15 - 9)
    return ((word & 0x1FF) * scale, ((word >> 9) & 0x1FF) * scale,
            ((word >> 18) & 0x1FF) * scale)


def sample_cubemap(packed, dx, dy, dz):
    """Vulkan cube-map face selection + per-face clamp-to-edge bilinear
    over the RGB9E5-packed [6, F, F] representation (scalar inputs)."""
    ax, ay, az = abs(dx), abs(dy), abs(dz)
    if ax >= ay and ax >= az:
        face = 0 if dx >= 0 else 1
        ma, sc, tc = ax, (-dz if dx >= 0 else dz), -dy
    elif ay >= az:
        face = 2 if dy >= 0 else 3
        ma, sc, tc = ay, dx, (dz if dy >= 0 else -dz)
    else:
        face = 4 if dz >= 0 else 5
        ma, sc, tc = az, (dx if dz >= 0 else -dx), -dy
    ma = max(ma, 1e-12)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    size = packed.shape[1]
    x = u * size - 0.5
    y = v * size - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def t(xi, yi):
        xi = min(max(xi, 0), size - 1)
        yi = min(max(yi, 0), size - 1)
        return _decode_rgb9e5(np.uint32(packed[face, yi, xi]))

    out = []
    for c in range(3):
        top = t(x0, y0)[c] * (1 - fx) + t(x0 + 1, y0)[c] * fx
        bot = t(x0, y0 + 1)[c] * (1 - fx) + t(x0 + 1, y0 + 1)[c] * fx
        out.append(top * (1 - fy) + bot * fy)
    return out


# ---------------------------------------------------------------------------
# the full frame
# ---------------------------------------------------------------------------

def _shade_pixel(scene, scene_data, tex, tri, lam, dlx, dly, shadow_maps,
                 mode, enable_shadows, rastered_cascades):
    """mesh_pbr.frag main (185-226) for one pixel of triangle ``tri``.
    Returns (r, g, b, albedo_alpha)."""
    tris = np.asarray(scene.tris)
    i0, i1, i2 = tris[tri]
    nrm = _SHADE_CACHE["world_nrm"]
    wp = _SHADE_CACHE["world_pos"]
    uv = np.asarray(scene.uvs, np.float64)
    col = np.asarray(scene.colors, np.float64) if scene.colors is not None \
        else None

    def interp(vals):
        return (vals[i0] * lam[0] + vals[i1] * lam[1] + vals[i2] * lam[2])

    def dinterp(vals, d):
        return (vals[i0] * d[0] + vals[i1] * d[1] + vals[i2] * d[2])

    n = interp(nrm)
    n = n / max(np.linalg.norm(n), 1e-20)
    world = interp(wp)
    u, v = interp(uv[:, 0]), interp(uv[:, 1])
    dudx, dudy = dinterp(uv[:, 0], dlx), dinterp(uv[:, 0], dly)
    dvdx, dvdy = dinterp(uv[:, 1], dlx), dinterp(uv[:, 1], dly)
    vcol = interp(col[:, :3]) if col is not None else np.ones(3)

    mat = int(np.asarray(scene.tri_material)[tri])
    cf = np.asarray(scene.mat_color_factors, np.float64)[mat]
    mrf = np.asarray(scene.mat_metal_rough, np.float64)[mat]
    aid = int(np.asarray(scene.mat_tex_ids)[mat, 0])
    mid = int(np.asarray(scene.mat_tex_ids)[mat, 2])

    at = sample_trilinear(tex, aid, np.array([u]), np.array([v]),
                          np.array([dudx]), np.array([dvdx]),
                          np.array([dudy]), np.array([dvdy]))
    albedo = np.array([cf[0] * at[0][0] * vcol[0],
                       cf[1] * at[1][0] * vcol[1],
                       cf[2] * at[2][0] * vcol[2]])
    alpha = at[3][0]
    mr = sample_trilinear(tex, mid, np.array([u]), np.array([v]),
                          np.array([dudx]), np.array([dvdx]),
                          np.array([dudy]), np.array([dvdy]))
    metallic = mrf[0] * mr[2][0]                     # factor * tex.b
    roughness = mrf[1] * mr[1][0]                    # factor * tex.g

    cam = np.asarray(scene_data["cam_pos"], np.float64)
    vv = cam - world
    vv = vv / max(np.linalg.norm(vv), 1e-20)
    sun = np.asarray(scene_data["sunlight_direction"], np.float64)[:3]
    ll = -sun / max(np.linalg.norm(sun), 1e-20)
    h = vv + ll
    h = h / max(np.linalg.norm(h), 1e-20)

    f0 = 0.04 * (1.0 - metallic) + albedo * metallic
    n_dot_v = max(float(n @ vv), 0.0)
    n_dot_l = max(float(n @ ll), 0.0)
    n_dot_h = max(float(n @ h), 0.0)
    h_dot_v = max(float(h @ vv), 0.0)

    a = roughness * roughness
    a2 = a * a
    den = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    ndf = a2 / (PI * den * den)
    r1 = roughness + 1.0
    k = r1 * r1 / 8.0
    g = (n_dot_v / (n_dot_v * (1.0 - k) + k)) * \
        (n_dot_l / (n_dot_l * (1.0 - k) + k))
    fr = f0 + (1.0 - f0) * np.clip(1.0 - h_dot_v, 0.0, 1.0) ** 5
    kd = (1.0 - fr) * (1.0 - metallic)
    spec = ndf * g * fr / (4.0 * n_dot_v * n_dot_l + 0.0001)
    rad = np.asarray(scene_data["sunlight_color"], np.float64)[:3]
    lo = (kd * albedo / PI + spec) * n_dot_l * rad

    view = np.asarray(scene_data["view"], np.float64)
    view_z = view[2, :3] @ world + view[2, 3]
    if enable_shadows:
        sh = shadow_factor(shadow_maps, world, view_z, scene_data, mode,
                           rastered_cascades)
    else:
        sh = 0.0
    amb = np.asarray(scene_data["ambient_color"], np.float64)[:3]
    out = amb * albedo + lo * (1.0 - sh)
    return out, alpha


_SHADE_CACHE: dict = {}
LAST_DEPTH: np.ndarray | None = None   # final depth buffer of the last frame


def render_frame_oracle(scene, scene_data, settings, width, height,
                        shadow_size=128, enable_shadows=True,
                        rastered_cascades=4, masked_alpha_raster=True):
    """The whole reference frame in NumPy float64 (shadow maps ->
    opaque+masked raster -> PBR shade -> background/skybox -> additive
    transparent -> tonemap).  ``scene``: HOST SceneArrays (pre-device_put
    2-D arrays).  Returns color f32[3, H, W]."""
    from vk_renderer_tpu.scene.types import pack_rgb9e5

    mode = int(scene_data["sunlight_direction"][3])
    shadows_on = enable_shadows and scene_data["sunlight_color"][3] > 0.5

    world_pos, clip = _world_and_clip(scene, scene_data["viewproj"])
    _SHADE_CACHE["world_pos"] = world_pos
    _SHADE_CACHE["world_nrm"] = _world_normals(scene)
    tris = np.asarray(scene.tris)
    n_om = scene.n_opaque + scene.n_masked

    if shadows_on:
        shadow_maps = render_shadow_maps(
            scene, scene_data["light_viewproj"], shadow_size,
            rastered_cascades)
    else:
        shadow_maps = np.ones((4, 4, 4))

    # opaque raster (back-face cull, LEQUAL later-wins submission order)
    depth, tid, _ = rasterize_oracle(clip, tris[:scene.n_opaque],
                                     width, height, cull="back")

    tex = scene.textures

    # masked bucket: forward pipeline semantics — submission order, depth
    # test vs the current buffer, discard on albedo alpha < 0.5
    for t in range(scene.n_opaque, n_om):
        pl = _edge_planes(clip, tris[t], width, height)
        if pl is None:
            continue
        edges, zv, inv_w, front = pl
        if not front:                                 # CULL_BACK
            continue
        v = clip[tris[t]]
        sx = (v[:, 0] / v[:, 3] + 1.0) * 0.5 * width
        sy = (v[:, 1] / v[:, 3] + 1.0) * 0.5 * height
        x0 = max(int(np.floor(sx.min())), 0)
        x1 = min(int(np.ceil(sx.max())), width - 1)
        y0 = max(int(np.floor(sy.min())), 0)
        y1 = min(int(np.ceil(sy.max())), height - 1)
        mat = int(np.asarray(scene.tri_material)[t])
        aid = int(np.asarray(scene.mat_tex_ids)[mat, 0])
        uvs = np.asarray(scene.uvs, np.float64)
        for py in range(y0, y1 + 1):
            for px in range(x0, x1 + 1):
                cx, cy = px + 0.5, py + 0.5
                e = [A * cx + B * cy + C for (A, B, C) in edges]
                ok = True
                for (A, B, C), ev in zip(edges, e):
                    if ev > 0:
                        continue
                    if ev < 0 or not (A > 0 or (A == 0 and B > 0)):
                        ok = False
                        break
                if not ok or sum(e) <= 0:
                    continue
                lam_s = np.array(e) / sum(e)
                z = float(lam_s @ zv)
                if not (0.0 <= z <= 1.0) or z > depth[py, px]:
                    continue
                lam, dlx, dly = _bary_and_derivs(
                    edges, inv_w, np.array([cx]), np.array([cy]))
                lam = [x[0] for x in lam]
                dlx = [x[0] for x in dlx]
                dly = [x[0] for x in dly]
                i0, i1, i2 = tris[t]
                u = float(uvs[i0, 0] * lam[0] + uvs[i1, 0] * lam[1]
                          + uvs[i2, 0] * lam[2])
                vv = float(uvs[i0, 1] * lam[0] + uvs[i1, 1] * lam[1]
                           + uvs[i2, 1] * lam[2])
                dudx = float(uvs[i0, 0] * dlx[0] + uvs[i1, 0] * dlx[1]
                             + uvs[i2, 0] * dlx[2])
                dudy = float(uvs[i0, 0] * dly[0] + uvs[i1, 0] * dly[1]
                             + uvs[i2, 0] * dly[2])
                dvdx = float(uvs[i0, 1] * dlx[0] + uvs[i1, 1] * dlx[1]
                             + uvs[i2, 1] * dlx[2])
                dvdy = float(uvs[i0, 1] * dly[0] + uvs[i1, 1] * dly[1]
                             + uvs[i2, 1] * dly[2])
                at = sample_trilinear(tex, aid, np.array([u]), np.array([vv]),
                                      np.array([dudx]), np.array([dvdx]),
                                      np.array([dudy]), np.array([dvdy]))
                if at[3][0] >= 0.5:
                    depth[py, px] = z
                    tid[py, px] = t

    global LAST_DEPTH
    LAST_DEPTH = depth.copy()

    # shade covered pixels
    color = np.zeros((3, height, width), np.float64)
    planes_cache: dict[int, tuple] = {}
    for py in range(height):
        for px in range(width):
            t = int(tid[py, px])
            if t < 0:
                continue
            if t not in planes_cache:
                planes_cache[t] = _edge_planes(clip, tris[t], width, height)
            edges, zv, inv_w, _ = planes_cache[t]
            lam, dlx, dly = _bary_and_derivs(
                edges, inv_w, np.array([px + 0.5]), np.array([py + 0.5]))
            lam = [float(x[0]) for x in lam]
            dlx = [float(x[0]) for x in dlx]
            dly = [float(x[0]) for x in dly]
            rgb, _ = _shade_pixel(scene, scene_data, tex, t, lam, dlx, dly,
                                  shadow_maps, mode, shadows_on,
                                  rastered_cascades)
            color[:, py, px] = rgb

    # background gradient / clear (vk_engine_run.cpp:246-248)
    for py in range(height):
        blend = (py + 0.5) / height
        bg = (np.asarray(settings["bg_top"], np.float64)[:3] * (1 - blend)
              + np.asarray(settings["bg_bottom"], np.float64)[:3] * blend) \
            * float(settings["enable_background"])
        for px in range(width):
            if tid[py, px] < 0:
                color[:, py, px] = bg

    # skybox at clear depth (skybox.vert pos.xyww trick)
    if scene.cubemap is not None:
        packed = pack_rgb9e5(np.asarray(scene.cubemap, np.float32))
        view = np.asarray(scene_data["view"], np.float64)
        proj = np.asarray(scene_data["proj"], np.float64)
        rot = view[:3, :3]
        for py in range(height):
            for px in range(width):
                if depth[py, px] < 1.0:
                    continue
                ndc_x = (px + 0.5) * 2.0 / width - 1.0
                ndc_y = (py + 0.5) * 2.0 / height - 1.0
                rx = ndc_x / proj[0, 0]
                ry = ndc_y / proj[1, 1]
                d = rot.T @ np.array([rx, ry, -1.0])
                color[:, py, px] = sample_cubemap(packed, d[0], -d[1], d[2])

    # additive transparent (srcAlpha=1 additive; discard < 0.5 applies;
    # depth test LEQUAL vs opaque result, write off)
    for t in range(n_om, tris.shape[0]):
        pl = _edge_planes(clip, tris[t], width, height)
        if pl is None:
            continue
        edges, zv, inv_w, front = pl
        if not front:
            continue
        v = clip[tris[t]]
        sx = (v[:, 0] / v[:, 3] + 1.0) * 0.5 * width
        sy = (v[:, 1] / v[:, 3] + 1.0) * 0.5 * height
        x0 = max(int(np.floor(sx.min())), 0)
        x1 = min(int(np.ceil(sx.max())), width - 1)
        y0 = max(int(np.floor(sy.min())), 0)
        y1 = min(int(np.ceil(sy.max())), height - 1)
        for py in range(y0, y1 + 1):
            for px in range(x0, x1 + 1):
                cx, cy = px + 0.5, py + 0.5
                e = [A * cx + B * cy + C for (A, B, C) in edges]
                ok = True
                for (A, B, C), ev in zip(edges, e):
                    if ev > 0:
                        continue
                    if ev < 0 or not (A > 0 or (A == 0 and B > 0)):
                        ok = False
                        break
                if not ok or sum(e) <= 0:
                    continue
                lam_s = np.array(e) / sum(e)
                z = float(lam_s @ zv)
                if not (0.0 <= z <= 1.0) or z > depth[py, px]:
                    continue
                lam, dlx, dly = _bary_and_derivs(
                    edges, inv_w, np.array([cx]), np.array([cy]))
                lam = [float(x[0]) for x in lam]
                dlx = [float(x[0]) for x in dlx]
                dly = [float(x[0]) for x in dly]
                rgb, alpha = _shade_pixel(scene, scene_data, tex, t, lam,
                                          dlx, dly, shadow_maps, mode,
                                          shadows_on, rastered_cascades)
                if alpha >= 0.5:
                    color[:, py, px] += rgb

    # tonemap (Reinhard + gamma 2.2, tonemap.comp:9-22)
    if float(settings["enable_postprocess"]) > 0.5:
        color = (color / (color + 1.0)) ** (1.0 / 2.2)
    return color.astype(np.float32)
