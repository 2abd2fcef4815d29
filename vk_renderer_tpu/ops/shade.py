"""Fragment shading: Cook-Torrance PBR, flat shading, shadow filter library.

Exact ports of the reference GLSL:
- shaders/mesh_pbr.frag:159-226 — GGX distribution, Schlick-GGX geometry
  (k=(r+1)^2/8), Schlick Fresnel, F0=mix(0.04, albedo, metallic),
  kD scaled by (1-metallic), out = ambient*albedo + Lo*(1-shadow).
- shaders/mesh.frag:124-182  — Lambert diffuse + ambient variant
  (BASELINE config 2 "flat" shading).
- shaders/mesh_pbr.frag:37-156 — shadow filters: Hard 1-tap, PCF 3x3,
  PCSS (16-tap Poisson blocker search + 16-tap Poisson PCF), CSM =
  cascade-select + PCSS.  Bias 5e-4, biasMat NDC->UV remap.

All per-pixel math is PLANAR — separate [H, W] arrays per component (see
ops/texture.py for the layout rationale: [H, W, 3]-style arrays are ~1000x
slower on TPU).  The G-buffer is a dict of planar arrays:
  nx ny nz | cr cg cb (vertex color) | u v dudx dvdx dudy dvdy |
  wx wy wz (world pos) | view_z | mat_id | covered
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import texture as tex

PI = 3.14159265359
SHADOW_BIAS = 0.0005                 # mesh_pbr.frag:38
NUM_SAMPLES_BLOCKER_SEARCH = 16
NUM_SAMPLES_PCF = 16
NEAR_PLANE = 0.1                     # mesh_pbr.frag:63
LIGHT_WORLD_SIZE = 2.0
LIGHT_FRUSTUM_WIDTH = 200.0
LIGHT_SIZE_UV = LIGHT_WORLD_SIZE / LIGHT_FRUSTUM_WIDTH

# mesh_pbr.frag:68-85, verbatim
POISSON_DISK = [
    (-0.94201624, -0.39906216), (0.94558609, -0.76890725),
    (-0.094184101, -0.92938870), (0.34495938, 0.29387760),
    (-0.91588581, 0.45771432), (-0.81544232, -0.87912464),
    (-0.38277543, 0.27676845), (0.97484398, 0.75648379),
    (0.44323325, -0.97511554), (0.53742981, -0.47373420),
    (-0.26496911, -0.41893023), (0.79197514, 0.19090188),
    (-0.24188840, 0.99706507), (-0.81409955, 0.91437590),
    (0.19984126, 0.78641367), (0.14383161, -0.14100790)]

# smallest |offset| in the disk (the (0.144, -0.141) entry, ~0.2014):
# the blocked-certainty proof only needs ONE search tap's neighborhood to
# be provably a blocker, and this tap has the tightest footprint
_POISSON_MIN_MAG = min((x * x + y * y) ** 0.5 for x, y in POISSON_DISK)


# ----------------------------------------------------------------------------
# shadow filter library (planar: coordinates as (su, sv, sz) [H, W] arrays)
# ----------------------------------------------------------------------------

def _shadow_hard(shadow_maps, su, sv, sz, layer):
    """compute_shadow (mesh_pbr.frag:39-46): 1 tap."""
    depth = tex.sample_shadow(shadow_maps, su, sv, layer)
    return jnp.where(depth + SHADOW_BIAS < sz, 1.0, 0.0)


def _tap(shadow_maps, u, v, layer):
    """One bilinear tap as its own [1, H, W] gather call: PER-TAP gathers
    run ~17% faster than one [K, H, W] batched gather on TPU (large-batch
    gathers degrade ~2-3x per index vs the 2M-index rate; honest
    micro-bench 2026-08-17), and the result is bit-identical."""
    return tex.sample_shadow_batch(shadow_maps, u[None], v[None], layer)[0]


def _shadow_pcf(shadow_maps, su, sv, sz, layer):
    """PCF 3x3 (mesh_pbr.frag:48-59), one gather per tap."""
    texel = 1.0 / tex.shadow_map_size(shadow_maps)
    acc = jnp.zeros_like(sz)
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            d = _tap(shadow_maps, su + i * texel, sv + j * texel, layer)
            acc = acc + jnp.where(sz - SHADOW_BIAS > d, 1.0, 0.0)
    return acc / 9.0


def _shadow_pcss(shadow_maps, su, sv, sz, layer):
    """PCSS (mesh_pbr.frag:87-121), one gather per Poisson tap."""
    search_w = LIGHT_SIZE_UV * (sz - NEAR_PLANE) / sz
    disk = POISSON_DISK[:NUM_SAMPLES_BLOCKER_SEARCH]
    blocker_sum = jnp.zeros_like(sz)
    n_blockers = jnp.zeros_like(sz)
    for (px, py) in disk:
        z = _tap(shadow_maps, su + px * search_w, sv + py * search_w, layer)
        hit = z + SHADOW_BIAS < sz
        blocker_sum = blocker_sum + jnp.where(hit, z, 0.0)
        n_blockers = n_blockers + hit.astype(jnp.float32)
    z_blocker = jnp.where(n_blockers > 0,
                          blocker_sum / jnp.maximum(n_blockers, 1), -1.0)

    penumbra = (sz - z_blocker) / z_blocker
    radius = penumbra * LIGHT_SIZE_UV * NEAR_PLANE / sz
    acc = jnp.zeros_like(sz)
    for (px, py) in POISSON_DISK[:NUM_SAMPLES_PCF]:
        d = _tap(shadow_maps, su + px * radius, sv + py * radius, layer)
        acc = acc + jnp.where(sz - SHADOW_BIAS > d, 1.0, 0.0)
    pcf = acc / NUM_SAMPLES_PCF
    return jnp.where(z_blocker < 0, 0.0, pcf)


def shadow_coords(wx, wy, wz, view_z, scene_data, shadow_mode):
    """The coordinate half of calcShadow (mesh_pbr.frag:127-141): cascade
    selection + shadowCoord = biasMat @ lightViewproj[layer] @ fragWorld.
    Pure elementwise math (no gathers); returns planar (su, sv, sz, layer).
    ``shadow_mode`` may be a Python int or a traced scalar."""
    static_mode = isinstance(shadow_mode, int)

    # cascade selection: first i with |viewZ| < cascadeDistances[i]
    view_depth = jnp.abs(view_z)
    dists = scene_data["cascade_distances"]
    n = dists.shape[0]
    layer = jnp.full(view_depth.shape, n - 1, jnp.int32)
    for i in range(n - 1, -1, -1):
        layer = jnp.where(view_depth < dists[i], i, layer)
    if static_mode:
        if shadow_mode < 3:
            layer = jnp.zeros_like(layer)
    else:
        layer = jnp.where(shadow_mode >= 3, layer, 0)

    # per-cascade coords with CONSTANT matrices then selected by layer
    # (tiny-table matrix gathers are pathologically slow on TPU)
    lvps = scene_data["light_viewproj"]                  # [4, 4, 4]

    def coord_for(m):
        def row(r):
            return wx * m[r, 0] + wy * m[r, 1] + wz * m[r, 2] + m[r, 3]
        x, y, z, w = row(0), row(1), row(2), row(3)
        return x * 0.5 + w * 0.5, y * 0.5 + w * 0.5, z

    su, sv, sz = coord_for(lvps[0])
    if (not static_mode) or shadow_mode >= 3:
        for i in range(1, lvps.shape[0]):
            ui, vi, zi = coord_for(lvps[i])
            sel = layer == i
            su = jnp.where(sel, ui, su)
            sv = jnp.where(sel, vi, sv)
            sz = jnp.where(sel, zi, sz)
    return su, sv, sz, layer


def _filter_dispatch(shadow_maps, su, sv, sz, layer, shadow_mode):
    """Run the selected shadow filter (Hard/PCF/PCSS; CSM differs from
    PCSS only in the cascade selection done by shadow_coords).  Layer is
    clamped to the rastered cascade count, so a single-cascade config
    (FrameConfig.shadow_cascades=1, modes < 3) never indexes layers that
    were not rendered."""
    layer = jnp.minimum(layer, tex.shadow_layer_count(shadow_maps) - 1)
    if isinstance(shadow_mode, int):
        if shadow_mode == 0:
            return _shadow_hard(shadow_maps, su, sv, sz, layer)
        if shadow_mode == 1:
            return _shadow_pcf(shadow_maps, su, sv, sz, layer)
        return _shadow_pcss(shadow_maps, su, sv, sz, layer)  # PCSS and CSM
    idx = jnp.clip(jnp.asarray(shadow_mode).astype(jnp.int32), 0, 2)
    return jax.lax.switch(
        idx,
        [lambda a: _shadow_hard(*a), lambda a: _shadow_pcf(*a),
         lambda a: _shadow_pcss(*a)],
        (shadow_maps, su, sv, sz, layer))


def compute_shadow_factor(shadow_maps, wx, wy, wz, view_z, scene_data,
                          shadow_mode, enable_shadows):
    """calcShadow (mesh_pbr.frag:127-156).  World position and view-space z
    arrive planar.

    ``shadow_mode``/``enable_shadows`` may be Python statics (tests, the
    profiler's per-mode stages) or traced scalars (the frame graph passes
    the reference's own UBO flag channels — sunlightDirection.w carries the
    mode and sunlightColor.w the enable bit, scenedata.py:132-135 — so the
    viewer's ImGui-equivalent toggles never recompile, VERDICT r1 #8)."""
    if enable_shadows is False:      # statically compiled out
        return jnp.zeros_like(view_z)
    su, sv, sz, layer = shadow_coords(wx, wy, wz, view_z, scene_data,
                                      shadow_mode)
    factor = _filter_dispatch(shadow_maps, su, sv, sz, layer, shadow_mode)
    if isinstance(enable_shadows, bool):   # statically always-on
        return factor
    return factor * jnp.asarray(enable_shadows).astype(jnp.float32)


# ----------------------------------------------------------------------------
# penumbra-classified sparse shadow filtering
# ----------------------------------------------------------------------------

# fp-safety margin for the certain-lit / certain-blocked predicates: the
# bilinear lerp and the 16-tap blocker mean can land a few ulp outside the
# window's true [min, max]; 1e-5 dominates that error (depths <= 1, so
# ~10 ulp ~ 1e-6) while staying below the 5e-4 compare bias and within a
# quantization step (1.5e-5), so certainty claims stay rigorous.
_CLASSIFY_EPS = 1e-5
_CLASSIFY_PAD = 4.0    # texels: bilinear footprint (1.5) + fp slack
# receiver-quad proof position slack (texels): the filter's tap position
# (su + p*radius)*s - 0.5 and the classifier's cell fraction start from
# the SAME su, so only the f32 rounding of the radius product and the two
# scale/offset ops separates them — < 5e-4 texels at a 4096 map
# (ulp(su) * s ~ 1.2e-4 + ulp of the final subtract).  0.01 texels is
# ~20x that while excluding only a 2% containment sliver per axis.
_QUAD_POS_EPS = 0.01


def _window_minmax(table, cx, cy, hw, layer, map_size: int):
    """Conservative min/max over the 2x2-cell window covering
    [cx-hw, cx+hw] x [cy-hw, cy+hw] (texel-index space) of a min|max<<16
    cell table (texture.build_shadow_coarse output — CoarseRows quad rows
    or the plain [L, sb, sb] test form).  Returns
    (mn, mx, fits, g0x, g0y, block): ``fits`` is False where the window
    spans more than 2 cells per axis (the values are then meaningless and
    the caller must leave the pixel uncertain)."""
    from . import texture as _tex
    quad = isinstance(table, _tex.CoarseRows)
    sb = table.cells if quad else table.shape[-1]
    n_layers = table.layers if quad else table.shape[0]
    block = map_size // sb
    layer = jnp.minimum(layer, n_layers - 1)
    bx0 = jnp.floor((cx - hw) / block)
    bx1 = jnp.floor((cx + hw) / block)
    by0 = jnp.floor((cy - hw) / block)
    by1 = jnp.floor((cy + hw) / block)
    fits = (bx1 <= bx0 + 1) & (by1 <= by0 + 1)
    g0x = jnp.clip(bx0, 0, sb - 1).astype(jnp.int32)
    g0y = jnp.clip(by0, 0, sb - 1).astype(jnp.int32)
    if quad:
        # the full 2x2 cell window in ONE row-4 gather (clamped-edge
        # neighbors are prebuilt — texture.make_coarse_rows)
        r = table.rows[(layer * sb + g0y) * sb + g0x]
        w00, w10, w01, w11 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    else:
        g1y = jnp.minimum(g0y + 1, sb - 1)
        flat = table.reshape(-1)
        base = layer * (sb * sb)
        # x-adjacent cells ride take2 consecutive-pair fetches; the
        # g0x == sb-1 border pair would cross into the next row, so clip
        # it back to the edge cell (same value the quad form prebuilds)
        from .gatherutil import take2
        edge_x = g0x == sb - 1
        w00, w10 = take2(flat, base + g0y * sb + g0x)
        w10 = jnp.where(edge_x, w00, w10)
        w01, w11 = take2(flat, base + g1y * sb + g0x)
        w11 = jnp.where(edge_x, w01, w11)
    inv_q = jnp.float32(1.0 / _tex.SHADOW_Q)
    mn = jnp.minimum(jnp.minimum(w00 & 0xFFFF, w10 & 0xFFFF),
                     jnp.minimum(w01 & 0xFFFF, w11 & 0xFFFF)
                     ).astype(jnp.float32) * inv_q
    mx = jnp.maximum(
        jnp.maximum((w00 >> 16) & 0xFFFF, (w10 >> 16) & 0xFFFF),
        jnp.maximum((w01 >> 16) & 0xFFFF, (w11 >> 16) & 0xFFFF)
    ).astype(jnp.float32) * inv_q
    return mn, mx, fits, g0x, g0y, block


def _classify_shadow(shadow_coarse, su, sv, sz, layer, map_size: int,
                     shadow_mode, return_parts: bool = False,
                     shadow_rows=None, shadow_fine=None):
    """Conservative per-pixel classification against the coarse min/max
    map (texture.build_shadow_coarse).  Returns (lit_c, blk_c) where
    lit_c  => the mode's filter returns exactly 0.0 (fully lit)
    blk_c  => the mode's filter returns exactly 1.0 (fully blocked)
    for EVERY filter mode the window covers (the window is the union of
    all modes' tap footprints when ``shadow_mode`` is traced; a static
    Hard/PCF mode narrows it).  Anything not provable is left uncertain
    (both False) — including windows too wide for the gathered 2x2 coarse
    blocks, NaN/degenerate coords, and off-map windows' border texels
    (border depth 1.0 is folded into the min/max exactly like the
    clamp-to-border-white sampler).

    Certainty argument: every bilinear tap value is a convex combination
    of texels inside the window (plus the 1.0 border), hence within
    [min_w, max_w] up to a few ulp (absorbed by _CLASSIFY_EPS).  If even
    the window max is a blocker, every blocker-search tap is a blocker and
    the PCSS penumbra radius is bounded by the radius at the window min —
    checked to also fit the gathered region — so all 16 PCF taps are
    blockers too: factor is exactly 1.  If even the window min is not a
    blocker, no tap of any mode contributes: factor is exactly 0.

    RECEIVER-QUAD second stage (``shadow_rows``, the full-resolution
    maps — one row-8 ShadowRows gather per pixel): the reference's CSM
    light matrix omits the Vulkan y-flip (vk_engine_run.cpp:541 vs
    :488), so its FRONT culling keeps the light-FACING faces — lit
    receivers are IN the cascade maps with their own sloped depth
    gradient, and the window-min lit proof above can never hold on them
    (the window min is the receiver's own down-slope depth; a min/max
    table at ANY cell granularity dilates the window by whole cells and
    fails on gently sloped floors, the dominant receiver class).  The
    fix reads the receiver's OWN 2x2 texel quad: any blocker the search
    finds has z >= coarse window min, which bounds the PCSS penumbra
    radius; when that radius (in texels, + position slack) fits inside
    the tap center's bilinear cell margins, every PCF tap interpolates
    exactly this quad — if even its min is no blocker, no tap passes
    the compare and the factor is exactly 0, whether or not the blocker
    search 'hit' the receiver's own surface.  No cell-granularity
    dilation: the probe IS the filter's footprint.

    FINE-WINDOW third stage (``shadow_fine``, a 4x-finer min/max table —
    texture.fine_block_for): the coarse table's window must cover the
    blocker SEARCH (~2*20 texels), forcing 64-texel cells whose +-2-cell
    dilation smears every shadow boundary into a ~256-texel uncertain
    strip.  But the lit/blocked question itself only needs the TAP
    footprint: the PCF disk's bounded radius plus — for the blocked
    proof's z_blocker >= 0 requirement — the SMALLEST blocker-search tap
    (|offset| >= 0.201 * search_w: if even that tap's neighborhood max
    is a blocker, the search finds a blocker and pcf == 1 means factor
    is exactly 1).  That window is <= ~8 texels, so 16-texel fine cells
    cover it with 4x less dilation — the fine min/max over it proves
    lit (min is no blocker -> no tap passes) and blocked (max is a
    blocker -> every PCF tap passes AND the min-magnitude search tap
    hits) right up close to the true penumbra."""
    s = jnp.float32(map_size)
    cx = su * s                      # window center, texel-index space
    cy = sv * s
    static_mode = isinstance(shadow_mode, int)

    # union tap half-width (texels), before the bilinear-footprint pad:
    # Hard: 0, PCF: 1 texel, PCSS/CSM: the blocker-search Poisson radius
    search_w = LIGHT_SIZE_UV * (sz - NEAR_PLANE) / sz
    if static_mode and shadow_mode == 0:
        hw_taps = jnp.zeros_like(sz)
    elif static_mode and shadow_mode == 1:
        hw_taps = jnp.ones_like(sz)
    else:
        hw_taps = jnp.maximum(jnp.abs(search_w) * s, 1.0)
    hw_lit = hw_taps + _CLASSIFY_PAD

    mn_g, mx_g, fits, g0x, g0y, block = _window_minmax(
        shadow_coarse, cx, cy, hw_lit, layer, map_size)
    sb = map_size // block

    def touches_border(hw):
        return ((cx - hw < 0.0) | (cx + hw > s - 1.0)
                | (cy - hw < 0.0) | (cy + hw > s - 1.0))

    def quad_lit(m_tex):
        # receiver-quad lit proof: when every tap of the mode lies within
        # ``m_tex`` texels of the center AND the center's bilinear-cell
        # margins exceed m_tex, every tap interpolates the SAME 2x2 texel
        # quad (convexity, off-map corners = border 1.0 which never
        # passes) — if even the quad min is no blocker, no tap passes
        # sz - bias > d: factor exactly 0.  One row-8 gather.
        lc = jnp.minimum(layer, tex.shadow_layer_count(shadow_rows) - 1)
        t00, t10, t01, t11 = tex.shadow_tap_corners(shadow_rows, su, sv, lc)
        qmin = jnp.minimum(jnp.minimum(t00, t10), jnp.minimum(t01, t11))
        fx = (cx - 0.5) - jnp.floor(cx - 0.5)
        fy = (cy - 0.5) - jnp.floor(cy - 0.5)
        contained = ((fx >= m_tex) & (fx <= 1.0 - m_tex)
                     & (fy >= m_tex) & (fy <= 1.0 - m_tex))
        return contained & ~(sz - SHADOW_BIAS > qmin - _CLASSIFY_EPS)

    # certain-lit over the lit window (border texels are depth 1.0)
    mn_eff = jnp.where(touches_border(hw_lit), jnp.minimum(mn_g, 1.0), mn_g)
    mn_m = mn_eff - _CLASSIFY_EPS
    lit_c = fits & ~(mn_m + SHADOW_BIAS < sz) & ~(sz - SHADOW_BIAS > mn_m)

    def fine_minmax(hw):
        # fine-window lit/blocked bounds over the TAP footprint (window
        # fits 2x2 fine cells whenever hw <= cell size; unfavorable
        # alignment or a huge radius just leaves the pixel uncertain)
        mn_f, mx_f, fits_f, _, _, _ = _window_minmax(
            shadow_fine, cx, cy, hw, layer, map_size)
        bl = touches_border(hw)
        mn_fe = jnp.where(bl, jnp.minimum(mn_f, 1.0), mn_f) - _CLASSIFY_EPS
        mx_fe = jnp.where(bl, jnp.maximum(mx_f, 1.0), mx_f) + _CLASSIFY_EPS
        f_lit = fits_f & ~(sz - SHADOW_BIAS > mn_fe)
        f_blk = fits_f & (mx_fe + SHADOW_BIAS < sz) & (sz - SHADOW_BIAS > mx_fe)
        return f_lit, f_blk

    if static_mode and shadow_mode < 2:
        # Hard's single tap is AT the quad center (containment trivial,
        # m = 0); PCF's 3x3 taps exceed one quad — no quad proof there
        if shadow_rows is not None and shadow_mode == 0:
            lit_c = lit_c | quad_lit(jnp.float32(0.0))
        # Hard/PCF taps all lie in the lit window: blocked-certainty needs
        # no penumbra-radius bound
        mx_eff = jnp.where(touches_border(hw_lit), jnp.maximum(mx_g, 1.0),
                           mx_g)
        mx_m = mx_eff + _CLASSIFY_EPS
        blk_c = fits & (mx_m + SHADOW_BIAS < sz) & (sz - SHADOW_BIAS > mx_m)
        if shadow_fine is not None:
            # fixed tap positions: the fine window over hw_lit bounds
            # every tap with 4x less cell dilation than the coarse one
            f_lit, f_blk = fine_minmax(hw_lit)
            lit_c = lit_c | f_lit
            blk_c = blk_c | f_blk
        if return_parts:
            return lit_c, blk_c & ~lit_c, {
                "fits": fits, "in_region": fits, "mn": mn_eff, "mx": mx_eff,
                "lit_depth_ok": ~(mn_m + SHADOW_BIAS < sz),
                "blk_depth_ok": (mx_m + SHADOW_BIAS < sz),
                "hw_lit": hw_lit, "hw_blk": hw_lit,
                "border_lit": touches_border(hw_lit)}
        return lit_c, blk_c & ~lit_c

    # worst-case PCSS PCF radius: every blocker-search hit has
    # z >= mn_eff (off-map taps are 1.0 and never hit), so the penumbra
    # is bounded by the value at the smallest possible mean blocker depth
    zb_min = jnp.maximum(mn_m, 1e-6)
    penumbra_bound = (sz - zb_min) / zb_min
    radius_bound = penumbra_bound * LIGHT_SIZE_UV * NEAR_PLANE / sz

    rb_tex = jnp.maximum(radius_bound, 0.0) * s
    if shadow_rows is not None:
        # receiver-quad lit proof (docstring): all PCF taps within the
        # bounded radius interpolate the center quad when that radius
        # (+ fp position slack) fits the bilinear-cell margins.  The
        # radius bound relies on the coarse min covering the blocker
        # search, hence `fits`; a NaN/degenerate radius (sz <= 0)
        # falls out via `contained`.  For a traced runtime mode of 0 the
        # bound is unnecessary but still sound (m only shrinks coverage);
        # runtime mode 1 (PCF 3x3) exceeds one quad — masked out.
        m_eff = rb_tex + _QUAD_POS_EPS
        if static_mode:
            lit_c = lit_c | (fits & quad_lit(m_eff))
        else:
            mode_t = jnp.asarray(shadow_mode)
            valid = jnp.where(mode_t >= 2, fits, mode_t < 1)
            lit_c = lit_c | (valid & quad_lit(m_eff))

    if shadow_fine is not None:
        # fine-window proofs over the TAP footprint (docstring stage 3):
        # hw covers the PCF disk's bounded radius (+ the fixed Hard/PCF
        # reach for traced modes) and, for the blocked side's
        # z_blocker >= 0 requirement, the smallest blocker-search tap.
        # Valid wherever the radius bound itself is (coarse window fits);
        # traced runtime modes < 2 need no radius, so only >= 2 gates on
        # `fits`.  One fine gather serves both sides (lit over the
        # larger window is just more conservative).
        union1 = 0.0 if static_mode else 1.0
        hw_pcf = jnp.maximum(rb_tex, union1) + _CLASSIFY_PAD
        hw_f = jnp.maximum(hw_pcf,
                           _POISSON_MIN_MAG * jnp.abs(search_w) * s
                           + _CLASSIFY_PAD)
        f_lit, f_blk = fine_minmax(hw_f)
        if static_mode:
            valid_f = fits
        else:
            mode_tf = jnp.asarray(shadow_mode)
            valid_f = jnp.where(mode_tf >= 2, fits, True)
        lit_c = lit_c | (valid_f & f_lit)
        blk_fine = valid_f & f_blk
    else:
        blk_fine = False

    # certain-blocked additionally needs the PCSS PCF disk: its radius at
    # the worst (smallest) possible blocker depth must fit the gathered
    # 2x2 region [g?x*B, (g?x+2)*B) x [g?y*B, (g?y+2)*B)
    hw_blk = jnp.maximum(hw_lit, jnp.abs(radius_bound) * s + _CLASSIFY_PAD)
    bxl = jnp.floor((cx - hw_blk) / block)
    bxh = jnp.floor((cx + hw_blk) / block)
    byl = jnp.floor((cy - hw_blk) / block)
    byh = jnp.floor((cy + hw_blk) / block)
    in_region = ((jnp.maximum(bxl, 0) >= g0x) & (jnp.minimum(bxh, sb - 1) <= g0x + 1)
                 & (jnp.maximum(byl, 0) >= g0y) & (jnp.minimum(byh, sb - 1) <= g0y + 1))
    mx_eff = jnp.where(touches_border(hw_blk), jnp.maximum(mx_g, 1.0), mx_g)
    mx_m = mx_eff + _CLASSIFY_EPS
    blk_c = (fits & in_region
             & (mx_m + SHADOW_BIAS < sz) & (sz - SHADOW_BIAS > mx_m))
    blk_c = blk_c | blk_fine
    if return_parts:
        return lit_c, blk_c & ~lit_c, {
            "fits": fits, "in_region": in_region,
            "mn": mn_eff, "mx": mx_eff,
            "lit_depth_ok": ~(mn_m + SHADOW_BIAS < sz),
            "blk_depth_ok": (mx_m + SHADOW_BIAS < sz),
            "hw_lit": hw_lit, "hw_blk": hw_blk,
            "border_lit": touches_border(hw_lit)}
    return lit_c, blk_c & ~lit_c


def classified_shadow_factor(shadow_maps, shadow_coarse, gbuf, scene_data,
                             shadow_mode, enable_shadows, n_dot_l, cap: int,
                             quad_lit: bool = True, shadow_fine=None):
    """Penumbra-classified sparse shadow factor — exact, at a fraction of
    the dense filter's gather cost.  Three tiers:
      1. classify every active pixel (covered, sun-facing, shadows on)
         with 4 coarse fetches: definitely-lit -> 0, definitely-blocked
         -> 1 (see _classify_shadow for why these are exact);
      2. compact the uncertain band (typically the penumbra + frustum
         edges, a few % of the frame) to ``cap`` slots;
      3. run the full filter (Hard/PCF/PCSS per mode) on the compact list
         and scatter back.
    Uncertain pixels beyond ``cap`` are COUNTED in the returned overflow
    (their factor falls back to 0 = lit), never silent.

    The active-pixel restriction is exact for the final image: the factor
    only scales Lo * n_dot_l (mesh_pbr.frag:225), which is zero wherever
    n_dot_l == 0, and uncovered pixels are overwritten by background or
    skybox.

    EXACT FOR EVERY CAMERA, TIERED BY THE LIVE BAND: compact-list gather
    cost is CAP-proportional (pad slots gather like real pixels), and the
    honest uncertain band spans two orders of magnitude across scenes —
    ~1% of the frame on hard-shadow views vs ~20%+ on soft-penumbra
    scenes (the Sponza replica's PCSS floor).  A single cap either
    over-pays the easy case or dense-falls-back on the hard one (measured:
    the flat w*h/8 cap made the replica run the FULL dense PCSS, ~1.3 s
    at 1080p).  The live count picks the smallest sufficient tier from a
    lax.cond ladder (cap/8, cap/2, cap); beyond the top tier the dense
    filter runs — slower, never wrong.  The returned scalar counts the
    uncertain pixels beyond the top cap (0 on the sparse paths); a
    cap-sizing signal, not a deviation."""
    from .common import compact_mask
    if enable_shadows is False:
        return jnp.zeros_like(n_dot_l), jnp.int32(0)
    su, sv, sz, layer = shadow_coords(gbuf["wx"], gbuf["wy"], gbuf["wz"],
                                      gbuf["view_z"], scene_data, shadow_mode)
    active = gbuf["covered"] & (n_dot_l > 0.0)
    if not isinstance(enable_shadows, bool):
        active = active & (jnp.asarray(enable_shadows) > 0.5)
    lit_c, blk_c = _classify_shadow(
        shadow_coarse, su, sv, sz, layer, tex.shadow_map_size(shadow_maps),
        shadow_mode, shadow_rows=shadow_maps if quad_lit else None,
        shadow_fine=shadow_fine)
    uncertain = active & ~lit_c & ~blk_c
    base = jnp.where(active & blk_c, 1.0, 0.0)
    n = n_dot_l.size

    def sparse_path(args, tier_cap):
        su, sv, sz, layer, uncertain, base = args
        sel, _ = compact_mask(uncertain, tier_cap)
        selc = jnp.maximum(sel, 0)

        def g(a):
            return jnp.take(a.reshape(-1), selc)

        f_u = _filter_dispatch(shadow_maps, g(su), g(sv), g(sz), g(layer),
                               shadow_mode)
        tgt = jnp.where(sel >= 0, sel, n)
        return base.reshape(-1).at[tgt].set(f_u, mode="drop").reshape(
            n_dot_l.shape)

    def dense_path(args):
        su, sv, sz, layer, uncertain, base = args
        f = _filter_dispatch(shadow_maps, su, sv, sz, layer, shadow_mode)
        return jnp.where(uncertain, f, base)

    n_unc = jnp.sum(uncertain.astype(jnp.int32))
    # the 3/4 rung matters on soft-penumbra scenes: the replica bench
    # camera's honest band is ~36% of the frame (745k px at 1080p) —
    # past cap/2 but well under cap, so without it the filter pays the
    # full top-tier slot count (measured −25% filter work there)
    tiers = sorted({min(cap, max(8192, cap // 8)),
                    min(cap, max(8192, cap // 2)),
                    min(cap, max(8192, (3 * cap) // 4)), cap})
    args = (su, sv, sz, layer, uncertain, base)

    def build(i):
        if i == len(tiers):
            return dense_path
        return lambda a: jax.lax.cond(
            n_unc <= tiers[i],
            lambda b: sparse_path(b, tiers[i]), build(i + 1), a)

    shadow = build(0)(args)
    return shadow, jnp.maximum(n_unc - cap, 0)


# ----------------------------------------------------------------------------
# BRDF helpers (planar scalars)
# ----------------------------------------------------------------------------

def _distribution_ggx(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _geometry_schlick_ggx(n_dot_v, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def _fresnel_schlick(cos_theta, f0):
    p = jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)
    return f0 + (1.0 - f0) * p


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-40))
    return x * inv, y * inv, z * inv


def _mat_take(table, col, idx):
    return jnp.take(table[:, col], idx)


def _sparse_shadow_factor(shadow_maps, gbuf, scene_data, shadow_mode,
                          enable_shadows, n_dot_l, cap: int):
    """Shadow factor restricted to the pixels where it can matter:
    the factor only scales the direct term (Lo * n_dot_l), so pixels with
    n_dot_l == 0 or no coverage are EXACTLY unaffected — compact those
    out, run the (gather-heavy) filter on the short list, scatter back.
    Active pixels beyond ``cap`` are counted in the returned overflow
    (their factor falls back to 0 = lit)."""
    from .common import compact_mask
    if enable_shadows is False:
        return jnp.zeros_like(n_dot_l), jnp.int32(0)
    mask = gbuf["covered"] & (n_dot_l > 0.0)
    sel, ovf = compact_mask(mask, cap)
    selc = jnp.maximum(sel, 0)

    def g(name):
        return jnp.take(gbuf[name].reshape(-1), selc)

    f_s = compute_shadow_factor(shadow_maps, g("wx"), g("wy"), g("wz"),
                                g("view_z"), scene_data, shadow_mode,
                                enable_shadows)
    n = n_dot_l.size
    tgt = jnp.where(sel >= 0, sel, n)
    shadow = jnp.zeros((n,), jnp.float32).at[tgt].set(f_s, mode="drop")
    return shadow.reshape(n_dot_l.shape), ovf


def shade_pbr(gbuf: dict, scene, scene_data: dict, shadow_maps,
              shadow_mode: int, enable_shadows: bool,
              shadow_sparse_cap: int | None = None,
              shadow_coarse=None, mr_nearest_mip: bool = False,
              fused_mat_meta: bool = False, shadow_quad_lit: bool = True):
    """mesh_pbr.frag main (185-226) over the planar G-buffer.
    Returns ((r, g, b), albedo_alpha), all planar [H, W] — plus a
    shadow-compaction overflow scalar when ``shadow_sparse_cap`` is set
    (see _sparse_shadow_factor; with ``shadow_coarse`` also given, the
    penumbra-classified path — classified_shadow_factor — runs instead,
    compacting only the provably-uncertain band).

    ``fused_mat_meta``: ONE [M, 16] i32 row-gather carries the material
    scalars (bitcast f32) AND both textures' meta+base descriptors
    (texture.packed_meta_cols) — replaces the [M, 8] material row plus
    the two per-pixel [T, 5] meta gathers, IF a 16-wide row costs like
    an 8-wide one (measured question, tools/bench_rowgather.py).
    Bit-identical output (tests/test_frame.py A/B)."""
    nx, ny, nz = _normalize3(gbuf["nx"], gbuf["ny"], gbuf["nz"])
    cam = scene_data["cam_pos"]
    vx, vy, vz = _normalize3(cam[0] - gbuf["wx"], cam[1] - gbuf["wy"],
                             cam[2] - gbuf["wz"])
    sun = scene_data["sunlight_direction"]
    inv_sun = jax.lax.rsqrt(jnp.maximum(
        sun[0] ** 2 + sun[1] ** 2 + sun[2] ** 2, 1e-40))
    lx, ly, lz = -sun[0] * inv_sun, -sun[1] * inv_sun, -sun[2] * inv_sun
    hx, hy, hz = _normalize3(vx + lx, vy + ly, vz + lz)

    meta_a = meta_m = None
    if "m_albedo_id" in gbuf:
        # packed-row G-buffer (interp.build_packed_rows): the material
        # scalars AND both textures' meta descriptors rode the
        # per-triangle row — no per-pixel material or meta gathers
        if "m_meta_a" in gbuf:
            meta_a = tex.unpack_meta(*gbuf["m_meta_a"])
            meta_m = tex.unpack_meta(*gbuf["m_meta_m"])
        albedo_id = gbuf["m_albedo_id"].astype(jnp.int32)
        mr_id = gbuf["m_mr_id"].astype(jnp.int32)
        cf_r, cf_g, cf_b = gbuf["m_cf_r"], gbuf["m_cf_g"], gbuf["m_cf_b"]
        metal_f, rough_f = gbuf["m_metal_f"], gbuf["m_rough_f"]
    elif fused_mat_meta:
        mat_id = gbuf["mat_id"]
        base_t, pack_t = tex.packed_meta_cols(scene.textures)
        aid = scene.mat_tex_ids[:, 0]
        mid = scene.mat_tex_ids[:, 2]
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        zero = jnp.zeros_like(aid)
        mrow = jnp.stack(
            [base_t[aid], pack_t[aid], base_t[mid], pack_t[mid],
             f2i(scene.mat_color_factors[:, 0]),
             f2i(scene.mat_color_factors[:, 1]),
             f2i(scene.mat_color_factors[:, 2]),
             f2i(scene.mat_metal_rough[:, 0]),
             f2i(scene.mat_metal_rough[:, 1]),
             zero, zero, zero, zero, zero, zero, zero], axis=-1)[mat_id]
        meta_a = tex.unpack_meta(mrow[..., 0], mrow[..., 1])
        meta_m = tex.unpack_meta(mrow[..., 2], mrow[..., 3])
        i2f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        cf_r, cf_g, cf_b = (i2f(mrow[..., 4]), i2f(mrow[..., 5]),
                            i2f(mrow[..., 6]))
        metal_f, rough_f = i2f(mrow[..., 7]), i2f(mrow[..., 8])
        albedo_id = mr_id = None   # meta carries the descriptors
    else:
        mat_id = gbuf["mat_id"]
        # ONE [M, 8] row-gather replaces 7 per-pixel column takes (ids are
        # exact in f32 below 2^24; the table stack over ~hundreds of
        # materials is free)
        mrow = jnp.stack(
            [scene.mat_tex_ids[:, 0].astype(jnp.float32),
             scene.mat_tex_ids[:, 2].astype(jnp.float32),
             scene.mat_color_factors[:, 0], scene.mat_color_factors[:, 1],
             scene.mat_color_factors[:, 2], scene.mat_metal_rough[:, 0],
             scene.mat_metal_rough[:, 1],
             jnp.zeros_like(scene.mat_color_factors[:, 0])], axis=-1)[mat_id]
        albedo_id = mrow[..., 0].astype(jnp.int32)
        mr_id = mrow[..., 1].astype(jnp.int32)
        cf_r, cf_g, cf_b = mrow[..., 2], mrow[..., 3], mrow[..., 4]
        metal_f, rough_f = mrow[..., 5], mrow[..., 6]

    at_r, at_g, at_b, at_a = tex.sample_trilinear(
        scene.textures, albedo_id, gbuf["u"], gbuf["v"],
        gbuf["dudx"], gbuf["dvdx"], gbuf["dudy"], gbuf["dvdy"],
        meta=meta_a)
    alb_r = cf_r * at_r * gbuf["cr"]
    alb_g = cf_g * at_g * gbuf["cg"]
    alb_b = cf_b * at_b * gbuf["cb"]
    # metallic = factor * tex.b, roughness = factor * tex.g (frag:196-197).
    # mr_nearest_mip is the gated fidelity knob (VERDICT r2 task 3): the
    # reference trilinears this texture only because every glTF texture
    # shares one sampler (vk_loader.cpp:320); its content is low-frequency
    mr_g, mr_b = tex.sample_trilinear(
        scene.textures, mr_id, gbuf["u"], gbuf["v"],
        gbuf["dudx"], gbuf["dvdx"], gbuf["dudy"], gbuf["dvdy"],
        channels=(1, 2), nearest_mip=mr_nearest_mip, meta=meta_m)
    metallic = metal_f * mr_b
    roughness = rough_f * mr_g

    f0_r = 0.04 * (1.0 - metallic) + alb_r * metallic
    f0_g = 0.04 * (1.0 - metallic) + alb_g * metallic
    f0_b = 0.04 * (1.0 - metallic) + alb_b * metallic

    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    n_dot_l = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    n_dot_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    h_dot_v = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)

    ndf = _distribution_ggx(n_dot_h, roughness)
    g = (_geometry_schlick_ggx(n_dot_v, roughness)
         * _geometry_schlick_ggx(n_dot_l, roughness))
    fr = _fresnel_schlick(h_dot_v, f0_r)
    fg = _fresnel_schlick(h_dot_v, f0_g)
    fb = _fresnel_schlick(h_dot_v, f0_b)

    one_minus_metal = 1.0 - metallic
    kd_r = (1.0 - fr) * one_minus_metal
    kd_g = (1.0 - fg) * one_minus_metal
    kd_b = (1.0 - fb) * one_minus_metal

    denom = 4.0 * n_dot_v * n_dot_l + 0.0001
    ndf_g = ndf * g
    spec_r = ndf_g * fr / denom
    spec_g = ndf_g * fg / denom
    spec_b = ndf_g * fb / denom

    rad = scene_data["sunlight_color"]
    lo_r = (kd_r * alb_r / PI + spec_r) * n_dot_l * rad[0]
    lo_g = (kd_g * alb_g / PI + spec_g) * n_dot_l * rad[1]
    lo_b = (kd_b * alb_b / PI + spec_b) * n_dot_l * rad[2]

    amb = scene_data["ambient_color"]
    if shadow_sparse_cap is None:
        shadow = compute_shadow_factor(shadow_maps, gbuf["wx"], gbuf["wy"],
                                       gbuf["wz"], gbuf["view_z"],
                                       scene_data, shadow_mode,
                                       enable_shadows)
        sp_ovf = None
    elif shadow_coarse is not None:
        # shadow_coarse may be (coarse, fine) — the three-stage classifier
        coarse, fine = (shadow_coarse if isinstance(shadow_coarse, tuple)
                        else (shadow_coarse, None))
        shadow, sp_ovf = classified_shadow_factor(
            shadow_maps, coarse, gbuf, scene_data, shadow_mode,
            enable_shadows, n_dot_l, shadow_sparse_cap,
            quad_lit=shadow_quad_lit, shadow_fine=fine)
    else:
        shadow, sp_ovf = _sparse_shadow_factor(
            shadow_maps, gbuf, scene_data, shadow_mode, enable_shadows,
            n_dot_l, shadow_sparse_cap)
    lit = 1.0 - shadow
    out_r = amb[0] * alb_r + lo_r * lit
    out_g = amb[1] * alb_g + lo_g * lit
    out_b = amb[2] * alb_b + lo_b * lit
    if sp_ovf is None:
        return (out_r, out_g, out_b), at_a
    return (out_r, out_g, out_b), at_a, sp_ovf


def shade_flat(gbuf: dict, scene, scene_data: dict, shadow_maps,
               shadow_mode: int, enable_shadows: bool,
               shadow_sparse_cap: int | None = None,
               shadow_coarse=None, mr_nearest_mip: bool = False,
               fused_mat_meta: bool = False, shadow_quad_lit: bool = True):
    """mesh.frag main (124-182): Lambert + ambient with the same shadow
    library and alpha handling."""
    del mr_nearest_mip   # no metallic-roughness texture in the flat path
    del fused_mat_meta   # one texture; the fused row targets the PBR path
    meta_a = None
    if "m_albedo_id" in gbuf:
        if "m_meta_a" in gbuf:
            meta_a = tex.unpack_meta(*gbuf["m_meta_a"])
        albedo_id = gbuf["m_albedo_id"].astype(jnp.int32)
        cf_r, cf_g, cf_b = gbuf["m_cf_r"], gbuf["m_cf_g"], gbuf["m_cf_b"]
    else:
        mat_id = gbuf["mat_id"]
        mrow = jnp.stack(
            [scene.mat_tex_ids[:, 0].astype(jnp.float32),
             scene.mat_color_factors[:, 0], scene.mat_color_factors[:, 1],
             scene.mat_color_factors[:, 2]], axis=-1)[mat_id]
        albedo_id = mrow[..., 0].astype(jnp.int32)
        cf_r, cf_g, cf_b = mrow[..., 1], mrow[..., 2], mrow[..., 3]
    at_r, at_g, at_b, at_a = tex.sample_trilinear(
        scene.textures, albedo_id, gbuf["u"], gbuf["v"],
        gbuf["dudx"], gbuf["dvdx"], gbuf["dudy"], gbuf["dvdy"],
        meta=meta_a)
    col_r = gbuf["cr"] * at_r * cf_r
    col_g = gbuf["cg"] * at_g * cf_g
    col_b = gbuf["cb"] * at_b * cf_b

    nx, ny, nz = _normalize3(gbuf["nx"], gbuf["ny"], gbuf["nz"])
    sun = scene_data["sunlight_direction"]
    inv_sun = jax.lax.rsqrt(jnp.maximum(
        sun[0] ** 2 + sun[1] ** 2 + sun[2] ** 2, 1e-40))
    lx, ly, lz = -sun[0] * inv_sun, -sun[1] * inv_sun, -sun[2] * inv_sun
    n_dot_l = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)

    if shadow_sparse_cap is None:
        shadow = compute_shadow_factor(shadow_maps, gbuf["wx"], gbuf["wy"],
                                       gbuf["wz"], gbuf["view_z"],
                                       scene_data, shadow_mode,
                                       enable_shadows)
        sp_ovf = None
    elif shadow_coarse is not None:
        coarse, fine = (shadow_coarse if isinstance(shadow_coarse, tuple)
                        else (shadow_coarse, None))
        shadow, sp_ovf = classified_shadow_factor(
            shadow_maps, coarse, gbuf, scene_data, shadow_mode,
            enable_shadows, n_dot_l, shadow_sparse_cap,
            quad_lit=shadow_quad_lit, shadow_fine=fine)
    else:
        shadow, sp_ovf = _sparse_shadow_factor(
            shadow_maps, gbuf, scene_data, shadow_mode, enable_shadows,
            n_dot_l, shadow_sparse_cap)
    lit = 1.0 - shadow
    rad = scene_data["sunlight_color"]
    amb = scene_data["ambient_color"]
    out_r = n_dot_l * col_r * rad[0] * lit + amb[0] * col_r
    out_g = n_dot_l * col_g * rad[1] * lit + amb[1] * col_g
    out_b = n_dot_l * col_b * rad[2] * lit + amb[2] * col_b
    if sp_ovf is None:
        return (out_r, out_g, out_b), at_a
    return (out_r, out_g, out_b), at_a, sp_ovf
