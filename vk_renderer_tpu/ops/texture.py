"""Texture sampling kernels (SURVEY.md F4) over the flat texture heap.

Replicates the reference's sampler states:
- glTF scene textures: ``_defaultSamplerLinear`` — linear mag/min, linear
  mipmap mode, REPEAT wrap, full LOD range (vk_engine_init.cpp:343-344,
  vk_initializers.cpp:228-243; the per-glTF samplers are created but the
  bindless table always binds the default sampler, vk_loader.cpp:320).
- shadow map: linear, CLAMP_TO_BORDER with opaque-white border
  (vk_engine_init.cpp:392-394) over a D32 2D-array.
- skybox cubemap: linear (run:137).  Per-face clamp-to-edge here instead of
  Vulkan's seamless cube filtering — a sub-LSB border deviation, documented.

LOD follows the Vulkan spec's isotropic approximation:
``lambda = log2(max(|dUV/dx|, |dUV/dy|))`` in level-0 texel units, then
trilinear blend between the two bracketing mips.

LAYOUT: everything is planar — per-pixel quantities are separate [H, W]
arrays and the heap is channels-first f32[4, N].  Arrays shaped [H, W, c]
with a tiny minor dimension are catastrophically slow on TPU (the 3-wide
lane dim pads to 128); planar form runs the same math ~1000x faster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.types import MAX_MIPS


def _desc_take(offsets, sizes, tex_id, level):
    """Per-(texture,mip) descriptor lookup as ONE [T*M, 4] row-gather
    instead of three flat takes (row gathers cost per INDEX, not per
    element, for rows <= 8 wide — see docs/PERF.md cost table; the stack
    below is tiny, trace-time, and CSE'd across call sites).  Offsets stay
    i32 (the heap exceeds 2^24, f32 rows would round them)."""
    max_mips = offsets.shape[1]
    rows = jnp.stack(
        [offsets.reshape(-1), sizes[:, :, 0].reshape(-1),
         sizes[:, :, 1].reshape(-1),
         jnp.zeros_like(offsets.reshape(-1))], axis=-1)
    r = rows[tex_id * max_mips + level]
    return r[..., 0], r[..., 1], r[..., 2]


def _unpack_rgba8(packed, srgb, channels):
    """u32 packed RGBA8 -> requested channel planes in shading space
    (per-texel sRGB decode before filtering for RGB of sRGB textures,
    exactly like R8G8B8A8_SRGB sampling hardware)."""
    out = []
    for c in channels:
        v = ((packed >> (8 * c)) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        if c < 3:
            lin = jnp.where(v <= 0.04045, v / 12.92,
                            jnp.power((v + 0.055) / 1.055, 2.4))
            v = jnp.where(srgb, lin, v)
        out.append(v)
    return out


def _bilinear_at(texels, off, w, h, u, v, srgb, channels):
    """Bilinear fetch given an explicit (offset, w, h) descriptor — ONE
    row-4 gather over the QUAD-INTERLEAVED u32 heap (scene/textures.py
    build: heap word 4*i+j is corner j of texel i's 2x2 REPEAT
    neighborhood; ~3x cheaper than the 2 take2 pairs it replaces).
    Returns a tuple of [H, W] planes for the requested channels."""
    x = u * w.astype(jnp.float32) - 0.5
    y = v * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def wrap(i, n):  # REPEAT
        return jnp.mod(i.astype(jnp.int32), n)

    x0i = wrap(x0, w)
    y0i = wrap(y0, h)
    quads = texels if texels.ndim == 2 else texels.reshape(-1, 4)
    q = quads[off + y0i * w + x0i]     # [..., 4]
    p00, p10, p01, p11 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    out = []
    for (t00, t10, t01, t11) in zip(_unpack_rgba8(p00, srgb, channels),
                                    _unpack_rgba8(p10, srgb, channels),
                                    _unpack_rgba8(p01, srgb, channels),
                                    _unpack_rgba8(p11, srgb, channels)):
        top = t00 + (t10 - t00) * fx
        bot = t01 + (t11 - t01) * fx
        out.append(top + (bot - top) * fy)
    return tuple(out)


def _bilinear_level(texels, offsets, sizes, tex_id, u, v, level, srgb,
                    channels=(0, 1, 2, 3)):
    """One mip level (descriptor looked up per pixel), bilinear fetch."""
    off, w, h = _desc_take(offsets, sizes, tex_id, level)
    return _bilinear_at(texels, off, w, h, u, v, srgb, channels)


def _meta_take(textures, tex_id):
    """Per-texture (w0, h0, max_level, srgb, w0i, h0i, base_off) as ONE
    [T, 5] row-gather (was four flat takes per sample).  base_off is the
    texture's level-0 heap offset: together with (w0i, h0i) it makes
    every mip descriptor DERIVABLE arithmetically (_desc_from_meta), so
    the per-pixel [T*M, 4] descriptor gather disappears from the
    trilinear path.  Offsets stay i32 in the row (f32 would round past
    2^24)."""
    rows = jnp.stack(
        [textures.mip_sizes[:, 0, 0], textures.mip_sizes[:, 0, 1],
         textures.n_mips - 1, textures.srgb_flags,
         textures.mip_offsets[:, 0]], axis=-1)
    r = rows[tex_id]
    return (r[..., 0].astype(jnp.float32), r[..., 1].astype(jnp.float32),
            r[..., 2].astype(jnp.float32), r[..., 3] > 0,
            r[..., 0], r[..., 1], r[..., 4])


def _desc_from_meta(base, w0i, h0i, level):
    """Mip descriptor (offset, w, h) computed from the level-0 descriptor
    instead of gathered: the heap build lays mips contiguously
    (scene/textures.py build: ``cursor += w*h`` per level) with sizes
    ``max(x >> m, 1)`` (iterated floor-halving == right shift), so

        off(l) = base + sum_{m<l} max(w0>>m,1) * max(h0>>m,1)

    exactly.  The unrolled where-sum is ~90 elementwise int ops per
    pixel — ~free next to the [T*M, 4] row-gather it replaces (see the
    gather cost table).  ``level`` must already be clipped to
    max_level (n_mips-1), which _lod_from_meta guarantees, so the
    build's clamp-extended slots are never addressed."""
    acc = jnp.zeros_like(base)
    for m in range(MAX_MIPS - 1):
        wm = jnp.maximum(w0i >> m, 1)
        hm = jnp.maximum(h0i >> m, 1)
        acc = acc + jnp.where(level > m, wm * hm, 0)
    w = jnp.maximum(w0i >> level, 1)
    h = jnp.maximum(h0i >> level, 1)
    return base + acc, w, h


def _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy):
    """Vulkan isotropic LOD from planar UV derivatives."""
    rho = jnp.maximum(
        jnp.sqrt((dudx * w0) ** 2 + (dvdx * h0) ** 2),
        jnp.sqrt((dudy * w0) ** 2 + (dvdy * h0) ** 2))
    lam = jnp.log2(jnp.maximum(rho, 1e-12))
    return jnp.clip(lam, 0.0, max_level)


def compute_lod(textures, tex_id, dudx, dvdx, dudy, dvdy):
    """Vulkan isotropic LOD from planar UV derivatives (oracle/test entry;
    the sampling path uses _meta_take + _lod_from_meta)."""
    w0, h0, max_level = _meta_take(textures, tex_id)[:3]
    return _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy), \
        max_level


WRAP_REPEAT, WRAP_CLAMP, WRAP_MIRROR = 0, 1, 2


def _wrap_index(i, n, wmode):
    """Per-texel-index Vulkan address modes (wmode i32 planar):
    0 REPEAT (mod), 1 CLAMP_TO_EDGE (clip), 2 MIRRORED_REPEAT
    (fold each period; Vulkan's per-index transform)."""
    rep = jnp.mod(i, n)
    clp = jnp.clip(i, 0, n - 1)
    m = jnp.mod(i, 2 * n)
    mir = jnp.where(m >= n, 2 * n - 1 - m, m)
    return jnp.where(wmode == WRAP_CLAMP, clp,
                     jnp.where(wmode == WRAP_MIRROR, mir, rep))


def _sample_general(textures, tex_id, u, v, dudx, dvdx, dudy, dvdy,
                    channels, meta):
    """Per-sampler-state sampling path (VERDICT r4 task 6): honors the
    glTF sampler the reference PARSES at src/vk_loader.cpp:253-270 —
    mag/min NEAREST vs LINEAR, mipmap mode NEAREST vs LINEAR,
    REPEAT / CLAMP_TO_EDGE / MIRRORED_REPEAT wrap per axis (mode bits:
    scene/textures.gltf_sampler_mode).  Compiled only for scenes with a
    non-default sampler (TextureTable.has_custom_samplers static flag);
    costs 4 single-texel gathers per bilinear (the quad-interleaved rows
    bake REPEAT neighbors, wrong at clamp/mirror seams) — the
    default-sampler scene class keeps the 1-gather quad path.

    Vulkan semantics: filter = magFilter where lambda <= 0 else
    minFilter; NEAREST filter reads texel floor(u*w) (no half-texel
    shift); mipmap NEAREST level = ceil(lambda + 0.5) - 1.  NEAREST
    filtering and NEAREST mip selection are folded into the bilinear /
    two-level form as degenerate cases (fx = 0, l1 = l0), so one code
    path serves every mode combination."""
    w0, h0, max_level, srgb, w0i, h0i, base = (
        meta if meta is not None else _meta_take(textures, tex_id))
    mode = jnp.take(textures.sampler_modes, tex_id)
    mag_n = (mode & 1) > 0
    min_n = (mode & 2) > 0
    mip_n = (mode & 4) > 0
    wrap_s = (mode >> 3) & 3
    wrap_t = (mode >> 5) & 3

    lam = _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy)
    f_nearest = jnp.where(lam <= 0.0, mag_n, min_n)
    max_l = max_level.astype(jnp.int32)
    # mip level(s): NEAREST folds to l1 == l0, frac = 0
    d_near = jnp.clip(jnp.ceil(lam + 0.5).astype(jnp.int32) - 1, 0, max_l)
    l0 = jnp.where(mip_n, d_near, jnp.floor(lam).astype(jnp.int32))
    l1 = jnp.where(mip_n, d_near, jnp.minimum(l0 + 1, max_l))
    frac = jnp.where(mip_n, 0.0, lam - jnp.floor(lam))

    flat = (textures.texels if textures.texels.ndim == 2
            else textures.texels.reshape(-1, 4))

    def level(li):
        off, wi, hi = _desc_from_meta(base, w0i, h0i, li)
        wf = wi.astype(jnp.float32)
        hf = hi.astype(jnp.float32)
        xb = u * wf - 0.5
        yb = v * hf - 0.5
        xn = jnp.floor(u * wf)
        yn = jnp.floor(v * hf)
        x0 = jnp.where(f_nearest, xn, jnp.floor(xb)).astype(jnp.int32)
        y0 = jnp.where(f_nearest, yn, jnp.floor(yb)).astype(jnp.int32)
        fx = jnp.where(f_nearest, 0.0, xb - jnp.floor(xb))
        fy = jnp.where(f_nearest, 0.0, yb - jnp.floor(yb))
        i0 = _wrap_index(x0, wi, wrap_s)
        i1 = _wrap_index(x0 + 1, wi, wrap_s)
        j0 = _wrap_index(y0, hi, wrap_t)
        j1 = _wrap_index(y0 + 1, hi, wrap_t)
        # lane 0 of each texel's quad row is the texel itself
        p00 = flat[off + j0 * wi + i0][..., 0]
        p10 = flat[off + j0 * wi + i1][..., 0]
        p01 = flat[off + j1 * wi + i0][..., 0]
        p11 = flat[off + j1 * wi + i1][..., 0]
        out = []
        for (t00, t10, t01, t11) in zip(_unpack_rgba8(p00, srgb, channels),
                                        _unpack_rgba8(p10, srgb, channels),
                                        _unpack_rgba8(p01, srgb, channels),
                                        _unpack_rgba8(p11, srgb, channels)):
            top = t00 + (t10 - t00) * fx
            bot = t01 + (t11 - t01) * fx
            out.append(top + (bot - top) * fy)
        return tuple(out)

    c0 = level(l0)
    c1 = level(l1)
    return tuple(a + (b - a) * frac for a, b in zip(c0, c1))


def sample_trilinear(textures, tex_id, u, v, dudx, dvdx, dudy, dvdy,
                     channels=(0, 1, 2, 3), nearest_mip: bool = False,
                     meta=None):
    """Full trilinear sample.  All per-pixel args planar [H, W].
    Returns a tuple of [H, W] planes for the requested channels.

    ``nearest_mip=True`` is the gated fidelity knob (VERDICT r2 task 3):
    ONE bilinear sample at the rounded mip level instead of two blended
    levels — half the texel gathers.  Off by default (exact trilinear);
    enable only for low-frequency content behind a goldens gate.

    ``meta``: the _meta_take 7-tuple when the caller already has it (the
    fused material+meta row, shade.shade_pbr) — skips the per-pixel
    [T, 5] meta row-gather; ``tex_id`` is then unused.

    Scenes carrying a non-default glTF sampler (has_custom_samplers)
    route through the general per-sampler path — which needs ``tex_id``
    (the packed-row builders return None for such scenes, so every
    caller passes ids there)."""
    if getattr(textures, "has_custom_samplers", False):
        assert tex_id is not None, \
            "custom-sampler scenes must sample by texture id"
        assert not nearest_mip, \
            "mr_nearest_mip knob is not supported with custom samplers"
        return _sample_general(textures, tex_id, u, v, dudx, dvdx, dudy,
                               dvdy, channels, meta)
    w0, h0, max_level, srgb, w0b, h0b, base = (
        meta if meta is not None else _meta_take(textures, tex_id))
    lam = _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy)
    if nearest_mip:
        l0 = jnp.round(lam).astype(jnp.int32)
        off, wi, hi = _desc_from_meta(base, w0b, h0b, l0)
        return _bilinear_at(textures.texels, off, wi, hi, u, v, srgb,
                            channels)
    l0 = jnp.floor(lam).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level.astype(jnp.int32))
    frac = lam - l0.astype(jnp.float32)

    off0, w0i, h0i = _desc_from_meta(base, w0b, h0b, l0)
    c0 = _bilinear_at(textures.texels, off0, w0i, h0i, u, v, srgb, channels)
    # level l0+1's descriptor follows ARITHMETICALLY from l0's: mips are
    # contiguous (scene/textures.py build: cursor += w*h per level) and
    # sizes halve with a clamp at 1 (generate_mips) — saves the second
    # per-pixel descriptor row-gather.  At the chain end (l1 == l0) the
    # descriptor is reused unchanged.
    deeper = l1 > l0
    off1 = jnp.where(deeper, off0 + w0i * h0i, off0)
    w1i = jnp.where(deeper, jnp.maximum(w0i >> 1, 1), w0i)
    h1i = jnp.where(deeper, jnp.maximum(h0i >> 1, 1), h0i)
    c1 = _bilinear_at(textures.texels, off1, w1i, h1i, u, v, srgb, channels)
    return tuple(a + (b - a) * frac for a, b in zip(c0, c1))


ALPHA_STATE_SHIFT = 1   # must match scene/textures.ALPHA_STATE_SHIFT
ALPHA_STATE_ACCEPT = 1
ALPHA_STATE_REJECT = 2


def alpha_state_lookup(states, u, v, dudx, dvdx, dudy, dvdy, meta, sbase):
    """One-gather lookup into the baked 3-state alpha-coverage pyramid
    (scene/textures.build_alpha_states): returns i32 planar states —
    ALPHA_STATE_ACCEPT (trilinear alpha certainly >= 0.5),
    ALPHA_STATE_REJECT (certainly < 0.5) or 0 (uncertain — caller must
    run the real trilinear).  ``meta``: the unpack_meta 7-tuple;
    ``sbase``: per-pixel i32 state-base cell index (-1 = no table ->
    uncertain).

    Consistency: the floor level l0 and the bilinear base texel are
    computed with EXACTLY the expressions sample_trilinear /_bilinear_at
    use (same f32 rounding), so the consulted cell is the one whose baked
    bounds cover this sample's footprint.  When frac == 0 the trilinear
    reduces exactly to the level-l0 bilinear, so the sharper LEVEL-ONLY
    nibble half applies (build_alpha_states)."""
    w0, h0, max_level, _srgb, w0i, h0i, _base = meta
    lam = _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy)
    l0 = jnp.floor(lam).astype(jnp.int32)
    frac = lam - l0.astype(jnp.float32)
    wl = jnp.maximum(w0i >> l0, 1)
    hl = jnp.maximum(h0i >> l0, 1)
    # bilinear base texel — the _bilinear_at expressions verbatim
    x = u * wl.astype(jnp.float32) - 0.5
    y = v * hl.astype(jnp.float32) - 0.5
    x0i = jnp.mod(jnp.floor(x).astype(jnp.int32), wl)
    y0i = jnp.mod(jnp.floor(y).astype(jnp.int32), hl)
    s = ALPHA_STATE_SHIFT
    b = 1 << s
    # level offset + cell-grid width, derived arithmetically (the state
    # layout is level-major with ceil-division grids — see
    # build_alpha_states; same unrolled-where idiom as _desc_from_meta)
    acc = jnp.zeros_like(l0)
    for m in range(MAX_MIPS - 1):
        cwm = (jnp.maximum(w0i >> m, 1) + (b - 1)) >> s
        chm = (jnp.maximum(h0i >> m, 1) + (b - 1)) >> s
        acc = acc + jnp.where(l0 > m, cwm * chm, 0)
    cw = (wl + (b - 1)) >> s
    ci = sbase + acc + (y0i >> s) * cw + (x0i >> s)
    word = jnp.take(states, jnp.clip(ci >> 3, 0, states.shape[0] - 1))
    nib = (word >> ((ci & 7) * 4)) & 0xF
    st = jnp.where(frac > 0.0, nib & 3, (nib >> 2) & 3)
    return jnp.where(sbase >= 0, st, 0)


F32_GUARD_BIT = 1 << 30
# i32 values bitcast into f32 table lanes MUST carry a set exponent bit:
# TPU vector moves/selects FLUSH DENORMALS, so any bit pattern with
# exponent bits 23-30 all zero (every plain int < 2^23) is silently
# zeroed riding an f32 row table (measured: the alpha-state-base column
# read back 0 for every pixel on TPU while CPU was exact).  Setting bit
# 30 makes every encoded value a normal-range f32; the layouts below
# provably never form an all-ones exponent (NaN) either, so the patterns
# survive moves bit-exactly.


def _alpha_bilinear_at(quads, off, w, h, u, v):
    """Bilinear ALPHA fetch from the alpha-quad table: ONE flat take
    (word = the 2x2 neighborhood's packed alpha bytes) — arithmetic
    mirrors _bilinear_at exactly, so the result is bit-identical to the
    RGBA heap's channel-3 bilinear."""
    x = u * w.astype(jnp.float32) - 0.5
    y = v * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    q = jnp.take(quads, off + y0i * w + x0i)
    t00 = (q & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    t10 = ((q >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    t01 = ((q >> 16) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    t11 = ((q >> 24) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


def sample_alpha_trilinear(quads, u, v, dudx, dvdx, dudy, dvdy, meta,
                           aq_base):
    """Trilinear ALPHA over the dedicated alpha-quad table — the masked
    peel loop's discard operand (mesh_pbr.frag:193), bit-identical to
    ``sample_trilinear(..., channels=(3,))`` over the RGBA heap but
    TWO FLAT TAKES per pixel over a ~4 MB array instead of two 4-wide
    row-gathers over the 50M-word heap (whose [N, 4] gather operand XLA
    re-materializes 32x-padded per cond branch — tools/bench_masked2.py).
    The table's level layout mirrors the heap's, so each level's offset
    is the heap descriptor's DELTA from the texture's level-0 offset
    rebased onto ``aq_base``.  ``meta``: unpack_meta 7-tuple;
    ``aq_base``: per-pixel i32 (from the alpha rows, guard-bit decoded;
    negative = no table — callers gate statically)."""
    w0, h0, max_level, _srgb, w0i, h0i, base = meta
    lam = _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy)
    l0 = jnp.floor(lam).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level.astype(jnp.int32))
    frac = lam - l0.astype(jnp.float32)
    off0, w0l, h0l = _desc_from_meta(base, w0i, h0i, l0)
    aq0 = aq_base + (off0 - base)
    c0 = _alpha_bilinear_at(quads, aq0, w0l, h0l, u, v)
    deeper = l1 > l0
    aq1 = jnp.where(deeper, aq0 + w0l * h0l, aq0)
    w1l = jnp.where(deeper, jnp.maximum(w0l >> 1, 1), w0l)
    h1l = jnp.where(deeper, jnp.maximum(h0l >> 1, 1), h0l)
    c1 = _alpha_bilinear_at(quads, aq1, w1l, h1l, u, v)
    return c0 + (c1 - c0) * frac


def packed_meta_cols(textures):
    """Per-texture (base_off, packed_meta) i32 columns for fusing texture
    meta into material/interp rows — DENORMAL-SAFE for f32-lane transport
    (see F32_GUARD_BIT):
    ``packed_meta = w0 | h0 << 13 | max_level << 26 | 1 << 30 | srgb << 31``
    (w0, h0 <= 8191; max_level <= 12 since MAX_MIPS is 13, so the level
    field can never be 15 and exponent bits 26-29 never go all-ones —
    the pattern is never NaN); ``base_enc = base | 1 << 30`` (base < 2^29
    asserted at heap build, so exponent bits 23-29 never go all-ones).
    Trace-time elementwise over the texture table, ~free."""
    w0 = textures.mip_sizes[:, 0, 0]
    h0 = textures.mip_sizes[:, 0, 1]
    pack = (w0 | (h0 << 13) | ((textures.n_mips - 1) << 26)
            | F32_GUARD_BIT | (textures.srgb_flags << 31))
    return textures.mip_offsets[:, 0] | F32_GUARD_BIT, pack


def unpack_meta(base, pack):
    """Inverse of packed_meta_cols: the _meta_take 7-tuple from the fused
    row's two i32 columns (pure elementwise bit ops)."""
    w0i = pack & 0x1FFF
    h0i = (pack >> 13) & 0x1FFF
    lvl = (pack >> 26) & 0xF
    srgb = ((pack >> 31) & 1) > 0
    base_off = base & (F32_GUARD_BIT - 1)
    return (w0i.astype(jnp.float32), h0i.astype(jnp.float32),
            lvl.astype(jnp.float32), srgb, w0i, h0i, base_off)


def sample_bilinear_lod0(textures, tex_id, u, v, channels=(0, 1, 2, 3)):
    """Bilinear sample at the base level (no mip chain)."""
    srgb = jnp.take(textures.srgb_flags, tex_id) > 0
    return _bilinear_level(textures.texels, textures.mip_offsets,
                           textures.mip_sizes, tex_id, u, v,
                           jnp.zeros_like(tex_id), srgb, channels)


# ----------------------------------------------------------------------------
# shadow map: 2D array, linear filter, clamp-to-border white
# ----------------------------------------------------------------------------

SHADOW_Q = 65535.0   # 16-bit fixed-point depth quantization (see pack)


def pack_shadow_maps(maps: jax.Array) -> jax.Array:
    """f32[L, S, S] depth -> pair-packed i32[L, S, S]:
    ``word[y, x] = q16(d[y, x]) | q16(d[y, min(x+1, S-1)]) << 16``.

    The redundant packing makes a bilinear x-pair ONE flat take (an
    unaligned pair can never be covered by one aligned fetch, so
    non-redundant layouts need two) — the shadow filters' gather count
    halves, and a PCSS tap costs 2 index-units total.

    16-bit fixed point quantizes depth to 1.5e-5 — 33x finer than the
    5e-4 compare bias (mesh_pbr.frag:38); a documented deviation from the
    reference's D32 (every backend samples the same packed maps, so
    cross-backend parity is exact)."""
    q = jnp.round(jnp.clip(maps, 0.0, 1.0) * SHADOW_Q).astype(jnp.int32)
    q_next = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    return q | (q_next << 16)


def quantize_shadow(maps: jax.Array) -> jax.Array:
    """The depth value the packed representation reproduces (for oracles)."""
    return jnp.round(jnp.clip(maps, 0.0, 1.0) * SHADOW_Q) / SHADOW_Q


SHADOW_COARSE_BLOCK = 64   # texels per coarse min/max cell at 2048 (see below)


def coarse_block_for(size: int) -> int:
    """Coarse cell size for a shadow map: ~32 cells per side, clamped to
    [16, 64].  The lower clamp keeps the widest PCSS search window
    (~2*(0.01*S + 4) texels) within TWO consecutive cells so the
    classifier's 2x2 gather always covers it; the upper clamp bounds the
    uncertainty dilation around depth discontinuities (+-2 cells).  The
    dilation problem is instead attacked by the FINE table
    (fine_block_for) whose window only has to cover the filter's TAP
    footprint, not the blocker search."""
    return max(16, min(SHADOW_COARSE_BLOCK, size // 32))


def fine_block_for(size: int) -> int:
    """Cell size of the classifier's FINE min/max level: its window only
    covers the filter's TAP footprint (PCF disk radius bound + the
    smallest blocker-search tap, typically <= ~8 texels — see
    shade._classify_shadow), so cells 4x smaller than the coarse level
    still guarantee the 2x2-cell fit while quartering the
    block-granularity dilation around shadow boundaries — the dominant
    term in the uncertain band once the receiver-quad proof handles
    sloped lit floors."""
    return max(4, coarse_block_for(size) // 4)


def build_shadow_coarse(packed: jax.Array,
                        block: int | None = None) -> jax.Array:
    """Pair-packed maps i32[L, S, S] -> coarse i32[L, S/B, S/B] where each
    word is ``min_q | max_q << 16`` over its B x B block of QUANTIZED
    depths (the lo halfword of the packed word is the texel's own value;
    the hi halfword is the redundant x+1 copy, so lo alone covers every
    texel).

    This is the classifier table for penumbra-classified sparse shadow
    filtering (shade.classified_shadow_factor): min/max over a
    conservative window bounds every bilinear tap any filter mode can
    take, so most pixels resolve to exactly-lit or exactly-blocked with
     4 coarse fetches instead of 32 Poisson taps.  Cheap to build: one
    block reduction over the maps, ~free next to a single 2M-pixel
    gather."""
    lo = packed & 0xFFFF
    l, s, _ = packed.shape
    block = coarse_block_for(s) if block is None else block
    block = min(block, s)            # tiny test maps: one cell per map
    assert s % block == 0, "shadow size must be a multiple of the block"
    sb = s // block
    r = lo.reshape(l, sb, block, sb, block)
    mn = r.min(axis=(2, 4))
    mx = r.max(axis=(2, 4))
    return mn | (mx << 16)


class ShadowRows:
    """Row-grouped shadow pairwords: ONE row-8 gather serves a full
    bilinear tap.  Group ``g`` of map row ``y`` holds pairwords
    ``(y, 4g..4g+3)`` in cols 0-3 and ``(min(y+1, S-1), 4g..4g+3)`` in
    cols 4-7, so both y-rows' x-pairs of any tap live in one 8-wide row
    (row gathers cost per index, not per byte — gatherutil table; ~3x
    cheaper than the legacy 2 flat takes per tap)."""

    def __init__(self, rows, layers: int, size: int):
        self.rows = rows          # i32[L*S*(S//4), 8]
        self.layers = layers
        self.size = size


def _sr_flatten(s):
    return (s.rows,), (s.layers, s.size)


def _sr_unflatten(aux, children):
    return ShadowRows(children[0], aux[0], aux[1])


jax.tree_util.register_pytree_node(ShadowRows, _sr_flatten, _sr_unflatten)


def make_shadow_rows(packed: jax.Array):
    """Pair-packed maps i32[L, S, S] -> ShadowRows (see class docstring).
    Built once per frame from the rastered maps (an elementwise
    concat/reshape, ~free next to one 2M-pixel gather).  Tiny test maps
    (S % 4 != 0) stay in the legacy [L, S, S] 2-take form."""
    l, s, _ = packed.shape
    if s % 4:
        return packed
    below = jnp.concatenate([packed[:, 1:, :], packed[:, -1:, :]], axis=1)
    a = packed.reshape(l, s, s // 4, 4)
    b = below.reshape(l, s, s // 4, 4)
    rows = jnp.concatenate([a, b], axis=-1).reshape(-1, 8)
    return ShadowRows(rows, l, s)


def shadow_layer_count(sm) -> int:
    """Cascade-layer count of either shadow-map form."""
    return sm.layers if isinstance(sm, ShadowRows) else sm.shape[0]


def shadow_map_size(sm) -> int:
    """Texel side length of either shadow-map form."""
    return sm.size if isinstance(sm, ShadowRows) else sm.shape[-1]


def _sel4(v4, c):
    """In-row dynamic select (elementwise where-chain, fuses free)."""
    out = v4[0]
    for k in range(1, 4):
        out = jnp.where(c == k, v4[k], out)
    return out


def _shadow_corners_rows(sr: ShadowRows, us, vs, layer):
    """Border-substituted bilinear corner depths (t00, t10, t01, t11) plus
    the lerp fractions, from ONE row-8 gather per tap (see ShadowRows)."""
    size = sr.size
    sf = jnp.float32(size)
    x = us * sf - 0.5
    y = vs * sf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0in = (x0 >= 0) & (x0 < size)
    x1in = (x0 + 1 >= 0) & (x0 + 1 < size)
    y0in = (y0 >= 0) & (y0 < size)
    y1in = (y0 + 1 >= 0) & (y0 + 1 < size)

    x0c = jnp.clip(x0, 0, size - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, size - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, size - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, size - 1).astype(jnp.int32)
    g = x0c >> 2
    c = x0c & 3
    idx = (layer[None] * size + y0c) * (size // 4) + g
    r = sr.rows[idx]                                   # [K, H, W, 8]
    w0 = _sel4([r[..., k] for k in range(4)], c)
    wb = _sel4([r[..., 4 + k] for k in range(4)], c)
    # the below-word is row min(y0c+1, S-1); when the clamped y1c folds
    # back onto y0c (off-map top/bottom), the tap needs row y0c again
    w1 = jnp.where(y1c > y0c, wb, w0)

    inv_q = jnp.float32(1.0 / SHADOW_Q)
    lo0 = (w0 & 0xFFFF).astype(jnp.float32) * inv_q
    hi0 = ((w0 >> 16) & 0xFFFF).astype(jnp.float32) * inv_q
    lo1 = (w1 & 0xFFFF).astype(jnp.float32) * inv_q
    hi1 = ((w1 >> 16) & 0xFFFF).astype(jnp.float32) * inv_q
    use_hi = x1c > x0c
    t00 = jnp.where(x0in & y0in, lo0, 1.0)
    t10 = jnp.where(x1in & y0in, jnp.where(use_hi, hi0, lo0), 1.0)
    t01 = jnp.where(x0in & y1in, lo1, 1.0)
    t11 = jnp.where(x1in & y1in, jnp.where(use_hi, hi1, lo1), 1.0)
    return t00, t10, t01, t11, fx, fy


def _sample_shadow_rows(sr: ShadowRows, us, vs, layer):
    """ShadowRows fast path: one row-8 gather per tap (see ShadowRows)."""
    t00, t10, t01, t11, fx, fy = _shadow_corners_rows(sr, us, vs, layer)
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


def shadow_tap_corners(shadow_packed, u: jax.Array, v: jax.Array,
                       layer: jax.Array):
    """The four border-substituted corner depths (t00, t10, t01, t11) of
    ONE bilinear tap at (u, v) — the exact texel values sample_shadow
    would interpolate, without the lerp.  The classifier's receiver-quad
    probe (shade._classify_shadow quad lit proof): every tap whose
    position stays inside the center texel cell interpolates THESE four
    values, so their min bounds every such tap from below.  One row-8
    gather on the ShadowRows form; two flat takes on the packed form.
    u/v planar [H, W] (any shape), layer matching."""
    if isinstance(shadow_packed, ShadowRows):
        c = _shadow_corners_rows(shadow_packed, u[None], v[None], layer)
    else:
        c = _shadow_corners_packed(shadow_packed, u[None], v[None], layer)
    return tuple(x[0] for x in c[:4])


class CoarseRows:
    """Quad-grouped coarse min/max cells (build_shadow_coarse output,
    regrouped): row ``i`` holds cells (x, y), (x+1, y), (x, y+1),
    (x+1, y+1) — clamped at the grid edge — so the classifier's 2x2 cell
    fetch is ONE row-4 gather instead of four."""

    def __init__(self, rows, layers: int, cells: int):
        self.rows = rows          # i32[L*sb*sb, 4]
        self.layers = layers
        self.cells = cells        # sb: cells per map side


def _cr_flatten(s):
    return (s.rows,), (s.layers, s.cells)


def _cr_unflatten(aux, children):
    return CoarseRows(children[0], aux[0], aux[1])


jax.tree_util.register_pytree_node(CoarseRows, _cr_flatten, _cr_unflatten)


def make_coarse_rows(coarse: jax.Array) -> CoarseRows:
    """[L, sb, sb] coarse cells -> CoarseRows (tiny; built per frame)."""
    l, sb, _ = coarse.shape
    xp = jnp.concatenate([coarse[:, :, 1:], coarse[:, :, -1:]], axis=2)
    yp = jnp.concatenate([coarse[:, 1:, :], coarse[:, -1:, :]], axis=1)
    xyp = jnp.concatenate([yp[:, :, 1:], yp[:, :, -1:]], axis=2)
    rows = jnp.stack([coarse, xp, yp, xyp], axis=-1).reshape(-1, 4)
    return CoarseRows(rows, l, sb)


def sample_shadow_batch(shadow_packed, us: jax.Array,
                        vs: jax.Array, layer: jax.Array) -> jax.Array:
    """Batched bilinear shadow taps.  shadow_packed: ShadowRows (the frame
    path — one row-8 gather per tap) or i32[L, S, S] from pack_shadow_maps
    (tests/tiny maps — two flat takes per tap); us/vs [K, H, W]
    (K independent filter taps); layer [H, W].  Border depth 1.0 outside
    [0,1]^2 (opaque-white border).  Both forms are bit-identical."""
    if isinstance(shadow_packed, ShadowRows):
        return _sample_shadow_rows(shadow_packed, us, vs, layer)
    t00, t10, t01, t11, fx, fy = _shadow_corners_packed(
        shadow_packed, us, vs, layer)
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


def _shadow_corners_packed(shadow_packed, us, vs, layer):
    """Legacy pair-packed form of _shadow_corners_rows (two flat takes)."""
    assert shadow_packed.dtype == jnp.int32, \
        "shadow maps must be pair-packed (texture.pack_shadow_maps)"
    size = shadow_packed.shape[-1]
    sf = jnp.float32(size)
    x = us * sf - 0.5
    y = vs * sf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0in = (x0 >= 0) & (x0 < size)
    x1in = (x0 + 1 >= 0) & (x0 + 1 < size)
    y0in = (y0 >= 0) & (y0 < size)
    y1in = (y0 + 1 >= 0) & (y0 + 1 < size)

    x0c = jnp.clip(x0, 0, size - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, size - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, size - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, size - 1).astype(jnp.int32)
    base = (layer * (size * size))[None]
    flat = shadow_packed.reshape(-1)
    w0 = jnp.take(flat, base + y0c * size + x0c)
    w1 = jnp.take(flat, base + y1c * size + x0c)
    inv_q = jnp.float32(1.0 / SHADOW_Q)
    lo0 = (w0 & 0xFFFF).astype(jnp.float32) * inv_q
    hi0 = ((w0 >> 16) & 0xFFFF).astype(jnp.float32) * inv_q
    lo1 = (w1 & 0xFFFF).astype(jnp.float32) * inv_q
    hi1 = ((w1 >> 16) & 0xFFFF).astype(jnp.float32) * inv_q
    # x0 < 0 clamps x0c to 0 == x1c: corner 1 is then the word's LO lane
    use_hi = x1c > x0c
    t00 = jnp.where(x0in & y0in, lo0, 1.0)
    t10 = jnp.where(x1in & y0in, jnp.where(use_hi, hi0, lo0), 1.0)
    t01 = jnp.where(x0in & y1in, lo1, 1.0)
    t11 = jnp.where(x1in & y1in, jnp.where(use_hi, hi1, lo1), 1.0)
    return t00, t10, t01, t11, fx, fy


def sample_shadow(shadow_packed: jax.Array, u: jax.Array, v: jax.Array,
                  layer: jax.Array) -> jax.Array:
    """Single bilinear shadow tap (see sample_shadow_batch)."""
    return sample_shadow_batch(shadow_packed, u[None], v[None], layer)[0]


# ----------------------------------------------------------------------------
# cubemap
# ----------------------------------------------------------------------------

def _decode_rgb9e5(w):
    """Shared-exponent RGB9E5 u32 -> (r, g, b) f32 (see types.pack_rgb9e5)."""
    e = ((w >> 27) & 0x1F).astype(jnp.float32)
    scale = jnp.exp2(e - (15.0 + 9.0))
    return ((w & 0x1FF).astype(jnp.float32) * scale,
            ((w >> 9) & 0x1FF).astype(jnp.float32) * scale,
            ((w >> 18) & 0x1FF).astype(jnp.float32) * scale)


def sample_cubemap(cubemap, dx, dy, dz):
    """cubemap: RGB9E5-packed u32 in one of three forms — quad rows
    [6*F*F, 4] (the scene path: a full bilinear fetch is ONE row-4
    gather over an array whose ARGUMENT layout stays compact — see the
    texel heap's [N, 4] rationale in scene/types.device_put),
    quad-interleaved [6, F, 4F] (legacy), or plain [6, F, F]
    (tests/tools: one gather per corner).  Vulkan face order
    +X -X +Y -Y +Z -Z; direction components planar [H, W].  Bilinear,
    per-face clamp-to-edge, face selection per the Vulkan cube-map
    equations.  Returns (r, g, b) planar — all forms bit-identical."""
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    use_x = (ax >= ay) & (ax >= az)
    use_y = (~use_x) & (ay >= az)

    face = jnp.where(use_x, jnp.where(dx >= 0, 0, 1),
                     jnp.where(use_y, jnp.where(dy >= 0, 2, 3),
                               jnp.where(dz >= 0, 4, 5)))
    ma = jnp.where(use_x, ax, jnp.where(use_y, ay, az))
    sc = jnp.where(use_x, jnp.where(dx >= 0, -dz, dz),
                   jnp.where(use_y, dx, jnp.where(dz >= 0, dx, -dx)))
    tc = jnp.where(use_x, -dy, jnp.where(use_y, jnp.where(dy >= 0, dz, -dz), -dy))

    ma = jnp.maximum(ma, 1e-12)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)

    assert cubemap.dtype == jnp.int32, \
        "cubemap must be RGB9E5-packed (scene/types.pack_rgb9e5)"
    if cubemap.ndim == 2:                 # [6*F*F, 4] quad rows
        size = int(round((cubemap.shape[0] // 6) ** 0.5))
        assert 6 * size * size == cubemap.shape[0]
        is_quad = True
    else:
        size = cubemap.shape[1]
        is_quad = cubemap.shape[2] == 4 * size
    sf = jnp.float32(size)
    xf = u * sf - 0.5
    yf = v * sf - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = xf - x0
    fy = yf - y0
    x0i = jnp.clip(x0, 0, size - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, size - 1).astype(jnp.int32)

    if is_quad:
        quads = cubemap if cubemap.ndim == 2 else cubemap.reshape(-1, 4)
        q = quads[(face * size + y0i) * size + x0i]
        # clamp-to-edge at the LOW edge: x0 < 0 clamps BOTH x-corners to
        # texel 0 (the prebuilt +1 neighbor is texel 1, wrong here); the
        # high edge is prebuilt as a duplicate.  Same for y.
        lox = x0 < 0
        loy = y0 < 0
        w00 = q[..., 0]
        w10 = jnp.where(lox, q[..., 0], q[..., 1])
        w01 = jnp.where(loy, q[..., 0], q[..., 2])
        w11 = jnp.where(lox & loy, q[..., 0],
                        jnp.where(lox, q[..., 2],
                                  jnp.where(loy, q[..., 1], q[..., 3])))
    else:
        x1i = jnp.clip(x0 + 1, 0, size - 1).astype(jnp.int32)
        y1i = jnp.clip(y0 + 1, 0, size - 1).astype(jnp.int32)
        flat = cubemap.reshape(-1)
        base = face * (size * size)
        w00 = jnp.take(flat, base + y0i * size + x0i)
        w10 = jnp.take(flat, base + y0i * size + x1i)
        w01 = jnp.take(flat, base + y1i * size + x0i)
        w11 = jnp.take(flat, base + y1i * size + x1i)
    out = []
    for (c00, c10, c01, c11) in zip(_decode_rgb9e5(w00), _decode_rgb9e5(w10),
                                    _decode_rgb9e5(w01), _decode_rgb9e5(w11)):
        top = c00 + (c10 - c00) * fx
        bot = c01 + (c11 - c01) * fx
        out.append(top + (bot - top) * fy)
    return tuple(out)
