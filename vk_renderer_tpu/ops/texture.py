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

from .gatherutil import take2


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


def _bilinear_level(texels, offsets, sizes, tex_id, u, v, level, srgb,
                    channels=(0, 1, 2, 3)):
    """One mip level, REPEAT wrap, bilinear over the packed u32 heap:
    four plain flat takes, one per corner (the u32 packing makes each take
    fetch all four RGBA channels at once).
    Returns a tuple of [H, W] planes for the requested channels."""
    off, w, h = _desc_take(offsets, sizes, tex_id, level)
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
    y1i = wrap(y0 + 1, h)
    stride = w + 1                          # wrap-padded rows
    # each x-pair via ONE row-4 double-fetch (take2): 2 gather index-units
    # per bilinear row instead of 2 plain takes — row gathers are ~3x
    # cheaper per index (gatherutil cost table); the wrap-padded rows
    # guarantee address+1 is the REPEAT texel
    p00, p10 = take2(texels, off + y0i * stride + x0i)
    p01, p11 = take2(texels, off + y1i * stride + x0i)

    out = []
    for (t00, t10, t01, t11) in zip(_unpack_rgba8(p00, srgb, channels),
                                    _unpack_rgba8(p10, srgb, channels),
                                    _unpack_rgba8(p01, srgb, channels),
                                    _unpack_rgba8(p11, srgb, channels)):
        top = t00 + (t10 - t00) * fx
        bot = t01 + (t11 - t01) * fx
        out.append(top + (bot - top) * fy)
    return tuple(out)


def _meta_take(textures, tex_id):
    """Per-texture (w0, h0, max_level, srgb) as ONE [T, 4] row-gather
    (was four flat takes per sample)."""
    rows = jnp.stack(
        [textures.mip_sizes[:, 0, 0], textures.mip_sizes[:, 0, 1],
         textures.n_mips - 1, textures.srgb_flags], axis=-1)
    r = rows[tex_id]
    return (r[..., 0].astype(jnp.float32), r[..., 1].astype(jnp.float32),
            r[..., 2].astype(jnp.float32), r[..., 3] > 0)


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
    w0, h0, max_level, _ = _meta_take(textures, tex_id)
    return _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy), \
        max_level


def sample_trilinear(textures, tex_id, u, v, dudx, dvdx, dudy, dvdy,
                     channels=(0, 1, 2, 3), nearest_mip: bool = False):
    """Full trilinear sample.  All per-pixel args planar [H, W].
    Returns a tuple of [H, W] planes for the requested channels.

    ``nearest_mip=True`` is the gated fidelity knob (VERDICT r2 task 3):
    ONE bilinear sample at the rounded mip level instead of two blended
    levels — half the texel gathers.  Off by default (exact trilinear);
    enable only for low-frequency content behind a goldens gate."""
    w0, h0, max_level, srgb = _meta_take(textures, tex_id)
    lam = _lod_from_meta(w0, h0, max_level, dudx, dvdx, dudy, dvdy)
    if nearest_mip:
        l0 = jnp.round(lam).astype(jnp.int32)
        return _bilinear_level(textures.texels, textures.mip_offsets,
                               textures.mip_sizes, tex_id, u, v, l0, srgb,
                               channels)
    l0 = jnp.floor(lam).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level.astype(jnp.int32))
    frac = lam - l0.astype(jnp.float32)

    c0 = _bilinear_level(textures.texels, textures.mip_offsets,
                         textures.mip_sizes, tex_id, u, v, l0, srgb, channels)
    c1 = _bilinear_level(textures.texels, textures.mip_offsets,
                         textures.mip_sizes, tex_id, u, v, l1, srgb, channels)
    return tuple(a + (b - a) * frac for a, b in zip(c0, c1))


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
    uncertainty dilation around depth discontinuities (+-2 cells)."""
    return max(16, min(SHADOW_COARSE_BLOCK, size // 32))


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


def sample_shadow_batch(shadow_packed: jax.Array, us: jax.Array,
                        vs: jax.Array, layer: jax.Array) -> jax.Array:
    """Batched bilinear shadow taps.  shadow_packed i32[L, S, S] from
    pack_shadow_maps; us/vs [K, H, W] (K independent filter taps);
    layer [H, W].  Border depth 1.0 outside [0,1]^2 (opaque-white border).

    PERF: ONE flat take per bilinear ROW (2 per tap) — the pair-packed
    words carry both x-corners, and plain takes are the cheapest
    per-index gather form on TPU."""
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
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


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
    """cubemap: RGB9E5-packed u32[6, F, F] (Vulkan face order
    +X -X +Y -Y +Z -Z; scene/types.pack_rgb9e5); direction components
    planar [H, W].  Bilinear, per-face clamp-to-edge, face selection per
    the Vulkan cube-map equations.  Returns (r, g, b) planar.

    One u32 gather per bilinear corner (4 total) replaces the previous
    three per-channel gathers per corner (12)."""
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
    size = cubemap.shape[1]
    sf = jnp.float32(size)
    xf = u * sf - 0.5
    yf = v * sf - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = xf - x0
    fy = yf - y0
    x0i = jnp.clip(x0, 0, size - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, size - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, size - 1).astype(jnp.int32)
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
