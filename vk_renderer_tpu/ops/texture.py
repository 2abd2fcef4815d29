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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_texels(texels: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """heap f32[N, 4] gather -> [..., 4]."""
    return texels[flat_idx]


def _bilinear_level(texels, offsets, sizes, tex_id, uv, level):
    """One mip level, REPEAT wrap, bilinear.  uv: [..., 2] in [0,1)-ish.
    tex_id/level: int arrays broadcastable to uv's batch shape."""
    off = offsets[tex_id, level]                       # [...]
    w = sizes[tex_id, level, 0]
    h = sizes[tex_id, level, 1]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    x = uv[..., 0] * wf - 0.5
    y = uv[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i, n):  # REPEAT
        return jnp.mod(i.astype(jnp.int32), n)

    x0i = wrap(x0, w); x1i = wrap(x0 + 1, w)
    y0i = wrap(y0, h); y1i = wrap(y0 + 1, h)

    base = off
    t00 = _gather_texels(texels, base + y0i * w + x0i)
    t10 = _gather_texels(texels, base + y0i * w + x1i)
    t01 = _gather_texels(texels, base + y1i * w + x0i)
    t11 = _gather_texels(texels, base + y1i * w + x1i)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_trilinear(textures, tex_id: jax.Array, uv: jax.Array,
                     duvdx: jax.Array, duvdy: jax.Array) -> jax.Array:
    """Full trilinear sample of the heap. tex_id: i32[...], uv/derivs [...,2].
    Returns RGBA f32[..., 4]."""
    texels = textures.texels
    offsets, sizes, n_mips = textures.mip_offsets, textures.mip_sizes, textures.n_mips

    size0 = sizes[tex_id, 0].astype(jnp.float32)       # [..., 2] (w, h)
    # scale derivatives to level-0 texel units
    ddx = duvdx * size0
    ddy = duvdy * size0
    rho = jnp.maximum(jnp.sqrt(jnp.sum(ddx * ddx, axis=-1)),
                      jnp.sqrt(jnp.sum(ddy * ddy, axis=-1)))
    lam = jnp.log2(jnp.maximum(rho, 1e-12))
    max_level = (n_mips[tex_id] - 1).astype(jnp.float32)
    lam = jnp.clip(lam, 0.0, max_level)

    l0 = jnp.floor(lam).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level.astype(jnp.int32))
    frac = (lam - l0.astype(jnp.float32))[..., None]

    c0 = _bilinear_level(texels, offsets, sizes, tex_id, uv, l0)
    c1 = _bilinear_level(texels, offsets, sizes, tex_id, uv, l1)
    return c0 * (1 - frac) + c1 * frac


def sample_bilinear_lod0(textures, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample at the base level (no mip chain)."""
    return _bilinear_level(textures.texels, textures.mip_offsets,
                           textures.mip_sizes, tex_id, uv,
                           jnp.zeros_like(tex_id))


# ----------------------------------------------------------------------------
# shadow map: 2D array, linear filter, clamp-to-border white
# ----------------------------------------------------------------------------

def sample_shadow(shadow_maps: jax.Array, uv: jax.Array,
                  layer: jax.Array) -> jax.Array:
    """shadow_maps f32[L, S, S]; uv [..., 2]; layer i32 broadcastable.
    Bilinear with border depth 1.0 outside [0,1]^2 (opaque-white border:
    depth 1.0 compares as 'no blocker')."""
    size = shadow_maps.shape[-1]
    sf = jnp.float32(size)
    x = uv[..., 0] * sf - 0.5
    y = uv[..., 1] * sf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < size) & (yi >= 0) & (yi < size)
        xc = jnp.clip(xi, 0, size - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, size - 1).astype(jnp.int32)
        v = shadow_maps[layer, yc, xc]
        return jnp.where(inside, v, 1.0)

    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    t00 = tap(x0i, y0i); t10 = tap(x0i + 1, y0i)
    t01 = tap(x0i, y0i + 1); t11 = tap(x0i + 1, y0i + 1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


# ----------------------------------------------------------------------------
# cubemap
# ----------------------------------------------------------------------------

def sample_cubemap(cubemap: jax.Array, direction: jax.Array) -> jax.Array:
    """cubemap f32[6, F, F, 3] (Vulkan face order +X -X +Y -Y +Z -Z);
    direction [..., 3] (need not be normalized).  Bilinear, per-face
    clamp-to-edge.  Face selection per the Vulkan cube-map equations."""
    d = direction
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    # (face, ma, sc, tc) per Vulkan spec table 16.10
    use_x = (ax >= ay) & (ax >= az)
    use_y = (~use_x) & (ay >= az)

    face = jnp.where(use_x, jnp.where(x >= 0, 0, 1),
                     jnp.where(use_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5)))
    ma = jnp.where(use_x, ax, jnp.where(use_y, ay, az))
    sc = jnp.where(use_x, jnp.where(x >= 0, -z, z),
                   jnp.where(use_y, x, jnp.where(z >= 0, x, -x)))
    tc = jnp.where(use_x, -y, jnp.where(use_y, jnp.where(y >= 0, z, -z), -y))

    ma = jnp.maximum(ma, 1e-12)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)

    size = cubemap.shape[1]
    sf = jnp.float32(size)
    xf = u * sf - 0.5
    yf = v * sf - 0.5
    x0 = jnp.floor(xf); y0 = jnp.floor(yf)
    fx = (xf - x0)[..., None]
    fy = (yf - y0)[..., None]

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, size - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, size - 1).astype(jnp.int32)
        return cubemap[face, yc, xc]

    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    t00 = tap(x0i, y0i); t10 = tap(x0i + 1, y0i)
    t01 = tap(x0i, y0i + 1); t11 = tap(x0i + 1, y0i + 1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
