"""Scene containers: the SoA device arrays the render graph consumes.

This layer replaces the reference's GPU-resident scene state — the packed
vertex/index mesh buffers (src/vk_loader.cpp:186-225), the bindless texture
table (src/vk_engine_init.cpp:215-266), the per-material UBOs
(src/vk_materials.h:14-21) and the flattened RenderObject draw list
(src/vk_types.h:148-163) — with one pytree of jnp arrays uploaded once via
``device_put``.  All counts are static per scene, so the jitted render
function compiles once per scene/resolution.

Vertex layout matches shaders/common.glsl:6-12 semantically (position,
normal, uv, color) but stored SoA, the TPU-friendly layout.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np

MAX_MIPS = 13  # enough for 4096x4096 (bindless capacity era, vk_engine_init.cpp:226)

# Material pass types (src/vk_materials.h MaterialPass: MainColor / Transparent)
PASS_OPAQUE = 0
PASS_TRANSPARENT = 1


@dataclass
class TextureTable:
    """Bindless-equivalent texture heap.

    All texel data lives in one flat ``u32[N]`` buffer of packed RGBA8 —
    exactly the reference's R8G8B8A8 storage (vk_loader.cpp:283): sRGB
    images keep their sRGB encoding (with mips re-encoded after linear-space
    filtering, matching the hardware blit chain vk_images.cpp:64-158) and
    are decoded to linear per-texel at sample time before filtering, exactly
    like VK_FORMAT_R8G8B8A8_SRGB sampling; UNORM images are stored raw.

    The heap is QUAD-INTERLEAVED: word ``4*i + j`` is corner ``j`` of texel
    ``i``'s bilinear 2x2 neighborhood (self, x+1, y+1, both — REPEAT
    wrapped), so a full bilinear fetch is ONE row-4 gather (TPU gathers
    cost per-index, not per-byte; see scene/textures.py build()).

    Per (texture, mip): ``mip_offset[t, m]`` is the quad-row index of texel
    (0,0); level texels are row-major.  ``mip_sizes[t, m] = (width, height)``.
    """
    texels: np.ndarray       # u32[4*N] packed RGBA8 (r | g<<8 | b<<16 | a<<24),
                             # quad-interleaved (4 words per texel)
    mip_offsets: np.ndarray  # i32[T, MAX_MIPS] (texel/quad-row units)
    mip_sizes: np.ndarray    # i32[T, MAX_MIPS, 2]  (w, h) logical, clamped at 1
    n_mips: np.ndarray       # i32[T]
    srgb_flags: np.ndarray = None   # i32[T]: 1 = stored sRGB-encoded
    # baked 3-state alpha-coverage pyramid (scene/textures.py
    # build_alpha_states): 2-bit states packed 16/word over (level, 2x2
    # cell); alpha_state_base[t] = texture t's first global cell index
    # (-1 = no table).  Only albedo textures of discard-capable
    # materials carry one.
    alpha_states: np.ndarray = None      # u32[W]
    alpha_state_base: np.ndarray = None  # i32[T]
    # per-slot sampler mode bits (scene/textures.py gltf_sampler_mode);
    # 0 = the reference's actual bound sampler (trilinear + REPEAT).
    # ``has_custom_samplers`` is STATIC (pytree aux): True compiles the
    # general sampler path (per-pixel filter/wrap selection, 4 single
    # gathers per bilinear instead of 1 quad-row) — scenes whose
    # samplers are all default pay nothing.
    sampler_modes: np.ndarray = None     # i32[T]
    has_custom_samplers: bool = False
    # alpha-only quad table for the masked peel loop (scene/textures.py
    # build_alpha_quads): one u32 per texel packs its 2x2 bilinear
    # neighborhood's alphas — a bilinear alpha fetch is ONE flat take
    alpha_quads: np.ndarray = None       # u32[N]
    alpha_quad_base: np.ndarray = None   # i32[T] (-1 = none)


@dataclass
class SceneArrays:
    """Everything the jitted frame function needs, as one pytree."""
    # vertex pool (SoA) — shaders/common.glsl:6-12
    positions: np.ndarray    # f32[V, 3]
    normals: np.ndarray      # f32[V, 3]
    uvs: np.ndarray          # f32[V, 2]
    colors: np.ndarray       # f32[V, 4]
    vert_obj: np.ndarray     # i32[V]   render-object id per vertex

    # triangle pool, sorted [opaque.. | masked.. | transparent..]
    tris: np.ndarray         # i32[T, 3]
    tri_material: np.ndarray # i32[T]
    n_opaque: int = 0        # static: count of opaque (never-discard) tris
    n_masked: int = 0        # static: count of alpha-cutoff-able tris
    n_transparent: int = 0   # static: additive-blend tris

    # render objects (flattened node graph, vk_types.h:148-163)
    obj_world: np.ndarray = None    # f32[O, 4, 4]
    obj_bounds: np.ndarray = None   # f32[O, 4] world-agnostic (center, radius)

    # material table (vk_materials.h:14-21)
    mat_color_factors: np.ndarray = None  # f32[M, 4]
    mat_metal_rough: np.ndarray = None    # f32[M, 4] (x=metallic, y=roughness)
    mat_tex_ids: np.ndarray = None        # i32[M, 3] (albedoID, normalID, metalRoughID)

    # bindless texture heap
    textures: TextureTable = None

    # skybox cubemap, f32[6, F, F, 3], +X -X +Y -Y +Z -Z (Vulkan layer order)
    # (device form: ONE RGB9E5-packed u32 [6, F, F] plane — a bilinear
    # corner costs one gather instead of three channel gathers)
    cubemap: np.ndarray = None

    # static: count of masked triangles whose alpha test CAN pass
    # (textures.tri_alpha_bounds amax >= 0.5).  The masked range is
    # sorted [can-pass.. | never-pass..]; never-pass triangles are
    # invisible to the camera raster (excluded from the masked bucket)
    # but still cast shadows (the reference's shadow pass has no
    # fragment stage).  -1 = unclassified (treat all as can-pass)
    n_masked_raster: int = -1

    @property
    def n_masked_vis(self) -> int:
        """Masked triangles the camera raster must consider."""
        return self.n_masked if self.n_masked_raster < 0 \
            else self.n_masked_raster

    @property
    def num_vertices(self) -> int:
        p = self.positions
        return p[0].shape[0] if isinstance(p, tuple) else p.shape[0]

    @property
    def num_triangles(self) -> int:
        t = self.tris
        return t[0].shape[0] if isinstance(t, tuple) else t.shape[0]

    def device_put(self) -> "SceneArrays":
        """Upload all arrays once (the immediate_submit analog,
        vk_loader.cpp:54-74 — but a single batched transfer).

        Per-vertex/per-triangle attribute matrices are split into PLANAR
        column tuples on device ([N, 3]-style minor dims are pathologically
        slow on TPU — see ops/texture.py): ``positions`` becomes
        ``(x, y, z)``, ``tris`` becomes ``(i0, i1, i2)``, the cubemap
        becomes per-channel ``[6, F, F]`` planes, etc.  Host-side builders
        keep the natural 2-D NumPy forms.
        """
        import jax.numpy as jnp

        def put(x):
            if isinstance(x, np.ndarray):
                return jax.device_put(jnp.asarray(x))
            return x

        def put_cols(x):
            return tuple(put(np.ascontiguousarray(x[:, c]))
                         for c in range(x.shape[1]))

        tex = self.textures
        new_tex = None
        if tex is not None:
            # DEVICE form is [N, 4] quad rows (host form stays flat
            # u32[4N]): as a jit ARGUMENT the 2-D array is stored
            # compactly and every quad row-gather uses it in place,
            # where the in-program ``reshape(-1, 4)`` of the flat form
            # was re-materialized T(8,128)-padded (32x = ~6 GB for the
            # replica heap) inside cond branches — docs/PERF.md "TPU
            # layout hazards"
            new_tex = TextureTable(
                texels=put(tex.texels.reshape(-1, 4)),
                mip_offsets=put(tex.mip_offsets),
                mip_sizes=put(tex.mip_sizes),
                n_mips=put(tex.n_mips),
                srgb_flags=put(tex.srgb_flags),
                alpha_states=(put(tex.alpha_states.view(np.int32))
                              if tex.alpha_states is not None else None),
                alpha_state_base=put(tex.alpha_state_base),
                sampler_modes=put(tex.sampler_modes),
                has_custom_samplers=tex.has_custom_samplers,
                alpha_quads=(put(tex.alpha_quads.view(np.int32))
                             if tex.alpha_quads is not None else None),
                alpha_quad_base=put(tex.alpha_quad_base))
        cubemap = None
        if self.cubemap is not None:
            # same [N, 4] storage rationale as the texel heap
            q = quad_pack_cubemap(pack_rgb9e5(self.cubemap))
            f, s_, _ = q.shape
            cubemap = put(np.ascontiguousarray(
                q.reshape(f * s_ * s_, 4)))
        # all-ones vertex colors (glTF COLOR_0 default — true for Sponza
        # and most assets) are represented as None on device: the shading
        # path then folds the multiply away AND packs vertex attributes
        # into a single 8-wide row table (3 corner gathers instead of 6
        # per pixel, frame._build_vertex_rows)
        colors = None
        if self.colors is not None and not bool(
                np.all(np.asarray(self.colors)[:, :3] == 1.0)):
            colors = put_cols(self.colors)
        return SceneArrays(
            positions=put_cols(self.positions),
            normals=put_cols(self.normals),
            uvs=put_cols(self.uvs),
            colors=colors,
            vert_obj=put(self.vert_obj),
            tris=put_cols(self.tris),
            tri_material=put(self.tri_material),
            n_opaque=self.n_opaque, n_masked=self.n_masked,
            n_transparent=self.n_transparent,
            obj_world=put(self.obj_world),
            obj_bounds=put(self.obj_bounds),
            mat_color_factors=put(self.mat_color_factors),
            mat_metal_rough=put(self.mat_metal_rough),
            mat_tex_ids=put(self.mat_tex_ids),
            textures=new_tex,
            cubemap=cubemap,
            n_masked_raster=self.n_masked_raster,
        )


RGB9E5_EXP_BIAS = 15
RGB9E5_MANTISSA_BITS = 9


def pack_rgb9e5(rgb: np.ndarray) -> np.ndarray:
    """f32[..., 3] (non-negative, HDR up to ~6.5e4) -> shared-exponent
    RGB9E5 u32 [...] (EXT_texture_shared_exponent layout: r | g<<9 | b<<18
    | e<<27).  ~9-bit relative precision per channel; one 32-bit word per
    texel makes a cubemap bilinear corner a single gather."""
    c = np.clip(np.asarray(rgb, np.float32), 0.0, 65408.0)
    maxc = np.maximum(c.max(axis=-1), 1e-12)
    e = np.clip(np.floor(np.log2(maxc)).astype(np.int32) + 1
                + RGB9E5_EXP_BIAS, 0, 31)
    scale = np.exp2(e - RGB9E5_EXP_BIAS - RGB9E5_MANTISSA_BITS
                    ).astype(np.float32)
    m = np.clip(np.round(c / scale[..., None]).astype(np.int32), 0, 511)
    return (m[..., 0] | (m[..., 1] << 9) | (m[..., 2] << 18)
            | (e << 27)).astype(np.int32)


def quad_pack_cubemap(packed: np.ndarray) -> np.ndarray:
    """RGB9E5 i32[6, F, F] -> quad-interleaved i32[6, F, 4F]: word
    ``(f, y, 4x + j)`` is corner j of texel (x, y)'s bilinear 2x2
    neighborhood (self, x+1, y+1, both — CLAMP-to-edge, matching the
    sampler's per-face clamp), so a cubemap bilinear is ONE row-4 gather
    (ops/texture.sample_cubemap)."""
    xp = np.concatenate([packed[:, :, 1:], packed[:, :, -1:]], axis=2)
    yp = np.concatenate([packed[:, 1:, :], packed[:, -1:, :]], axis=1)
    xyp = np.concatenate([yp[:, :, 1:], yp[:, :, -1:]], axis=2)
    f, s, _ = packed.shape
    return np.stack([packed, xp, yp, xyp],
                    axis=-1).reshape(f, s, 4 * s).astype(np.int32)


def register_pytrees():
    """Register scene containers as jax pytrees (static counts as aux)."""
    def scene_flatten(s: SceneArrays):
        children = (s.positions, s.normals, s.uvs, s.colors, s.vert_obj,
                    s.tris, s.tri_material, s.obj_world, s.obj_bounds,
                    s.mat_color_factors, s.mat_metal_rough, s.mat_tex_ids,
                    s.textures, s.cubemap)
        aux = (s.n_opaque, s.n_masked, s.n_transparent, s.n_masked_raster)
        return children, aux

    def scene_unflatten(aux, children):
        (positions, normals, uvs, colors, vert_obj, tris, tri_material,
         obj_world, obj_bounds, mcf, mmr, mti, textures, cubemap) = children
        return SceneArrays(positions, normals, uvs, colors, vert_obj, tris,
                           tri_material, aux[0], aux[1], aux[2], obj_world,
                           obj_bounds, mcf, mmr, mti, textures, cubemap,
                           n_masked_raster=aux[3])

    def tex_flatten(t: TextureTable):
        return ((t.texels, t.mip_offsets, t.mip_sizes, t.n_mips,
                 t.srgb_flags, t.alpha_states, t.alpha_state_base,
                 t.sampler_modes, t.alpha_quads, t.alpha_quad_base),
                (t.has_custom_samplers,))

    def tex_unflatten(aux, children):
        (texels, mip_offsets, mip_sizes, n_mips, srgb_flags, alpha_states,
         alpha_state_base, sampler_modes, alpha_quads,
         alpha_quad_base) = children
        return TextureTable(texels, mip_offsets, mip_sizes, n_mips,
                            srgb_flags, alpha_states, alpha_state_base,
                            sampler_modes, aux[0], alpha_quads,
                            alpha_quad_base)

    jax.tree_util.register_pytree_node(SceneArrays, scene_flatten, scene_unflatten)
    jax.tree_util.register_pytree_node(TextureTable, tex_flatten, tex_unflatten)


register_pytrees()
