"""Texture heap construction: decode, mip generation, bindless table.

Replicates the reference's texture pipeline on the host at load time:
- glTF images decode to RGBA8 and upload as R8G8B8A8_SRGB with full mip
  chains (src/vk_loader.cpp:272-329); sampling hardware decodes sRGB->linear
  before filtering, so we store linear floats.
- default 1x1 textures and the magenta/black checkerboard are
  R8G8B8A8_UNORM (src/vk_engine_init.cpp:318-341) — stored raw.
- mip generation is the vkCmdBlitImage linear-filter chain
  (src/vk_images.cpp:64-158): each level bilinearly resamples the previous
  at destination pixel centers.

Bindless slot layout replicates the reference exactly, including its
slot-0 double-write quirk (SURVEY.md quirk 2): slot 0 holds the flat-normal
color (0.5, 0.5, 1, 1) — because init_default_data writes white to slot 0
then overwrites slot 0 with the default normal (vk_engine_init.cpp:351-355)
— slot 1 is never written (we store white), and glTF textures start at 2.
"""

from __future__ import annotations

import numpy as np

from ..utils.image import linear_to_srgb, srgb_to_linear
from .types import MAX_MIPS, TextureTable


def blit_resize_bilinear(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Bilinear resample f32[H, W, C] to (dst_h, dst_w) at dst pixel centers,
    clamp-to-edge — the vkCmdBlitImage(VK_FILTER_LINEAR) sampling rule."""
    src_h, src_w = img.shape[:2]
    xs = (np.arange(dst_w, dtype=np.float64) + 0.5) * (src_w / dst_w) - 0.5
    ys = (np.arange(dst_h, dtype=np.float64) + 0.5) * (src_h / dst_h) - 0.5
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = (xs - x0).astype(np.float32)
    fy = (ys - y0).astype(np.float32)
    x0c = np.clip(x0, 0, src_w - 1); x1c = np.clip(x0 + 1, 0, src_w - 1)
    y0c = np.clip(y0, 0, src_h - 1); y1c = np.clip(y0 + 1, 0, src_h - 1)
    a = img[y0c][:, x0c]
    b = img[y0c][:, x1c]
    c = img[y1c][:, x0c]
    d = img[y1c][:, x1c]
    fx = fx[None, :, None]
    fy = fy[:, None, None]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy).astype(np.float32)


def generate_mips(level0: np.ndarray) -> list[np.ndarray]:
    """Full mip chain down to 1x1 (mipLevels = floor(log2(max(w,h)))+1,
    src/vk_loader.cpp:121)."""
    mips = [level0.astype(np.float32)]
    h, w = level0.shape[:2]
    n_levels = int(np.floor(np.log2(max(w, h)))) + 1
    for _ in range(1, n_levels):
        w = max(w // 2, 1)
        h = max(h // 2, 1)
        mips.append(blit_resize_bilinear(mips[-1], w, h))
    return mips


class TextureHeapBuilder:
    """Accumulates textures into the flat heap (the bindless table analog)."""

    def __init__(self):
        self._textures: list[list[np.ndarray]] = []   # per texture: list of mips
        self._srgb: list[bool] = []

    def add(self, rgba_u8: np.ndarray, *, srgb: bool, mipmapped: bool) -> int:
        """Add an RGBA8 image; returns its bindless index.  Uses the native
        C++ texture pipeline (native/texops.cpp) when built, NumPy otherwise
        — outputs are identical (tests assert parity)."""
        rgba_u8 = np.asarray(rgba_u8)
        assert rgba_u8.dtype == np.uint8 and rgba_u8.ndim == 3 and rgba_u8.shape[2] == 4

        from .. import native_bridge
        f = native_bridge.decode_rgba8(rgba_u8, srgb)
        if f is None:
            f = rgba_u8.astype(np.float32) / 255.0
            if srgb:
                # hardware sRGB decode applies to RGB only; alpha stays linear
                f = np.concatenate([srgb_to_linear(f[..., :3]), f[..., 3:]],
                                   axis=-1)
        if mipmapped:
            mips = native_bridge.generate_mips(f)
            if mips is None:
                mips = generate_mips(f)
        else:
            mips = [f]
        # the descriptor table has MAX_MIPS slots; a >4096^2 texture's chain
        # must be clamped or build() would index past offsets[t, MAX_MIPS-1]
        mips = mips[:MAX_MIPS]
        # base dimensions must fit the 13-bit packed-meta fields
        # (ops/texture.packed_meta_cols packs w0/h0 as <= 8191); beyond that
        # the packed-rows path would silently decode w0=0 and sample garbage
        # while the narrow path stayed correct — reject loudly instead
        h0, w0 = mips[0].shape[:2]
        if w0 > 8191 or h0 > 8191:
            raise ValueError(
                f"texture {w0}x{h0} exceeds the 8191px packed-meta limit "
                "(downscale at load; the reference's bindless era caps at "
                "4096^2, vk_engine_init.cpp:226)")
        self._textures.append(mips)
        self._srgb.append(bool(srgb))
        return len(self._textures) - 1

    def add_solid(self, rgba: tuple[float, float, float, float]) -> int:
        """1x1 UNORM constant texture (the default-texture path)."""
        px = np.array([[list(rgba)]], dtype=np.float32)
        self._textures.append([px])
        self._srgb.append(False)
        return len(self._textures) - 1

    def min_alpha(self, index: int) -> float:
        """Min texel alpha across all mips — used to classify materials as
        never-discarding (bilinear filtering of values >= 0.5 stays >= 0.5,
        so min >= 0.5 means mesh_pbr.frag:193 can never discard)."""
        return float(min(m[..., 3].min() for m in self._textures[index]))

    def build(self) -> TextureTable:
        """Pack the heap: RGBA8 in uint32 (the reference's texture format),
        sRGB textures stored sRGB-encoded (mips re-encoded after the
        linear-space blit chain — the hardware behavior), QUAD-INTERLEAVED:
        heap word ``4*i + j`` holds corner ``j`` of texel ``i``'s bilinear
        2x2 neighborhood (j = self, x+1, y+1, x+1&y+1, REPEAT-wrapped), so
        a full bilinear fetch is ONE row-4 gather (TPU gathers cost per
        index, not per byte — see ops/gatherutil's measured table; the 4x
        heap memory buys back ~3x of the sampler's gather cost)."""
        n_tex = len(self._textures)
        offsets = np.zeros((n_tex, MAX_MIPS), dtype=np.int32)
        sizes = np.ones((n_tex, MAX_MIPS, 2), dtype=np.int32)
        n_mips = np.zeros(n_tex, dtype=np.int32)
        srgb_flags = np.array([1 if s else 0 for s in self._srgb], np.int32)
        chunks = []
        cursor = 0
        for t, mips in enumerate(self._textures):
            n_mips[t] = len(mips)
            for m, img in enumerate(mips):
                h, w = img.shape[:2]
                f = np.clip(img, 0.0, 1.0)
                if self._srgb[t]:
                    # re-encode: RGB to sRGB, alpha stays linear
                    f = np.concatenate([linear_to_srgb(f[..., :3]),
                                        f[..., 3:]], axis=-1)
                u8 = (f * 255.0 + 0.5).astype(np.uint32)
                packed = (u8[..., 0] | (u8[..., 1] << 8)
                          | (u8[..., 2] << 16) | (u8[..., 3] << 24))
                # quad-interleave with the REPEAT neighbors
                xp = np.roll(packed, -1, axis=1)
                yp = np.roll(packed, -1, axis=0)
                xyp = np.roll(yp, -1, axis=1)
                quad = np.stack([packed, xp, yp, xyp], axis=-1)  # [h, w, 4]
                offsets[t, m] = cursor          # quad-row (texel) units
                sizes[t, m] = (w, h)
                chunks.append(quad.reshape(-1).astype(np.uint32))
                cursor += w * h
            # clamp-extend: trilinear may address level n_mips-1+1; point the
            # remaining slots at the last real level
            for m in range(len(mips), MAX_MIPS):
                offsets[t, m] = offsets[t, len(mips) - 1]
                sizes[t, m] = sizes[t, len(mips) - 1]
        # heap offsets ride i32 descriptor tables (and the packed rows
        # bitcast them through f32 lanes): the quad-row cursor must fit
        assert cursor < 2**31, "texture heap exceeds int32 addressing"
        texels = (np.concatenate(chunks) if chunks
                  else np.zeros((4,), dtype=np.uint32))
        return TextureTable(texels=texels, mip_offsets=offsets,
                            mip_sizes=sizes, n_mips=n_mips,
                            srgb_flags=srgb_flags)


def make_default_heap() -> tuple[TextureHeapBuilder, dict[str, int]]:
    """Create the heap pre-populated with the reference's default slots
    (vk_engine_init.cpp:318-355, including the slot-0 overwrite quirk) plus
    the error checkerboard used as the load-failure fallback
    (vk_loader.cpp:323-328)."""
    b = TextureHeapBuilder()
    # slot 0: intended white, overwritten by flat normal 0xFFFF8080
    slot0 = b.add_solid((128 / 255.0, 128 / 255.0, 1.0, 1.0))
    # slot 1: never written in the reference; white (the original intent)
    slot1 = b.add_solid((1.0, 1.0, 1.0, 1.0))
    ids = {"default_normal": slot0, "white": slot1}
    return b, ids


def make_checkerboard_u8(size: int = 16) -> np.ndarray:
    """16x16 magenta/black error checkerboard (vk_engine_init.cpp:329-341)."""
    img = np.zeros((size, size, 4), dtype=np.uint8)
    for y in range(size):
        for x in range(size):
            img[y, x] = (255, 0, 255, 255) if (x % 2) ^ (y % 2) else (0, 0, 0, 255)
    return img
