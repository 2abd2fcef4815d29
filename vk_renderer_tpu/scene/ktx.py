"""KTX cubemap loader (SURVEY C13).

The reference delegates to libktx (`VulkanEngine::load_cubemap`,
src/vk_loader.cpp:521-558: ktxTexture_CreateFromNamedFile +
ktxTexture_VkUploadEx, then a CUBE image view over 6 layers).  This module
parses the two container formats directly — KTX1 (identifier "KTX 11") and
KTX2 ("KTX 20") — for the uncompressed byte formats a skybox cubemap
actually uses (RGBA8/RGB8, UNORM or SRGB), and returns the base mip as the
builder's cubemap layout: f32[6, F, F, 3] in Vulkan face order
(+X, -X, +Y, -Y, +Z, -Z — the KTX face order is identical, KTX spec 4.3).

sRGB-format texels are decoded to linear before return, matching what
sampling an _SRGB image does in hardware; the render path's cubemap planes
hold linear radiance (scene/procedural.py:124).

Supercompressed (BasisU/Zstd) and block-compressed payloads are out of
scope and raise ValueError — the reference's libktx would transcode these,
but no shipped asset needs it.
"""

from __future__ import annotations

import struct

import numpy as np

_KTX1_ID = b"\xabKTX 11\xbb\r\n\x1a\n"
_KTX2_ID = b"\xabKTX 20\xbb\r\n\x1a\n"

# Vulkan formats accepted for KTX2 (vkFormat field)
_VK_R8G8B8A8_UNORM = 37
_VK_R8G8B8A8_SRGB = 43
_VK_R8G8B8_UNORM = 23
_VK_R8G8B8_SRGB = 29
_VK2_CHANNELS = {_VK_R8G8B8A8_UNORM: (4, False), _VK_R8G8B8A8_SRGB: (4, True),
                 _VK_R8G8B8_UNORM: (3, False), _VK_R8G8B8_SRGB: (3, True)}

# GL enums for KTX1
_GL_UNSIGNED_BYTE = 0x1401
_GL_RGB = 0x1907
_GL_RGBA = 0x1908
_GL_SRGB8 = 0x8C41
_GL_SRGB8_ALPHA8 = 0x8C43


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92,
                    ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _faces_to_cubemap(raw: bytes, face: int, nchan: int, srgb: bool,
                      face_stride: int | None = None) -> np.ndarray:
    """Six tightly packed faces of ``face``x``face`` texels -> f32 cubemap."""
    fs = face * face * nchan if face_stride is None else face_stride
    out = np.zeros((6, face, face, 3), np.float32)
    for f in range(6):
        img = np.frombuffer(raw, np.uint8, count=face * face * nchan,
                            offset=f * fs)
        img = img.reshape(face, face, nchan)[..., :3].astype(np.float32) / 255.0
        out[f] = _srgb_to_linear(img) if srgb else img
    return out


def _load_ktx1(data: bytes) -> np.ndarray:
    (endianness, gl_type, _gl_type_size, gl_format, gl_internal, _gl_base,
     width, height, depth, n_array, n_faces, _n_mips,
     kv_bytes) = struct.unpack_from("<13I", data, 12)
    if endianness != 0x04030201:
        raise ValueError("big-endian KTX1 not supported")
    if gl_type != _GL_UNSIGNED_BYTE:
        raise ValueError(f"KTX1 glType 0x{gl_type:x} not supported "
                         "(uncompressed 8-bit only)")
    if n_faces != 6 or depth not in (0, 1) or n_array not in (0, 1):
        raise ValueError("not a non-array cubemap KTX1")
    if width != height:
        raise ValueError("cubemap faces must be square")
    if gl_format == _GL_RGBA:
        nchan = 4
    elif gl_format == _GL_RGB:
        nchan = 3
    else:
        raise ValueError(f"KTX1 glFormat 0x{gl_format:x} not supported")
    srgb = gl_internal in (_GL_SRGB8, _GL_SRGB8_ALPHA8)

    off = 12 + 13 * 4 + kv_bytes
    # mip 0: u32 imageSize, then 6 faces each padded to 4 bytes
    (image_size,) = struct.unpack_from("<I", data, off)
    off += 4
    face_bytes = width * height * nchan
    pad = (4 - face_bytes % 4) % 4
    del image_size  # per KTX1: size of ONE face for cubemaps
    return _faces_to_cubemap(data[off:], width, nchan, srgb,
                             face_stride=face_bytes + pad)


def _load_ktx2(data: bytes) -> np.ndarray:
    (vk_format, _type_size, width, height, depth, layers, n_faces,
     level_count, supercomp) = struct.unpack_from("<9I", data, 12)
    if supercomp != 0:
        raise ValueError("supercompressed KTX2 not supported")
    if n_faces != 6 or depth not in (0, 1) or layers not in (0, 1):
        raise ValueError("not a non-array cubemap KTX2")
    if width != height:
        raise ValueError("cubemap faces must be square")
    if vk_format not in _VK2_CHANNELS:
        raise ValueError(f"KTX2 vkFormat {vk_format} not supported "
                         "(RGBA8/RGB8 UNORM/SRGB only)")
    nchan, srgb = _VK2_CHANNELS[vk_format]

    # fixed header (80 bytes) is followed by the level index
    level_index_off = 80
    byte_off, _byte_len, _unc_len = struct.unpack_from(
        "<3Q", data, level_index_off)  # level 0 (largest mip is level 0)
    return _faces_to_cubemap(data[byte_off:], width, nchan, srgb)


def load_cubemap(path: str) -> np.ndarray:
    """KTX1/KTX2 cubemap file -> f32[6, F, F, 3] linear, Vulkan face order.
    Drop-in for SceneBuilder.cubemap (scene/assembly.py:106)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:12] == _KTX1_ID:
        return _load_ktx1(data)
    if data[:12] == _KTX2_ID:
        return _load_ktx2(data)
    raise ValueError(f"{path}: not a KTX1/KTX2 file")


def write_ktx2(path: str, cubemap_u8: np.ndarray, srgb: bool = False) -> None:
    """Minimal KTX2 cubemap writer (tests / asset tooling): u8[6, F, F, 4]
    -> non-supercompressed R8G8B8A8 file with one mip level."""
    assert cubemap_u8.dtype == np.uint8 and cubemap_u8.shape[-1] == 4
    n_faces, face, _, nchan = cubemap_u8.shape
    assert n_faces == 6 and cubemap_u8.shape[1] == cubemap_u8.shape[2]
    vk_format = _VK_R8G8B8A8_SRGB if srgb else _VK_R8G8B8A8_UNORM
    payload = cubemap_u8.tobytes()
    header = _KTX2_ID + struct.pack(
        "<9I", vk_format, 1, face, face, 0, 0, 6, 1, 0)
    # dfd/kvd (u32 off/len each) + sgd (u64 off/len), all empty
    index = struct.pack("<4I2Q", 0, 0, 0, 0, 0, 0)
    level_index_pos = len(header) + len(index)
    data_off = level_index_pos + 24
    level_index = struct.pack("<3Q", data_off, len(payload), len(payload))
    with open(path, "wb") as f:
        f.write(header + index + level_index + payload)
