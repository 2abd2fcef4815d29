"""KTX cubemap loader tests (SURVEY C13; ref load_cubemap
vk_loader.cpp:521-558): hand-built KTX1 and KTX2 containers round-trip
through scene.ktx.load_cubemap and sample correctly via the cubemap
sampler."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from vk_renderer_tpu.scene import ktx
from vk_renderer_tpu.ops import texture as tex

FACE = 8
# distinct per-face base colors (+X,-X,+Y,-Y,+Z,-Z)
FACE_COLORS = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [255, 255, 0], [255, 0, 255], [0, 255, 255]],
                       np.uint8)


def _cube_u8(nchan=4):
    cm = np.zeros((6, FACE, FACE, nchan), np.uint8)
    for f in range(6):
        cm[f, :, :, :3] = FACE_COLORS[f]
        if nchan == 4:
            cm[f, :, :, 3] = 255
    return cm


def _write_ktx1(path, cm, srgb=False):
    """Minimal KTX1 cubemap writer (uncompressed RGBA8/RGB8, one mip)."""
    n_faces, face, _, nchan = cm.shape
    gl_format = 0x1908 if nchan == 4 else 0x1907           # GL_RGBA / GL_RGB
    gl_internal = (0x8C43 if srgb else 0x8058) if nchan == 4 else \
                  (0x8C41 if srgb else 0x8051)
    face_bytes = face * face * nchan
    pad = (4 - face_bytes % 4) % 4
    hdr = b"\xabKTX 11\xbb\r\n\x1a\n" + struct.pack(
        "<13I", 0x04030201, 0x1401, 1, gl_format, gl_internal, gl_format,
        face, face, 0, 0, 6, 1, 0)
    body = struct.pack("<I", face_bytes)
    for f in range(6):
        body += cm[f].tobytes() + b"\x00" * pad
    with open(path, "wb") as fh:
        fh.write(hdr + body)


@pytest.mark.parametrize("container", ["ktx1", "ktx2"])
@pytest.mark.parametrize("nchan", [3, 4])
def test_roundtrip(tmp_path, container, nchan):
    cm = _cube_u8(nchan)
    p = str(tmp_path / f"sky.{container}")
    if container == "ktx1":
        _write_ktx1(p, cm)
    else:
        if nchan == 3:
            pytest.skip("writer emits RGBA8 only")
        ktx.write_ktx2(p, cm)
    out = ktx.load_cubemap(p)
    assert out.shape == (6, FACE, FACE, 3) and out.dtype == np.float32
    want = FACE_COLORS.astype(np.float32) / 255.0
    np.testing.assert_allclose(out.reshape(6, -1, 3).mean(axis=1), want,
                               atol=1e-6)


def test_srgb_decode(tmp_path):
    cm = _cube_u8(4)
    cm[..., :3] = 128
    p = str(tmp_path / "sky_srgb.ktx2")
    ktx.write_ktx2(p, cm, srgb=True)
    out = ktx.load_cubemap(p)
    lin = ((128 / 255.0 + 0.055) / 1.055) ** 2.4
    np.testing.assert_allclose(out, lin, atol=1e-6)


def test_sampler_sees_correct_faces(tmp_path):
    """Loaded cubemap sampled along the six axes returns each face's
    color — the full pisa_cube-shaped round trip of VERDICT r1 #9."""
    p = str(tmp_path / "sky.ktx2")
    ktx.write_ktx2(p, _cube_u8(4))
    cm = ktx.load_cubemap(p)
    from vk_renderer_tpu.scene.types import pack_rgb9e5
    planes = jnp.asarray(pack_rgb9e5(cm))
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    dx = jnp.asarray(dirs[:, 0]).reshape(6, 1)
    dy = jnp.asarray(dirs[:, 1]).reshape(6, 1)
    dz = jnp.asarray(dirs[:, 2]).reshape(6, 1)
    r, g, b = tex.sample_cubemap(planes, dx, dy, dz)
    got = np.stack([np.asarray(r)[:, 0], np.asarray(g)[:, 0],
                    np.asarray(b)[:, 0]], axis=1)
    want = FACE_COLORS.astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def _cube_f16(scale=1.0):
    """HDR half-float cube: per-face colors scaled past 1.0 (radiance)."""
    cm = np.zeros((6, FACE, FACE, 4), np.float16)
    for f in range(6):
        cm[f, :, :, :3] = (FACE_COLORS[f].astype(np.float32) / 255.0
                           * scale).astype(np.float16)
        cm[f, :, :, 3] = 1.0
    return cm


def test_ktx1_half_float_roundtrip(tmp_path):
    """The actual pisa_cube.ktx container class: KTX1 +
    R16G16B16A16_SFLOAT (vk_engine_init.cpp:678, loaded through libktx at
    vk_loader.cpp:521-558) — VERDICT r3 Missing #3."""
    cm = _cube_f16(scale=3.5)          # HDR values: no u8 quantization
    p = str(tmp_path / "pisa_cube.ktx")
    ktx.write_ktx1_half(p, cm)
    out = ktx.load_cubemap(p)
    assert out.shape == (6, FACE, FACE, 3) and out.dtype == np.float32
    np.testing.assert_allclose(
        out, cm[..., :3].astype(np.float32), rtol=1e-3)


@pytest.mark.parametrize("supercomp", [0, 2, 3])
def test_ktx2_half_float_supercompressed(tmp_path, supercomp):
    """KTX2 16F with none/Zstd/ZLIB supercompression round-trips."""
    if supercomp == 2:
        pytest.importorskip("zstandard")
    cm = _cube_f16(scale=2.0)
    p = str(tmp_path / "sky16f.ktx2")
    ktx.write_ktx2(p, cm, supercomp=supercomp)
    out = ktx.load_cubemap(p)
    np.testing.assert_allclose(
        out, cm[..., :3].astype(np.float32), rtol=1e-3)


def test_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.ktx")
    with open(p, "wb") as f:
        f.write(b"not a ktx file at all")
    with pytest.raises(ValueError):
        ktx.load_cubemap(p)


def test_cubemap_quad_pack_parity(tmp_path):
    """quad_pack_cubemap (one row-4 gather per bilinear) must be
    bit-identical to the plain [6, F, F] form, including face seams and
    clamp-to-edge corners."""
    rng = np.random.default_rng(11)
    from vk_renderer_tpu.scene.types import pack_rgb9e5, quad_pack_cubemap
    cm = rng.uniform(0.0, 4.0, size=(6, 8, 8, 3)).astype(np.float32)
    plain = jnp.asarray(pack_rgb9e5(cm))
    quad = jnp.asarray(quad_pack_cubemap(np.asarray(plain)))
    d = rng.normal(size=(3, 7, 9)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=0, keepdims=True), 1e-6)
    dx, dy, dz = (jnp.asarray(d[i]) for i in range(3))
    want = tex.sample_cubemap(plain, dx, dy, dz)
    got = tex.sample_cubemap(quad, dx, dy, dz)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
