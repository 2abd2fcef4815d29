"""Scene layer tests: glTF parsing, texture heap, assembly invariants."""

import json
import os

import numpy as np
import pytest

from vk_renderer_tpu.scene import procedural, textures
from vk_renderer_tpu.scene.assembly import SceneBuilder
from vk_renderer_tpu.scene.gltf import GltfAsset


def _write_cube_gltf(tmp_path):
    """Emit a tiny valid glTF: one 8-vert indexed cube with a material."""
    pos = np.array([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3, 4, 6, 5, 4, 7, 6,
                    0, 4, 5, 0, 5, 1, 2, 6, 7, 2, 7, 3,
                    1, 5, 6, 1, 6, 2, 0, 3, 7, 0, 7, 4], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    (tmp_path / "buf.bin").write_bytes(buf)
    j = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "buf.bin", "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 8, "type": "VEC3",
             "min": [-1, -1, -1], "max": [1, 1, 1]},
            {"bufferView": 1, "componentType": 5123, "count": 36, "type": "SCALAR"},
        ],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.5}}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "nodes": [{"mesh": 0, "translation": [1, 2, 3]}],
        "scenes": [{"nodes": [0]}],
    }
    p = tmp_path / "cube.gltf"
    p.write_text(json.dumps(j))
    return str(p)


class TestGltfParser:
    def test_load_and_accessors(self, tmp_path):
        path = _write_cube_gltf(tmp_path)
        a = GltfAsset.load(path)
        pos = a.read_accessor(0)
        assert pos.shape == (8, 3)
        np.testing.assert_allclose(pos[6], [1, 1, 1])
        idx = a.read_accessor(1)
        assert idx.shape == (36, 1)
        assert idx.max() == 7

    def test_trs_transform(self):
        n = {"translation": [1, 2, 3], "rotation": [0, 0, 0, 1], "scale": [2, 2, 2]}
        m = GltfAsset.node_local_transform(n)
        np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(m[0, 0], 2)

    def test_rotation_quat(self):
        # 90 deg about z: x-axis -> y-axis
        s = np.sin(np.pi / 4)
        m = GltfAsset.node_local_transform({"rotation": [0, 0, s, np.cos(np.pi / 4)]})
        out = m[:3, :3] @ np.array([1, 0, 0])
        np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)

    def test_builder_load(self, tmp_path):
        path = _write_cube_gltf(tmp_path)
        b = SceneBuilder()
        b.load_gltf(path)
        scene = b.build()
        assert scene.num_triangles == 12
        assert scene.n_opaque == 12
        # node translation applied as world matrix
        np.testing.assert_allclose(scene.obj_world[0][:3, 3], [1, 2, 3])
        # material factors flow through (default material is index 0)
        np.testing.assert_allclose(scene.mat_color_factors[1], [0.8, 0.2, 0.2, 1.0])


class TestTextureHeap:
    def test_default_slots_match_reference_quirk(self):
        b, ids = textures.make_default_heap()
        t = b.build()
        # slot 0 = flat normal (vk_engine_init.cpp:351-355 double write);
        # heap is packed RGBA8 u32, quad-interleaved (4 words per texel)
        def unpack(v):
            return [(int(v) >> (8 * c)) & 0xFF for c in range(4)]
        assert unpack(t.texels[4 * t.mip_offsets[0, 0]]) == [128, 128, 255, 255]
        assert unpack(t.texels[4 * t.mip_offsets[1, 0]]) == [255, 255, 255, 255]

    def test_mip_chain_counts(self):
        b = textures.TextureHeapBuilder()
        img = np.full((64, 32, 4), 128, np.uint8)
        i = b.add(img, srgb=False, mipmapped=True)
        t = b.build()
        assert t.n_mips[i] == 7  # 64 -> 1
        np.testing.assert_array_equal(t.mip_sizes[i, 0], [32, 64])
        np.testing.assert_array_equal(t.mip_sizes[i, 6], [1, 1])

    def test_mip_downsample_is_box_average_for_even(self):
        img = np.zeros((4, 4, 1), np.float32)
        img[0, 0] = 1.0  # one bright texel
        m = textures.blit_resize_bilinear(img, 2, 2)
        assert m[0, 0, 0] == pytest.approx(0.25)
        assert m[1, 1, 0] == pytest.approx(0.0)

    def test_srgb_roundtrip_and_flag(self):
        b = textures.TextureHeapBuilder()
        solid = b.add_solid((1.0, 1.0, 1.0, 1.0))
        img = np.full((2, 2, 4), 128, np.uint8)
        i = b.add(img, srgb=True, mipmapped=False)
        t = b.build()
        # sRGB u8 -> linear f32 -> sRGB u8 must round-trip exactly
        v = int(t.texels[4 * t.mip_offsets[i, 0]])
        assert (v & 0xFF) == 128 and ((v >> 24) & 0xFF) == 128
        assert t.srgb_flags[i] == 1 and t.srgb_flags[solid] == 0

    def test_quad_neighbors_wrap(self):
        b = textures.TextureHeapBuilder()
        img = np.zeros((2, 4, 4), np.uint8)
        img[0, 0] = (10, 20, 30, 40)
        i = b.add(img, srgb=False, mipmapped=False)
        t = b.build()
        off = int(t.mip_offsets[i, 0])
        w = int(t.mip_sizes[i, 0, 0])
        h = int(t.mip_sizes[i, 0, 1])
        quad = t.texels.reshape(-1, 4)
        # quad corner 1 at x == w-1 is the REPEAT wrap texel (x == 0)
        assert quad[off + (w - 1), 1] == quad[off, 0]
        # quad corner 2 at y == h-1 wraps to row 0
        assert quad[off + (h - 1) * w, 2] == quad[off, 0]

    def test_desc_from_meta_matches_tables(self):
        # the trilinear path DERIVES mip descriptors arithmetically
        # (texture._desc_from_meta) instead of gathering mip_offsets/
        # mip_sizes — must reproduce the build's tables exactly for
        # every level, including non-square and non-power-of-two sizes
        # (odd sizes exercise the max(x >> m, 1) == iterated-halving
        # identity) and 1x1 solids
        import jax.numpy as jnp

        from vk_renderer_tpu.ops.texture import _desc_from_meta

        b = textures.TextureHeapBuilder()
        idxs = []
        for (w, h) in [(64, 32), (5, 3), (1, 1), (37, 128), (256, 7)]:
            idxs.append(b.add(np.zeros((h, w, 4), np.uint8), srgb=False,
                              mipmapped=True))
        idxs.append(b.add_solid((1.0, 0.0, 0.0, 1.0)))
        t = b.build()
        for i in idxs:
            n = int(t.n_mips[i])
            base = jnp.int32(t.mip_offsets[i, 0])
            w0 = jnp.int32(t.mip_sizes[i, 0, 0])
            h0 = jnp.int32(t.mip_sizes[i, 0, 1])
            for lvl in range(n):
                off, w, h = _desc_from_meta(base, w0, h0, jnp.int32(lvl))
                assert int(off) == int(t.mip_offsets[i, lvl]), (i, lvl)
                assert int(w) == int(t.mip_sizes[i, lvl, 0]), (i, lvl)
                assert int(h) == int(t.mip_sizes[i, lvl, 1]), (i, lvl)

    def test_min_alpha_classification(self):
        b = textures.TextureHeapBuilder()
        solid = b.add(np.full((8, 8, 4), 255, np.uint8), srgb=True, mipmapped=True)
        holey_img = np.full((8, 8, 4), 255, np.uint8)
        holey_img[2:4, 2:4, 3] = 0
        holey = b.add(holey_img, srgb=True, mipmapped=True)
        assert b.min_alpha(solid) >= 0.5
        assert b.min_alpha(holey) < 0.5


class TestProcedural:
    def test_cube_scene(self):
        scene = procedural.build_cube_scene().build()
        assert scene.num_triangles == 12
        assert scene.cubemap.shape == (6, 128, 128, 3)
        assert scene.num_vertices == 24

    def test_sponza_like_scale(self):
        scene = procedural.build_sponza_like(target_tris=50_000).build()
        assert scene.num_triangles >= 50_000
        assert scene.n_masked > 0          # foliage exercises alpha discard
        assert scene.n_transparent > 0     # additive panes
        # buckets are contiguous: [opaque | masked | transparent]
        assert (scene.n_opaque + scene.n_masked + scene.n_transparent
                == scene.num_triangles)
        # every vertex belongs to an object with a world matrix
        assert scene.vert_obj.max() < scene.obj_world.shape[0]

    def test_device_put(self):
        import jax
        scene = procedural.build_cube_scene().build().device_put()
        leaves = jax.tree_util.tree_leaves(scene)
        assert all(hasattr(l, "devices") or np.isscalar(l) for l in leaves)
