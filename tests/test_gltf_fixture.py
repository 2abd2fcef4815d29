"""The checked-in real-exporter-shaped glTF asset (VERDICT r2 task 7).

tests/fixtures/textured_box/ is a committed, export-style asset: external
.bin buffer, interleaved byteStride accessors, uint16 indices, PNG image
URIs, OPAQUE + MASK materials, matrix + TRS node transforms
(tools/make_gltf_fixture.py; loader surface: scene/gltf.py, ref
vk_loader.cpp:227-518).  The rendered image is gated as golden
``gltf_fixture`` in test_goldens.py; this file checks the loader-level
semantics directly.
"""

import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "textured_box",
                       "scene.gltf")


def test_strided_accessors_roundtrip():
    """Interleaved (byteStride 32) attribute reads must match the tight
    quad reads and the generator's geometry."""
    from vk_renderer_tpu.scene.gltf import GltfAsset
    asset = GltfAsset.load(FIXTURE)
    pos = asset.read_accessor(0)     # box positions via strided view
    nrm = asset.read_accessor(1)
    uv = asset.read_accessor(2)
    assert pos.shape == (24, 3) and nrm.shape == (24, 3) and uv.shape == (24, 2)
    # unit box centered at origin
    np.testing.assert_allclose(pos.min(0), [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(pos.max(0), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0)
    idx = asset.read_accessor(3).reshape(-1)
    assert idx.shape == (36,) and idx.max() == 23


def test_scene_assembly_buckets_and_images():
    """MASK material lands in the masked bucket; PNG URIs decode; node
    matrix+TRS transforms compose into object worlds."""
    from vk_renderer_tpu.scene.assembly import SceneBuilder
    b = SceneBuilder()
    b.load_gltf(FIXTURE, "fixture")
    s = b.build()
    assert s.n_opaque == 12 and s.n_masked == 2 and s.n_transparent == 0
    # two textures + the default slots
    assert s.textures.n_mips.shape[0] >= 2
    # the box child carries matrix(root) @ TRS(child): translation y
    # includes the root's +0.5
    worlds = np.asarray(s.obj_world)
    ys = worlds[:, 1, 3]
    assert np.any(np.isclose(ys, 0.5)) or np.any(np.isclose(ys, 0.0)), ys
    zs = worlds[:, 2, 3]
    assert np.any(np.isclose(zs, -4.0)) and np.any(np.isclose(zs, -3.0))


def test_mask_material_discards_in_render():
    """Alpha holes in the leaf texture must show background through the
    masked quad (discard semantics end-to-end on a real asset)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import golden_configs, render_config
    entry = next(e for e in golden_configs() if e[0] == "gltf_fixture")
    _, builder, settings, cfg = entry
    img = render_config(builder, settings, cfg).astype(np.float32)
    # leaf quad region (right of center): red-channel background
    # (bg gradient is red at the top) must peek through some holes while
    # green leaf texels dominate elsewhere — i.e. the region is MIXED
    region = img[:60, 150:230]
    green_frac = ((region[..., 1] > region[..., 0] + 20)).mean()
    assert 0.05 < green_frac < 0.95, green_frac
