"""Sponza-replica asset pipeline test (VERDICT r3 Missing #2).

Generates a reduced-scale replica GLB + pisa-class KTX1 16F cubemap,
loads BOTH through the production loaders (scene/gltf.py + scene/ktx.py
— the same code path the real Sponza.gltf / pisa_cube.ktx take), and
renders a frame.  Asserts the asset-class invariants the bench relies
on: Khronos-Sponza material/texture distribution, masked foliage
(non-empty masked bucket via texture alpha), NO blend bucket (the real
Sponza has none), and the texture-ID-swap quirk routing normal maps
into metalRoughID."""

import numpy as np
import pytest

from vk_renderer_tpu.graph import driver, frame
from vk_renderer_tpu.graph.scenedata import RenderSettings
from vk_renderer_tpu.scene import ktx, sponza_replica
from vk_renderer_tpu.scene.assembly import SceneBuilder
from vk_renderer_tpu.scene.camera import Camera


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    root = tmp_path_factory.mktemp("replica")
    glb = str(root / "Sponza.glb")
    kx = str(root / "pisa_cube.ktx")
    n_tris, n_tex = sponza_replica.write_glb(glb, tex_size=64, aux_size=32,
                                             scale=0.6)
    sponza_replica.write_pisa_cubemap(kx, face=32)
    return glb, kx, n_tris, n_tex


def test_replica_asset_class(replica):
    glb, kx, n_tris, n_tex = replica
    assert n_tex == 70, "texture count must match the real asset class"
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)          # the 16F KTX1 path
    scene = b.build()
    # 25 scene materials + the builder's default slot
    assert scene.mat_color_factors.shape[0] == 26
    assert scene.n_masked > 0, "foliage/chains must hit the masked bucket"
    assert scene.n_transparent == 0, "the real Sponza has no BLEND"
    assert scene.n_opaque + scene.n_masked == scene.tris.shape[0]
    # texture-ID swap quirk (vk_loader.cpp:353-363): materials WITH a
    # normalTexture carry it in metalRoughID — with the default heap's
    # 2 slots + checkerboard the glTF textures sit above those, so
    # every replica material's metalRoughID differs from its albedo
    mt = scene.mat_tex_ids[1:]                 # skip default material
    assert np.all(mt[:, 2] >= 2), "normal maps must land in metalRoughID"
    assert np.all(mt[:, 2] != mt[:, 0])
    # full-scale replica (generated separately for the bench) carries
    # ~287k tris; the reduced fixture only checks the pipeline
    assert n_tris > 20_000


def test_replica_renders(replica):
    glb, kx, _, _ = replica
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)
    scene = b.build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    # tiny-frame caps: at 192x108 the whole 25k-tri scene lands in 8
    # camera tiles (and the 256^2 light grid has 16), so per-tile caps
    # must cover thousands of candidates — cap overflow here is a test
    # sizing artifact, not a renderer property
    cfg = driver.config_from_settings(
        settings, 192, 108, shadow_size=256, cap_opaque=16384,
        cap_masked=4096, rec_opaque=2048, rec_masked=1024, rec_shadow=4096,
        shadow_cap=32768, masked_peels=12, packed_rows=True,
        masked_tail_rounds=1, masked_tail_peels=4)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    out = frame.render_frame(scene, driver.scene_data_pytree(
        cam, settings, cfg), driver.make_settings_pytree(settings), cfg)
    stats = frame.stats_from_vec(out["stats_vec"])
    img = np.asarray(out["color_u8"])
    assert stats["triangles"] > 10_000
    assert stats["bin_overflow"] == 0
    assert stats["peel_overflow"] == 0
    assert img.std() > 5.0, "frame must not be empty/flat"
