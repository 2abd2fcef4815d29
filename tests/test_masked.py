"""Alpha-cutoff (masked bucket) semantics: discard reveals what's behind."""

import numpy as np
import pytest

from vk_renderer_tpu.graph import driver
from vk_renderer_tpu.graph.frame import FrameConfig
from vk_renderer_tpu.graph.scenedata import RenderSettings
from vk_renderer_tpu.scene import procedural
from vk_renderer_tpu.scene.assembly import Material, Node, SceneBuilder
from vk_renderer_tpu.scene.camera import Camera

W, H = 256, 128


def _scene_with_cutout():
    """A solid red wall behind a 'fence' texture with a transparent hole in
    its middle: pixels through the hole must show the wall."""
    b = SceneBuilder()
    # fence texture: opaque green except a fully transparent center block
    img = np.zeros((64, 64, 4), np.uint8)
    img[...] = (40, 200, 40, 255)
    img[16:48, 16:48, 3] = 0
    fence_tex = b.heap.add(img, srgb=True, mipmapped=True)
    m_fence = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0, 1, 0, 0], np.float32),
        albedo_id=fence_tex, can_discard=True))
    m_wall = b.add_material(Material(
        color_factors=np.array([1, 0, 0, 1], np.float32),
        metal_rough_factors=np.array([0, 1, 0, 0], np.float32),
        albedo_id=b.default_ids["white"]))

    def quad(z):
        pos = np.array([[-2, -2, z], [2, -2, z], [2, 2, z], [-2, 2, z]],
                       np.float32)
        nrm = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return (pos, nrm, uv, tris)

    wall = procedural.make_mesh("wall", [quad(-8.0)], [m_wall])
    fence = procedural.make_mesh("fence", [quad(-5.0)], [m_fence])
    b.root.add_child(Node(mesh=wall))
    b.root.add_child(Node(mesh=fence))
    return b.build()


def test_masked_low_base_color_alpha_not_culled():
    """A MASK material with baseColorFactor.a < 1 (valid glTF) must still
    render: the discard operand is the RAW texture alpha
    (mesh_pbr.frag:193 — colorFactors.a does not participate), so
    tri_alpha_bounds must not scale its bounds by cf_a.  The round-4 bug
    classified every triangle of such a material never-pass and silently
    culled it (ADVICE r4, high)."""
    b = SceneBuilder()
    img = np.zeros((16, 16, 4), np.uint8)
    img[...] = (40, 200, 40, 255)          # fully opaque texels
    tex = b.heap.add(img, srgb=True, mipmapped=True)
    m = b.add_material(Material(
        color_factors=np.array([1, 1, 1, 0.4], np.float32),  # cf_a < 0.5
        metal_rough_factors=np.array([0, 1, 0, 0], np.float32),
        albedo_id=tex, can_discard=True))
    pos = np.array([[-2, -2, -5], [2, -2, -5], [2, 2, -5], [-2, 2, -5]],
                   np.float32)
    nrm = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = procedural.make_mesh("quad", [(pos, nrm, uv, tris)], [m])
    b.root.add_child(Node(mesh=mesh))
    scene = b.build()
    # the always-opaque texture must classify every triangle can-pass
    assert scene.n_masked == 2 and scene.n_masked_vis == 2
    dscene = scene.device_put()
    cfg = FrameConfig(width=W, height=H, cap_opaque=64, cap_masked=64,
                      cap_transparent=64, raster_chunk=32, masked_chunk=8,
                      shadow_size=256, shadow_cap=256,
                      shading="flat", use_skybox=False)
    s = RenderSettings()
    s.sunlight_color = np.array([0, 0, 0, 1], np.float32)
    out = driver.render(dscene, Camera(), s, cfg)
    color = np.asarray(out["color"])
    c = color[:, H // 2, W // 2]
    assert c[1] > 0.02, f"masked quad with cf_a<1 must render, got {c}"


def test_cutout_reveals_wall():
    scene = _scene_with_cutout().device_put()
    assert scene.n_masked == 2 and scene.n_opaque == 2
    cfg = FrameConfig(width=W, height=H, cap_opaque=64, cap_masked=64,
                      cap_transparent=64, raster_chunk=32, masked_chunk=8,
                      shadow_size=256, shadow_cap=256,
                      shading="flat", use_skybox=False)
    s = RenderSettings()
    s.sunlight_color = np.array([0, 0, 0, 1], np.float32)  # ambient only
    out = driver.render(scene, Camera(), s, cfg)
    color = np.asarray(out["color"])
    depth = np.asarray(out["depth"])

    # center pixel: through the hole -> red wall (ambient*red = (0.1,0,0))
    c = color[:, H // 2, W // 2]
    assert c[0] > 0.05 and c[1] < 0.02, f"hole should show wall, got {c}"
    # fence region outside the hole: green
    cy = color[:, H // 2, W // 2 + 40]
    assert cy[1] > cy[0], f"fence should be green, got {cy}"
    # depth through the hole is the wall's (farther than the fence)
    assert depth[H // 2, W // 2] > depth[H // 2, W // 2 + 40]
