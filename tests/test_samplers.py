"""Per-sampler state (VERDICT r4 task 6): nearest filtering, clamp-to-edge
and mirrored-repeat wrap, honored per glTF sampler.

The reference PARSES these into VkSamplers (src/vk_loader.cpp:253-270)
but binds _defaultSamplerLinear to every bindless slot (:320) — so the
default mode replicates actual reference behavior, and nonzero modes are
the rebuild honoring what the loader parsed.  Gated per scene: default-
sampler scenes keep the 1-gather quad path (has_custom_samplers static).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vk_renderer_tpu.graph import driver, frame
from vk_renderer_tpu.graph.scenedata import RenderSettings
from vk_renderer_tpu.ops import texture as tex
from vk_renderer_tpu.scene import procedural
from vk_renderer_tpu.scene.assembly import Material, Node, SceneBuilder
from vk_renderer_tpu.scene.camera import Camera
from vk_renderer_tpu.scene.textures import (TextureHeapBuilder,
                                            gltf_sampler_mode)

import frame_oracle


def _gradient_texture(size=32):
    """Asymmetric content so wrap/filter differences are visible."""
    img = np.zeros((size, size, 4), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    img[..., 0] = (255 * xx / (size - 1)).astype(np.uint8)
    img[..., 1] = (255 * yy / (size - 1)).astype(np.uint8)
    img[..., 2] = ((xx // 4 + yy // 4) % 2) * 255
    img[..., 3] = 255
    return img


MODES = {
    "nearest": 1 | 2,                       # mag+min NEAREST
    "nearest_mip": 1 | 2 | 4,               # + mipmap NEAREST
    "clamp": (1 << 3) | (1 << 5),           # CLAMP_TO_EDGE both axes
    "mirror": (2 << 3) | (2 << 5),          # MIRRORED_REPEAT both axes
    "mixed": 1 | (1 << 3) | (2 << 5),       # mag NEAREST, clampS, mirrorT
}


@pytest.mark.parametrize("name", sorted(MODES))
def test_sampler_mode_matches_oracle(name):
    mode = MODES[name]
    b = TextureHeapBuilder()
    t = b.add(_gradient_texture(), srgb=True, mipmapped=True,
              sampler_mode=mode)
    table = b.build()
    assert table.has_custom_samplers
    dev = frame_oracle_table_to_device(table)

    n = 80
    # off-grid offsets keep texel-boundary floor flips out of the
    # comparison; range crosses the wrap boundary on both sides
    u, v = np.meshgrid(
        np.linspace(-1.37, 2.41, n).astype(np.float32) + 0.0037,
        np.linspace(-0.83, 1.93, n).astype(np.float32) + 0.0021)
    for lod in [0.0, 0.45, 1.3, 2.6]:
        d = np.full(u.shape, (2.0 ** lod) / 32.0, np.float32)
        z = np.zeros_like(d)
        tid = jnp.full(u.shape, t, jnp.int32)
        got = tex.sample_trilinear(dev, tid, jnp.asarray(u), jnp.asarray(v),
                                   jnp.asarray(d), jnp.asarray(z),
                                   jnp.asarray(z), jnp.asarray(d))
        want = frame_oracle.sample_trilinear(
            table, t, u.astype(np.float64), v.astype(np.float64),
            d.astype(np.float64), z.astype(np.float64),
            z.astype(np.float64), d.astype(np.float64))
        for ch in range(4):
            g = np.asarray(got[ch], np.float64)
            w = want[ch]
            close = np.abs(g - w) < 2e-3
            # f32-vs-f64 LOD/texel-boundary flips may disagree on a few
            # samples; the agreeing rest must be tight
            assert close.mean() > 0.995, \
                f"{name} lod {lod} ch {ch}: {close.mean()}"


def frame_oracle_table_to_device(table):
    from vk_renderer_tpu.scene.types import TextureTable
    return TextureTable(
        texels=jnp.asarray(table.texels),
        mip_offsets=jnp.asarray(table.mip_offsets),
        mip_sizes=jnp.asarray(table.mip_sizes),
        n_mips=jnp.asarray(table.n_mips),
        srgb_flags=jnp.asarray(table.srgb_flags),
        sampler_modes=jnp.asarray(table.sampler_modes),
        has_custom_samplers=table.has_custom_samplers)


def test_gltf_sampler_to_heap(tmp_path):
    """Samplers flow from glTF JSON to heap slots via the real loader;
    two textures sharing an image with different samplers get distinct
    slots."""
    from vk_renderer_tpu.utils.image import save_png
    img = _gradient_texture(8)
    png_path = os.path.join(tmp_path, "t.png")
    save_png(str(png_path), img)

    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                   np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + uv.tobytes() + idx.tobytes()
    import base64
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode(),
                     "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [-1, -1, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "images": [{"uri": "t.png"}],
        "samplers": [
            {"magFilter": 9728, "minFilter": 9984, "wrapS": 33071,
             "wrapT": 33648},
            {},                                    # all-default sampler
        ],
        "textures": [{"source": 0, "sampler": 0},
                     {"source": 0, "sampler": 1}],
        "materials": [
            {"pbrMetallicRoughness":
             {"baseColorTexture": {"index": 0}}},
            {"pbrMetallicRoughness":
             {"baseColorTexture": {"index": 1}}},
        ],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2,
             "material": 0},
            {"attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2,
             "material": 1},
        ]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    path = os.path.join(tmp_path, "s.gltf")
    with open(path, "w") as f:
        json.dump(gltf, f)

    b = SceneBuilder()
    b.load_gltf(path, "s")
    scene = b.build()
    expect = gltf_sampler_mode(gltf["samplers"][0])
    assert expect == (1 | 2 | 4 | (1 << 3) | (2 << 5))
    modes = scene.textures.sampler_modes
    assert scene.textures.has_custom_samplers
    # two materials, same image, different samplers -> distinct slots
    a0 = scene.mat_color_factors.shape[0]
    mats = scene.mat_tex_ids
    slot0 = mats[b.default_material + 1, 0]
    slot1 = mats[b.default_material + 2, 0]
    assert slot0 != slot1
    assert modes[slot0] == expect
    assert modes[slot1] == 0
    del a0


def test_frame_with_custom_samplers_matches_oracle():
    """Frame-level gate: a clamp+nearest textured quad renders through
    render_frame (general sampler path, narrow rows) and must match the
    f64 oracle frame."""
    W, H = 96, 64
    b = SceneBuilder()
    t_custom = b.heap.add(_gradient_texture(), srgb=True, mipmapped=True,
                          sampler_mode=MODES["mixed"])
    t_plain = b.heap.add(procedural.checker_texture(
        32, (200, 180, 160, 255), (90, 80, 70, 255), tiles=4),
        srgb=True, mipmapped=True)
    m_custom = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0.0, 0.8, 0, 0], np.float32),
        albedo_id=t_custom))
    m_plain = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0.1, 0.6, 0, 0], np.float32),
        albedo_id=t_plain))
    parts = [procedural.box_mesh((4.0, 0.1, 4.0), (0, -0.1, 0), uv_scale=3),
             procedural._quad([-1.5, 0.0, 1.0], [1.5, 0.0, 1.0],
                              [1.5, 2.0, 1.0], [-1.5, 2.0, 1.0], [0, 0, 1],
                              uv_scale=2.5)]
    mesh = procedural.make_mesh("s", parts, [m_plain, m_custom])
    b.root.add_child(Node(mesh=mesh))
    b.cubemap = procedural.make_sky_cubemap(16)
    scene_h = b.build()
    assert scene_h.textures.has_custom_samplers
    scene = scene_h.device_put()

    settings = RenderSettings(enable_shadows=True, shadow_mode=0,
                              enable_background=True,
                              enable_postprocess=True)
    cam = Camera(position=np.array([0.0, 1.5, 5.0], np.float32))
    cam.pitch = -0.15
    cfg = driver.config_from_settings(
        settings, W, H, shadow_size=128, shadow_cascades=1,
        cap_opaque=256, cap_masked=64, cap_transparent=64,
        rec_opaque=512, rec_masked=128, rec_transparent=128,
        rec_shadow=512, shadow_cap=512, big_cap=128, shadow_big_cap=128,
        masked_peels=2, masked_tail_rounds=1, masked_tail_peels=2)

    out = frame.render_frame(scene, driver.scene_data_pytree(
        cam, settings, cfg), driver.make_settings_pytree(settings), cfg)
    got = np.asarray(out["color"])
    got_depth = np.asarray(out["depth"])

    sd = {k: np.asarray(v) for k, v in driver.scene_data_pytree(
        cam, settings, cfg).items()}
    st = {k: np.asarray(v) for k, v in
          driver.make_settings_pytree(settings).items()}
    want = frame_oracle.render_frame_oracle(
        scene_h, sd, st, W, H, shadow_size=128, rastered_cascades=1)
    same_winner = np.abs(got_depth - frame_oracle.LAST_DEPTH) < 1e-4
    assert same_winner.mean() > 0.99
    diff = np.abs(got - want)[:, same_winner]
    frac_close = (diff < 0.03).mean()
    assert frac_close > 0.995, f"diverges: {frac_close}"
