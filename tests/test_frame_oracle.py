"""Full-frame independent-oracle gate (VERDICT r3 task 4).

Renders a small-but-complete scene (textured opaque + alpha-masked +
additive transparent geometry, CSM/hard shadows, skybox, gradient
background, tonemap) through BOTH the production render_frame and the
from-scratch float64 NumPy oracle (tests/frame_oracle.py, written against
the GLSL spec rather than ops/*.py) and asserts agreement.

Comparison method: pixels whose raster WINNER differs (f32-vs-f64 edge
ties — the rasterizer itself has its own oracle gate in test_raster.py)
are excluded via a depth-mismatch mask; the rest must agree closely.
A shading transcription error (wrong BRDF term, swapped channel, biased
shadow compare) moves whole surfaces, not edge pixels, and fails loudly.
"""

import numpy as np
import jax
import pytest

from vk_renderer_tpu.graph import driver, frame
from vk_renderer_tpu.graph.scenedata import RenderSettings
from vk_renderer_tpu.scene import procedural
from vk_renderer_tpu.scene.assembly import Material, Node, SceneBuilder
from vk_renderer_tpu.scene.camera import Camera
from vk_renderer_tpu.scene.types import PASS_TRANSPARENT

import frame_oracle

W, H = 96, 64
SHADOW = 128


def _scene_builder():
    """Small full-featured scene: textured ground + two boxes + masked
    foliage quad + additive pane, under a procedural sky."""
    b = SceneBuilder()
    ground_tex = b.heap.add(
        procedural.checker_texture(64, (180, 160, 140, 255),
                                   (80, 70, 60, 255), tiles=8),
        srgb=True, mipmapped=True)
    box_tex = b.heap.add(procedural.noise_texture(64, (0.9, 0.7, 0.5), 5),
                         srgb=True, mipmapped=True)
    leaf_tex = b.heap.add(
        procedural.noise_texture(64, (0.2, 0.8, 0.3), 6, alpha_holes=True),
        srgb=True, mipmapped=True)

    m_ground = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0.0, 0.8, 0, 0], np.float32),
        albedo_id=ground_tex))
    m_box = b.add_material(Material(
        color_factors=np.array([1.0, 0.9, 0.9, 1.0], np.float32),
        metal_rough_factors=np.array([0.5, 0.4, 0, 0], np.float32),
        albedo_id=box_tex))
    m_leaf = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0.0, 0.9, 0, 0], np.float32),
        albedo_id=leaf_tex, can_discard=True))
    m_pane = b.add_material(Material(
        color_factors=np.array([0.3, 0.5, 0.9, 0.4], np.float32),
        metal_rough_factors=np.array([0.0, 0.3, 0, 0], np.float32),
        albedo_id=box_tex, pass_type=PASS_TRANSPARENT))

    parts, mats = [], []
    parts.append(procedural.box_mesh((6.0, 0.1, 6.0), (0, -0.1, 0),
                                     uv_scale=6))
    mats.append(m_ground)
    parts.append(procedural.box_mesh((0.8, 0.8, 0.8), (-1.2, 0.8, -1.0)))
    mats.append(m_box)
    parts.append(procedural.box_mesh((0.5, 1.4, 0.5), (1.4, 1.4, 0.5)))
    mats.append(m_box)
    # masked foliage quad facing the camera
    q = procedural._quad([-0.9, 0.0, 1.8], [0.9, 0.0, 1.8],
                         [0.9, 1.8, 1.8], [-0.9, 1.8, 1.8], [0, 0, 1])
    parts.append(q)
    mats.append(m_leaf)
    # additive pane in front
    q2 = procedural._quad([-1.6, 0.2, 2.6], [0.4, 0.2, 2.6],
                          [0.4, 1.6, 2.6], [-1.6, 1.6, 2.6], [0, 0, 1])
    parts.append(q2)
    mats.append(m_pane)

    mesh = procedural.make_mesh("oracle_scene", parts, mats)
    b.root.add_child(Node(mesh=mesh))
    b.cubemap = procedural.make_sky_cubemap(32)
    return b


def _settings(mode):
    return RenderSettings(
        enable_shadows=True, shadow_mode=mode, enable_background=True,
        enable_postprocess=True,
        sunlight_direction=np.array([0.4, -1.0, -0.3, 0.0], np.float32))


def _camera():
    cam = Camera(position=np.array([0.0, 2.2, 6.5], np.float32))
    cam.pitch = -0.25
    return cam


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_full_frame_matches_independent_oracle(mode):
    """All four shadow filter modes (VERDICT r4 task 8: modes 1-2 — PCF
    and PCSS — were previously uncovered by the full-frame gate).  Modes
    0-2 share one FrameConfig (mode is a traced channel, cascades=1), so
    the parametrization costs one extra compile total (mode 3)."""
    b = _scene_builder()
    host_scene = b.build()
    scene = host_scene.device_put()
    settings = _settings(mode)
    cam = _camera()
    cascades = 4 if mode >= 3 else 1
    cfg = driver.config_from_settings(
        settings, W, H, shadow_size=SHADOW, shadow_cascades=cascades,
        cap_opaque=256, cap_masked=64, cap_transparent=64, rec_opaque=512,
        rec_masked=128, rec_transparent=128, rec_shadow=512,
        shadow_cap=512, big_cap=128, shadow_big_cap=128,
        masked_peels=4, transparent_peels=2, packed_rows=True,
        masked_tail_rounds=1, masked_tail_peels=2)

    out = frame.render_frame(scene, driver.scene_data_pytree(
        cam, settings, cfg), driver.make_settings_pytree(settings), cfg)
    got = np.asarray(out["color"])
    got_depth = np.asarray(out["depth"])
    stats = frame.stats_from_vec(out["stats_vec"])
    assert stats["bin_overflow"] == 0 and stats["peel_overflow"] == 0

    sd = {k: np.asarray(v) for k, v in driver.scene_data_pytree(
        cam, settings, cfg).items()}
    st = {k: np.asarray(v) for k, v in
          driver.make_settings_pytree(settings).items()}
    want = frame_oracle.render_frame_oracle(
        host_scene, sd, st, W, H, shadow_size=SHADOW,
        rastered_cascades=cascades)

    # exclude raster-winner disagreements (f32 vs f64 edge ties): the
    # oracle re-rasters in f64; compare depths to find them
    oracle_depth = frame_oracle_last_depth()
    same_winner = np.abs(got_depth - oracle_depth) < 1e-4
    frac_same = same_winner.mean()
    assert frac_same > 0.995, f"raster winners diverge: {frac_same}"

    diff = np.abs(got - want)[:, same_winner]
    frac_close = (diff < 0.03).mean()
    assert frac_close > 0.995, f"shaded pixels diverge: {frac_close}"
    mse = float((diff ** 2).mean())
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, f"full-frame oracle PSNR {psnr:.1f} dB < 40"


def frame_oracle_last_depth():
    return frame_oracle.LAST_DEPTH
