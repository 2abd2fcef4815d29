"""Regenerate the golden-image regression set (tests/goldens/*.png).

Renders the BASELINE config ladder at a small fixed size on the CPU
backend (deterministic reference path) and writes the u8 framebuffers.
Run from the repo root after an INTENTIONAL rendering change, eyeball the
diffs, and commit the new goldens:

    JAX_PLATFORMS=cpu python tools/make_goldens.py

tests/test_goldens.py gates every config at PSNR >= 40 dB against these
(BASELINE.md integration criterion).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
W, H = 256, 128


def golden_configs():
    """(name, scene_builder, settings, cfg) per BASELINE config ladder."""
    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.frame import FrameConfig
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.scene import procedural

    def cfg(**kw):
        base = dict(width=W, height=H, cap_opaque=4096, cap_masked=64,
                    cap_transparent=64, raster_chunk=64, masked_chunk=16,
                    shadow_size=256, shadow_cap=4096)
        base.update(kw)
        return FrameConfig(**base)

    cube = procedural.build_cube_scene
    sponza = procedural.build_sponza_like

    return [
        ("cube_flat_bg", cube,
         RenderSettings(enable_background=True),
         cfg(shading="flat", use_skybox=False)),
        ("cube_pbr_sky_tonemap", cube,
         RenderSettings(enable_postprocess=True),
         cfg()),
        ("cube_csm", cube,
         RenderSettings(enable_shadows=True, shadow_mode=3),
         cfg(enable_shadows=True)),
        ("sponza_like_flagship", sponza,
         RenderSettings(enable_shadows=True, shadow_mode=3,
                        enable_postprocess=True),
         cfg(enable_shadows=True)),
    ]


def render_config(builder, settings, cfg):
    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.scene.camera import Camera
    scene = builder().build().device_put()
    cam = Camera()
    out = driver.render(scene, cam, settings, cfg)
    return np.asarray(out["color_u8"])


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from vk_renderer_tpu.utils.image import save_png
    for name, builder, settings, cfg in golden_configs():
        img = render_config(builder, settings, cfg)
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        save_png(path, img)
        print(f"wrote {path}  mean={img.mean():.2f}")


if __name__ == "__main__":
    main()
