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
    """(name, scene_builder, settings, cfg) per BASELINE config ladder,
    plus one golden per shadow filter mode (Hard/PCF/PCSS — headline
    reference features, mesh_pbr.frag:39-125 / vk_engine_run.cpp:219-220)
    and a 512x512 flagship.  Every config is sized to render with ZERO
    deviation counters (bin/peel/sparse overflow — asserted by
    tests/test_goldens.py): the sponza-class scenes use the 40k-triangle
    build so the per-tile caps hold at golden resolution (the full 260k
    scene is exercised overflow-free at 1080p by bench.py)."""
    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.frame import FrameConfig
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.scene import procedural

    def cfg(**kw):
        # shadow_cap = 40960 >= the sponza-class scene's triangle count:
        # the widest cascade can concentrate nearly ALL casters in one
        # tile of a small shadow map (22.2k of 40k measured in one
        # 128x32 tile at 512^2), and goldens must render with ZERO
        # dropped casters now that shadow overflow is surfaced
        base = dict(width=W, height=H, cap_opaque=16384, cap_masked=512,
                    cap_transparent=256, raster_chunk=64, masked_chunk=16,
                    shadow_size=256, shadow_cap=40960, rec_opaque=4096,
                    rec_shadow=4096, masked_peels=8,
                    masked_tail_rounds=1, masked_tail_peels=2)
        base.update(kw)
        return FrameConfig(**base)

    cube = procedural.build_cube_scene

    def sponza_small():
        return procedural.build_sponza_like(target_tris=40_000)

    def gltf_fixture():
        # the checked-in real-exporter-shaped asset (external .bin +
        # PNG URIs + interleaved/strided accessors + MASK material) —
        # proves the loader on non-self-generated input paths
        # (tools/make_gltf_fixture.py; ref vk_loader.cpp:227-518)
        from vk_renderer_tpu.scene.assembly import SceneBuilder
        b = SceneBuilder()
        b.load_gltf(os.path.join(os.path.dirname(__file__), "..", "tests",
                                 "fixtures", "textured_box", "scene.gltf"),
                    "fixture")
        b.cubemap = procedural.make_sky_cubemap(64)
        return b

    def s(mode, **kw):
        return RenderSettings(enable_shadows=True, shadow_mode=mode,
                              enable_postprocess=True, **kw)

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
        ("sponza_like_flagship", sponza_small,
         s(3), cfg(enable_shadows=True)),
        # one golden per shadow filter mode; modes < 3 raster a single
        # cascade (shadow_cascades=1 — the mode-aware static, VERDICT r2)
        ("sponza_like_hard", sponza_small,
         s(0), cfg(enable_shadows=True, shadow_cascades=1)),
        ("sponza_like_pcf", sponza_small,
         s(1), cfg(enable_shadows=True, shadow_cascades=1)),
        ("sponza_like_pcss", sponza_small,
         s(2), cfg(enable_shadows=True, shadow_cascades=1)),
        # non-trivial resolution flagship (VERDICT r2 task 4)
        ("sponza_like_flagship_512", sponza_small,
         s(3), cfg(enable_shadows=True, width=512, height=512,
                   shadow_size=512)),
        # checked-in exporter-shaped glTF asset (VERDICT r2 task 7)
        ("gltf_fixture", gltf_fixture,
         RenderSettings(enable_shadows=True, shadow_mode=3,
                        enable_postprocess=True, enable_background=True),
         cfg(enable_shadows=True)),
    ]


def render_config(builder, settings, cfg, with_stats=False):
    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.frame import stats_from_vec
    from vk_renderer_tpu.scene.camera import Camera
    scene = builder().build().device_put()
    cam = Camera()
    if "sponza" in getattr(builder, "__name__", ""):
        # eye-level interior view down the hall (floor, walls and cast
        # shadows all in frame — the default origin camera sits at floor
        # level and sees mostly sky below)
        cam.position = np.array([9.0, 1.8, 0.3], np.float32)
        cam.yaw = float(np.pi / 2)
    out = driver.render(scene, cam, settings, cfg)
    img = np.asarray(out["color_u8"])
    if with_stats:
        return img, stats_from_vec(out["stats_vec"])
    return img


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="regenerate just this golden (substring match)")
    args = ap.parse_args()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from vk_renderer_tpu.utils.image import save_png
    for name, builder, settings, cfg in golden_configs():
        if args.only and args.only not in name:
            continue
        img, stats = render_config(builder, settings, cfg, with_stats=True)
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        save_png(path, img)
        print(f"wrote {path}  mean={img.mean():.2f}  stats={stats}")


if __name__ == "__main__":
    main()
