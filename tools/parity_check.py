"""Cross-backend parity harness: Pallas raster path vs XLA reference path.

The BASELINE gate is >=40 dB PSNR vs the Vulkan reference framebuffer; the
Vulkan binary can't run in this environment (no GPU, assets not shipped),
so this harness establishes the next-best guarantee: the TPU fast path and
the XLA reference implementation (which the float64 NumPy oracle validates
in tests/) produce the same image.

Run on the TPU:  python tools/parity_check.py [--width 1920 --height 1080]
Prints per-config PSNR; FAIL below --min-db (default 40).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--min-db", type=float, default=40.0)
    args = ap.parse_args()

    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()
    import jax

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.frame import render_frame
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import common as ops_common
    from vk_renderer_tpu.scene import procedural
    from vk_renderer_tpu.scene.camera import Camera
    from vk_renderer_tpu.utils.image import psnr

    scene = procedural.build_sponza_like(target_tris=80_000).build().device_put()
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2

    configs = [
        ("flat_noshadow", dict(shading="flat"), RenderSettings()),
        ("pbr_skybox", dict(), RenderSettings(enable_postprocess=True)),
        ("pbr_csm", dict(), RenderSettings(enable_shadows=True, shadow_mode=3,
                                           enable_postprocess=True)),
    ]

    failed = False
    for name, cfg_kw, settings in configs:
        cfg = driver.config_from_settings(settings, args.width, args.height,
                                          shadow_size=1024, **cfg_kw)
        # fast path (pallas on TPU)
        ops_common.on_tpu.cache_clear()
        out_fast = driver.render(scene, cam, settings, cfg)
        # u8 readback: bulk f32 D2H through the TPU tunnel is ~0.5 MB/s
        fast = np.asarray(out_fast["color_u8"]).astype(np.float32) / 255.0
        # force XLA reference path
        import vk_renderer_tpu.ops.common as oc
        orig = oc.on_tpu
        try:
            import functools
            oc.on_tpu = functools.cache(lambda: False)
            # new FrameConfig instance -> new jit cache entry
            import dataclasses
            cfg2 = dataclasses.replace(cfg, raster_chunk=16)
            out_ref = driver.render(scene, cam, settings, cfg2)
            ref = np.asarray(out_ref["color_u8"]).astype(np.float32) / 255.0
        finally:
            oc.on_tpu = orig
        db = psnr(fast, ref)
        status = "OK" if db >= args.min_db else "FAIL"
        if db < args.min_db:
            failed = True
        print(f"{name}: PSNR {db:.2f} dB [{status}]")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
