"""Sweep FrameConfig variants on the bench scene and print honest ms each.

Decides the measured knobs (packed_rows, max_span, mr_nearest_mip, caps)
in one run: each variant compiles once (cached across runs via
utils/jaxcache) and is timed with the honest tunnel protocol
(docs/PERF.md: warm up, pull a scalar, then time).

    python tools/sweep_variants.py [--frames 6] [--width 1920 --height 1080]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


VARIANTS = [
    ("baseline", {}),            # bench config (packed_rows, per-peel cap
    #                              ladder, quad+fine classifier)
    # masked peel depth (overflow>0 in the stats line disqualifies)
    ("peels6", {"masked_peels": 6}),
    # bbox-span / big-cap trade, camera + shadow sorts
    ("max_span8", {"max_span": 8, "big_cap": 2048}),
    ("shadow_span8", {"shadow_max_span": 8, "shadow_big_cap": 512}),
    ("rec_shadow4352", {"rec_shadow": 4352}),
    # compact-before-sort caps: measured real pairs are 194k camera /
    # ~230k per cascade (diag_out.log) vs the 585k auto cap — the sort
    # costs its STATIC length, so a 1.3x-headroom cap halves the keys
    ("pair262k", {"pair_cap": 262_144, "shadow_pair_cap": 294_912}),
    ("combo", {"max_span": 8, "big_cap": 2048, "shadow_max_span": 8,
               "shadow_big_cap": 512, "pair_cap": 262_144,
               "shadow_pair_cap": 294_912}),
    # combo with the pair caps bumped past the measured miss (combo's
    # fallback_px 29405 = a cascade's span-8+big emission over 294912)
    ("combo2", {"max_span": 8, "big_cap": 2048, "shadow_max_span": 8,
                "shadow_big_cap": 512, "pair_cap": 327_680,
                "shadow_pair_cap": 393_216}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    args = ap.parse_args()

    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()
    import jax

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.frame import stats_from_vec
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.scene import procedural
    from vk_renderer_tpu.scene.camera import Camera

    scene = procedural.build_sponza_like().build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    base = dataclasses.replace(
        driver.config_from_settings(settings, args.width, args.height),
        mr_nearest_mip=True,      # bench default (golden-gated)
        packed_rows=True)         # bench default (bit-identical layout)

    names = args.only.split(",") if args.only else None
    for name, kw in VARIANTS:
        if names and name not in names:
            continue
        cfg = dataclasses.replace(base, **kw)
        out = driver.render(scene, cam, settings, cfg)
        jax.block_until_ready(out["color_u8"])
        stats = stats_from_vec(out["stats_vec"])     # honest sync
        t0 = time.perf_counter()
        for i in range(args.frames):
            cam.yaw += 0.002
            out = driver.render(scene, cam, settings, cfg)
        jax.block_until_ready(out["color_u8"])
        dt = (time.perf_counter() - t0) / args.frames
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 1),
                          **{k: stats[k] for k in
                             ("bin_overflow", "peel_overflow",
                              "sparse_overflow", "fallback_px")}}),
              flush=True)


if __name__ == "__main__":
    main()
