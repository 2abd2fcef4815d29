"""Measure the gated-fidelity ladder on the replica bench camera
(VERDICT r4 task 4): each knob's fps AND its measured PSNR vs the exact
1080p frame, so every BENCH-legal claim carries a dB number instead of a
guess.

Rungs:
  exact      1920x1080, pure defaults (the bench config)
  mr_nearest 1920x1080, mr_nearest_mip=True (half the metal-rough gathers)
  half_res   960x540 render, bilinearly upscaled to 1080p on device

Run: python tools/measure_ladder.py   (TPU; three full-frame compiles)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.scene import ktx, sponza_replica
    from vk_renderer_tpu.scene.assembly import SceneBuilder
    from vk_renderer_tpu.scene.camera import Camera
    from vk_renderer_tpu.utils.image import psnr

    glb, kx = sponza_replica.ensure_assets()
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)
    scene = b.build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2

    @jax.jit
    def upscale2x(img):
        """Bilinear 2x upscale [3, H, W] -> [3, 2H, 2W] at dst pixel
        centers (the viewer's display-blit rule), on device."""
        c, h, w = img.shape
        ys = (jnp.arange(2 * h, dtype=jnp.float32) + 0.5) * 0.5 - 0.5
        xs = (jnp.arange(2 * w, dtype=jnp.float32) + 0.5) * 0.5 - 0.5
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fy = jnp.clip(ys - y0, 0.0, 1.0)[None, :, None]
        fx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, :]
        a = img[:, y0][:, :, x0]
        bq = img[:, y0][:, :, x1]
        cq = img[:, y1][:, :, x0]
        d = img[:, y1][:, :, x1]
        top = a * (1 - fx) + bq * fx
        bot = cq * (1 - fx) + d * fx
        out = top * (1 - fy) + bot * fy
        q = jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5
        return q.astype(jnp.uint8).transpose(1, 2, 0)

    def run(name, w, h, n_frames=10, **cfg_kw):
        cfg = driver.config_from_settings(settings, w, h, **cfg_kw)
        out = driver.render(scene, cam, settings, cfg)
        jax.block_until_ready(out["color"])
        _ = np.asarray(out["stats_vec"])            # honest sync
        t0 = time.perf_counter()
        for _ in range(n_frames):
            out = driver.render(scene, cam, settings, cfg)
        jax.block_until_ready(out["color"])
        dt = (time.perf_counter() - t0) / n_frames
        if (w, h) != (1920, 1080):
            u8 = np.asarray(upscale2x(out["color"]))
        else:
            u8 = np.asarray(out["color_u8"])
        print(f"{name:<12} {w}x{h}: {dt*1e3:8.1f} ms/frame "
              f"({1.0/dt:5.2f} fps)", flush=True)
        return u8

    exact = run("exact", 1920, 1080)
    mr = run("mr_nearest", 1920, 1080, mr_nearest_mip=True)
    half = run("half_res", 960, 540)

    f = lambda a: a.astype(np.float32) / 255.0
    print(f"mr_nearest PSNR vs exact: {psnr(f(mr), f(exact)):6.2f} dB",
          flush=True)
    print(f"half_res   PSNR vs exact: {psnr(f(half), f(exact)):6.2f} dB",
          flush=True)


if __name__ == "__main__":
    main()
