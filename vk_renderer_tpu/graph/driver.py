"""Host-side frame driver: the run()-loop analog without a window.

Bridges host state (Camera, RenderSettings) to the jitted render_frame —
what the reference does in run()/draw() before command recording
(src/vk_engine_run.cpp:16-138): build scene data, pack toggles, invoke.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene.camera import Camera
from .frame import FrameConfig, render_frame
from .scenedata import RenderSettings, build_scene_data


def make_settings_pytree(settings: RenderSettings) -> dict:
    return {
        "enable_background": jnp.float32(1.0 if settings.enable_background else 0.0),
        "enable_postprocess": jnp.float32(1.0 if settings.enable_postprocess else 0.0),
        "bg_top": jnp.asarray(settings.background_top, jnp.float32),
        "bg_bottom": jnp.asarray(settings.background_bottom, jnp.float32),
    }


def scene_data_pytree(camera: Camera, settings: RenderSettings, cfg: FrameConfig) -> dict:
    sd = build_scene_data(camera, settings, cfg.width / cfg.height)
    return {k: jnp.asarray(v) for k, v in sd.items()}


def render(scene, camera: Camera, settings: RenderSettings, cfg: FrameConfig):
    """One frame end-to-end; returns the render_frame output dict."""
    sd = scene_data_pytree(camera, settings, cfg)
    st = make_settings_pytree(settings)
    return render_frame(scene, sd, st, cfg)


def config_from_settings(settings: RenderSettings, width: int, height: int,
                         shading: str = "pbr", **kw) -> FrameConfig:
    """FrameConfig with the static toggles lifted from RenderSettings."""
    return FrameConfig(width=width, height=height, shading=shading,
                       enable_shadows=settings.enable_shadows,
                       shadow_mode=settings.shadow_mode, **kw)
