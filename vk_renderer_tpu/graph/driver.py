"""Host-side frame driver: the run()-loop analog without a window.

Bridges host state (Camera, RenderSettings) to the jitted render_frame —
what the reference does in run()/draw() before command recording
(src/vk_engine_run.cpp:16-138): build scene data, pack toggles, invoke.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene.camera import Camera
from .frame import (FRAME_VEC_LEN, FRAME_VEC_SPEC, FrameConfig, render_frame,
                    render_frame_packed)
from .scenedata import RenderSettings, build_scene_data


def pack_frame_vec(sd: dict, st: dict) -> np.ndarray:
    """Host-side pack of per-frame state into ONE f32 vector — one
    host->device transfer per frame instead of 13 (each transfer has
    per-call overhead through the TPU tunnel).  Layout:
    frame.FRAME_VEC_SPEC."""
    merged = {**sd, **st}
    parts = [np.asarray(merged[name], np.float32).reshape(-1)
             for name, _ in FRAME_VEC_SPEC]
    vec = np.concatenate(parts)
    assert vec.shape[0] == FRAME_VEC_LEN
    return vec


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
    """One frame end-to-end; returns the render_frame output dict.
    All per-frame host state ships as one packed vector (one transfer)."""
    sd = build_scene_data(camera, settings, cfg.width / cfg.height)
    st = {
        "enable_background": np.float32(settings.enable_background),
        "enable_postprocess": np.float32(settings.enable_postprocess),
        "bg_top": np.asarray(settings.background_top, np.float32),
        "bg_bottom": np.asarray(settings.background_bottom, np.float32),
    }
    return render_frame_packed(scene, jnp.asarray(pack_frame_vec(sd, st)), cfg)


def config_from_settings(settings: RenderSettings, width: int, height: int,
                         shading: str = "pbr", **kw) -> FrameConfig:
    """FrameConfig with the static toggles lifted from RenderSettings.
    ``shadow_mode`` stays OUT of the static config — it is a traced
    per-frame channel (sunlightDirection.w), so changing it at runtime
    never recompiles."""
    return FrameConfig(width=width, height=height, shading=shading,
                       enable_shadows=settings.enable_shadows, **kw)
