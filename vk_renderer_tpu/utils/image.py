"""Host-side image utilities: framebuffer readback, PNG I/O, PSNR.

The reference blits its RGBA16F draw image to a BGRA8-unorm swapchain
(src/vk_engine_run.cpp:159-161, format at src/vk_engine.cpp:47-51) — a plain
format conversion with clamping, no colorspace math.  ``to_u8`` replicates
that: clamp to [0,1] and quantize.  PSNR is the integration-gate metric from
BASELINE.md (>=40 dB vs reference framebuffers).
"""

from __future__ import annotations

import numpy as np


def to_u8(color_chw: np.ndarray) -> np.ndarray:
    """f32[3, H, W] -> u8[H, W, 3] (the swapchain blit)."""
    img = np.asarray(color_chw)
    img = np.clip(img, 0.0, 1.0)
    img = np.transpose(img, (1, 2, 0))
    return (img * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    """Accepts f32[3, H, W] (converted via to_u8) or ready u8[H, W, 3]
    (the render graph's device-quantized ``color_u8`` output)."""
    from PIL import Image
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_u8(img)
    Image.fromarray(img).save(path)


def load_png(path: str) -> np.ndarray:
    """PNG -> u8[H, W, C]."""
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGBA"))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 decode — what R8G8B8A8_SRGB sampling does in hardware
    before filtering (textures created at src/vk_loader.cpp:283,296)."""
    c = np.asarray(c, dtype=np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, dtype=np.float32)
    return np.where(c <= 0.0031308, c * 12.92,
                    1.055 * np.power(np.maximum(c, 1e-12), 1 / 2.4) - 0.055).astype(np.float32)
