"""Native C++ texture pipeline vs the NumPy reference implementations."""

import numpy as np
import pytest

from vk_renderer_tpu import native_bridge
from vk_renderer_tpu.scene import textures
from vk_renderer_tpu.utils.image import srgb_to_linear

needs_native = pytest.mark.skipif(not native_bridge.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_decode_parity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(33, 17, 4), dtype=np.uint8)
    for srgb in (False, True):
        got = native_bridge.decode_rgba8(img, srgb)
        want = img.astype(np.float32) / 255.0
        if srgb:
            want = np.concatenate([srgb_to_linear(want[..., :3]),
                                   want[..., 3:]], axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-6)


@needs_native
def test_resize_parity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(37, 53, 4)).astype(np.float32)
    got = native_bridge.blit_resize_bilinear(img, 26, 18)
    want = textures.blit_resize_bilinear(img, 26, 18)
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_native
def test_mips_parity():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, size=(64, 32, 4)).astype(np.float32)
    got = native_bridge.generate_mips(img)
    want = textures.generate_mips(img)
    assert len(got) == len(want) == 7
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=1e-5)


@needs_native
def test_heap_builder_uses_native():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    b = textures.TextureHeapBuilder()
    i = b.add(img, srgb=True, mipmapped=True)
    t = b.build()
    assert t.n_mips[i] == 5
