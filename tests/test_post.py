"""Post-pass kernels vs NumPy oracles (gradient background, tonemap)."""

import numpy as np
import pytest

from vk_renderer_tpu.ops import post


def gradient_oracle(h, w, top, bottom, extent_h=None):
    """Direct NumPy port of gradient_color.comp:16-31."""
    extent_h = h if extent_h is None else extent_h
    out = np.zeros((3, h, w), dtype=np.float32)
    for y in range(h):
        blend = y / extent_h
        out[:, y, :] = (top[:3] * (1 - blend) + bottom[:3] * blend)[:, None]
    return out


class TestGradient:
    def test_xla_matches_oracle(self):
        top = np.array([1.0, 0, 0, 1.0], np.float32)
        bottom = np.array([0, 0, 1.0, 1.0], np.float32)
        got = np.asarray(post.gradient_xla(64, 128, top, bottom))
        np.testing.assert_allclose(got, gradient_oracle(64, 128, top, bottom), atol=1e-6)

    def test_pallas_matches_xla(self):
        top = np.array([0.9, 0.1, 0.3, 1.0], np.float32)
        bottom = np.array([0.2, 0.8, 1.0, 1.0], np.float32)
        got = np.asarray(post.gradient_pallas(128, 256, top, bottom, interpret=True))
        want = np.asarray(post.gradient_xla(128, 256, top, bottom))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_padded_extent(self):
        # padded fb height 1088, real extent 1080: blend uses the real extent
        top = np.array([1.0, 0, 0, 1.0], np.float32)
        bottom = np.array([0, 0, 1.0, 1.0], np.float32)
        got = np.asarray(post.gradient_xla(16, 128, top, bottom, extent_h=8))
        assert got[0, 8, 0] == pytest.approx(0.0)  # blend=1 -> red fully gone
        assert got[2, 8, 0] == pytest.approx(1.0)


class TestTonemap:
    def test_matches_reference_curve(self):
        rng = np.random.default_rng(0)
        hdr = rng.uniform(0, 8, size=(3, 32, 128)).astype(np.float32)
        got = np.asarray(post.tonemap_xla(hdr))
        want = np.power(hdr / (hdr + 1.0), np.float32(1 / 2.2), dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_pallas_matches_xla(self):
        rng = np.random.default_rng(1)
        hdr = rng.uniform(0, 8, size=(3, 64, 128)).astype(np.float32)
        got = np.asarray(post.tonemap_pallas(hdr, interpret=True))
        want = np.asarray(post.tonemap_xla(hdr))
        # pallas uses exp(log(x)/g) which differs from pow by ~4e-5 in f32;
        # far below the 40 dB PSNR budget (~1e-2 avg error)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_maps_to_zero(self):
        z = np.zeros((3, 8, 128), np.float32)
        assert np.all(np.asarray(post.tonemap_xla(z)) == 0)
        assert np.all(np.asarray(post.tonemap_pallas(z, interpret=True)) == 0)
