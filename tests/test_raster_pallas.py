"""Pallas raster kernel (interpret mode) vs the XLA reference raster."""

import numpy as np
import pytest
import jax.numpy as jnp

from vk_renderer_tpu.ops import binning, raster, setup as rsetup
from vk_renderer_tpu.ops import raster_pallas

W, H = 256, 64


def _interpret_pallas(*args, **kw):
    """Run the pallas kernel in interpreter mode on CPU."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    with mock.patch.object(raster_pallas.pl, "pallas_call", fake_call):
        return raster_pallas.rasterize_depth_pallas(*args, **kw)


def _setup_scene(seed=0, n=30):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-10, -10], [W + 10, H + 10], size=(3 * n, 2))
    z = rng.uniform(0.05, 0.95, size=3 * n)
    x = pts[:, 0] / W * 2 - 1
    y = pts[:, 1] / H * 2 - 1
    clip = np.stack([x, y, z, np.ones(3 * n)], axis=1)
    tris = np.arange(3 * n).reshape(n, 3)
    st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(tris, jnp.int32),
                               jnp.ones(n, bool), W, H, cull=rsetup.CULL_NONE)
    bins, counts, _ = binning.bin_triangles(st["bbox"], st["valid"], W, H,
                                            tile_w=128, tile_h=32, cap=64)
    return raster.pad_setup(st), bins, counts


class TestPallasRaster:
    def test_matches_xla_reference(self):
        padded, bins, counts = _setup_scene()
        d_ref, i_ref = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                              tile_h=32, chunk=64,
                                              counts=counts)
        d_p, i_p = _interpret_pallas(padded, bins, counts, W, H,
                                     tile_w=128, tile_h=32, chunk=64)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-4)

    def test_init_depth_chaining(self):
        padded, bins, counts = _setup_scene(seed=5)
        init_d = jnp.full((H, W), 0.5, jnp.float32)
        init_i = jnp.full((H, W), -1, jnp.int32)
        d_ref, i_ref = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                              tile_h=32, chunk=64,
                                              init_depth=init_d,
                                              init_id=init_i, counts=counts)
        d_p, i_p = _interpret_pallas(padded, bins, counts, W, H, tile_w=128,
                                     tile_h=32, chunk=64, init_depth=init_d,
                                     init_id=init_i)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-4)

    def test_empty_bins(self):
        padded, bins, counts = _setup_scene(n=1)
        counts = jnp.zeros_like(counts)
        bins = jnp.full_like(bins, padded["edge"][0].shape[0] - 1)
        d_p, i_p = _interpret_pallas(padded, bins, counts, W, H,
                                     tile_w=128, tile_h=32, chunk=64)
        assert np.all(np.asarray(d_p) == 1.0)
        assert np.all(np.asarray(i_p) == -1)
