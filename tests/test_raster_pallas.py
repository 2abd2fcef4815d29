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


def _interpret_packed(*args, **kw):
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    with mock.patch.object(raster_pallas.pl, "pallas_call", fake_call):
        return raster_pallas.rasterize_depth_packed(*args, **kw)


class TestPackedRaster:
    """Occupancy-packed record path (bin_buckets_packed + build_records)
    vs the XLA reference rasterizer."""

    def _packed(self, st, padded, n, cap=64, rec_cap=64, floor=None,
                init_d=None, init_i=None):
        (plan,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), W, H, tile_w=128, tile_h=32,
            caps=(cap,), rec_caps=(rec_cap,))
        records = raster_pallas.build_records(
            padded, st["bbox"], plan["rec_tri"], plan["rec_tile"],
            W // 128, 128, 32)
        d, i = _interpret_packed(records, plan["rec_start"], plan["counts"],
                                 W, H, n, tile_w=128, tile_h=32,
                                 floor_depth=floor, init_depth=init_d,
                                 init_id=init_i)
        return d, i, plan

    def test_matches_xla_reference(self):
        n = 30
        rng = np.random.default_rng(3)
        pts = rng.uniform([-10, -10], [W + 10, H + 10], size=(3 * n, 2))
        z = rng.uniform(0.05, 0.95, size=3 * n)
        clip = np.stack([pts[:, 0] / W * 2 - 1, pts[:, 1] / H * 2 - 1, z,
                         np.ones(3 * n)], axis=1)
        tris = np.arange(3 * n).reshape(n, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(n, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        padded = raster.pad_setup(st)
        bins, counts, _ = binning.bin_triangles(st["bbox"], st["valid"], W, H,
                                                tile_w=128, tile_h=32, cap=64)
        d_ref, i_ref = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                              tile_h=32, chunk=64,
                                              counts=counts)
        d_p, i_p, plan = self._packed(st, padded, n)
        assert int(plan["overflow"]) == 0
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-4)

    def test_peel_floor_matches(self):
        n = 20
        rng = np.random.default_rng(11)
        pts = rng.uniform([0, 0], [W, H], size=(3 * n, 2))
        z = rng.uniform(0.1, 0.9, size=3 * n)
        clip = np.stack([pts[:, 0] / W * 2 - 1, pts[:, 1] / H * 2 - 1, z,
                         np.ones(3 * n)], axis=1)
        tris = np.arange(3 * n).reshape(n, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(n, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        padded = raster.pad_setup(st)
        bins, counts, _ = binning.bin_triangles(st["bbox"], st["valid"], W, H,
                                                tile_w=128, tile_h=32, cap=64)
        # each backend peels against ITS OWN first-layer depth (the packed
        # kernel folds tile origins into the plane constants, so its z
        # differs from the XLA z in the last ulp — a cross-backend floor
        # would fail to exclude the producer's own layer exactly, which
        # never happens in the real pipeline)
        d1_ref, _ = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                           tile_h=32, chunk=64, counts=counts)
        d_ref, i_ref = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                              tile_h=32, chunk=64,
                                              counts=counts,
                                              floor_depth=jnp.asarray(d1_ref))
        _, _, plan = self._packed(st, padded, n)
        records = raster_pallas.build_records(
            padded, st["bbox"], plan["rec_tri"], plan["rec_tile"],
            W // 128, 128, 32)
        d1_p, _ = _interpret_packed(records, plan["rec_start"],
                                    plan["counts"], W, H, n,
                                    tile_w=128, tile_h=32)
        d_p, i_p = _interpret_packed(records, plan["rec_start"],
                                     plan["counts"], W, H, n,
                                     tile_w=128, tile_h=32, floor_depth=d1_p)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-4)
