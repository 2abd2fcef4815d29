"""Pallas raster kernel (interpret mode) vs the XLA reference raster."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from vk_renderer_tpu.ops import binning, raster, setup as rsetup
from vk_renderer_tpu.ops import raster_pallas

W, H = 256, 64


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Interpret-mode pallas executables embed host callbacks that the
    persistent compilation cache cannot (de)serialize — both the read and
    the write path SEGFAULT the process (observed at
    compilation_cache.py get/put_executable_and_time).  Disable the disk
    cache for this module only; the in-process jit cache still applies."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


@pytest.fixture(autouse=True)
def _drop_interpret_executables():
    """Accumulated interpret-mode executables corrupt the process: after
    ~10 interpret tests the NEXT XLA compile segfaults (observed in
    backend_compile_and_load with the disk cache fully disabled — not a
    cache artifact; each test passes in isolation).  Dropping the live
    executables between tests bounds the accumulation.  Costs recompiles
    within the module; correctness-neutral."""
    yield
    jax.clear_caches()


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


def _interpret_layers(*args, **kw):
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    with mock.patch.object(raster_pallas.pl, "pallas_call", fake_call):
        return raster_pallas.rasterize_layers_packed(*args, **kw)


class TestKBufferRaster:
    """One-pass K-layer kernel (rasterize_layers_packed) vs iterated
    strict depth peeling with the SAME packed kernel (same tile-folded z,
    so the comparison is bit-exact)."""

    def _scene(self, seed, n, z=None):
        rng = np.random.default_rng(seed)
        pts = rng.uniform([0, 0], [W, H], size=(3 * n, 2))
        if z is None:
            z = rng.uniform(0.1, 0.9, size=3 * n)
        clip = np.stack([pts[:, 0] / W * 2 - 1, pts[:, 1] / H * 2 - 1, z,
                         np.ones(3 * n)], axis=1)
        tris = np.arange(3 * n).reshape(n, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(n, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        padded = raster.pad_setup(st)
        (plan,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), W, H, tile_w=128, tile_h=32,
            caps=(64,), rec_caps=(64,))
        records = raster_pallas.build_records(
            padded, st["bbox"], plan["rec_tri"], plan["rec_tile"],
            W // 128, 128, 32)
        return records, plan, n

    def _iterated(self, records, plan, n, k_layers, bound):
        """Oracle: k strict peels of the single-layer packed kernel."""
        layers = []
        floor = None
        no_id = jnp.full((H, W), -1, jnp.int32)
        for _ in range(k_layers):
            d, t = _interpret_packed(records, plan["rec_start"],
                                     plan["counts"], W, H, n,
                                     tile_w=128, tile_h=32,
                                     init_depth=bound, init_id=no_id,
                                     floor_depth=floor)
            found = np.asarray(t) >= 0
            ld = np.where(found, np.asarray(d), 2.0).astype(np.float32)
            layers.append((ld, np.asarray(t)))
            floor = jnp.asarray(ld)
        return layers

    @pytest.mark.parametrize("seed", [3, 7, 21])
    def test_matches_iterated_peeling(self, seed):
        records, plan, n = self._scene(seed, 40)
        bound = jnp.ones((H, W), jnp.float32)
        got = _interpret_layers(records, plan["rec_start"], plan["counts"],
                                bound, W, H, n, 3, tile_w=128, tile_h=32)
        want = self._iterated(records, plan, n, 3, bound)
        # at least some pixels must exercise layers 1 and 2
        assert (np.asarray(want[1][1]) >= 0).any()
        for k in range(3):
            np.testing.assert_array_equal(np.asarray(got[k][1]), want[k][1],
                                          err_msg=f"layer {k} ids")
            found = want[k][1] >= 0
            np.testing.assert_array_equal(
                np.asarray(got[k][0])[found], want[k][0][found],
                err_msg=f"layer {k} depths")
            assert np.all(np.asarray(got[k][0])[~found] == 2.0)

    def test_duplicate_depth_ties(self):
        """Coplanar fragments: the LATER submission wins the layer and the
        tied earlier fragment is SKIPPED by strict peeling (never appears
        as the next layer) — the tie rule the k-buffer must reproduce."""
        # two identical triangle pairs at z=0.5 (ids 0/1), one at 0.7
        pts = np.array([[10, 2], [120, 2], [10, 30]], np.float64)
        clip1 = np.stack([pts[:, 0] / W * 2 - 1, pts[:, 1] / H * 2 - 1,
                          np.full(3, 0.5), np.ones(3)], axis=1)
        clip = np.concatenate([clip1, clip1,
                               clip1 * [1, 1, 0, 1] + [0, 0, 0.7, 0]])
        tris = np.arange(9).reshape(3, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(3, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        padded = raster.pad_setup(st)
        (plan,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, 3),), W, H, tile_w=128, tile_h=32,
            caps=(64,), rec_caps=(64,))
        records = raster_pallas.build_records(
            padded, st["bbox"], plan["rec_tri"], plan["rec_tile"],
            W // 128, 128, 32)
        bound = jnp.ones((H, W), jnp.float32)
        got = _interpret_layers(records, plan["rec_start"], plan["counts"],
                                bound, W, H, 3, 3, tile_w=128, tile_h=32)
        want = self._iterated(records, plan, 3, 3, bound)
        for k in range(3):
            np.testing.assert_array_equal(np.asarray(got[k][1]), want[k][1])
        # interior: layer0 = later duplicate (id 1), layer1 = id 2 (the
        # tied id 0 is skipped), layer2 empty
        inside = np.asarray(got[0][1]) >= 0
        assert inside.any()
        assert np.all(np.asarray(got[0][1])[inside] == 1)
        assert np.all(np.asarray(got[1][1])[inside] == 2)
        assert np.all(np.asarray(got[2][1])[inside] == -1)

    def test_bound_excludes_fragments(self):
        """Fragments behind the bound (opaque depth) never enter any
        layer; fragments EQUAL to it do (LESS_OR_EQUAL)."""
        records, plan, n = self._scene(13, 25)
        bound = jnp.full((H, W), 0.5, jnp.float32)
        got = _interpret_layers(records, plan["rec_start"], plan["counts"],
                                bound, W, H, n, 2, tile_w=128, tile_h=32)
        want = self._iterated(records, plan, n, 2, bound)
        for k in range(2):
            np.testing.assert_array_equal(np.asarray(got[k][1]), want[k][1])
            found = want[k][1] >= 0
            assert np.all(np.asarray(got[k][0])[found] <= 0.5)
