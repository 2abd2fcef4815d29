"""Rasterizer tests: production (setup+binning+raster) vs NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from vk_renderer_tpu.ops import binning, raster, setup as rsetup

from oracle import rasterize_oracle

W, H = 128, 64


def run_production(clip, tris, width=W, height=H, cull="back",
                   tile_w=128, tile_h=32, cap=256):
    cull_map = {"back": rsetup.CULL_BACK, "front": rsetup.CULL_FRONT,
                "none": rsetup.CULL_NONE}
    st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(tris, jnp.int32),
                               jnp.ones(len(tris), bool),
                               width, height, cull=cull_map[cull])
    bins, counts, overflow = binning.bin_triangles(
        st["bbox"], st["valid"], width, height,
        tile_w=tile_w, tile_h=tile_h, cap=cap, chunk=1024)
    assert int(overflow) == 0
    padded = raster.pad_setup(st)
    depth, tri_id = raster.rasterize_depth(padded, bins, width, height,
                                           tile_w=tile_w, tile_h=tile_h,
                                           chunk=min(64, cap))
    return np.asarray(depth), np.asarray(tri_id)


def make_ortho_clip(pts_screen, z, width=W, height=H):
    """Screen-space triangle -> clip coords with w=1 (inverse viewport)."""
    pts = np.asarray(pts_screen, np.float64)
    x = pts[:, 0] / width * 2 - 1
    y = pts[:, 1] / height * 2 - 1
    return np.stack([x, y, np.asarray(z, np.float64), np.ones(len(pts))], axis=1)


class TestBasicCoverage:
    def test_single_triangle_matches_oracle(self):
        # CCW-front (negative shoelace in y-down coords is clockwise; pick
        # vertex order that the oracle reports front)
        clip = make_ortho_clip([(20, 10), (100, 50), (30, 55)], [0.5, 0.5, 0.5])
        tris = [[0, 1, 2]]
        od, oi, _ = rasterize_oracle(clip, tris, W, H, cull="none")
        d, i = run_production(clip, tris, cull="none")
        assert (oi >= 0).sum() > 100  # nontrivial coverage
        mismatch = (i != oi).mean()
        assert mismatch < 0.005, f"coverage mismatch {mismatch}"
        both = (i >= 0) & (oi >= 0)
        np.testing.assert_allclose(d[both], od[both], atol=1e-4)

    def test_cull_back_and_front_partition(self):
        clip = make_ortho_clip([(20, 10), (100, 50), (30, 55)], [0.5, 0.5, 0.5])
        tris = [[0, 1, 2]]
        _, i_back = run_production(clip, tris, cull="back")
        _, i_front = run_production(clip, tris, cull="front")
        covered_back = (i_back >= 0).sum()
        covered_front = (i_front >= 0).sum()
        # one of the two culls kills it entirely, the other keeps it
        assert min(covered_back, covered_front) == 0
        assert max(covered_back, covered_front) > 100

    def test_front_face_convention_matches_oracle(self):
        """Oracle implements the Vulkan spec sign; production must agree."""
        clip = make_ortho_clip([(20, 10), (100, 50), (30, 55)], [0.5, 0.5, 0.5])
        for order in ([[0, 1, 2]], [[0, 2, 1]]):
            _, oi = rasterize_oracle(clip, order, W, H, cull="back")[:2]
            _, pi = run_production(clip, order, cull="back")
            assert ((oi >= 0).sum() > 0) == ((pi >= 0).sum() > 0)

    def test_depth_test_nearest_wins(self):
        clip = np.concatenate([
            make_ortho_clip([(10, 10), (120, 30), (20, 60)], [0.8, 0.8, 0.8]),
            make_ortho_clip([(15, 5), (115, 35), (25, 55)], [0.3, 0.3, 0.3]),
        ])
        tris = [[0, 1, 2], [3, 4, 5]]
        od, oi, _ = rasterize_oracle(clip, tris, W, H, cull="none")
        d, i = run_production(clip, tris, cull="none")
        assert (i != oi).mean() < 0.005
        # overlap region should belong to the nearer (second) triangle
        overlap = (oi == 1)
        assert overlap.sum() > 50
        assert (i[overlap] == 1).mean() > 0.99

    def test_shared_edge_no_gaps_no_double(self):
        """Top-left rule: a quad split into two triangles covers each
        interior pixel exactly once."""
        quad = make_ortho_clip([(10, 10), (110, 10), (110, 50), (10, 50)],
                               [0.5] * 4)
        tris = [[0, 1, 2], [0, 2, 3]]
        d, i = run_production(quad, tris, cull="none")
        # inside the quad strictly: all covered
        inner = i[12:48, 12:108]
        assert (inner >= 0).all()
        # run with each triangle alone; they must not both claim a pixel
        _, i0 = run_production(quad, [[0, 1, 2]], cull="none")
        _, i1 = run_production(quad, [[0, 2, 3]], cull="none")
        double = (i0 >= 0) & (i1 >= 0)
        assert double.sum() == 0

    def test_random_soup_vs_oracle(self):
        rng = np.random.default_rng(42)
        n = 40
        pts = rng.uniform([-10, -10], [W + 10, H + 10], size=(3 * n, 2))
        z = rng.uniform(0.05, 0.95, size=3 * n)
        clip = make_ortho_clip(pts, z)
        tris = np.arange(3 * n).reshape(n, 3)
        od, oi, _ = rasterize_oracle(clip, tris, W, H, cull="none")
        d, i = run_production(clip, tris, cull="none")
        mismatch = (i != oi).mean()
        assert mismatch < 0.01, f"id mismatch frac {mismatch}"
        both = (i >= 0) & (oi >= 0) & (i == oi)
        np.testing.assert_allclose(d[both], od[both], atol=1e-3)


class TestPerspective:
    def _persp_clip(self, rng, n):
        """Random triangles in view space, projected RH_ZO."""
        from vk_renderer_tpu.utils import glmath as glm
        proj = glm.perspective_rh_zo(np.radians(60), W / H, 0.1, 100.0)
        proj[1, 1] *= -1
        pts = rng.uniform([-6, -4, -30], [6, 4, -2], size=(3 * n, 3))
        hom = np.concatenate([pts, np.ones((3 * n, 1))], axis=1)
        return (proj @ hom.T).T

    def test_perspective_soup_vs_oracle(self):
        rng = np.random.default_rng(3)
        clip = self._persp_clip(rng, 30)
        tris = np.arange(90).reshape(30, 3)
        od, oi, _ = rasterize_oracle(clip, tris, W, H, cull="none")
        d, i = run_production(clip, tris, cull="none")
        mismatch = (i != oi).mean()
        assert mismatch < 0.01, f"id mismatch frac {mismatch}"
        both = (i == oi) & (i >= 0)
        np.testing.assert_allclose(d[both], od[both], atol=2e-3)

    def test_near_plane_crossing_clipless(self):
        """Triangle with one vertex behind the eye: the clipless rasterizer
        must draw the front part (extending toward the screen border) and
        nothing of the mirror region."""
        from vk_renderer_tpu.utils import glmath as glm
        proj = glm.perspective_rh_zo(np.radians(60), W / H, 0.1, 100.0)
        proj[1, 1] *= -1
        # wide triangle: two verts in front, one far behind the camera
        pts = np.array([[-2, -1, -5], [2, -1, -5], [0, 1, 3]], np.float64)
        hom = np.concatenate([pts, np.ones((3, 1))], axis=1)
        clip = (proj @ hom.T).T
        d, i = run_production(clip, [[0, 1, 2]], cull="none")
        assert (i >= 0).sum() > 50  # visible region drawn
        # the in-front vertices project inside the viewport; depth there must
        # be in [0, 1]
        covered = i >= 0
        assert np.all(d[covered] >= 0) and np.all(d[covered] <= 1)

    def test_fully_behind_rejected(self):
        from vk_renderer_tpu.utils import glmath as glm
        proj = glm.perspective_rh_zo(np.radians(60), W / H, 0.1, 100.0)
        proj[1, 1] *= -1
        pts = np.array([[-1, -1, 5], [1, -1, 5], [0, 1, 5]], np.float64)
        hom = np.concatenate([pts, np.ones((3, 1))], axis=1)
        clip = (proj @ hom.T).T
        d, i = run_production(clip, [[0, 1, 2]], cull="none")
        assert (i >= 0).sum() == 0


class TestBinning:
    def test_overflow_reported(self):
        clip = make_ortho_clip([(20, 10), (100, 50), (30, 55)] * 5,
                               [0.5] * 15)
        tris = np.arange(15).reshape(5, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(5, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        bins, counts, overflow = binning.bin_triangles(
            st["bbox"], st["valid"], W, H, tile_w=128, tile_h=64,
            cap=2, chunk=8)
        assert int(overflow) == 3  # 5 identical tris, cap 2

    def test_bins_ordered_and_complete(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform([0, 0], [W, H], size=(30, 2))
        clip = make_ortho_clip(pts, rng.uniform(0.2, 0.8, 30))
        tris = np.arange(30).reshape(10, 3)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(10, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        bins, counts, _ = binning.bin_triangles(
            st["bbox"], st["valid"], W, H, tile_w=32, tile_h=32,
            cap=16, chunk=4)
        bins = np.asarray(bins)
        counts = np.asarray(counts)
        bbox = np.stack([np.asarray(b) for b in st["bbox"]], axis=-1)
        valid = np.asarray(st["valid"])
        for r in range(bins.shape[0]):
            for c in range(bins.shape[1]):
                lst = bins[r, c, :counts[r, c]]
                # ordered ascending (draw order preserved)
                assert np.all(np.diff(lst) > 0)
                # contains exactly the overlapping valid triangles
                expect = [t for t in range(10) if valid[t]
                          and bbox[t, 0] < (c + 1) * 32 and bbox[t, 2] > c * 32
                          and bbox[t, 1] < (r + 1) * 32 and bbox[t, 3] > r * 32]
                assert set(lst.tolist()) == set(expect)


def test_coplanar_tie_later_draw_wins():
    """Exact-depth ties resolve to the LATER submitted triangle
    (LESS_OR_EQUAL sequential z-test) on the XLA path, matching the
    Pallas kernel and the Vulkan reference."""
    pts = [(20, 10), (100, 50), (30, 55)]
    clip = np.concatenate([make_ortho_clip(pts, [0.5] * 3),
                           make_ortho_clip(pts, [0.5] * 3)])
    tris = [[0, 1, 2], [3, 4, 5]]
    d, i = run_production(clip, tris, cull="none", cap=64)
    covered = i >= 0
    assert covered.sum() > 100
    assert (i[covered] == 1).all(), "tie must go to the later triangle"


class TestExactBigBinning:
    """binning._big_exact_keys: triangles spanning > max_span tiles emit
    exact per-tile pairs (same sort) instead of a global front-of-tile
    list — the raster result must be identical to small-triangle binning,
    and a big triangle must not land in tiles its edges exclude."""

    def _scene(self):
        rng = np.random.default_rng(42)
        # a screen-filling 'floor' pair (spans every tile) + small tris
        big = make_ortho_clip([(-10, -10), (W + 10, -10), (-10, H + 10),
                               (W + 10, H + 10)], [0.9, 0.9, 0.9, 0.9])
        pts = rng.uniform([0, 0], [W, H], size=(3 * 12, 2))
        small = make_ortho_clip(pts, rng.uniform(0.1, 0.8, 3 * 12))
        clip = np.concatenate([big, small])
        tris = [[0, 1, 2], [1, 3, 2]] + [
            [4 + 3 * k, 5 + 3 * k, 6 + 3 * k] for k in range(12)]
        return clip, np.asarray(tris, np.int32)

    def _raster(self, clip, tris, max_span, edge_mode):
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(len(tris), bool), W, H,
                                   cull=rsetup.CULL_NONE)
        n = len(tris)
        kw = dict(edge=st["edge"], anchor=st["anchor"]) if edge_mode else {}
        (res,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), W, H, tile_w=32, tile_h=32,
            caps=(64,), max_span=max_span, big_cap=16, **kw)
        bins, counts, overflow = res
        assert int(overflow) == 0
        padded = raster.pad_setup(st)
        d, i = raster.rasterize_depth(padded, bins, W, H, tile_w=32,
                                      tile_h=32, chunk=8, counts=counts)
        return np.asarray(d), np.asarray(i), st

    def test_exact_equals_all_small(self):
        clip, tris = self._scene()
        # max_span huge: every triangle binned via bbox pairs (reference)
        d_ref, i_ref, _ = self._raster(clip, tris, max_span=64,
                                       edge_mode=False)
        # max_span 1: the floor pair (and most tris) take the exact path
        d_x, i_x, _ = self._raster(clip, tris, max_span=1, edge_mode=True)
        np.testing.assert_array_equal(i_ref, i_x)
        np.testing.assert_allclose(d_ref, d_x, atol=1e-5)

    def test_big_only_in_admitted_tiles(self):
        # one big-but-thin diagonal sliver: exact mode must not place it
        # in off-diagonal corner tiles its edges exclude
        clip = make_ortho_clip([(-10, -6), (W + 10, H - 6),
                                (W + 10, H + 2)], [0.5, 0.5, 0.5])
        tris = np.asarray([[0, 1, 2]], np.int32)
        st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                   jnp.asarray(tris, jnp.int32),
                                   jnp.ones(1, bool), W, H,
                                   cull=rsetup.CULL_NONE)
        (res,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, 1),), W, H, tile_w=32, tile_h=32,
            caps=(8,), max_span=1, big_cap=4,
            edge=st["edge"], anchor=st["anchor"])
        bins, counts, overflow = res
        counts = np.asarray(counts)
        assert int(overflow) == 0
        # bottom-left corner tile (row 1, col 0) is far off the sliver
        assert counts[1, 0] == 0
        # but the sliver IS somewhere (top-left tile contains its start)
        assert counts.sum() >= 2


class TestPairCompaction:
    """binning._compact_keys (compact-before-sort): identical bins to the
    full-length sort, and COUNTED overflow when the pair cap drops real
    pairs (the sort costs its static length; compaction removes the
    sentinel pads, never the semantics)."""

    def _scene(self, n=24, seed=9):
        rng = np.random.default_rng(seed)
        pts = rng.uniform([0, 0], [W, H], size=(3 * n, 2))
        clip = make_ortho_clip(pts, rng.uniform(0.2, 0.8, 3 * n))
        tris = np.arange(3 * n).reshape(n, 3)
        return rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                                     jnp.asarray(tris, jnp.int32),
                                     jnp.ones(n, bool), W, H,
                                     cull=rsetup.CULL_NONE), n

    def test_compacted_bins_identical(self):
        st, n = self._scene()
        kw = dict(width=W, height=H, tile_w=32, tile_h=32, caps=(16,),
                  max_span=16, big_cap=8, edge=st["edge"],
                  anchor=st["anchor"])
        (full,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), **kw)
        (comp,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), pair_cap=4096, **kw)
        np.testing.assert_array_equal(np.asarray(full[0]),
                                      np.asarray(comp[0]))
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(comp[1]))
        assert int(full[2]) == int(comp[2]) == 0

    def test_compacted_packed_identical(self):
        st, n = self._scene(seed=17)
        kw = dict(width=W, height=H, tile_w=128, tile_h=32, caps=(64,),
                  rec_caps=(64,), max_span=16, big_cap=8,
                  edge=st["edge"], anchor=st["anchor"])
        (full,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), **kw)
        (comp,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), pair_cap=4096, **kw)
        for key in ("rec_tri", "rec_tile", "rec_start", "counts"):
            np.testing.assert_array_equal(np.asarray(full[key]),
                                          np.asarray(comp[key]),
                                          err_msg=key)
        assert int(full["overflow"]) == int(comp["overflow"]) == 0

    def test_tiny_pair_cap_counts_overflow(self):
        st, n = self._scene()
        kw = dict(width=W, height=H, tile_w=32, tile_h=32, caps=(16,),
                  max_span=16, big_cap=8, edge=st["edge"],
                  anchor=st["anchor"])
        (full,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), **kw)
        # count the real pairs via a roomy compaction, then halve the cap
        (comp,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), pair_cap=4096, **kw)
        total = int(np.asarray(full[1]).sum())
        assert total > 8
        (tiny,) = binning.bin_triangles_buckets(
            st["bbox"], st["valid"], ((0, n),), pair_cap=8, **kw)
        assert int(tiny[2]) >= total - 8  # dropped pairs counted

    def test_packed_cond_fallback_exact(self):
        """Packed path with an undersized pair_cap must lax.cond-fall back
        to the full sort: plans IDENTICAL to the uncompacted build, with
        the miss counted in pair_fallback (never dropped)."""
        st, n = self._scene(seed=21)
        kw = dict(width=W, height=H, tile_w=128, tile_h=32, caps=(64,),
                  rec_caps=(64,), max_span=16, big_cap=8,
                  edge=st["edge"], anchor=st["anchor"])
        (full,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), **kw)
        (tiny,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), pair_cap=8, **kw)
        for key in ("rec_tri", "rec_tile", "rec_start", "counts"):
            np.testing.assert_array_equal(np.asarray(full[key]),
                                          np.asarray(tiny[key]),
                                          err_msg=key)
        assert int(full["overflow"]) == int(tiny["overflow"]) == 0
        assert int(tiny["pair_fallback"]) > 0
        # roomy cap: compacted sort, no fallback, same plans
        (comp,) = binning.bin_buckets_packed(
            st["bbox"], st["valid"], ((0, n),), pair_cap=4096, **kw)
        for key in ("rec_tri", "rec_tile", "rec_start", "counts"):
            np.testing.assert_array_equal(np.asarray(full[key]),
                                          np.asarray(comp[key]),
                                          err_msg=key)
        assert int(comp["pair_fallback"]) == 0
