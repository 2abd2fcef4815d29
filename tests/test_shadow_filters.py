"""Shadow-filter oracle tests (VERDICT r1 #10).

Independent scalar NumPy re-implementations of the reference GLSL filters
(shaders/mesh_pbr.frag:48-125) are evaluated per pixel and compared against
the planar/batched JAX implementations in ops/shade.py.  This guards both
the filter math (Poisson offsets, blocker search, penumbra estimate) and
the batched-gather plumbing (sample_shadow_batch corner masking, border
depth 1.0) that round 1 only checked with ``isfinite``.
"""

import numpy as np
import jax.numpy as jnp

from vk_renderer_tpu.ops import shade
from vk_renderer_tpu.ops import texture as tex
from vk_renderer_tpu.ops.shade import (POISSON_DISK, SHADOW_BIAS, NEAR_PLANE,
                                       LIGHT_SIZE_UV,
                                       NUM_SAMPLES_BLOCKER_SEARCH,
                                       NUM_SAMPLES_PCF)


def _pack(smap_f32):
    """Shadow maps are pair-packed 16-bit fixed point on device
    (texture.pack_shadow_maps); oracles must see the quantized values."""
    return jnp.asarray(tex.pack_shadow_maps(jnp.asarray(smap_f32)))


def _quant(smap_f32):
    return np.asarray(tex.quantize_shadow(jnp.asarray(smap_f32)))


# ---------------------------------------------------------------------------
# scalar oracles (straight ports of mesh_pbr.frag, float64-free: use f32
# arithmetic to match the TPU path bit-for-bit where it matters)
# ---------------------------------------------------------------------------

def _bilinear_oracle(smap, u, v):
    """One bilinear tap, border depth 1.0 outside [0,1]^2 (texture.py:136)."""
    s = smap.shape[0]
    x = np.float32(u) * s - 0.5
    y = np.float32(v) * s - 0.5
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = np.float32(x - x0)
    fy = np.float32(y - y0)

    def at(xi, yi):
        if 0 <= xi < s and 0 <= yi < s:
            return np.float32(smap[yi, xi])
        return np.float32(1.0)

    t00, t10 = at(x0, y0), at(x0 + 1, y0)
    t01, t11 = at(x0, y0 + 1), at(x0 + 1, y0 + 1)
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    return top + (bot - top) * fy


def _hard_oracle(smap, su, sv, sz):
    d = _bilinear_oracle(smap, su, sv)
    return 1.0 if d + SHADOW_BIAS < sz else 0.0


def _pcf_oracle(smap, su, sv, sz):
    """3x3 PCF (mesh_pbr.frag:48-59).  Offsets in f32 to match the planar
    path's rounding exactly (a tap landing on a texel boundary must floor
    the same way)."""
    texel = np.float32(1.0 / smap.shape[0])
    acc = 0.0
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            d = _bilinear_oracle(smap, np.float32(su) + np.float32(i) * texel,
                                 np.float32(sv) + np.float32(j) * texel)
            acc += 1.0 if sz - SHADOW_BIAS > d else 0.0
    return acc / 9.0


def _pcss_oracle(smap, su, sv, sz):
    """PCSS (mesh_pbr.frag:87-121): Poisson blocker search + Poisson PCF."""
    sz = np.float32(sz)
    su, sv = np.float32(su), np.float32(sv)
    search_w = np.float32(
        np.float32(LIGHT_SIZE_UV) * (sz - np.float32(NEAR_PLANE)) / sz)
    blocker_sum, n_blockers = np.float32(0.0), 0
    for (px, py) in POISSON_DISK[:NUM_SAMPLES_BLOCKER_SEARCH]:
        z = _bilinear_oracle(smap, su + np.float32(px) * search_w,
                             sv + np.float32(py) * search_w)
        if z + SHADOW_BIAS < sz:
            blocker_sum += z
            n_blockers += 1
    if n_blockers == 0:
        return 0.0
    z_blocker = np.float32(blocker_sum / n_blockers)
    penumbra = np.float32((sz - z_blocker) / z_blocker)
    radius = np.float32(
        penumbra * np.float32(LIGHT_SIZE_UV) * np.float32(NEAR_PLANE) / sz)
    acc = 0.0
    for (px, py) in POISSON_DISK[:NUM_SAMPLES_PCF]:
        d = _bilinear_oracle(smap, su + np.float32(px) * radius,
                             sv + np.float32(py) * radius)
        acc += 1.0 if sz - SHADOW_BIAS > d else 0.0
    return acc / NUM_SAMPLES_PCF


def _random_inputs(seed, h=6, w=7, layers=1, size=16):
    rng = np.random.default_rng(seed)
    smap = rng.uniform(0.1, 0.9, size=(layers, size, size)).astype(np.float32)
    smap = _quant(smap)   # what the packed device representation holds
    # stay away from exact comparison boundaries so f32-order-of-operations
    # differences between oracle and batched path can't flip a tap
    su = rng.uniform(-0.2, 1.2, size=(h, w)).astype(np.float32)
    sv = rng.uniform(-0.2, 1.2, size=(h, w)).astype(np.float32)
    sz = rng.uniform(0.2, 0.95, size=(h, w)).astype(np.float32)
    layer = rng.integers(0, layers, size=(h, w)).astype(np.int32)
    return smap, su, sv, sz, layer


class TestShadowFilterOracles:
    def test_hard_matches_oracle(self):
        smap, su, sv, sz, layer = _random_inputs(0)
        got = np.asarray(shade._shadow_hard(
            _pack(smap), jnp.asarray(su), jnp.asarray(sv),
            jnp.asarray(sz), jnp.asarray(layer)))
        want = np.vectorize(
            lambda u, v, z: _hard_oracle(smap[0], u, v, z))(su, sv, sz)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pcf_matches_oracle(self):
        smap, su, sv, sz, layer = _random_inputs(1)
        got = np.asarray(shade._shadow_pcf(
            _pack(smap), jnp.asarray(su), jnp.asarray(sv),
            jnp.asarray(sz), jnp.asarray(layer)))
        want = np.vectorize(
            lambda u, v, z: _pcf_oracle(smap[0], u, v, z))(su, sv, sz)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pcss_matches_oracle(self):
        smap, su, sv, sz, layer = _random_inputs(2)
        got = np.asarray(shade._shadow_pcss(
            _pack(smap), jnp.asarray(su), jnp.asarray(sv),
            jnp.asarray(sz), jnp.asarray(layer)))
        want = np.vectorize(
            lambda u, v, z: _pcss_oracle(smap[0], u, v, z))(su, sv, sz)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pcss_layers_select_correct_map(self):
        """Multi-layer maps: each pixel must sample ITS layer, not layer 0."""
        smap, su, sv, sz, layer = _random_inputs(3, layers=4)
        got = np.asarray(shade._shadow_pcss(
            _pack(smap), jnp.asarray(su), jnp.asarray(sv),
            jnp.asarray(sz), jnp.asarray(layer)))
        want = np.vectorize(
            lambda u, v, z, l: _pcss_oracle(smap[l], u, v, z))(
                su, sv, sz, layer)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pcss_known_geometry(self):
        """Behavioral sanity: a uniform blocker at depth 0.3 shadows a
        receiver at 0.6 fully; a receiver at 0.2 (in front) is lit."""
        smap = np.full((1, 32, 32), 0.3, np.float32)
        mid = jnp.full((2, 2), 0.5, jnp.float32)
        lay = jnp.zeros((2, 2), jnp.int32)
        behind = np.asarray(shade._shadow_pcss(
            _pack(smap), mid, mid, jnp.full((2, 2), 0.6, jnp.float32),
            lay))
        infront = np.asarray(shade._shadow_pcss(
            _pack(smap), mid, mid, jnp.full((2, 2), 0.2, jnp.float32),
            lay))
        np.testing.assert_allclose(behind, 1.0)
        np.testing.assert_allclose(infront, 0.0)


class TestCascadeSelection:
    """CSM layer = first i with |viewZ| < cascadeDistances[i]
    (mesh_pbr.frag:129-137), hand-placed splits."""

    def _factor_for(self, view_z, dists, layer_depths):
        """Build scene_data whose 4 light matrices all map world->center of
        the map at sz=0.5; per-layer uniform map depths make the resulting
        hard/PCSS factor reveal which layer was sampled."""
        n = 4
        size = 32
        smaps = np.stack([np.full((size, size), d, np.float32)
                          for d in layer_depths])
        # matrix rows: x_clip = 0, y_clip = 0, z = 0.5, w = 1 for any world
        # point -> su = sv = 0.5, sz = 0.5
        m = np.zeros((4, 4), np.float32)
        m[2, 3] = 0.5
        m[3, 3] = 1.0
        sd = {"cascade_distances": jnp.asarray(dists, jnp.float32),
              "light_viewproj": jnp.asarray(np.stack([m] * n))}
        h, w = view_z.shape
        wx = jnp.zeros((h, w), jnp.float32)
        f = shade.compute_shadow_factor(
            _pack(smaps), wx, wx, wx, jnp.asarray(view_z), sd,
            shadow_mode=3, enable_shadows=True)
        return np.asarray(f)

    def test_layers_follow_split_distances(self):
        dists = [2.0, 8.0, 22.0, 100.0]
        # layer i map depth: 0.3 (blocker -> shadowed) for even i, 0.9
        # (beyond receiver -> lit) for odd i; receiver sz = 0.5
        layer_depths = [0.3, 0.9, 0.3, 0.9]
        view_z = np.array([[1.0, 2.5, 10.0, 50.0, 500.0]], np.float32)
        # expected layers: 0, 1, 2, 3, 3 (beyond all splits -> last)
        want_shadowed = np.array([[1.0, 0.0, 1.0, 0.0, 0.0]])
        got = self._factor_for(view_z, dists, layer_depths)
        np.testing.assert_allclose(got, want_shadowed, atol=1e-6)

    def test_dynamic_matches_static(self):
        """Traced shadow_mode/enable (the frame graph path) must equal the
        static specialization for every mode."""
        import jax
        rng = np.random.default_rng(7)
        h, w, n, size = 5, 6, 4, 32
        smaps = _pack(
            rng.uniform(0.1, 0.9, size=(n, size, size)).astype(np.float32))
        wx = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * 10)
        wy = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * 10)
        wz = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * 10)
        vz = jnp.asarray(rng.uniform(0.5, 80, size=(h, w)).astype(np.float32))
        lvp = rng.normal(size=(n, 4, 4)).astype(np.float32) * 0.02
        lvp[:, 3, 3] = 1.0
        sd = {"cascade_distances": jnp.asarray([2.0, 8.0, 22.0, 100.0],
                                               jnp.float32),
              "light_viewproj": jnp.asarray(lvp)}
        for mode in range(4):
            want = shade.compute_shadow_factor(
                smaps, wx, wy, wz, vz, sd, mode, True)
            got = jax.jit(shade.compute_shadow_factor)(
                smaps, wx, wy, wz, vz, sd,
                jnp.float32(mode), jnp.float32(1.0))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6, err_msg=f"mode {mode}")
        # enable=0 kills the factor
        got = shade.compute_shadow_factor(
            smaps, wx, wy, wz, vz, sd, jnp.float32(3), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(got), 0.0)

    def test_negative_view_z_uses_abs(self):
        dists = [2.0, 8.0, 22.0, 100.0]
        layer_depths = [0.3, 0.9, 0.3, 0.9]
        view_z = np.array([[-1.0, -10.0]], np.float32)
        got = self._factor_for(view_z, dists, layer_depths)
        np.testing.assert_allclose(got, np.array([[1.0, 1.0]]), atol=1e-6)


class TestClassifiedShadow:
    """shade.classified_shadow_factor must EQUAL the dense filter on every
    active pixel, for every mode, on maps with both large certain regions
    (flat lit/blocked areas — the classifier's win) and fine structure
    (penumbra-like noise — the compacted filter path)."""

    def _setup(self, seed, structured, layers=4, size=256, h=16, w=24):
        rng = np.random.default_rng(seed)
        if structured:
            # flat 0.25 / 0.9 half-planes + a noisy band in the middle:
            # certain-blocked, certain-lit, and uncertain regions all exist
            smap = np.full((layers, size, size), 0.9, np.float32)
            smap[:, :, : size // 2] = 0.25
            band = slice(size // 2 - 8, size // 2 + 8)
            smap[:, :, band] = rng.uniform(
                0.1, 0.95, size=(layers, size, 16)).astype(np.float32)
        else:
            smap = rng.uniform(0.1, 0.9,
                               size=(layers, size, size)).astype(np.float32)
        packed = _pack(smap)
        # block 16 on the 256 test map = the production cells-per-side
        # ratio (2048 / 64); _classify_shadow derives the block from shapes
        coarse = tex.build_shadow_coarse(packed, block=16)

        # light matrices: clip = world (identity-ish), so su = wx*0.5+0.5
        m = np.zeros((4, 4), np.float32)
        m[0, 0] = m[1, 1] = m[2, 2] = m[3, 3] = 1.0
        sd = {"cascade_distances": jnp.asarray([2.0, 8.0, 22.0, 100.0],
                                               jnp.float32),
              "light_viewproj": jnp.asarray(np.stack([m] * 4))}
        gbuf = {
            "wx": jnp.asarray(rng.uniform(-1.3, 1.3, (h, w)).astype(np.float32)),
            "wy": jnp.asarray(rng.uniform(-1.3, 1.3, (h, w)).astype(np.float32)),
            "wz": jnp.asarray(rng.uniform(0.15, 0.97, (h, w)).astype(np.float32)),
            "view_z": jnp.asarray(rng.uniform(0.5, 80, (h, w)).astype(np.float32)),
            "covered": jnp.ones((h, w), bool),
        }
        n_dot_l = jnp.ones((h, w), jnp.float32)
        return packed, coarse, sd, gbuf, n_dot_l

    def _check_mode(self, seed, structured, mode, traced=False, quad=False,
                    rows_form=False, fine=False):
        packed, coarse, sd, gbuf, n_dot_l = self._setup(seed, structured)
        # block 4 on the 256 test map = the production fine ratio
        # (fine_block_for: coarse/4); both the proven and unfit fine
        # paths run on the noisy band
        fine_tbl = (tex.make_coarse_rows(
            tex.build_shadow_coarse(packed, block=4)) if fine else None)
        mode_arg = jnp.float32(mode) if traced else mode
        en_arg = jnp.float32(1.0) if traced else True
        want = shade.compute_shadow_factor(
            packed, gbuf["wx"], gbuf["wy"], gbuf["wz"], gbuf["view_z"],
            sd, mode_arg, en_arg)
        maps = tex.make_shadow_rows(packed) if rows_form else packed
        got, ovf = shade.classified_shadow_factor(
            maps, coarse, gbuf, sd, mode_arg, en_arg, n_dot_l,
            cap=n_dot_l.size, quad_lit=quad, shadow_fine=fine_tbl)
        assert int(ovf) == 0
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"mode {mode} traced={traced} "
                                              f"structured={structured} "
                                              f"quad={quad} fine={fine}")

    def test_exact_vs_dense_all_modes_structured(self):
        for mode in range(4):
            self._check_mode(10 + mode, structured=True, mode=mode)

    def test_exact_vs_dense_all_modes_noise(self):
        for mode in range(4):
            self._check_mode(20 + mode, structured=False, mode=mode)

    def test_exact_vs_dense_traced_mode(self):
        for mode in range(4):
            self._check_mode(30 + mode, structured=True, mode=mode,
                             traced=True)

    def test_exact_vs_dense_with_quad_proof(self):
        """The two-stage (coarse + receiver-quad) classifier must stay
        EXACT — the quad lit proof (shade._classify_shadow) can only ever
        move pixels from uncertain to certain-lit when the filter provably
        returns 0."""
        for mode in range(4):
            self._check_mode(40 + mode, structured=True, mode=mode,
                             quad=True)
            self._check_mode(50 + mode, structured=False, mode=mode,
                             quad=True)

    def test_exact_vs_dense_with_quad_traced(self):
        for mode in range(4):
            self._check_mode(60 + mode, structured=True, mode=mode,
                             traced=True, quad=True)

    def test_exact_vs_dense_quad_rows_form(self):
        """Quad proof over the ShadowRows form (the frame path's one
        row-8 gather) — same exactness."""
        for mode in range(4):
            self._check_mode(70 + mode, structured=True, mode=mode,
                             quad=True, rows_form=True)

    def test_exact_vs_dense_all_stages(self):
        """The full production classifier (coarse + quad + fine) must
        stay EXACT for every mode, static and traced."""
        for mode in range(4):
            self._check_mode(80 + mode, structured=True, mode=mode,
                             quad=True, fine=True)
            self._check_mode(90 + mode, structured=False, mode=mode,
                             quad=True, fine=True)
            self._check_mode(100 + mode, structured=True, mode=mode,
                             traced=True, quad=True, fine=True,
                             rows_form=True)

    def test_fine_proves_boundary_blocked(self):
        """The fine table's raison d'etre: deep-shadow pixels within two
        COARSE cells of a shadow boundary are unprovable from the coarse
        min/max (the boundary dilates into the whole 2x2-cell window),
        but the fine window over the tap footprint proves them blocked."""
        size = 256
        smap = np.full((4, size, size), 0.9, np.float32)   # far floor
        smap[:, :, : size // 2] = 0.2                      # occluder half
        packed = _pack(smap)
        coarse = tex.make_coarse_rows(tex.build_shadow_coarse(packed,
                                                              block=64))
        fine = tex.make_coarse_rows(tex.build_shadow_coarse(packed,
                                                            block=16))
        h, w = 8, 32
        rng = np.random.default_rng(6)
        # receivers at depth 0.5 behind the occluder (factor 1), spread
        # over x in the occluder half INCLUDING the strip within 2 coarse
        # cells of the boundary at x = 128 (where coarse mx sees 0.9)
        wx = rng.uniform(-0.9, -0.2, (h, w)).astype(np.float32)  # su .05-.4
        wy = rng.uniform(-0.9, 0.9, (h, w)).astype(np.float32)
        wz = np.full((h, w), 0.5, np.float32)
        sd = {"cascade_distances": jnp.asarray([2.0, 8.0, 22.0, 100.0],
                                               jnp.float32),
              "light_viewproj": jnp.asarray(
                  np.stack([np.eye(4, dtype=np.float32)] * 4))}
        view_z = rng.uniform(0.5, 80, (h, w)).astype(np.float32)
        su, sv, sz, layer = shade.shadow_coords(
            jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
            jnp.asarray(view_z), sd, 3)
        _, blk_co = shade._classify_shadow(coarse, su, sv, sz, layer,
                                           size, 3)
        _, blk_3s = shade._classify_shadow(coarse, su, sv, sz, layer,
                                           size, 3, shadow_rows=packed,
                                           shadow_fine=fine)
        frac_co = float(jnp.mean(blk_co.astype(jnp.float32)))
        frac_3s = float(jnp.mean(blk_3s.astype(jnp.float32)))
        assert frac_3s > frac_co + 0.1, (frac_co, frac_3s)
        assert frac_3s > 0.9, f"fine stage failed to prove blocked: {frac_3s}"
        # the claim must be TRUE: dense CSM factor is 1 on proven pixels
        dense = shade.compute_shadow_factor(
            packed, jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
            jnp.asarray(view_z), sd, 3, True)
        blk_np = np.asarray(blk_3s)
        np.testing.assert_array_equal(np.asarray(dense)[blk_np],
                                      np.ones(int(blk_np.sum()), np.float32))

    def test_quad_proves_receiver_in_map_lit(self):
        """The receiver-in-map case (the reference's cascade maps CONTAIN
        the lit receivers — front culling with the unflipped light matrix
        keeps light-facing faces): on a gently sloped surface whose
        receivers sit ON the map, the coarse window-min lit proof can
        never hold (the window min is the receiver's own down-slope
        surface), but the receiver-quad stage must prove most such pixels
        lit — it reads the receiver's own 2x2 texels, so the only depth
        drop it sees is ~1 texel of slope, not a whole min/max cell."""
        size = 256
        # slope m = 1.2e-5 depth/texel, receiver offset o = 2e-4:
        #   quad min reach <= ~1 texel -> drop ~m < bias - o = 3e-4:
        #     the quad stage PROVES lit;
        #   coarse window min reach is 6..70 texels (64-cells) -> drop
        #     up to 8.4e-4 > 3e-4 for most pixels: coarse CANNOT
        m = 1.2e-5
        x = np.arange(size, dtype=np.float32) * m
        smap = np.broadcast_to(0.5 + x, (4, size, size)).copy()
        packed = _pack(smap)
        coarse = tex.make_coarse_rows(tex.build_shadow_coarse(packed,
                                                              block=64))
        rng = np.random.default_rng(4)
        h, w = 16, 24
        # receivers ON the surface: sz = the surface depth at su + 2e-4
        # (inside the bias band: the dense hard test reads them lit)
        wx = rng.uniform(-0.8, 0.8, (h, w)).astype(np.float32)
        wy = rng.uniform(-0.8, 0.8, (h, w)).astype(np.float32)
        su = wx * 0.5 + 0.5
        wz = (0.5 + m * (su * size) + 2e-4).astype(np.float32)
        sd = {"cascade_distances": jnp.asarray([2.0, 8.0, 22.0, 100.0],
                                               jnp.float32),
              "light_viewproj": jnp.asarray(
                  np.stack([np.eye(4, dtype=np.float32)] * 4))}
        view_z = rng.uniform(0.5, 80, (h, w)).astype(np.float32)
        su_j, sv_j, sz_j, layer = shade.shadow_coords(
            jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
            jnp.asarray(view_z), sd, 3)
        lit_co, blk_co = shade._classify_shadow(
            coarse, su_j, sv_j, sz_j, layer, size, 3)
        lit_2l, blk_2l = shade._classify_shadow(
            coarse, su_j, sv_j, sz_j, layer, size, 3, shadow_rows=packed)
        frac_co = float(jnp.mean(lit_co.astype(jnp.float32)))
        frac_2l = float(jnp.mean(lit_2l.astype(jnp.float32)))
        assert frac_co < 0.6, f"coarse alone proved too much: {frac_co}"
        assert frac_2l > 0.9, f"quad stage failed to prove lit: {frac_2l}"
        assert frac_2l - frac_co > 0.3, (frac_co, frac_2l)
        # and the claim must be TRUE: dense CSM factor is 0 everywhere here
        dense = shade.compute_shadow_factor(
            packed, jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
            jnp.asarray(view_z), sd, 3, True)
        lit_np = np.asarray(lit_2l)
        np.testing.assert_array_equal(np.asarray(dense)[lit_np],
                                      np.zeros(int(lit_np.sum()), np.float32))

    def test_quad_rows_vs_packed_parity(self):
        """The quad lit proof must classify identically whether the maps
        arrive as ShadowRows (one row-8 gather) or pair-packed arrays."""
        packed, coarse, sd, gbuf, n_dot_l = self._setup(11, structured=True)
        rows = tex.make_shadow_rows(packed)
        su, sv, sz, layer = shade.shadow_coords(
            gbuf["wx"], gbuf["wy"], gbuf["wz"], gbuf["view_z"], sd, 3)
        a = shade._classify_shadow(coarse, su, sv, sz, layer,
                                   packed.shape[-1], 3,
                                   shadow_rows=packed)
        b = shade._classify_shadow(coarse, su, sv, sz, layer,
                                   packed.shape[-1], 3,
                                   shadow_rows=rows)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_classifier_actually_classifies(self):
        """On the structured map the uncertain band must be well under the
        full frame — otherwise the sparse path saves nothing."""
        packed, coarse, sd, gbuf, n_dot_l = self._setup(42, structured=True)
        su, sv, sz, layer = shade.shadow_coords(
            gbuf["wx"], gbuf["wy"], gbuf["wz"], gbuf["view_z"], sd, 3)
        lit_c, blk_c = shade._classify_shadow(coarse, su, sv, sz, layer,
                                              packed.shape[-1], 3)
        frac_certain = float(jnp.mean((lit_c | blk_c).astype(jnp.float32)))
        assert frac_certain > 0.5, frac_certain

    def test_overflow_counted_beyond_cap(self):
        """Uncertain pixels beyond the cap are counted, never silent."""
        packed, coarse, sd, gbuf, n_dot_l = self._setup(7, structured=False)
        _, ovf_big = shade.classified_shadow_factor(
            packed, coarse, gbuf, sd, 3, True, n_dot_l, cap=n_dot_l.size)
        _, ovf_tiny = shade.classified_shadow_factor(
            packed, coarse, gbuf, sd, 3, True, n_dot_l, cap=1)
        assert int(ovf_big) == 0
        assert int(ovf_tiny) > 0

    def test_inactive_pixels_zero(self):
        """covered=False or n_dot_l=0 pixels must come back 0 (lit) —
        their factor never reaches the image (scales Lo * n_dot_l)."""
        packed, coarse, sd, gbuf, n_dot_l = self._setup(3, structured=True)
        gbuf = dict(gbuf)
        cov = np.ones((16, 24), bool)
        cov[:8] = False
        gbuf["covered"] = jnp.asarray(cov)
        ndl = np.ones((16, 24), np.float32)
        ndl[:, :12] = 0.0
        got, _ = shade.classified_shadow_factor(
            packed, coarse, gbuf, sd, 3, True, jnp.asarray(ndl),
            cap=16 * 24)
        got = np.asarray(got)
        assert np.all(got[:8] == 0.0)
        assert np.all(got[:, :12] == 0.0)


class TestShadowRowsParity:
    """The ShadowRows fast path (texture.make_shadow_rows: one row-8
    gather per tap) must be BIT-IDENTICAL to the legacy 2-take sampler on
    every coordinate class: interior, off-map borders (all four sides),
    texel-boundary x/y, and every cascade layer."""

    def test_rows_vs_legacy_bilinear(self):
        rng = np.random.default_rng(3)
        smap = rng.uniform(0.0, 1.0, size=(4, 64, 64)).astype(np.float32)
        packed = _pack(smap)
        rows = tex.make_shadow_rows(packed)
        assert isinstance(rows, tex.ShadowRows)
        # coordinates straddling every edge case incl. off-map
        us = jnp.asarray(rng.uniform(-0.2, 1.2, size=(3, 8, 16)),
                         jnp.float32)
        vs = jnp.asarray(rng.uniform(-0.2, 1.2, size=(3, 8, 16)),
                         jnp.float32)
        layer = jnp.asarray(rng.integers(0, 4, size=(8, 16)), jnp.int32)
        want = tex.sample_shadow_batch(packed, us, vs, layer)
        got = tex.sample_shadow_batch(rows, us, vs, layer)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rows_vs_legacy_boundary_coords(self):
        # exact texel boundaries and the clamp rows (y0 = -1, y0 = S-1)
        smap = np.linspace(0, 1, 4 * 16 * 16, dtype=np.float32
                           ).reshape(4, 16, 16)
        packed = _pack(smap)
        rows = tex.make_shadow_rows(packed)
        s = 16
        edge = [-0.5 / s, 0.5 / s, 0.5, (s - 0.5) / s, 1.0 - 0.25 / s,
                1.0 + 0.5 / s]
        us = jnp.asarray(np.array(edge, np.float32)[:, None, None]
                         * np.ones((1, len(edge), 1), np.float32))
        vs = jnp.asarray(np.array(edge, np.float32)[None, :, None]
                         * np.ones((len(edge), 1, 1), np.float32))
        us, vs = jnp.broadcast_to(us, (6, 6, 1)), jnp.broadcast_to(vs, (6, 6, 1))
        layer = jnp.zeros((6, 1), jnp.int32)
        want = tex.sample_shadow_batch(packed, us, vs, layer)
        got = tex.sample_shadow_batch(rows, us, vs, layer)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_filters_accept_rows_form(self):
        rng = np.random.default_rng(5)
        smap = rng.uniform(0.0, 1.0, size=(4, 64, 64)).astype(np.float32)
        packed = _pack(smap)
        rows = tex.make_shadow_rows(packed)
        su = jnp.asarray(rng.uniform(0, 1, (4, 6)), jnp.float32)
        sv = jnp.asarray(rng.uniform(0, 1, (4, 6)), jnp.float32)
        sz = jnp.asarray(rng.uniform(0.2, 0.9, (4, 6)), jnp.float32)
        layer = jnp.asarray(rng.integers(0, 4, (4, 6)), jnp.int32)
        for mode in range(3):
            want = shade._filter_dispatch(packed, su, sv, sz, layer, mode)
            got = shade._filter_dispatch(rows, su, sv, sz, layer, mode)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"mode {mode}")


def test_classified_coarse_quad_parity():
    """CoarseRows (one row-4 gather) must match the legacy [L, sb, sb]
    coarse table through classified_shadow_factor, every mode."""
    rng = np.random.default_rng(9)
    smap = np.full((4, 256, 256), 0.9, np.float32)
    smap[:, :, :128] = 0.25
    smap[:, :, 120:136] = rng.uniform(
        0.1, 0.95, size=(4, 256, 16)).astype(np.float32)
    packed = _pack(smap)
    coarse = tex.build_shadow_coarse(packed, block=16)
    quad = tex.make_coarse_rows(coarse)
    m = np.eye(4, dtype=np.float32)
    sd = {"cascade_distances": jnp.asarray([2.0, 8.0, 22.0, 100.0],
                                           jnp.float32),
          "light_viewproj": jnp.asarray(np.stack([m] * 4))}
    h, w = 16, 24
    gbuf = {
        "wx": jnp.asarray(rng.uniform(-1.3, 1.3, (h, w)).astype(np.float32)),
        "wy": jnp.asarray(rng.uniform(-1.3, 1.3, (h, w)).astype(np.float32)),
        "wz": jnp.asarray(rng.uniform(0.15, 0.97, (h, w)).astype(np.float32)),
        "view_z": jnp.asarray(rng.uniform(0.5, 80, (h, w)).astype(np.float32)),
        "covered": jnp.ones((h, w), bool),
    }
    n_dot_l = jnp.ones((h, w), jnp.float32)
    for mode in range(4):
        want, ovf_w = shade.classified_shadow_factor(
            packed, coarse, gbuf, sd, mode, True, n_dot_l, cap=h * w)
        got, ovf_g = shade.classified_shadow_factor(
            packed, quad, gbuf, sd, mode, True, n_dot_l, cap=h * w)
        assert int(ovf_w) == int(ovf_g) == 0
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"mode {mode}")
