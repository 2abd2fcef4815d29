"""Perspective-correct interpolation vs the float64 oracle.

Regression guard for the per-vertex-normalization bug: scaling homogeneous
vertices individually is invariant for coverage/depth but corrupts
attribute interpolation weights; setup must restore a common per-triangle
factor (see ops/setup.py).
"""

import numpy as np
import jax.numpy as jnp

from vk_renderer_tpu.ops import binning, interp, raster, setup as rsetup
from vk_renderer_tpu.utils import glmath as glm

from oracle import rasterize_oracle, interpolate_oracle

W, H = 128, 64


def test_attribute_interpolation_matches_oracle():
    rng = np.random.default_rng(11)
    n = 20
    proj = glm.perspective_rh_zo(np.radians(60), W / H, 0.1, 100.0)
    proj[1, 1] *= -1
    pts = rng.uniform([-6, -4, -40], [6, 4, -1.5], size=(3 * n, 3))
    hom = np.concatenate([pts, np.ones((3 * n, 1))], axis=1)
    clip = (proj.astype(np.float64) @ hom.T).T
    tris = np.arange(3 * n).reshape(n, 3)
    attr = rng.uniform(0, 1, size=(3 * n, 4))

    od, oi, obary = rasterize_oracle(clip, tris, W, H, cull="none")
    oattr = interpolate_oracle(attr, tris, oi, obary)

    st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(tris, jnp.int32),
                               jnp.ones(n, bool), W, H, cull=rsetup.CULL_NONE)
    bins, _, ovf = binning.bin_triangles(st["bbox"], st["valid"], W, H,
                                         tile_w=128, tile_h=32, cap=64,
                                         chunk=64)
    assert int(ovf) == 0
    padded = raster.pad_setup(st)
    depth, tid = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                        tile_h=32, chunk=32)
    tid = jnp.asarray(np.asarray(tid))
    weights = interp.interpolation_weights(tid, padded)
    tris_p = jnp.concatenate([jnp.asarray(tris, jnp.int32),
                              jnp.zeros((1, 3), jnp.int32)])
    vidx = interp.corner_indices(tris_p, weights["ids"])
    attr_j = jnp.asarray(attr, jnp.float32)
    vals = np.stack([np.asarray(interp.interp_channel(attr_j[:, c], vidx,
                                                      weights["lam"]))
                     for c in range(attr.shape[1])], axis=-1)

    both = (np.asarray(tid) == oi) & (oi >= 0)
    assert both.sum() > 500
    err = np.abs(vals[both] - oattr[both]).max()
    assert err < 2e-3, f"interpolation error {err}"

    # weights themselves: perspective-correct barycentrics vs oracle
    lam = np.stack([np.asarray(l) for l in weights["lam"]], axis=-1)
    lam_err = np.abs(lam[both] - obary[both]).max()
    assert lam_err < 2e-3, f"barycentric error {lam_err}"


def test_derivatives_match_finite_differences():
    """Analytic UV derivatives == finite differences inside a big triangle."""
    proj = glm.perspective_rh_zo(np.radians(60), W / H, 0.1, 100.0)
    proj[1, 1] *= -1
    pts = np.array([[-8, -6, -10], [8, -6, -10], [0, 8, -4]], np.float64)
    hom = np.concatenate([pts, np.ones((3, 1))], axis=1)
    clip = (proj.astype(np.float64) @ hom.T).T
    tris = np.array([[0, 1, 2]], np.int32)
    uvs = np.array([[0, 0], [4, 0], [0, 4]], np.float32)

    st = rsetup.triangle_setup(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(tris), jnp.ones(1, bool),
                               W, H, cull=rsetup.CULL_NONE)
    bins, _, _ = binning.bin_triangles(st["bbox"], st["valid"], W, H,
                                       tile_w=128, tile_h=32, cap=64, chunk=64)
    padded = raster.pad_setup(st)
    _, tid = raster.rasterize_depth(padded, bins, W, H, tile_w=128,
                                    tile_h=32, chunk=32)
    weights = interp.interpolation_weights(tid, padded)
    tris_p = jnp.concatenate([jnp.asarray(tris), jnp.zeros((1, 3), jnp.int32)])
    vidx = interp.corner_indices(tris_p, weights["ids"])
    uvs_j = jnp.asarray(uvs)
    u, dudx, dudy = interp.interp_channel_with_derivs(uvs_j[:, 0], vidx, weights)
    v, dvdx, dvdy = interp.interp_channel_with_derivs(uvs_j[:, 1], vidx, weights)
    uv = np.stack([np.asarray(u), np.asarray(v)], -1)
    ddx = np.stack([np.asarray(dudx), np.asarray(dvdx)], -1)
    ddy = np.stack([np.asarray(dudy), np.asarray(dvdy)], -1)

    t = np.asarray(tid)
    inner = (t >= 0)
    inner[:, :2] = inner[:, -2:] = False
    inner[:2, :] = inner[-2:, :] = False
    inner &= np.roll(t >= 0, 1, 1) & np.roll(t >= 0, -1, 1)
    inner &= np.roll(t >= 0, 1, 0) & np.roll(t >= 0, -1, 0)
    fdx = (np.roll(uv, -1, 1) - np.roll(uv, 1, 1)) / 2
    fdy = (np.roll(uv, -1, 0) - np.roll(uv, 1, 0)) / 2
    assert inner.sum() > 300
    np.testing.assert_allclose(ddx[inner], fdx[inner], atol=5e-3)
    np.testing.assert_allclose(ddy[inner], fdy[inner], atol=5e-3)
