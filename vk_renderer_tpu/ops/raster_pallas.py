"""Pallas TPU depth-raster kernel — the hot inner loop of the renderer.

Same semantics as ops/raster.rasterize_depth (Vulkan coverage rules,
top-left fill, LESS_OR_EQUAL z, sentinel-id empties) but tiled for the
VPU: each grid step processes one (framebuffer tile, triangle chunk) pair
with the tile's depth/id buffers resident in VMEM across the chunk loop
(output revisiting), per-chunk triangle coefficients in SMEM (scalar
reads feed vector FMAs over the (tile_h, tile_w) pixel registers), and a
sequential z-test that reproduces the reference's submission-order tie
behavior exactly (later triangle wins on equal depth).

Coefficients are refolded from anchor-relative to tile-local coordinates
scalar-side (c'' = c + a*(tile_x0 - ax) + b*(tile_y0 - ay)), keeping the
f32 edge evaluation conditioned on the tile scale.

The alpha-cutoff and depth-peeling variants stay on the XLA path (they
need texture gathers / extra per-pixel state and run on small buckets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv

F_FIELDS = 16   # edge 9 | zlin 3 | anchor 2 | pad 2


def _kernel(counts_ref, fdata_ref, ids_ref, initd_ref, initi_ref,
            outd_ref, outi_ref, *, chunk, tile_w, tile_h, cols):
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        outd_ref[:, :] = initd_ref[:, :]
        outi_ref[:, :] = initi_ref[:, :]

    count = counts_ref[t]

    @pl.when(j * chunk < count)
    def _process():
        col = t % cols
        row = t // cols
        tx0 = (col * tile_w).astype(jnp.float32)
        ty0 = (row * tile_h).astype(jnp.float32)

        pxl = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
               .astype(jnp.float32) + 0.5)
        pyl = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
               .astype(jnp.float32) + 0.5)

        zb = outd_ref[:, :]
        ib = outi_ref[:, :]
        for c in range(chunk):
            base = c * F_FIELDS
            a0 = fdata_ref[0, base + 0]; b0 = fdata_ref[0, base + 1]
            c0 = fdata_ref[0, base + 2]
            a1 = fdata_ref[0, base + 3]; b1 = fdata_ref[0, base + 4]
            c1 = fdata_ref[0, base + 5]
            a2 = fdata_ref[0, base + 6]; b2 = fdata_ref[0, base + 7]
            c2 = fdata_ref[0, base + 8]
            za = fdata_ref[0, base + 9]; zbc = fdata_ref[0, base + 10]
            zc0 = fdata_ref[0, base + 11]
            ax = fdata_ref[0, base + 12]; ay = fdata_ref[0, base + 13]
            tri = ids_ref[0, c]

            ox = tx0 - ax
            oy = ty0 - ay
            k0 = c0 + a0 * ox + b0 * oy
            k1 = c1 + a1 * ox + b1 * oy
            k2 = c2 + a2 * ox + b2 * oy
            kz = zc0 + za * ox + zbc * oy

            e0 = a0 * pxl + b0 * pyl + k0
            e1 = a1 * pxl + b1 * pyl + k1
            e2 = a2 * pxl + b2 * pyl + k2
            z = za * pxl + zbc * pyl + kz

            tl0 = jnp.logical_or(a0 > 0.0, jnp.logical_and(a0 == 0.0, b0 > 0.0))
            tl1 = jnp.logical_or(a1 > 0.0, jnp.logical_and(a1 == 0.0, b1 > 0.0))
            tl2 = jnp.logical_or(a2 > 0.0, jnp.logical_and(a2 == 0.0, b2 > 0.0))
            cov = ((e0 > 0.0) | ((e0 == 0.0) & tl0))
            cov &= ((e1 > 0.0) | ((e1 == 0.0) & tl1))
            cov &= ((e2 > 0.0) | ((e2 == 0.0) & tl2))
            cov &= (e0 + e1 + e2) > 0.0        # interpolated 1/w > 0
            cov &= z >= 0.0                    # near depth clip

            zcand = jnp.where(cov, z, 2.0)
            take = zcand <= zb                 # LEQUAL: later draw wins ties
            zb = jnp.where(take, zcand, zb)
            ib = jnp.where(take, tri, ib)
        outd_ref[:, :] = zb
        outi_ref[:, :] = ib


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_w",
                                             "tile_h", "chunk"))
def rasterize_depth_pallas(setup_padded: dict, bins: jax.Array,
                           counts: jax.Array, width: int, height: int,
                           tile_w: int = 128, tile_h: int = 32,
                           chunk: int = 32,
                           init_depth: jax.Array | None = None,
                           init_id: jax.Array | None = None):
    """Drop-in for raster.rasterize_depth (opaque/no-hook path).
    Returns (depth f32[H, W], tri_id i32[H, W], -1 empty)."""
    edge = setup_padded["edge"]
    zlin = setup_padded["zlin"]
    anchor = setup_padded["anchor"]
    sentinel = edge.shape[0] - 1

    rows, cols, cap = bins.shape
    n_chunks = cdiv(cap, chunk)
    cap_pad = n_chunks * chunk
    n_tiles = rows * cols

    # per-triangle record [T+1, 16]
    f = jnp.concatenate([
        edge.reshape(-1, 9), zlin, anchor,
        jnp.zeros((edge.shape[0], F_FIELDS - 14), jnp.float32)], axis=1)

    bins_f = bins.reshape(n_tiles, cap)
    if cap_pad != cap:
        bins_f = jnp.pad(bins_f, ((0, 0), (0, cap_pad - cap)),
                         constant_values=sentinel)
    fdata = f[bins_f]                                    # [NT, capP, 16]
    fdata = fdata.reshape(n_tiles * n_chunks, chunk * F_FIELDS)
    ids = bins_f.reshape(n_tiles * n_chunks, chunk)

    if init_depth is None:
        initd = jnp.ones((n_tiles, tile_h, tile_w), jnp.float32)
        initi = jnp.full((n_tiles, tile_h, tile_w), sentinel, jnp.int32)
    else:
        initd = _to_tiles(init_depth, rows, cols, tile_h, tile_w, 1.0)
        initi = _to_tiles(jnp.where(init_id < 0, sentinel, init_id),
                          rows, cols, tile_h, tile_w, sentinel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk * F_FIELDS), lambda t, j, c: (t * n_chunks + j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk), lambda t, j, c: (t * n_chunks + j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, j, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, j, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, tile_h, tile_w), lambda t, j, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, j, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, chunk=chunk, tile_w=tile_w,
                               tile_h=tile_h, cols=cols)
    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(counts.reshape(-1), fdata, ids, initd, initi)

    depth = _from_tiles(outd.reshape(rows, cols, tile_h, tile_w))
    tri_id = _from_tiles(outi.reshape(rows, cols, tile_h, tile_w))
    tri_id = jnp.where(tri_id == sentinel, -1, tri_id)
    return depth[:height, :width], tri_id[:height, :width]


def _from_tiles(x: jax.Array) -> jax.Array:
    r, c, th, tw = x.shape
    return x.transpose(0, 2, 1, 3).reshape(r * th, c * tw)


def _to_tiles(img: jax.Array, rows: int, cols: int, th: int, tw: int,
              fill) -> jax.Array:
    h, w = img.shape
    ph, pw = rows * th - h, cols * tw - w
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), constant_values=fill)
    return img.reshape(rows, th, cols, tw).transpose(0, 2, 1, 3).reshape(
        rows * cols, th, tw)
