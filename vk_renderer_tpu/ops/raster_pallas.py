"""Pallas TPU depth-raster kernel — the hot inner loop of the renderer.

Same semantics as ops/raster.rasterize_depth (Vulkan coverage rules,
top-left fill, LESS_OR_EQUAL z, sentinel-id empties), tiled for the VPU:

- grid = one program per framebuffer tile; the tile's depth/id live in
  VMEM for the whole program,
- the tile's binned-triangle coefficient stream is DMA'd HBM -> SMEM in
  double-buffered chunks, with the chunk loop bound **dynamically** by the
  tile's bin occupancy (empty tiles cost ~nothing — essential: a 2048^2
  shadow target has 1024 tiles and most hold few triangles),
- per triangle, 14 scalar reads feed vector FMAs over the
  (tile_h, tile_w) pixel registers; a sequential z-test reproduces the
  reference's submission-order tie behavior exactly (later draw wins ties).

Coefficients are refolded from anchor-relative to tile-local coordinates
scalar-side (k = c + a*(tile_x0 - ax) + b*(tile_y0 - ay)), keeping the
f32 edge evaluation conditioned on the tile scale (see ops/setup.py).

``floor_depth`` supports depth peeling (z > floor coverage), which the
frame graph uses for both the alpha-cutoff bucket (peel -> dense planar
alpha evaluation -> accept or re-peel) and the additive transparent pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv

F_FIELDS = 16   # edge 9 | zlin 3 | anchor 2 | tri-id (f32) | pad


def _kernel(counts_ref, fdata_hbm, initd_ref, initi_ref, floor_ref,
            outd_ref, outi_ref, *, chunk, tile_w, tile_h, cols, n_chunks,
            has_floor):
    t = pl.program_id(0)
    count = counts_ref[t]
    nk = (count + chunk - 1) // chunk
    rec = chunk * F_FIELDS

    outd_ref[:, :] = initd_ref[:, :]
    outi_ref[:, :] = initi_ref[:, :]

    @pl.when(nk > 0)
    def _run():
        def scoped(fbuf, fsem):
            def fdma(k):
                # each chunk record is exactly one (8,128) f32 tile, so a
                # leading-dim dynamic index is always tiling-aligned
                # (1-D dynamic-offset HBM DMA silently misbehaves on Mosaic)
                return pltpu.make_async_copy(
                    fdata_hbm.at[t * n_chunks + k], fbuf, fsem)

            def rd(i):
                return fbuf[i // 128, i % 128]

            col = t % cols
            row = t // cols
            tx0 = (col * tile_w).astype(jnp.float32)
            ty0 = (row * tile_h).astype(jnp.float32)
            pxl = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
                   .astype(jnp.float32) + 0.5)
            pyl = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
                   .astype(jnp.float32) + 0.5)

            def loop(k, carry):
                zb, ib = carry
                d = fdma(k)
                d.start()
                d.wait()

                for c in range(chunk):
                    base = c * F_FIELDS
                    a0 = rd(base + 0); b0 = rd(base + 1)
                    c0 = rd(base + 2)
                    a1 = rd(base + 3); b1 = rd(base + 4)
                    c1 = rd(base + 5)
                    a2 = rd(base + 6); b2 = rd(base + 7)
                    c2 = rd(base + 8)
                    za = rd(base + 9); zbr = rd(base + 10)
                    zc0 = rd(base + 11)
                    ax = rd(base + 12); ay = rd(base + 13)
                    tri = rd(base + 14).astype(jnp.int32)

                    ox = tx0 - ax
                    oy = ty0 - ay
                    k0 = c0 + a0 * ox + b0 * oy
                    k1 = c1 + a1 * ox + b1 * oy
                    k2 = c2 + a2 * ox + b2 * oy
                    kz = zc0 + za * ox + zbr * oy

                    e0 = a0 * pxl + b0 * pyl + k0
                    e1 = a1 * pxl + b1 * pyl + k1
                    e2 = a2 * pxl + b2 * pyl + k2
                    z = za * pxl + zbr * pyl + kz

                    tl0 = (a0 > 0.0) | ((a0 == 0.0) & (b0 > 0.0))
                    tl1 = (a1 > 0.0) | ((a1 == 0.0) & (b1 > 0.0))
                    tl2 = (a2 > 0.0) | ((a2 == 0.0) & (b2 > 0.0))
                    cov = ((e0 > 0.0) | ((e0 == 0.0) & tl0))
                    cov &= ((e1 > 0.0) | ((e1 == 0.0) & tl1))
                    cov &= ((e2 > 0.0) | ((e2 == 0.0) & tl2))
                    cov &= (e0 + e1 + e2) > 0.0   # interpolated 1/w > 0
                    cov &= z >= 0.0               # near depth clip
                    if has_floor:                 # depth-peel floor
                        cov &= z > floor_ref[:, :]

                    zcand = jnp.where(cov, z, 2.0)
                    take = zcand <= zb            # LEQUAL: later draw wins
                    zb = jnp.where(take, zcand, zb)
                    ib = jnp.where(take, tri, ib)
                return zb, ib

            zb, ib = jax.lax.fori_loop(0, nk, loop,
                                       (outd_ref[:, :], outi_ref[:, :]))
            outd_ref[:, :] = zb
            outi_ref[:, :] = ib

        pl.run_scoped(
            scoped,
            pltpu.SMEM(((chunk * F_FIELDS) // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_w",
                                             "tile_h", "chunk"))
def rasterize_depth_pallas(setup_padded: dict, bins: jax.Array,
                           counts: jax.Array, width: int, height: int,
                           tile_w: int = 128, tile_h: int = 32,
                           chunk: int = 64,
                           init_depth: jax.Array | None = None,
                           init_id: jax.Array | None = None,
                           floor_depth: jax.Array | None = None):
    """Drop-in for raster.rasterize_depth.  ``floor_depth`` restricts
    coverage to z > floor (the depth-peeling hook).
    Returns (depth f32[H, W], tri_id i32[H, W], -1 empty)."""
    planes = (list(setup_padded["edge"]) + list(setup_padded["zlin"])
              + list(setup_padded["anchor"]))
    sentinel = planes[0].shape[0] - 1

    assert (chunk * F_FIELDS) % 1024 == 0, \
        "chunk records must be whole (8,128) tiles (chunk multiple of 64)"
    rows, cols, cap = bins.shape
    n_chunks = cdiv(cap, chunk)
    cap_pad = n_chunks * chunk
    n_tiles = rows * cols

    # per-triangle record [T+1, 16] built from the planar setup; the
    # slot's triangle id rides along as f32 (exact for id < 2^24)
    pad_planes = [jnp.zeros_like(planes[0])] * (F_FIELDS - 14)
    f = jnp.stack(planes + pad_planes, axis=-1)

    bins_f = bins.reshape(n_tiles, cap)
    if cap_pad != cap:
        bins_f = jnp.pad(bins_f, ((0, 0), (0, cap_pad - cap)),
                         constant_values=sentinel)
    fdata = f[bins_f]
    fdata = fdata.at[:, :, 14].set(bins_f.astype(jnp.float32))
    rec_tiles = (chunk * F_FIELDS) // 1024
    fdata = fdata.reshape(-1, rec_tiles * 8, 128)  # whole (8,128) tiles per record

    if init_depth is None:
        initd = jnp.ones((n_tiles, tile_h, tile_w), jnp.float32)
        initi = jnp.full((n_tiles, tile_h, tile_w), sentinel, jnp.int32)
    else:
        initd = _to_tiles(init_depth, rows, cols, tile_h, tile_w, 1.0)
        initi = _to_tiles(jnp.where(init_id < 0, sentinel, init_id),
                          rows, cols, tile_h, tile_w, sentinel)
    has_floor = floor_depth is not None
    floor_t = (_to_tiles(floor_depth, rows, cols, tile_h, tile_w, 2.0)
               if has_floor else jnp.zeros((1, tile_h, tile_w), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # fdata stays in HBM
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w),
                         (lambda t, c: (t, 0, 0)) if has_floor
                         else (lambda t, c: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, chunk=chunk, tile_w=tile_w,
                               tile_h=tile_h, cols=cols, n_chunks=n_chunks,
                               has_floor=has_floor)
    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(counts.reshape(-1), fdata, initd, initi, floor_t)

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
