"""Pallas TPU depth-raster kernel — the hot inner loop of the renderer.

Same semantics as ops/raster.rasterize_depth (Vulkan coverage rules,
top-left fill, LESS_OR_EQUAL z, sentinel-id empties), tiled for the VPU:

- grid = one program per framebuffer tile; the tile's depth/id live in
  VMEM for the whole program,
- the tile's binned-triangle record stream is DMA'd HBM -> SMEM in
  chunks from an OCCUPANCY-PACKED record array (``rec_start[tile]`` from
  ops/binning.bin_buckets_packed): the chunk loop is bounded dynamically
  by the tile's bin occupancy and empty tiles cost ~nothing,
- per triangle, the records carry TILE-FOLDED plane coefficients
  (k = c + a*(tile_x0 - ax) + b*(tile_y0 - ay), computed vectorized at
  record-build time, keeping the f32 edge evaluation conditioned on the
  tile scale — see ops/setup.py's anchor note) so the kernel's scalar
  work per triangle is just the field reads + two unpacks,
- the (tile_h, tile_w) tile is processed as tile_h/8 VPU-native (8, 128)
  SUB-BLOCKS, each guarded by the triangle's row range (packed into one
  record field): a small triangle touches 1-2 sub-blocks instead of
  paying vector FMAs over the whole tile — the main win over round 1,
- the top-left fill rule is folded into a per-edge scalar threshold:
  ``covered = e > (-FLT_MIN if top-left else 0)`` — exact because TPU
  flushes denormals, so no computed e lands in (-FLT_MIN, 0),
- a sequential z-test reproduces the reference's submission-order tie
  behavior exactly (later draw wins ties).

``floor_depth`` supports depth peeling (z > floor coverage), which the
frame graph uses for both the alpha-cutoff bucket (peel -> dense planar
alpha evaluation -> accept or re-peel) and the additive transparent pass;
the near-plane z >= 0 clip is folded into the same compare
(z > max(floor, -FLT_MIN), again exact under flush-to-zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv

F_FIELDS = 16   # a,b,k x3 edges | a,b,k z | tri*8+tl_bits | rowrange | pad x2
MAX_TRI = 1 << 21          # tri*8 + tl bits must stay exact in f32 (< 2^24)
_NEG_MIN_NORMAL = -1.1754943508222875e-38


def _kernel(counts_ref, start_ref, fdata_hbm, initd_ref, initi_ref,
            floor_ref, outd_ref, outi_ref, *, chunk, tile_w, tile_h,
            has_floor):
    n_sub = tile_h // 8
    t = pl.program_id(0)
    count = counts_ref[t]
    start = start_ref[t]
    nk = (count + chunk - 1) // chunk

    outd_ref[:, :] = initd_ref[:, :]
    outi_ref[:, :] = initi_ref[:, :]

    @pl.when(nk > 0)
    def _run():
        def scoped(fbuf, fsem):
            def fdma(k):
                # each chunk record is exactly one (8,128) f32 tile, so a
                # leading-dim dynamic index is always tiling-aligned
                # (1-D dynamic-offset HBM DMA silently misbehaves on Mosaic)
                return pltpu.make_async_copy(fdata_hbm.at[start + k],
                                             fbuf, fsem)

            def rd(i):
                return fbuf[i // 128, i % 128]

            pxl = (jax.lax.broadcasted_iota(jnp.int32, (8, tile_w), 1)
                   .astype(jnp.float32) + 0.5)
            py0 = (jax.lax.broadcasted_iota(jnp.int32, (8, tile_w), 0)
                   .astype(jnp.float32) + 0.5)
            pyl = [py0 + (8.0 * sb) for sb in range(n_sub)]
            mn = jnp.float32(_NEG_MIN_NORMAL)

            def loop(k, carry):
                d = fdma(k)
                d.start()
                d.wait()

                for c in range(chunk):
                    base = c * F_FIELDS
                    a0 = rd(base + 0); b0 = rd(base + 1); k0 = rd(base + 2)
                    a1 = rd(base + 3); b1 = rd(base + 4); k1 = rd(base + 5)
                    a2 = rd(base + 6); b2 = rd(base + 7); k2 = rd(base + 8)
                    za = rd(base + 9); zb = rd(base + 10); kz = rd(base + 11)
                    tb = rd(base + 12)
                    rr = rd(base + 13)

                    # unpack tri id + top-left bits; thresholds realize the
                    # top-left rule as a single compare per edge
                    trif = jnp.floor(tb * 0.125)
                    bits = tb - 8.0 * trif
                    tri = trif.astype(jnp.int32)
                    hi2 = jnp.floor(bits * 0.25)
                    rem = bits - 4.0 * hi2
                    hi1 = jnp.floor(rem * 0.5)
                    hi0 = rem - 2.0 * hi1
                    th0 = jnp.where(hi0 > 0.5, mn, 0.0)
                    th1 = jnp.where(hi1 > 0.5, mn, 0.0)
                    th2 = jnp.where(hi2 > 0.5, mn, 0.0)

                    # tile-relative covered row range [r0, r1)
                    r0 = jnp.floor(rr * (1.0 / 256.0))
                    r1 = rr - 256.0 * r0

                    for sb in range(n_sub):
                        lo = float(8 * sb)

                        @pl.when((r1 > lo) & (r0 < lo + 8.0))
                        def _(sb=sb):
                            py = pyl[sb]
                            e0 = a0 * pxl + b0 * py + k0
                            e1 = a1 * pxl + b1 * py + k1
                            e2 = a2 * pxl + b2 * py + k2
                            z = za * pxl + zb * py + kz
                            cov = (e0 > th0) & (e1 > th1) & (e2 > th2)
                            cov &= (e0 + e1 + e2) > 0.0  # interp 1/w > 0
                            if has_floor:   # peel floor (z>=0 pre-folded)
                                cov &= z > floor_ref[8 * sb:8 * sb + 8, :]
                            else:           # near clip z >= 0 (FTZ-exact)
                                cov &= z > mn
                            rows_ = slice(8 * sb, 8 * sb + 8)
                            zbuf = outd_ref[rows_, :]
                            ibuf = outi_ref[rows_, :]
                            zc = jnp.where(cov, z, 2.0)
                            take = zc <= zbuf   # LEQUAL: later draw wins
                            outd_ref[rows_, :] = jnp.where(take, zc, zbuf)
                            outi_ref[rows_, :] = jnp.where(take, tri, ibuf)
                return carry

            jax.lax.fori_loop(0, nk, loop, 0)

        pl.run_scoped(
            scoped,
            pltpu.SMEM(((chunk * F_FIELDS) // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )


def _kernel_k(counts_ref, start_ref, fdata_hbm, bound_ref, floor_ref,
              *out_refs, chunk, tile_w, tile_h, k_layers, sentinel,
              has_floor):
    """K-layer depth-peel raster in ONE record pass (the k-buffer).

    Maintains the ``k_layers`` nearest fragments per pixel with STRICTLY
    increasing depths, reproducing iterated depth peeling exactly
    (``z > floor`` strict re-peel + LESS_OR_EQUAL later-wins ties):
    a fragment tying an existing layer's depth REPLACES it (later draw
    wins) without shifting deeper layers (strict peeling would skip the
    tied fragment); a strictly nearer fragment shifts the deeper stack
    down one slot.  Sequential record order gives the submission-order
    tie behavior for free, as in ``_kernel``.

    Fragments are bounded above by ``bound_ref`` (z <= bound, LEQUAL vs
    the opaque depth — the peel loops' ``init_depth``) and, with
    ``has_floor``, strictly below by ``floor_ref`` (z > floor — the
    CONTINUATION-round form: the masked pass re-enters the stream with
    floor = the deepest already-peeled layer per pixel, so reject chains
    deeper than one round's k_layers resolve across cheap tile-gated
    rounds instead of one tall insertion stack); layers start at
    (2.0, sentinel) = empty.  Replaces peels+1 full raster passes (peel
    0, peel 1, overflow probe) with one record stream."""
    n_sub = tile_h // 8
    t = pl.program_id(0)
    count = counts_ref[t]
    start = start_ref[t]
    nk = (count + chunk - 1) // chunk

    for k in range(k_layers):
        out_refs[2 * k][:, :] = jnp.full((tile_h, tile_w), 2.0, jnp.float32)
        out_refs[2 * k + 1][:, :] = jnp.full((tile_h, tile_w), sentinel,
                                             jnp.int32)

    @pl.when(nk > 0)
    def _run():
        def scoped(fbuf, fsem):
            def fdma(k):
                return pltpu.make_async_copy(fdata_hbm.at[start + k],
                                             fbuf, fsem)

            def rd(i):
                return fbuf[i // 128, i % 128]

            pxl = (jax.lax.broadcasted_iota(jnp.int32, (8, tile_w), 1)
                   .astype(jnp.float32) + 0.5)
            py0 = (jax.lax.broadcasted_iota(jnp.int32, (8, tile_w), 0)
                   .astype(jnp.float32) + 0.5)
            pyl = [py0 + (8.0 * sb) for sb in range(n_sub)]
            mn = jnp.float32(_NEG_MIN_NORMAL)

            def loop(k, carry):
                d = fdma(k)
                d.start()
                d.wait()

                for c in range(chunk):
                    base = c * F_FIELDS
                    a0 = rd(base + 0); b0 = rd(base + 1); k0 = rd(base + 2)
                    a1 = rd(base + 3); b1 = rd(base + 4); k1 = rd(base + 5)
                    a2 = rd(base + 6); b2 = rd(base + 7); k2 = rd(base + 8)
                    za = rd(base + 9); zb = rd(base + 10); kz = rd(base + 11)
                    tb = rd(base + 12)
                    rr = rd(base + 13)

                    trif = jnp.floor(tb * 0.125)
                    bits = tb - 8.0 * trif
                    tri = trif.astype(jnp.int32)
                    hi2 = jnp.floor(bits * 0.25)
                    rem = bits - 4.0 * hi2
                    hi1 = jnp.floor(rem * 0.5)
                    hi0 = rem - 2.0 * hi1
                    th0 = jnp.where(hi0 > 0.5, mn, 0.0)
                    th1 = jnp.where(hi1 > 0.5, mn, 0.0)
                    th2 = jnp.where(hi2 > 0.5, mn, 0.0)

                    r0 = jnp.floor(rr * (1.0 / 256.0))
                    r1 = rr - 256.0 * r0

                    for sb in range(n_sub):
                        lo = float(8 * sb)

                        @pl.when((r1 > lo) & (r0 < lo + 8.0))
                        def _(sb=sb):
                            py = pyl[sb]
                            e0 = a0 * pxl + b0 * py + k0
                            e1 = a1 * pxl + b1 * py + k1
                            e2 = a2 * pxl + b2 * py + k2
                            z = za * pxl + zb * py + kz
                            rows_ = slice(8 * sb, 8 * sb + 8)
                            cov = (e0 > th0) & (e1 > th1) & (e2 > th2)
                            cov &= (e0 + e1 + e2) > 0.0
                            cov &= z > mn                   # near clip
                            cov &= z <= bound_ref[rows_, :]  # LEQUAL bound
                            if has_floor:   # continuation round: strict
                                cov &= z > floor_ref[rows_, :]
                            zc = jnp.where(cov, z, 2.0)

                            ds = [out_refs[2 * j][rows_, :]
                                  for j in range(k_layers)]
                            is_ = [out_refs[2 * j + 1][rows_, :]
                                   for j in range(k_layers)]
                            # insertion position: first layer with
                            # zc <= d[j]; tie REPLACES, strict SHIFTS
                            taken = ~cov
                            rep, strict = [], []
                            for j in range(k_layers):
                                rj = ~taken & (zc <= ds[j])
                                rep.append(rj)
                                strict.append(rj & (zc < ds[j]))
                                taken = taken | rj
                            pushed = jnp.zeros_like(cov)
                            for j in range(k_layers):
                                if j > 0:
                                    pushed = pushed | strict[j - 1]
                                    nd = jnp.where(pushed, ds[j - 1],
                                                   jnp.where(rep[j], zc,
                                                             ds[j]))
                                    ni = jnp.where(pushed, is_[j - 1],
                                                   jnp.where(rep[j], tri,
                                                             is_[j]))
                                else:
                                    nd = jnp.where(rep[0], zc, ds[0])
                                    ni = jnp.where(rep[0], tri, is_[0])
                                out_refs[2 * j][rows_, :] = nd
                                out_refs[2 * j + 1][rows_, :] = ni
                return carry

            jax.lax.fori_loop(0, nk, loop, 0)

        pl.run_scoped(
            scoped,
            pltpu.SMEM(((chunk * F_FIELDS) // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )


def build_records(setup_padded: dict, bbox, rec_tri: jax.Array,
                  rec_tile: jax.Array, cols: int, tile_w: int, tile_h: int,
                  chunk: int = 64) -> jax.Array:
    """Gather + tile-fold the per-slot triangle records.

    One record build per (setup, bin) pair serves every raster over those
    bins — peel iterations and overflow probes reuse it (round 1 re-ran
    this gather inside every peel, the single largest frame cost).

    setup_padded: planar setup with the zero sentinel row (raster.pad_setup)
    bbox: the UNPADDED planar bbox from triangle_setup (y0/y1 used)
    rec_tri/rec_tile: from binning.bin_buckets_packed
    Returns f32[rec_cap, (chunk*F_FIELDS)//128, 128].
    """
    e = setup_padded["edge"]
    zl = setup_padded["zlin"]
    anc = setup_padded["anchor"]
    f32 = jnp.float32
    n_pad = e[0].shape[0]
    assert n_pad - 1 <= MAX_TRI, "triangle id exceeds packed-field range"
    zero = jnp.zeros((1,), f32)
    by0 = jnp.concatenate([bbox[1], zero])
    by1 = jnp.concatenate([bbox[3], zero])

    # two row-gathers (width 8) instead of 16 element takes — XLA TPU
    # gathers cost per index, not per byte, up to 8-wide rows
    tbl_a = jnp.stack([e[0], e[1], e[2], e[3], e[4], e[5], e[6], e[7]],
                      axis=-1)
    tbl_b = jnp.stack([e[8], zl[0], zl[1], zl[2], anc[0], anc[1], by0, by1],
                      axis=-1)
    ga = tbl_a[rec_tri]          # [S, 8]
    gb = tbl_b[rec_tri]

    slot_tile = jnp.repeat(rec_tile, chunk)
    ty0i = (slot_tile // cols) * tile_h
    tx0 = ((slot_tile % cols) * tile_w).astype(f32)
    ty0 = ty0i.astype(f32)

    a0, b0, c0 = ga[:, 0], ga[:, 1], ga[:, 2]
    a1, b1, c1 = ga[:, 3], ga[:, 4], ga[:, 5]
    a2, b2 = ga[:, 6], ga[:, 7]
    c2 = gb[:, 0]
    za, zbp, zc = gb[:, 1], gb[:, 2], gb[:, 3]
    ax, ay = gb[:, 4], gb[:, 5]
    y0, y1 = gb[:, 6], gb[:, 7]

    ox = tx0 - ax
    oy = ty0 - ay
    k0 = c0 + a0 * ox + b0 * oy
    k1 = c1 + a1 * ox + b1 * oy
    k2 = c2 + a2 * ox + b2 * oy
    kz = zc + za * ox + zbp * oy

    def tl(a, b):
        return (a > 0.0) | ((a == 0.0) & (b > 0.0))

    bits = (tl(a0, b0).astype(f32) + 2.0 * tl(a1, b1).astype(f32)
            + 4.0 * tl(a2, b2).astype(f32))
    f12 = rec_tri.astype(f32) * 8.0 + bits

    r0 = jnp.clip(jnp.floor(y0).astype(jnp.int32) - ty0i, 0, tile_h)
    r1 = jnp.clip(jnp.ceil(y1).astype(jnp.int32) - ty0i, 0, tile_h)
    f13 = (r0 * 256 + r1).astype(f32)

    pad = jnp.zeros_like(k0)
    rec = jnp.stack([a0, b0, k0, a1, b1, k1, a2, b2, k2, za, zbp, kz,
                     f12, f13, pad, pad], axis=-1)
    return rec.reshape(-1, (chunk * F_FIELDS) // 128, 128)


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_w",
                                             "tile_h", "chunk", "sentinel"))
def rasterize_depth_packed(records: jax.Array, rec_start: jax.Array,
                           counts: jax.Array, width: int, height: int,
                           sentinel: int, tile_w: int = 128,
                           tile_h: int = 32, chunk: int = 64,
                           init_depth: jax.Array | None = None,
                           init_id: jax.Array | None = None,
                           floor_depth: jax.Array | None = None):
    """Raster over an occupancy-packed record stream.
    Returns (depth f32[H, W], tri_id i32[H, W], -1 empty)."""
    assert (chunk * F_FIELDS) % 1024 == 0, \
        "chunk records must be whole (8,128) tiles (chunk multiple of 64)"
    rows, cols = counts.shape
    n_tiles = rows * cols

    if init_depth is None:
        initd = jnp.ones((n_tiles, tile_h, tile_w), jnp.float32)
        initi = jnp.full((n_tiles, tile_h, tile_w), sentinel, jnp.int32)
    else:
        initd = _to_tiles(init_depth, rows, cols, tile_h, tile_w, 1.0)
        initi = _to_tiles(jnp.where(init_id < 0, sentinel, init_id),
                          rows, cols, tile_h, tile_w, sentinel)
    has_floor = floor_depth is not None
    if has_floor:
        # fold the z >= 0 near clip into the peel floor (FTZ-exact)
        floor_t = jnp.maximum(
            _to_tiles(floor_depth, rows, cols, tile_h, tile_w, 2.0),
            jnp.float32(_NEG_MIN_NORMAL))
    else:
        floor_t = jnp.zeros((1, tile_h, tile_w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # records stay in HBM
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w),
                         (lambda t, c, s: (t, 0, 0)) if has_floor
                         else (lambda t, c, s: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile_h, tile_w), lambda t, c, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, chunk=chunk, tile_w=tile_w,
                               tile_h=tile_h, has_floor=has_floor)
    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(counts.reshape(-1), rec_start, records, initd, initi, floor_t)

    depth = _from_tiles(outd.reshape(rows, cols, tile_h, tile_w))
    tri_id = _from_tiles(outi.reshape(rows, cols, tile_h, tile_w))
    tri_id = jnp.where(tri_id == sentinel, -1, tri_id)
    return depth[:height, :width], tri_id[:height, :width]


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_w",
                                             "tile_h", "chunk", "sentinel",
                                             "k_layers"))
def rasterize_layers_packed(records: jax.Array, rec_start: jax.Array,
                            counts: jax.Array, bound: jax.Array, width: int,
                            height: int, sentinel: int, k_layers: int,
                            tile_w: int = 128, tile_h: int = 32,
                            chunk: int = 64,
                            floor_depth: jax.Array | None = None):
    """K-layer peel raster over a packed record stream in ONE pass
    (see _kernel_k).  ``bound`` f32[H, W]: fragments must satisfy
    z <= bound (LEQUAL vs the opaque depth); optional ``floor_depth``
    f32[H, W]: z > floor strictly (the continuation-round form — pass
    2.0 at resolved pixels to blank them).  Returns a list of
    ``k_layers`` (depth f32[H, W], tri_id i32[H, W]) pairs, nearest
    first; depth 2.0 / id -1 where the layer is empty.  Layer k equals
    the k-th iterated strict depth peel over the same records —
    semantics proven equal in tests/test_raster_pallas.py +
    tests/test_frame.py (k-raster A/B)."""
    assert (chunk * F_FIELDS) % 1024 == 0, \
        "chunk records must be whole (8,128) tiles (chunk multiple of 64)"
    rows, cols = counts.shape
    bound_t = _to_tiles(bound, rows, cols, tile_h, tile_w, 2.0)
    has_floor = floor_depth is not None
    if has_floor:
        floor_t = _to_tiles(floor_depth, rows, cols, tile_h, tile_w, 2.0)
    else:
        floor_t = None
    outs = rasterize_layers_grid(records, rec_start, counts.reshape(-1),
                                 bound_t, floor_t, sentinel, k_layers,
                                 tile_w=tile_w, tile_h=tile_h, chunk=chunk)
    layers = []
    for k in range(k_layers):
        d = _from_tiles(outs[2 * k].reshape(rows, cols, tile_h, tile_w))
        i = _from_tiles(outs[2 * k + 1].reshape(rows, cols, tile_h, tile_w))
        i = jnp.where(i == sentinel, -1, i)
        layers.append((d[:height, :width], i[:height, :width]))
    return layers


@functools.partial(jax.jit, static_argnames=("tile_w", "tile_h", "chunk",
                                             "sentinel", "k_layers"))
def rasterize_layers_grid(records: jax.Array, rec_start: jax.Array,
                          counts: jax.Array, bound_t: jax.Array,
                          floor_t: jax.Array | None, sentinel: int,
                          k_layers: int, tile_w: int = 128,
                          tile_h: int = 32, chunk: int = 64):
    """The k-layer peel kernel over an EXPLICIT tile grid: ``counts`` /
    ``rec_start`` [G] and ``bound_t`` (``floor_t``) [G, th, tw] — G need
    not be the full framebuffer grid.  The masked pass's tail rounds
    compact the (few) tiles still holding pending pixels into a small G
    (the kernel's per-tile program overhead dominated tile-gated rounds:
    zeroed counts still paid the full-grid program launches +
    layer-output writes).  Records' tile-folded coefficients are
    slot-independent (pixel coords are tile-local), so running tile t in
    any slot j only requires rec_start[j]/counts[j]/bound_t[j] to be
    tile t's.  Returns the raw [G, th, tw] layer pairs, interleaved."""
    n_tiles = counts.shape[0]
    has_floor = floor_t is not None
    if not has_floor:
        floor_t = jnp.zeros((1, tile_h, tile_w), jnp.float32)

    tile_spec = pl.BlockSpec((None, tile_h, tile_w), lambda t, c, s: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    floor_spec = pl.BlockSpec((None, tile_h, tile_w),
                              (lambda t, c, s: (t, 0, 0)) if has_floor
                              else (lambda t, c, s: (0, 0, 0)),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), tile_spec, floor_spec],
        out_specs=[tile_spec] * (2 * k_layers),
    )
    kernel = functools.partial(_kernel_k, chunk=chunk, tile_w=tile_w,
                               tile_h=tile_h, k_layers=k_layers,
                               sentinel=sentinel, has_floor=has_floor)
    out_shapes = []
    for _ in range(k_layers):
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w),
                                               jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w),
                                               jnp.int32))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(counts, rec_start, records, bound_t, floor_t)


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_w",
                                             "tile_h", "chunk"))
def rasterize_depth_pallas(setup_padded: dict, bins: jax.Array,
                           counts: jax.Array, width: int, height: int,
                           tile_w: int = 128, tile_h: int = 32,
                           chunk: int = 64,
                           init_depth: jax.Array | None = None,
                           init_id: jax.Array | None = None,
                           floor_depth: jax.Array | None = None,
                           bbox=None):
    """Dense-bins compatibility wrapper (tests, single-shot callers):
    lays the [rows, cols, cap] bin table out as the packed-record special
    case rec_start[t] = t * n_chunks and calls the packed kernel.
    ``bbox``: optional planar bbox for the sub-block row guards; without
    it every triangle is treated as covering all rows of its tile."""
    planes = setup_padded["edge"]
    sentinel = planes[0].shape[0] - 1
    rows, cols, cap = bins.shape
    n_chunks = cdiv(cap, chunk)
    cap_pad = n_chunks * chunk
    n_tiles = rows * cols

    bins_f = bins.reshape(n_tiles, cap)
    if cap_pad != cap:
        bins_f = jnp.pad(bins_f, ((0, 0), (0, cap_pad - cap)),
                         constant_values=sentinel)
    rec_tri = bins_f.reshape(-1)
    rec_tile = (jnp.arange(n_tiles * n_chunks, dtype=jnp.int32) // n_chunks)
    rec_start = jnp.arange(n_tiles, dtype=jnp.int32) * n_chunks

    if bbox is None:
        t = planes[0].shape[0] - 1
        full = (jnp.zeros((t,), jnp.float32),
                jnp.zeros((t,), jnp.float32),
                jnp.full((t,), float(cols * 128), jnp.float32),
                jnp.full((t,), float(rows * tile_h), jnp.float32))
        bbox = full
    records = build_records(setup_padded, bbox, rec_tri, rec_tile, cols,
                            tile_w, tile_h, chunk)
    return rasterize_depth_packed(records, rec_start, counts, width, height,
                                  sentinel, tile_w=tile_w, tile_h=tile_h,
                                  chunk=chunk, init_depth=init_depth,
                                  init_id=init_id, floor_depth=floor_depth)


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
