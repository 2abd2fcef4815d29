"""Triangle -> screen-tile binning.

The TPU analog of the GPU's internal tile binner: each framebuffer tile
gets a fixed-capacity list of overlapping triangle ids.  Overflow beyond
the cap is *counted and surfaced* (SURVEY.md names silent bin overflow the
scariest correctness trap) via the returned ``overflow`` scalar.

Implementation is sort-based (TPU scatters are slow; sorts are fast), and
one sort serves every material bucket of a camera view (the reference
draws opaque, alpha-masked and transparent objects from ONE culled list,
vk_engine_run.cpp:449-458 — here they are contiguous triangle-id ranges of
the same scene):

1. every small triangle emits up to ``max_span`` (tile, tri) pairs from
   its tile bbox, packed into ONE int32 key ``tile << ceil(log2 T) | tri``
   (single-operand sorts are memory-bound; 4 B keys halve the traffic of
   the (key, value) form and the tri id rides along for free),
2. sort ascending: pairs group by tile, and within a tile by triangle id
   == the reference's submission draw order,
3. per-(tile, bucket) offsets via searchsorted — bucket ranges are static
   tri-id intervals, so a bucket's slice of a tile's list is just two
   binary searches; no per-bucket re-sort,
4. triangles spanning more than ``max_span`` tiles (screen-filling floors,
   grazing wall slivers, and near-plane-crossing triangles whose 2DH bbox
   is conservatively the whole viewport) get EXACT per-tile coverage
   tests against their edge functions (conservative tile-corner test) and
   emit keys into the SAME sort — so a triangle only lands in tiles it
   can actually touch, draw order within a tile stays ascending-id, and
   no tile rasters a global big list.  Callers that cannot supply edge
   coefficients fall back to the legacy front-of-tile big list.

Returns bins filled with ``T`` (sentinel, one past the last triangle) in
empty slots — callers pad per-triangle arrays with a zero sentinel row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import cdiv


def _big_exact_keys(edge, anchor, bbox, big, tri_ids, rows: int, cols: int,
                    tile_w: int, tile_h: int, big_cap: int, log2p: int,
                    n_tiles: int):
    """EXACT (tile, tri) keys for up to ``big_cap`` big triangles.

    For each (big triangle, tile) pair, evaluate the conservative
    triangle-vs-rectangle test on the 2DH edge functions: an edge excludes
    the tile iff its maximum over the tile rectangle is negative, and the
    maximizing corner is picked by the coefficient signs.  The pass set is
    a superset of the per-pixel raster test, so no covered pixel is ever
    lost; a triangle whose bbox exploded to the whole viewport (near-plane
    crossing) still only lands in tiles its edges admit.  The tile's bbox
    overlap additionally prunes ordinary large triangles.

    Cost: big_cap * n_tiles elementwise ops + that many extra sort keys —
    at 1080p (510 tiles, cap 1024) ~0.5M keys next to the ~4M bbox pairs.
    """
    sentinel_key = jnp.int32(n_tiles << log2p)
    bigi = big.astype(jnp.int32)
    big_idx = jnp.cumsum(bigi) - 1
    big_total = jnp.sum(bigi)
    pos = jnp.where(big & (big_idx < big_cap), big_idx, big_cap)
    slot_tri = jnp.full((big_cap,), -1, jnp.int32).at[pos].set(
        tri_ids, mode="drop", unique_indices=True)
    ok = slot_tri >= 0
    st = jnp.maximum(slot_tri, 0)

    def g(plane):
        return jnp.take(plane, st)[:, None]              # [big_cap, 1]

    ax, ay = g(anchor[0]), g(anchor[1])
    tx = (jnp.arange(n_tiles, dtype=jnp.int32) % cols).astype(jnp.float32)
    ty = (jnp.arange(n_tiles, dtype=jnp.int32) // cols).astype(jnp.float32)
    x0 = (tx * tile_w)[None, :]                          # [1, n_tiles]
    x1 = x0 + tile_w
    y0 = (ty * tile_h)[None, :]
    y1 = y0 + tile_h

    covered = ok[:, None]
    for i in range(3):
        a, b, c = g(edge[3 * i]), g(edge[3 * i + 1]), g(edge[3 * i + 2])
        mx = (a * (jnp.where(a > 0, x1, x0) - ax)
              + b * (jnp.where(b > 0, y1, y0) - ay) + c)
        covered = covered & (mx >= 0.0)
    # bbox overlap prune (cheap; bbox is conservative, incl. the
    # full-viewport case)
    bx0, by0, bx1, by1 = (g(p) for p in bbox)
    covered = covered & (x1 > bx0) & (x0 < bx1) & (y1 > by0) & (y0 < by1)

    tile_id = jnp.arange(n_tiles, dtype=jnp.int32)[None, :]
    keys = jnp.where(covered, (tile_id << log2p) | st[:, None],
                     sentinel_key)
    return keys.reshape(-1), big_total


def _compact_keys(keys: jax.Array, real: jax.Array, sentinel_key,
                  cap: int):
    """Scatter the ``real`` keys into a [cap] list (sentinel-key padded),
    dropping (and COUNTING) beyond-cap entries.

    The sort's cost is its STATIC length — every sentinel pad rides all
    O(n log n) passes — while a scatter is one cheap pass, so compacting
    the real pairs out of the [T, max_span] / [big_cap, n_tiles]
    emission grids before sorting cuts the bin stage's dominant cost by
    the pad fraction.  Exactness: dropped pairs are whole candidate
    (tile, triangle) entries, surfaced through the callers' overflow
    counters exactly like per-tile cap overflow — never silent."""
    pos = jnp.cumsum(real.astype(jnp.int32)) - 1
    total = pos[-1] + 1
    tgt = jnp.where(real & (pos < cap), pos, cap)        # cap == OOB drop
    compact = jnp.full((cap,), sentinel_key, jnp.int32).at[tgt].set(
        keys, mode="drop", unique_indices=True)
    return compact, jnp.maximum(total - cap, 0)


def _emit_pairs(bbox, valid, width: int, height: int, tile_w: int,
                tile_h: int, max_span: int, edge=None, anchor=None,
                big_cap: int = 512):
    """Emit the UNSORTED (tile, tri) int32 keys plus their real-pair mask.
    With ``edge``/``anchor`` given, big triangles contribute EXACT pairs
    to the same emission (see _big_exact_keys) and the returned ``big``
    mask is all-False; otherwise callers handle big triangles via the
    legacy front-of-tile list."""
    bx0, by0, bx1, by1 = bbox
    n_tris = bx0.shape[0]
    rows = cdiv(height, tile_h)
    cols = cdiv(width, tile_w)
    n_tiles = rows * cols

    # packed key layout: tile in the high bits, triangle in the low bits
    log2p = max(1, int(n_tris + 1).bit_length())
    assert (n_tiles + 1) << log2p < 2**31, "tile/tri key exceeds int32"

    tx0 = jnp.clip(jnp.floor(bx0 / tile_w), 0, cols - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(by0 / tile_h), 0, rows - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil(bx1 / tile_w) - 1, 0, cols - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil(by1 / tile_h) - 1, 0, rows - 1).astype(jnp.int32)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    span = nx * ny

    small = valid & (span <= max_span)
    big = valid & (span > max_span)

    tri_ids = jnp.arange(n_tris, dtype=jnp.int32)
    k = jnp.arange(max_span, dtype=jnp.int32)[None, :]
    dx = k % nx[:, None]
    dy = k // nx[:, None]
    tile_id = (ty0[:, None] + dy) * cols + (tx0[:, None] + dx)
    pair_ok = small[:, None] & (k < span[:, None])
    sentinel_key = jnp.int32(n_tiles << log2p)
    keys = jnp.where(pair_ok, (tile_id << log2p) | tri_ids[:, None],
                     sentinel_key).reshape(-1)
    real = pair_ok.reshape(-1)
    big_exact_total = None
    if edge is not None:
        big_keys, big_exact_total = _big_exact_keys(
            edge, anchor, bbox, big, tri_ids, rows, cols, tile_w, tile_h,
            big_cap, log2p, n_tiles)
        keys = jnp.concatenate([keys, big_keys])
        real = jnp.concatenate([real, big_keys != sentinel_key])
        big = jnp.zeros_like(big)
    return (keys, real, sentinel_key, big, tri_ids, log2p, rows, cols,
            n_tiles, big_exact_total)


def _pair_sort(bbox, valid, width: int, height: int, tile_w: int,
               tile_h: int, max_span: int, edge=None, anchor=None,
               big_cap: int = 512, pair_cap: int = 0):
    """_emit_pairs + sort (the dense-bins path).  ``pair_cap`` > 0
    compacts the real pairs to that static length before sorting
    (_compact_keys); dropped pairs are returned in the tuple's last slot
    (``pair_drop``) and are surfaced as bin overflow.  The packed
    production path instead uses a lax.cond full-sort fallback — exact on
    every path — in _bin_buckets_packed_impl."""
    (keys, real, sentinel_key, big, tri_ids, log2p, rows, cols, n_tiles,
     big_exact_total) = _emit_pairs(
        bbox, valid, width, height, tile_w, tile_h, max_span, edge=edge,
        anchor=anchor, big_cap=big_cap)
    pair_drop = jnp.int32(0)
    if pair_cap > 0 and pair_cap < keys.shape[0]:
        keys, pair_drop = _compact_keys(keys, real, sentinel_key, pair_cap)
    keys_s = jax.lax.sort(keys)
    tris_s = keys_s & ((1 << log2p) - 1)
    return (keys_s, tris_s, big, tri_ids, log2p, rows, cols, n_tiles,
            big_exact_total, pair_drop)


def _bucket_big_list(big, tri_ids, lo, hi, big_cap, sentinel):
    """Packed global list of this bucket's big (span > max_span) triangles."""
    bigb = big & (tri_ids >= lo) & (tri_ids < hi)
    big_i = jnp.cumsum(bigb.astype(jnp.int32)) - 1
    big_total = jnp.sum(bigb.astype(jnp.int32))
    big_eff = jnp.minimum(big_total, big_cap)
    big_list = jnp.full((big_cap,), sentinel, jnp.int32)
    big_pos = jnp.where(bigb & (big_i < big_cap), big_i, big_cap)
    big_list = big_list.at[big_pos].set(tri_ids, mode="drop",
                                        unique_indices=True)
    return big_list, big_eff, big_total


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "bounds", "caps", "max_span", "big_cap",
                                   "has_edges", "pair_cap"))
def _bin_triangles_buckets_impl(bbox, valid: jax.Array, bounds, width: int,
                                height: int, tile_w: int, tile_h: int,
                                caps, max_span: int, big_cap: int,
                                edge, anchor, has_edges: bool,
                                pair_cap: int):
    n_tris = bbox[0].shape[0]
    sentinel = n_tris
    (keys_s, tris_s, big, tri_ids, log2p, rows, cols, n_tiles,
     big_exact_total, pair_drop) = _pair_sort(
        tuple(bbox), valid, width, height, tile_w, tile_h, max_span,
        edge=edge if has_edges else None, anchor=anchor, big_cap=big_cap,
        pair_cap=pair_cap)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    out = []
    for (lo, hi), cap in zip(bounds, caps):
        offsets = jnp.searchsorted(
            keys_s, (tile_range << log2p) + lo, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(
            keys_s, (tile_range << log2p) + hi, side="left").astype(jnp.int32)
        counts = ends - offsets

        if has_edges:
            # exact mode: big pairs are already in the sorted keys, in
            # ascending-id (submission) order; the whole cap+big_cap slot
            # range serves the merged per-tile lists
            big_eff = jnp.int32(0)
            big_list = jnp.full((big_cap,), sentinel, jnp.int32)
            cap_eff = cap + big_cap
            big_drop = jnp.maximum(big_exact_total - big_cap, 0) * n_tiles
        else:
            # legacy: big triangles at the FRONT of every tile's slots so
            # the dynamic chunk bound covers them with no sentinel gaps
            big_list, big_eff, big_total = _bucket_big_list(
                big, tri_ids, lo, hi, big_cap, sentinel)
            cap_eff = cap
            big_drop = jnp.maximum(big_total - big_cap, 0) * n_tiles

        counts_small = jnp.minimum(counts, cap_eff)
        slot = jnp.arange(cap + big_cap, dtype=jnp.int32)[None, :]
        is_big = slot < big_eff
        small_slot = slot - big_eff
        gather_idx = jnp.clip(offsets[:, None] + small_slot, 0,
                              keys_s.shape[0] - 1)
        small_ok = (small_slot >= 0) & (small_slot < counts_small[:, None])
        bins = jnp.where(
            is_big, big_list[jnp.clip(slot, 0, big_cap - 1)],
            jnp.where(small_ok, tris_s[gather_idx], sentinel))

        overflow = (jnp.sum(jnp.maximum(counts - cap_eff, 0)) + big_drop
                    + pair_drop)
        out.append((bins.reshape(rows, cols, cap + big_cap),
                    (counts_small + big_eff).reshape(rows, cols), overflow))
    return tuple(out)


def bin_triangles_buckets(bbox, valid: jax.Array, bounds, width: int,
                          height: int, tile_w: int = 128, tile_h: int = 32,
                          caps=(2048,), max_span: int = 16,
                          big_cap: int = 512, edge=None, anchor=None,
                          pair_cap: int = 0):
    """Bin all buckets of a view with ONE pair sort (dense-bins form).

    bbox: (x0, y0, x1, y1) planar over T (a 2-D [T, 4] array is also
    accepted).  ``bounds``: static tuple of (lo, hi) triangle-id ranges,
    one per bucket (ranges are how the scene stores material passes —
    SceneArrays tris are sorted [opaque | masked | transparent]).
    ``caps``: per-bucket per-tile capacity.  With ``edge``/``anchor``
    (the triangle_setup planes), big triangles are binned EXACTLY into
    only the tiles they touch (see _big_exact_keys).

    Returns a tuple, one per bucket, of
    (bins i32[rows, cols, cap + big_cap], counts i32[rows, cols],
    overflow i32).
    """
    if not isinstance(bbox, (tuple, list)):
        bbox = [bbox[:, c] for c in range(4)]
    has_edges = edge is not None
    return _bin_triangles_buckets_impl(
        tuple(bbox), valid, tuple(bounds), width, height, tile_w, tile_h,
        tuple(caps), max_span, big_cap,
        tuple(edge) if has_edges else (), tuple(anchor) if has_edges else (),
        has_edges, pair_cap)


def _build_packed_plans(keys_s, log2p, bounds, caps, rec_caps, chunk,
                        big, tri_ids, big_cap, big_exact_total, has_edges,
                        sentinel, n_tiles, rows, cols):
    """Per-bucket occupancy-packed plans from a SORTED key array.  Output
    shapes depend only on the static caps — not on len(keys_s) — so the
    compact-sort and full-sort paths can be lax.cond branches."""
    tris_s = keys_s & ((1 << log2p) - 1)
    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    out = []
    for (lo, hi), cap, rec_cap in zip(bounds, caps, rec_caps):
        offsets = jnp.searchsorted(
            keys_s, (tile_range << log2p) + lo, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(
            keys_s, (tile_range << log2p) + hi, side="left").astype(jnp.int32)
        counts = ends - offsets

        if has_edges:
            # exact mode: big pairs already merged into the sorted keys
            big_eff = jnp.int32(0)
            big_list = jnp.full((big_cap,), sentinel, jnp.int32)
            cap_eff = cap + big_cap
            big_drop = jnp.maximum(big_exact_total - big_cap, 0) * n_tiles
        else:
            big_list, big_eff, big_total = _bucket_big_list(
                big, tri_ids, lo, hi, big_cap, sentinel)
            cap_eff = cap
            big_drop = jnp.maximum(big_total - big_cap, 0) * n_tiles

        counts_cap = jnp.minimum(counts, cap_eff) + big_eff
        nk = (counts_cap + chunk - 1) // chunk
        rec_start = jnp.cumsum(nk) - nk              # exclusive prefix sum
        # tiles whose record range spills past rec_cap are truncated
        nk_fit = jnp.clip(jnp.minimum(nk, rec_cap - rec_start), 0, None)
        counts_fit = jnp.minimum(counts_cap, nk_fit * chunk)

        # per-record owning tile: rec_start is nondecreasing and empty
        # tiles contribute no records, so the last tile starting <= r owns r
        rec_idx = jnp.arange(rec_cap, dtype=jnp.int32)
        rec_tile = (jnp.searchsorted(rec_start, rec_idx, side="right")
                    .astype(jnp.int32) - 1)
        rec_tile = jnp.clip(rec_tile, 0, n_tiles - 1)

        # slot -> source triangle (big list first, then the sorted pairs)
        slot_tile = jnp.repeat(rec_tile, chunk)
        local = (jnp.arange(rec_cap * chunk, dtype=jnp.int32)
                 - jnp.take(rec_start, slot_tile) * chunk)
        in_range = local < jnp.take(counts_fit, slot_tile)
        is_big = local < big_eff
        src_small = jnp.take(offsets, slot_tile) + (local - big_eff)
        tri = jnp.where(
            in_range,
            jnp.where(is_big,
                      big_list[jnp.clip(local, 0, big_cap - 1)],
                      tris_s[jnp.clip(src_small, 0, keys_s.shape[0] - 1)]),
            sentinel)

        overflow = (jnp.sum(jnp.maximum(counts - cap_eff, 0)) + big_drop
                    + jnp.sum(counts_cap - counts_fit))
        out.append({"rec_tri": tri, "rec_tile": rec_tile,
                    "rec_start": rec_start.astype(jnp.int32),
                    "counts": counts_fit.reshape(rows, cols),
                    "overflow": overflow})
    return tuple(out)


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "bounds", "caps", "rec_caps", "chunk",
                                   "max_span", "big_cap", "has_edges",
                                   "pair_cap"))
def _bin_buckets_packed_impl(bbox, valid: jax.Array, bounds, width: int,
                             height: int, tile_w: int, tile_h: int,
                             caps, rec_caps, chunk: int, max_span: int,
                             big_cap: int, edge, anchor, has_edges: bool,
                             pair_cap: int):
    n_tris = bbox[0].shape[0]
    sentinel = n_tris
    (keys, real, sentinel_key, big, tri_ids, log2p, rows, cols, n_tiles,
     big_exact_total) = _emit_pairs(
        tuple(bbox), valid, width, height, tile_w, tile_h, max_span,
        edge=edge if has_edges else None, anchor=anchor, big_cap=big_cap)

    def build(keys_sorted):
        return _build_packed_plans(
            keys_sorted, log2p, bounds, caps, rec_caps, chunk, big,
            tri_ids, big_cap, big_exact_total, has_edges, sentinel,
            n_tiles, rows, cols)

    if pair_cap > 0 and pair_cap < keys.shape[0]:
        # compact-before-sort with an EXACT fallback: if the real pairs
        # exceed pair_cap, a lax.cond sorts the full emission instead —
        # slower, never wrong.  The miss count is surfaced per bucket as
        # ``pair_fallback`` (a cap-sizing signal, like fallback_px), NOT
        # as overflow: no pair is ever dropped on either path.
        compact, drop = _compact_keys(keys, real, sentinel_key, pair_cap)
        out = jax.lax.cond(
            drop == 0,
            lambda ops: build(jax.lax.sort(ops[0])),
            lambda ops: build(jax.lax.sort(ops[1])),
            (compact, keys))
        out = tuple({**p, "pair_fallback": drop} for p in out)
    else:
        out = build(jax.lax.sort(keys))
        out = tuple({**p, "pair_fallback": jnp.int32(0)} for p in out)
    return out


def bin_buckets_packed(bbox, valid: jax.Array, bounds, width: int,
                       height: int, tile_w: int = 128, tile_h: int = 32,
                       caps=(2048,), rec_caps=(4096,), chunk: int = 64,
                       max_span: int = 16, big_cap: int = 512, edge=None,
                       anchor=None, pair_cap: int = 0):
    """Occupancy-packed per-bucket raster work lists (the TPU-path form).

    Instead of a dense ``[n_tiles, cap]`` bin table (whose per-slot record
    gather cost scales with n_tiles * cap regardless of occupancy — the
    round-1 shadow pass built 285 MB of records per cascade this way),
    each bucket's per-tile candidate lists are packed back-to-back into
    ``rec_cap`` chunk-aligned records of ``chunk`` slots; the raster
    kernel DMAs records ``rec_start[tile] + k``.  Total record-gather cost
    now tracks actual bin occupancy, with ``rec_cap`` a static safety cap
    (truncation is counted in ``overflow`` — never silent).  With
    ``edge``/``anchor``, big triangles are binned EXACTLY into only the
    tiles they touch (see _big_exact_keys).  ``pair_cap`` > 0 sorts a
    compacted real-pair list instead of the full emission, with a
    lax.cond full-sort fallback when the cap misses — exact on every
    path; misses are counted in ``pair_fallback``.

    Returns per bucket a dict:
      rec_tri   i32[rec_cap * chunk]  triangle id per slot (sentinel pad)
      rec_tile  i32[rec_cap]          owning tile per record
      rec_start i32[n_tiles]          first record of each tile
      counts    i32[rows, cols]       per-tile candidate count (clamped)
      overflow  i32                   dropped candidates (cap + rec_cap)
      pair_fallback i32               pair_cap misses (exact cond fallback)
    """
    if not isinstance(bbox, (tuple, list)):
        bbox = [bbox[:, c] for c in range(4)]
    has_edges = edge is not None
    return _bin_buckets_packed_impl(
        tuple(bbox), valid, tuple(bounds), width, height, tile_w, tile_h,
        tuple(caps), tuple(rec_caps), chunk, max_span, big_cap,
        tuple(edge) if has_edges else (), tuple(anchor) if has_edges else (),
        has_edges, pair_cap)


def bin_triangles(bbox, valid: jax.Array, width: int, height: int,
                  tile_w: int = 128, tile_h: int = 32, cap: int = 2048,
                  max_span: int = 16, big_cap: int = 512, chunk: int = 0):
    """Single-bucket form (shadow cascades, tests).  ``chunk`` is accepted
    for API compatibility (unused)."""
    del chunk
    if not isinstance(bbox, (tuple, list)):
        bbox = [bbox[:, c] for c in range(4)]
    n_tris = bbox[0].shape[0]
    (result,) = bin_triangles_buckets(
        tuple(bbox), valid, ((0, n_tris),), width, height, tile_w=tile_w,
        tile_h=tile_h, caps=(cap,), max_span=max_span, big_cap=big_cap)
    return result
