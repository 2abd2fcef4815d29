"""Tiled depth rasterizer (XLA reference path) -> visibility buffer.

The software replacement for the Vulkan fixed-function rasterizer + depth
test (SURVEY.md F1/F2): per framebuffer tile, stream the tile's binned
triangles in chunks, evaluate the three inside-positive edge functions and
the screen-linear depth plane at every pixel center (+0.5 sampling, Vulkan
top-left fill rule), and keep the nearest passing triangle per pixel
(LESS_OR_EQUAL compare, clear depth 1.0 — vk_engine_init.cpp depth configs
and vk_engine_run.cpp:251).

Output is a *visibility buffer*: depth[H, W] plus winning triangle id
(-1 where uncovered).  Shading happens deferred, densely, afterwards —
the TPU-friendly split (raster is irregular, shading is dense VPU work).

An optional ``alpha_fn`` hook implements the alpha-cutoff path
(mesh_pbr.frag:193 ``discard`` on albedo alpha < 0.5) for the masked
triangle bucket: it returns per-candidate coverage given interpolation
weights, and discarded fragments never write depth — exactly the
forward-pipeline semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import cdiv


def rasterize_depth_auto(setup_padded: dict, bins: jax.Array, counts: jax.Array,
                         width: int, height: int, tile_w: int = 128,
                         tile_h: int = 32, chunk: int = 16,
                         init_depth: jax.Array | None = None,
                         init_id: jax.Array | None = None,
                         floor_depth: jax.Array | None = None):
    """Backend dispatch: the Pallas kernel on TPU, the XLA reference
    implementation elsewhere.  (Dense-bins form; the frame graph uses the
    occupancy-packed plan API below instead.)"""
    from .common import on_tpu
    if on_tpu():
        from .raster_pallas import rasterize_depth_pallas
        return rasterize_depth_pallas(setup_padded, bins, counts, width,
                                      height, tile_w=tile_w, tile_h=tile_h,
                                      chunk=64, init_depth=init_depth,
                                      init_id=init_id, floor_depth=floor_depth)
    return rasterize_depth(setup_padded, bins, width, height, tile_w=tile_w,
                           tile_h=tile_h, chunk=chunk, init_depth=init_depth,
                           init_id=init_id, counts=counts,
                           floor_depth=floor_depth)


# ---------------------------------------------------------------------------
# Plan API: bin once per view, build records once, raster many times.
# The peel loops (masked alpha-cutoff, additive transparent) re-raster the
# same bins up to peels+1 times — a "plan" carries everything those rasters
# share so the expensive parts (pair sort, record gather) happen once.
# ---------------------------------------------------------------------------

def plan_view_buckets(st: dict, bounds, width: int, height: int,
                      tile_w: int, tile_h: int, caps, rec_caps,
                      chunk: int = 64, max_span: int = 16,
                      big_cap: int = 512, pair_cap: int = 0):
    """Bin every bucket of a view with one pair sort; returns a tuple of
    per-bucket plan dicts (occupancy-packed records on TPU, dense bins on
    the XLA reference path).  ``rec_caps`` are static record-count safety
    caps, auto-shrunk to the scene's worst-case pair count.  ``pair_cap``
    > 0 (TPU path only) sorts a compacted real-pair list instead of the
    full T*max_span + big_cap*n_tiles emission (the sort costs its STATIC
    length), with a lax.cond full-sort fallback when the cap misses —
    exact on every path; misses land in each plan's ``pair_fallback``."""
    from . import binning
    from .common import on_tpu
    # triangle_setup's edge planes enable EXACT big-triangle binning
    # (binning._big_exact_keys) — a big triangle lands only in tiles its
    # edges admit instead of prepending to every tile's list
    edge, anchor = st.get("edge"), st.get("anchor")
    if on_tpu():
        n_tris = st["valid"].shape[0]
        n_tiles = cdiv(width, tile_w) * cdiv(height, tile_h)
        # worst case: every pair lands in a distinct partial chunk (bbox
        # pairs + exact big pairs)
        worst = (cdiv(n_tris * max_span + big_cap * n_tiles, chunk)
                 + n_tiles + 1)
        rec_caps = tuple(min(rc, worst) for rc in rec_caps)
        return binning.bin_buckets_packed(
            st["bbox"], st["valid"], bounds, width, height, tile_w=tile_w,
            tile_h=tile_h, caps=caps, rec_caps=rec_caps, chunk=chunk,
            max_span=max_span, big_cap=big_cap, edge=edge, anchor=anchor,
            pair_cap=pair_cap)
    # XLA reference path: full-length sort always (perf is a TPU concern;
    # the dense path must stay unconditionally exact with zero knobs)
    dense = binning.bin_triangles_buckets(
        st["bbox"], st["valid"], bounds, width, height, tile_w=tile_w,
        tile_h=tile_h, caps=caps, big_cap=big_cap, edge=edge, anchor=anchor)
    return tuple({"bins": b, "counts": c, "overflow": o,
                  "pair_fallback": jnp.int32(0)}
                 for (b, c, o) in dense)


def prepare_records(plan: dict, setup_padded: dict, bbox, width: int,
                    tile_w: int, tile_h: int, chunk: int = 64) -> dict:
    """Materialize the packed raster records for a plan (TPU path; no-op
    on the dense path).  Call once, raster many."""
    if "rec_tri" not in plan:
        return plan
    from .raster_pallas import build_records
    plan = dict(plan)
    plan["records"] = build_records(setup_padded, bbox, plan["rec_tri"],
                                    plan["rec_tile"], cdiv(width, tile_w),
                                    tile_w, tile_h, chunk)
    return plan


def rasterize_plan(plan: dict, setup_padded: dict, width: int, height: int,
                   sentinel: int, tile_w: int = 128, tile_h: int = 32,
                   chunk: int = 16,
                   init_depth: jax.Array | None = None,
                   init_id: jax.Array | None = None,
                   floor_depth: jax.Array | None = None):
    """Depth raster over a prepared plan.  ``chunk`` applies to the XLA
    path only (the Pallas kernel's chunk is fixed by the record layout)."""
    if "records" in plan:
        from .raster_pallas import rasterize_depth_packed
        return rasterize_depth_packed(
            plan["records"], plan["rec_start"], plan["counts"], width,
            height, sentinel, tile_w=tile_w, tile_h=tile_h,
            init_depth=init_depth, init_id=init_id, floor_depth=floor_depth)
    return rasterize_depth(setup_padded, plan["bins"], width, height,
                           tile_w=tile_w, tile_h=tile_h, chunk=chunk,
                           init_depth=init_depth, init_id=init_id,
                           counts=plan["counts"], floor_depth=floor_depth)


def rasterize_plan_k(plan: dict, setup_padded: dict, width: int, height: int,
                     sentinel: int, k_layers: int, bound: jax.Array,
                     tile_w: int = 128, tile_h: int = 32, chunk: int = 16,
                     floor_depth: jax.Array | None = None):
    """The first ``k_layers`` strict depth-peel layers over a prepared
    plan in ONE record pass (TPU k-buffer kernel) or ``k_layers``
    iterated peels (XLA reference path) — bit-identical by construction:
    layer k is the LESS_OR_EQUAL later-wins winner among fragments with
    z strictly behind layer k-1 and z <= ``bound`` (the opaque depth).
    Optional ``floor_depth``: layer 0 additionally requires z strictly
    > floor — the masked pass's CONTINUATION-ROUND form (floor = the
    deepest already-peeled layer; 2.0 blanks resolved pixels).

    Returns a list of (depth, id) pairs, nearest first; (2.0, -1) where
    a layer is empty.  The masked/transparent passes consume peels+1
    layers: the last one is the ``peel_overflow`` existence probe, so
    the three rasterizations per bucket (peel 0, peel 1, probe) collapse
    into one stream of the records."""
    if "records" in plan:
        from .raster_pallas import rasterize_layers_packed
        return rasterize_layers_packed(
            plan["records"], plan["rec_start"], plan["counts"], bound,
            width, height, sentinel, k_layers, tile_w=tile_w, tile_h=tile_h,
            floor_depth=floor_depth)
    layers = []
    floor = floor_depth
    no_id = jnp.full((height, width), -1, jnp.int32)
    for _ in range(k_layers):
        d, t = rasterize_depth(setup_padded, plan["bins"], width, height,
                               tile_w=tile_w, tile_h=tile_h, chunk=chunk,
                               init_depth=bound, init_id=no_id,
                               counts=plan["counts"], floor_depth=floor)
        found = t >= 0
        ld = jnp.where(found, d, 2.0)
        layers.append((ld, t))
        floor = ld          # 2.0 where empty: no deeper layer there
    return layers


def rasterize_plan_k_tiled(plan: dict, setup_padded: dict, width: int,
                           height: int, sentinel: int, k_layers: int,
                           bound_t: jax.Array, tile_w: int = 128,
                           tile_h: int = 32, chunk: int = 16,
                           floor_t: jax.Array | None = None):
    """rasterize_plan_k in TILE space: ``bound_t``/``floor_t`` and the
    returned layers are [n_tiles, tile_h, tile_w] (row-major tile order).
    The records path feeds rasterize_layers_grid directly — the layers
    are BORN tiled in the kernel, so the round-5 tile-space masked pass
    skips every per-layer [H, W] <-> tile conversion.  The XLA reference
    path converts around rasterize_plan_k (tests; bit-identical)."""
    rows = cdiv(height, tile_h)
    cols = cdiv(width, tile_w)
    if "records" in plan:
        from .raster_pallas import rasterize_layers_grid
        outs = rasterize_layers_grid(
            plan["records"], plan["rec_start"], plan["counts"].reshape(-1),
            bound_t, floor_t, sentinel, k_layers, tile_w=tile_w,
            tile_h=tile_h)
        layers = []
        for k in range(k_layers):
            i = outs[2 * k + 1]
            layers.append((outs[2 * k], jnp.where(i == sentinel, -1, i)))
        return layers
    from .raster_pallas import _from_tiles, _to_tiles
    bound = _from_tiles(bound_t.reshape(rows, cols, tile_h, tile_w)
                        )[:height, :width]
    floor = None
    if floor_t is not None:
        floor = _from_tiles(floor_t.reshape(rows, cols, tile_h, tile_w)
                            )[:height, :width]
    layers = rasterize_plan_k(plan, setup_padded, width, height, sentinel,
                              k_layers, bound, tile_w=tile_w, tile_h=tile_h,
                              chunk=chunk, floor_depth=floor)
    return [(_to_tiles(d, rows, cols, tile_h, tile_w, 2.0),
             _to_tiles(t, rows, cols, tile_h, tile_w, -1))
            for d, t in layers]


def rasterize_layers_subset_tiled(plan: dict, sentinel: int, k_layers: int,
                                  bound_t: jax.Array, floor_t: jax.Array,
                                  tile_sel: jax.Array, tile_w: int = 128,
                                  tile_h: int = 32):
    """K-layer peel over ONLY the tiles in ``tile_sel`` ([TCAP] flat tile
    indices, -1 padding), tile-space in AND out — the tail-round form of
    rasterize_plan_k_tiled.  Unselected tiles return empty layers
    (2.0 / -1).  Records path only."""
    from .raster_pallas import rasterize_layers_grid
    counts = plan["counts"].reshape(-1)
    n_tiles = counts.shape[0]
    selc = jnp.clip(tile_sel, 0, n_tiles - 1)
    ok = tile_sel >= 0
    counts_c = jnp.where(ok, jnp.take(counts, selc), 0)
    start_c = jnp.take(plan["rec_start"], selc)
    outs = rasterize_layers_grid(
        plan["records"], start_c, counts_c, bound_t[selc], floor_t[selc],
        sentinel, k_layers, tile_w=tile_w, tile_h=tile_h)
    tgt = jnp.where(ok, tile_sel, n_tiles)
    layers = []
    for k in range(k_layers):
        d_full = jnp.full((n_tiles, tile_h, tile_w), 2.0, jnp.float32
                          ).at[tgt].set(outs[2 * k], mode="drop")
        i_full = jnp.full((n_tiles, tile_h, tile_w), sentinel, jnp.int32
                          ).at[tgt].set(outs[2 * k + 1], mode="drop")
        layers.append((d_full, jnp.where(i_full == sentinel, -1, i_full)))
    return layers


def rasterize_plan_k_subset(plan: dict, width: int, height: int,
                            sentinel: int, k_layers: int, bound: jax.Array,
                            floor_depth: jax.Array, tile_sel: jax.Array,
                            tile_w: int = 128, tile_h: int = 32):
    """K-layer peel over ONLY the tiles listed in ``tile_sel`` ([TCAP]
    flat tile indices, -1 padding) — the masked tail rounds' form: the
    pending set concentrates in a handful of tiles, and the full-grid
    kernel's per-tile program overhead dominated gated rounds.  Tiles
    not selected return empty layers (2.0 / -1).  Records path only
    (callers lax.cond to rasterize_plan_k otherwise)."""
    from .raster_pallas import (_from_tiles, _to_tiles,
                                rasterize_layers_grid)
    counts = plan["counts"]
    rows, cols = counts.shape
    n_tiles = rows * cols
    tcap = tile_sel.shape[0]
    selc = jnp.clip(tile_sel, 0, n_tiles - 1)
    ok = tile_sel >= 0
    counts_c = jnp.where(ok, jnp.take(counts.reshape(-1), selc), 0)
    start_c = jnp.take(plan["rec_start"], selc)
    bound_t = _to_tiles(bound, rows, cols, tile_h, tile_w, 2.0)
    floor_t = _to_tiles(floor_depth, rows, cols, tile_h, tile_w, 2.0)
    outs = rasterize_layers_grid(
        plan["records"], start_c, counts_c, bound_t[selc], floor_t[selc],
        sentinel, k_layers, tile_w=tile_w, tile_h=tile_h)
    tgt = jnp.where(ok, tile_sel, n_tiles)
    layers = []
    for k in range(k_layers):
        d_full = jnp.full((n_tiles, tile_h, tile_w), 2.0, jnp.float32
                          ).at[tgt].set(outs[2 * k], mode="drop")
        i_full = jnp.full((n_tiles, tile_h, tile_w), sentinel, jnp.int32
                          ).at[tgt].set(outs[2 * k + 1], mode="drop")
        d = _from_tiles(d_full.reshape(rows, cols, tile_h, tile_w))
        i = _from_tiles(i_full.reshape(rows, cols, tile_h, tile_w))
        i = jnp.where(i == sentinel, -1, i)
        layers.append((d[:height, :width], i[:height, :width]))
    return layers


def pad_setup(setup: dict) -> dict:
    """Append the all-zero sentinel entry so bin-slot gathers at id==T are
    harmless (zero edges fail coverage everywhere).  Planar in/out."""
    zero = jnp.zeros((1,), jnp.float32)

    def pad(p):
        return jnp.concatenate([p, zero])

    return {
        "edge": [pad(p) for p in setup["edge"]],
        "zlin": [pad(p) for p in setup["zlin"]],
        "anchor": [pad(p) for p in setup["anchor"]],
    }


def _coverage(e, a, b):
    """Inside test with the top-left rule (y-down): e>0, or e==0 on a top
    edge (a==0, b>0) or left edge (a>0)."""
    top_left = (a > 0.0) | ((a == 0.0) & (b > 0.0))
    return (e > 0.0) | ((e == 0.0) & top_left)


@partial(jax.jit, static_argnames=("width", "height", "tile_w", "tile_h",
                                   "chunk", "alpha_fn"))
def rasterize_depth(setup_padded: dict, bins: jax.Array, width: int, height: int,
                    tile_w: int = 128, tile_h: int = 32, chunk: int = 64,
                    alpha_fn=None, init_depth: jax.Array | None = None,
                    init_id: jax.Array | None = None,
                    floor_depth: jax.Array | None = None,
                    counts: jax.Array | None = None):
    """Z-buffer pass over binned triangles.

    ``init_depth``/``init_id`` allow chaining buckets (opaque then masked)
    while keeping LESS_OR_EQUAL later-wins semantics across passes.
    ``floor_depth`` [H, W] restricts coverage to fragments strictly behind
    it (z > floor) — the depth-peeling hook for the order-independent
    additive transparent pass.
    ``counts`` (the bin occupancy from bin_triangles) bounds the chunk loop
    dynamically: only ceil(max(counts)/chunk) chunks actually execute —
    essential when bins are sparse (small scenes, empty shadow cascades).
    Returns (depth f32[H, W], tri_id i32[H, W], -1 = empty).
    """
    # XLA reference path: reassemble stacked per-triangle arrays from the
    # planar setup (fine off-TPU; the TPU path is the Pallas kernel)
    edge = jnp.stack(setup_padded["edge"], axis=-1).reshape(-1, 3, 3)
    zlin = jnp.stack(setup_padded["zlin"], axis=-1)
    anchor = jnp.stack(setup_padded["anchor"], axis=-1)
    sentinel = edge.shape[0] - 1

    rows, cols, cap = bins.shape
    assert cap % chunk == 0, "bin capacity must be a multiple of the raster chunk"
    n_tiles = rows * cols
    p = tile_h * tile_w
    bins_f = bins.reshape(n_tiles, cap)

    # absolute pixel-center coordinates per tile
    lx = (jnp.arange(p, dtype=jnp.float32) % tile_w)
    ly = (jnp.arange(p, dtype=jnp.float32) // tile_w)
    tile_x0 = (jnp.arange(n_tiles, dtype=jnp.float32) % cols) * tile_w
    tile_y0 = (jnp.arange(n_tiles, dtype=jnp.float32) // cols) * tile_h
    px = tile_x0[:, None] + lx[None, :] + 0.5          # [NT, P]
    py = tile_y0[:, None] + ly[None, :] + 0.5

    if init_depth is None:
        depth0 = jnp.ones((n_tiles, p), jnp.float32)
        id0 = jnp.full((n_tiles, p), sentinel, jnp.int32)
    else:
        depth0 = _to_tiles(init_depth, rows, cols, tile_h, tile_w).reshape(n_tiles, p)
        id0 = _to_tiles(jnp.where(init_id < 0, sentinel, init_id),
                        rows, cols, tile_h, tile_w).reshape(n_tiles, p)
    floor_t = (None if floor_depth is None else
               _to_tiles(floor_depth, rows, cols, tile_h, tile_w).reshape(n_tiles, p))

    n_chunks = cdiv(cap, chunk)

    def body(carry, ck):
        zbuf, ibuf = carry
        ids = jax.lax.dynamic_slice(bins_f, (0, ck * chunk), (n_tiles, chunk))
        ecoef = edge[ids]                               # [NT, C, 3, 3]
        zcoef = zlin[ids]                               # [NT, C, 3]
        anc = anchor[ids]                               # [NT, C, 2]

        # anchored pixel coords (see setup.py precision note): [NT, P, C]
        pxa = px[:, :, None] - anc[:, None, :, 0]
        pya = py[:, :, None] - anc[:, None, :, 1]

        # e_i(p) for the 3 edges and the depth plane: [NT, P, C]
        def plane(c):
            return (pxa * c[:, None, :, 0]
                    + pya * c[:, None, :, 1] + c[:, None, :, 2])

        e0 = plane(ecoef[:, :, 0])
        e1 = plane(ecoef[:, :, 1])
        e2 = plane(ecoef[:, :, 2])
        z = plane(zcoef)

        cov = (_coverage(e0, ecoef[:, None, :, 0, 0], ecoef[:, None, :, 0, 1])
               & _coverage(e1, ecoef[:, None, :, 1, 0], ecoef[:, None, :, 1, 1])
               & _coverage(e2, ecoef[:, None, :, 2, 0], ecoef[:, None, :, 2, 1])
               & (e0 + e1 + e2 > 0.0)                   # interp 1/w > 0
               & (z >= 0.0))                            # near-plane depth clip
        if floor_t is not None:
            cov = cov & (z > floor_t[:, :, None])       # depth-peel floor

        if alpha_fn is not None:
            # alpha_fn(ids [NT,C], e0/e1/e2 [NT,P,C]) -> keep mask [NT,P,C];
            # raw (unnormalized) edge values let the callback derive both
            # perspective-correct weights and analytic UV derivatives
            cov = cov & alpha_fn(ids, e0, e1, e2)

        zc = jnp.where(cov, z, jnp.inf)
        best = jnp.min(zc, axis=-1)                     # [NT, P]
        # exact-depth ties: LATER bin slot wins (LESS_OR_EQUAL sequential
        # semantics, matching the Pallas kernel and the Vulkan reference) —
        # argmin returns the first min, so search the reversed chunk
        nc = zc.shape[-1]
        bidx = nc - 1 - jnp.argmin(zc[..., ::-1], axis=-1)
        bid = jnp.take_along_axis(ids, bidx, axis=-1)   # [NT, P]
        take = best <= zbuf
        zbuf = jnp.where(take, best, zbuf)
        ibuf = jnp.where(take, bid, ibuf)
        return (zbuf, ibuf), None

    if counts is not None:
        n_needed = jnp.minimum(
            (jnp.max(counts).astype(jnp.int32) + chunk - 1) // chunk, n_chunks)

        def wcond(state):
            return state[0] < n_needed

        def wbody(state):
            ck, carry = state[0], state[1:]
            carry, _ = body(carry, ck)
            return (ck + 1, *carry)

        _, zbuf, ibuf = jax.lax.while_loop(wcond, wbody, (jnp.int32(0),
                                                          depth0, id0))
    else:
        (zbuf, ibuf), _ = jax.lax.scan(body, (depth0, id0),
                                       jnp.arange(n_chunks, dtype=jnp.int32))

    depth = _from_tiles(zbuf.reshape(rows, cols, tile_h, tile_w))
    tri_id = _from_tiles(ibuf.reshape(rows, cols, tile_h, tile_w))
    tri_id = jnp.where(tri_id == sentinel, -1, tri_id)
    return depth[:height, :width], tri_id[:height, :width]


def _from_tiles(x: jax.Array) -> jax.Array:
    """[rows, cols, th, tw] -> [rows*th, cols*tw]."""
    r, c, th, tw = x.shape
    return x.transpose(0, 2, 1, 3).reshape(r * th, c * tw)


def _to_tiles(img: jax.Array, rows: int, cols: int, th: int, tw: int) -> jax.Array:
    """[H, W] -> [rows, cols, th, tw], padding with the edge-agnostic values
    already present (image must be pre-padded to the tile grid)."""
    h, w = img.shape
    ph, pw = rows * th - h, cols * tw - w
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), constant_values=1.0
                      if img.dtype == jnp.float32 else 0)
    return img.reshape(rows, th, cols, tw).transpose(0, 2, 1, 3)
