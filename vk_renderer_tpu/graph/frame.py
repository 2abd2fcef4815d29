"""The per-frame render graph as one jitted pure function.

Replaces VulkanEngine::draw() (src/vk_engine_run.cpp:68-193): every pass —
shadow, background, geometry (opaque + alpha-masked + skybox), transparent,
tonemap — is a stage inside a single XLA program over HBM-resident arrays.
Vulkan's image layout transitions become data dependencies; the swapchain
blit becomes the final crop/readback.

Pass order and semantics match the reference frame:
  shadow maps -> background gradient/clear -> opaque geometry raster+shade
  -> skybox (fills depth==1 pixels) -> additive transparent -> tonemap.

Static configuration (FrameConfig) plays the role of pipeline state; traced
inputs (scene_data + toggles) play the role of the per-frame UBO, so camera
or lighting changes never recompile.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import binning, interp, post, raster, shade, skybox
from ..ops import setup as rsetup
from ..ops import texture as tex
from ..ops.common import cdiv
from ..ops.common import einsum as common_einsum

NUM_CASCADES = 4

# C19 postprocess registry: name -> (f32[3, H, W] -> f32[3, H, W]).
# Register extra passes (e.g. vignette, FXAA) here and list them in
# FrameConfig.post_chain; the reference's only registered pass is tonemap
# (vk_engine_init.cpp:596).
POSTPROCESS_REGISTRY = {
    "tonemap": lambda img: post.tonemap_xla(img),
}


@dataclass(frozen=True)
class FrameConfig:
    """Static pipeline state (the analog of baked VkPipelines)."""
    width: int = 1920
    height: int = 1080
    tile_w: int = 128
    tile_h: int = 32
    # per-tile opaque candidate capacity: the floor's subdivision grid
    # compresses into the horizon tile rows — the bench camera's worst
    # tile holds 10.9k opaque candidates (tools/diag_overflow.py; the
    # round-2 default 2048 dropped 48.5k pairs once the floor/ceiling
    # winding fix made them visible).  Counts-clamp only on the TPU
    # packed path (records stay bounded by rec_opaque)
    cap_opaque: int = 16384
    # masked per-tile candidates: the replica's densest foliage tile
    # holds 3070 at the bench camera (tools/diag_overflow.py
    # masked_maxtile) — the old 512 dropped ~2.2k pairs per frame
    cap_masked: int = 4096
    cap_transparent: int = 256
    raster_chunk: int = 16           # XLA-path chunking (Pallas is fixed 64)
    masked_chunk: int = 8
    transparent_peels: int = 2
    # masked (alpha-cutoff) peel depth: acceptance (alpha >= 0.5) stops
    # most chains, and peels past the second ride the ~free tiny accept
    # tier — but the REJECT chains can run deep: the procedural scene's
    # pending set empties after 6 peels (tools/diag_overflow.py
    # masked_pend*: 379k/33k/3.9k/904/91/0) while the Sponza replica's
    # aligned thorn-bush row decays only ~1.8x per layer at the bench
    # camera (475k/253k/147k/71k/.../2.0k after 10).  masked_peels
    # bounds ROUND 0; deeper chains resolve in tile-gated CONTINUATION
    # rounds over the same records (masked_tail_rounds x
    # masked_tail_peels more accept layers at ~zero raster cost — only
    # tiles still holding pending pixels re-raster)
    masked_peels: int = 10
    masked_tail_rounds: int = 3
    masked_tail_peels: int = 6
    # tail rounds run the peel kernel over a COMPACTED pending-tile grid
    # of this many programs (the full 510-tile grid's per-program
    # overhead made even a fully-gated round cost ~120 ms); beyond the
    # cap a lax.cond falls back to the gated full grid — exact either way
    masked_tail_tile_cap: int = 64
    # cell-tier ladder for the masked accept layers (round 5): the
    # domain compacts at 32-PIXEL-CELL granularity (a pure reshape of
    # the tiled k-buffer layers; cell compaction is ~free at ~65k cells,
    # tools/bench_chain.py, while per-PIXEL compaction pays ~10 ms in
    # compact_mask's 2M-update scatter and per-TILE granularity gathers
    # 4096-px tiles for sparse domains).  Each accept evaluates alpha
    # over the gathered cells at the smallest tier covering the live
    # cell count; the full grid is appended as the top tier, so the
    # ladder is exhaustive (no dense fallback, no cap-miss accounting)
    # per-peel selection keeps ~3 compiled tiers per accept layer:
    # peel 0 sees the bucket's full footprint (biggest tier only),
    # peel 1 the first rejects, later peels the decaying middle, and the
    # tail rounds the small tiers
    # sized from the replica bench camera's measured per-layer domain
    # decay (tools/debug_masked_domains.py: 33k, 21k, 14k, 9k, 6k, 4k,
    # 3k, 2k, 1.4k, 0.9k cells over 10 peels) — the 36864 rung catches
    # peel 0's ~33k so it stops paying the 49k tier's 1.5x slot excess
    masked_cell_tiers: tuple = (1024, 4096, 12288, 24576, 36864, 49152)
    # opt-in baked alpha-coverage-state accept (scene/textures.
    # build_alpha_states): bit-exact vs the trilinear accept
    # (tests/test_alpha_state.py A/B) but measured cost-neutral on the
    # chained-gather cost model — kept as an A/B-able alternative
    alpha_state_accept: bool = False
    # occupancy-packed record caps (TPU path; auto-shrunk to scene size).
    # Record-build cost is proportional to the STATIC cap, and truncation
    # is counted in bin_overflow — sized ~5x above bench-scene occupancy.
    # rec_shadow: the bench scene's cascades need up to ~4.2k chunks EACH
    # (260k tris over the 2048^2 map; measured per-cascade 4116/3732/
    # 3551/1456) — the old 2048 silently truncated roughly half the
    # shadow records until shadow overflow was folded into bin_overflow
    rec_opaque: int = 4096
    rec_masked: int = 2048
    rec_transparent: int = 1024
    rec_shadow: int = 5120
    # big-triangle capacity for EXACT big binning (near-plane-crossing
    # floors, grazing slivers — binning._big_exact_keys); the honest bench
    # scene has ~900 such triangles at the flagship camera
    big_cap: int = 1024
    # bbox-pair span threshold: triangles spanning more tiles than this go
    # to the exact big path.  Lower = fewer sort keys (T*max_span), more
    # big-tested triangles (big_cap*n_tiles elementwise) — a tuning
    # trade, exact either way
    max_span: int = 16
    # shadow-cascade binning knobs (per-cascade sorts dominate the CSM
    # shadow stage: static key count = T*span + big_cap*n_tiles, and the
    # 2048^2 light grid has 1024 tiles).  Same exact semantics as
    # max_span/big_cap; tuned separately because light-space triangle
    # footprints differ from camera-space ones
    shadow_max_span: int = 16
    shadow_big_cap: int = 1024
    # compact-before-sort pair capacity (binning._compact_keys) — OFF by
    # default since round 5: chained-in-jit measurement showed lax.sort
    # of the FULL 5.6M-key emission costs ~9 ms while the compaction's
    # 5.6M-update scatter costs ~27 ms (the round-3/4 "sorts are the
    # dominant cost" model was dispatch-overhead fiction — sorts are
    # ~0.8 ms per 640k keys).  -1 = auto compaction (legacy), 0 = off
    # (full-length sort), >0 = explicit cap.  EXACT on every path
    pair_cap: int = 0
    shadow_pair_cap: int = 0
    shading: str = "pbr"             # "pbr" (mesh_pbr.frag) | "flat" (mesh.frag)
    # compiles the shadow SUBSYSTEM in (pipelines-at-init analog); the
    # per-frame on/off and filter mode are TRACED scene_data channels
    enable_shadows: bool = False     # vk_engine.h:116 default off
    shadow_size: int = 2048          # vk_engine.h:107
    # per-tile caster capacity: the widest cascade concentrates up to
    # ~18.2k of the bench scene's 260k triangles in ONE 128x32 tile
    # (measured at the bench camera) — the old 4096 dropped ~131k
    # cascade-3 pairs per frame, silently until shadow overflow was
    # folded into bin_overflow.  Memory-free on the TPU packed path
    # (counts clamp only; records are bounded by rec_shadow)
    shadow_cap: int = 24576
    # cascades actually RASTERED (the reference bakes this into separate
    # pipelines: modes < 3 render one cascade, vk_engine_run.cpp:336; CSM
    # renders NUM_CASCADES).  Static — pick 1 for Hard/PCF/PCSS configs,
    # 4 for CSM; the filters clamp their layer index to what exists.
    shadow_cascades: int = NUM_CASCADES
    use_skybox: bool = True
    # registered postprocess chain (C19; vk_engine_init.cpp:554-596 keeps a
    # vector of passes ping-ponged over two images — here each entry maps a
    # [3, H, W] image to the next, resolved via POSTPROCESS_REGISTRY)
    post_chain: tuple = ("tonemap",)
    # sparse-shading capacity for the masked/transparent buckets (0 =
    # auto: 1/3 of the frame for the masked foliage — measured 25% at the
    # bench camera — and 1/8 for transparent); overflow is counted in
    # sparse_overflow
    sparse_cap: int = 0
    # OPT-IN shadow-filter compaction capacity (0 = dense/exact).  The
    # filter only matters where covered & n_dot_l > 0, but that set is
    # 80-90% of the frame for interior views, so there is no safe default
    # cap; overflow beyond an explicit cap is counted in sparse_overflow
    shadow_sparse_cap: int = 0
    # penumbra-classified sparse shadow filtering (DEFAULT ON; exact —
    # see shade.classified_shadow_factor): certain-lit/-blocked pixels
    # resolve from 4 coarse fetches, only the provably-uncertain band
    # (penumbrae + frustum edges) runs the full filter.  -1 = auto cap
    # (1/16 of the frame), 0 = off (dense filter), >0 = explicit cap.
    # Beyond the cap a lax.cond runs the dense filter instead — exact on
    # every path; the miss count lands in the fallback_px stat
    shadow_classify_cap: int = -1
    # second classifier stage: the receiver-quad lit proof
    # (shade._classify_shadow docstring).  The reference's cascade maps
    # CONTAIN the lit receivers (front culling keeps light-facing faces —
    # vk_engine_run.cpp:541 omits the y-flip of :488), so the coarse
    # window-min lit test alone leaves ~100% of hard-lit pixels
    # "uncertain" (measured, tools/measure_sparse.py).  Stage 2 reads the
    # receiver's own 2x2 texel quad (one ShadowRows gather) — min/max
    # tables at any granularity dilate by whole cells and fail on sloped
    # floors.  False = coarse-only (A/B benching)
    shadow_fine_classify: bool = True
    # sparse skybox: only compacted uncovered pixels sample the cubemap
    # (-1 = auto cap, 0 = dense, >0 explicit).  Dense lax.cond fallback
    # beyond the cap — exact on every path (fallback_px counts misses)
    sky_sparse_cap: int = -1
    # gated fidelity knob: metallic-roughness texture sampled at the
    # nearest mip (single bilinear) instead of trilinear — half its texel
    # gathers.  Default OFF = exact; tests gate the ON path vs goldens
    # at >= 40 dB (VERDICT r2 task 3)
    mr_nearest_mip: bool = False
    # fused material+texture-meta row: ONE [M, 16] i32 row-gather carries
    # the material scalars AND both textures' meta/base descriptors
    # (shade.shade_pbr fused_mat_meta) — replaces 3 per-pixel gathers
    # with 1 IF a 16-wide row is as cheap as an 8-wide one (measured
    # question: tools/bench_rowgather.py / tools/sweep_variants.py).
    # Bit-identical output; ignored on the packed_rows path
    fused_mat_meta: bool = False
    # k-buffer raster (EXACT): the masked/transparent buckets' peels+1
    # rasterizations (peel 0, peel 1, overflow probe) collapse into ONE
    # pass over the records that keeps the peels+1 nearest strictly-
    # increasing-depth fragments per pixel (raster.rasterize_plan_k) —
    # proven equal to iterated strict peeling incl. LEQUAL later-wins
    # ties (tests/test_raster_pallas.py, tests/test_frame.py A/B).
    # False = the iterated per-peel rasters (A/B benching)
    k_raster: bool = True
    # pin the per-frame gather row tables (packed interpolation rows,
    # alpha rows, shadow rows, classifier cells) to ONE materialization
    # with lax.optimization_barrier before any lax.cond consumes them.
    # docs/PERF.md hazard #1: XLA re-materializes an in-program gather
    # operand's reshape/concat chain INSIDE every cond branch that
    # gathers from it (measured as a fixed ~5-50 ms per branch depending
    # on table size) — the tier ladders compile ~30 such branches per
    # frame.  The barrier makes the branches consume one shared buffer.
    # Bit-identical output (a pure identity); False = A/B benching
    pin_tables: bool = True
    # DEFAULT path (VERDICT r3 #2b; colorless scenes — glTF COLOR_0
    # defaults to 1 for Sponza-class assets): pack every per-pixel
    # interpolation input (edge planes, anchor, 3 corner attribute rows,
    # material scalars + both textures' meta) into one [T+1, 48]
    # per-triangle row (interp.build_packed_rows) — one wide row-gather
    # per pixel instead of ~6 narrow ones.  Bit-identical to the
    # narrow-row path (tests/test_frame.py A/B; measured −240 ms at
    # 1080p); scenes WITH vertex colors fall back to narrow rows
    # automatically (build_ptbl returns None)
    packed_rows: bool = True


# Per-frame host state (GPUSceneData + toggles) rides to the device as ONE
# packed f32 vector instead of 13 separate small arrays — one host->device
# transfer and one executable parameter per frame (transfers through the
# tunneled-TPU transport have per-call overhead).  Order must match
# driver.pack_frame_vec.
FRAME_VEC_SPEC = (
    ("view", (4, 4)), ("proj", (4, 4)), ("viewproj", (4, 4)),
    ("cam_pos", (3,)), ("light_viewproj", (NUM_CASCADES, 4, 4)),
    ("cascade_distances", (4,)), ("ambient_color", (4,)),
    ("sunlight_direction", (4,)), ("sunlight_color", (4,)),
    ("enable_background", ()), ("enable_postprocess", ()),
    ("bg_top", (4,)), ("bg_bottom", (4,)),
)
FRAME_VEC_LEN = sum(math.prod(s) if s else 1 for _, s in FRAME_VEC_SPEC)
_SETTINGS_KEYS = ("enable_background", "enable_postprocess", "bg_top",
                  "bg_bottom")


def unpack_frame_vec(vec: jax.Array) -> tuple[dict, dict]:
    """Packed f32[FRAME_VEC_LEN] -> (scene_data dict, settings dict)."""
    sd, st = {}, {}
    i = 0
    for name, shape in FRAME_VEC_SPEC:
        n = 1
        for d in shape:
            n *= d
        val = vec[i:i + n].reshape(shape) if shape else vec[i]
        (st if name in _SETTINGS_KEYS else sd)[name] = val
        i += n
    return sd, st


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_packed(scene, frame_vec: jax.Array, cfg: FrameConfig):
    """render_frame with all per-frame host state in one packed vector
    (one host->device transfer per frame; see FRAME_VEC_SPEC)."""
    sd, st = unpack_frame_vec(frame_vec)
    return render_frame(scene, sd, st, cfg)


def _resolve_classify_cap(cfg: FrameConfig) -> int:
    """Uncertain-band capacity for classified shadow filtering: -1 = auto
    (1/2 of the frame — soft-penumbra scenes like the Sponza replica
    honestly measure ~36% uncertain at the bench camera, and any smaller
    cap made them dense-fallback into a full-frame PCSS), 0 = off.  The
    filter itself TIERS below this cap (cap/8, cap/2, cap — shade.
    classified_shadow_factor, i.e. w*h/16, w*h/4, w*h/2), so hard-shadow
    scenes with a ~1% band still pay only the smallest tier; beyond the
    cap a lax.cond falls back to the dense filter — exact for every
    camera."""
    if cfg.shadow_classify_cap >= 0:
        return cfg.shadow_classify_cap
    return max(8192, (cfg.width * cfg.height) // 2)


def _resolve_sky_cap(cfg: FrameConfig) -> int | None:
    """Sky-pixel capacity for sparse cubemap sampling: -1 = auto (1/3 of
    the frame — the bench camera sees 27% sky through the roof opening,
    tools/measure_sparse.py), 0 = dense.  Beyond the cap a lax.cond falls
    back to the dense sampler — exact for every camera."""
    if cfg.sky_sparse_cap == 0:
        return None
    if cfg.sky_sparse_cap > 0:
        return cfg.sky_sparse_cap
    return max(8192, (cfg.width * cfg.height) // 3)


def _resolve_pair_cap(cfg_cap: int, n_tris: int, max_span: int,
                      big_cap: int, n_tiles: int) -> int:
    """Compact-before-sort capacity: -1 = auto (2 pairs per triangle —
    measured real pairs at the 1080p bench camera are 0.75/tri for the
    camera view and ~0.9/tri per shadow cascade, so >2x headroom — plus
    a big-pair/small-scene slack floor), 0 = off, >0 explicit.  A miss
    lax.cond-falls back to the full-length sort (exact, just slower) and
    is counted in fallback_px, so a tight cap risks speed only.  Clamped
    to the full emission length (beyond which compaction is a pure
    pessimization)."""
    full = n_tris * max_span + big_cap * n_tiles
    if cfg_cap == 0:
        return 0
    cap = cfg_cap if cfg_cap > 0 else max(1 << 17, n_tris * 2 + 65536)
    return min(cap, full)


def _build_classifier_tables(shadow_packed, cfg: FrameConfig):
    """Classifier tables for penumbra-classified sparse shadow filtering
    (shade.classified_shadow_factor): the coarse level bounds the blocker
    search; the 4x-finer level bounds the TAP footprint near shadow
    boundaries (both sides of the lit/blocked question).  The
    receiver-quad stage needs no table (it reads the full-res ShadowRows
    the filters already carry).  Both tables are cheap block reductions
    over the pair-packed maps; ``cfg.shadow_fine_classify`` gates the
    quad + fine stages together (A/B benching)."""
    if cfg.shadow_classify_cap == 0:
        return None
    coarse = tex.make_coarse_rows(tex.build_shadow_coarse(shadow_packed))
    if not cfg.shadow_fine_classify:
        return coarse
    size = shadow_packed.shape[-1]
    fine = tex.make_coarse_rows(tex.build_shadow_coarse(
        shadow_packed, block=tex.fine_block_for(size)))
    return (coarse, fine)


def _frustum_planes(viewproj: jax.Array) -> jax.Array:
    """extract_frustum_planes (vk_engine_run.cpp:420-433), in-jit."""
    m = viewproj
    planes = jnp.stack([m[3] + m[0], m[3] - m[0], m[3] + m[1],
                        m[3] - m[1], m[2], m[3] - m[2]])
    return planes / jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)


def _winner_alpha(scene, tid, rows, vattr, px=None, py=None, ptbl=None,
                  ptbl_a=None):
    """Trilinear albedo-alpha of the per-pixel winning triangle (the
    mesh_pbr.frag:192-193 discard operand).  Shape-agnostic: dense [H, W]
    or a sparse compact list with explicit ``px``/``py``.  With ``ptbl``
    (packed rows), everything but the texels rides ONE row-gather; with
    ``ptbl_a`` (the 24-wide alpha-row table, interp.build_alpha_rows)
    that row-gather is half the transactions — the masked peel loop runs
    ~2-3M of these per frame."""
    if ptbl_a is not None:
        has_aq = (getattr(scene.textures, "alpha_quads", None) is not None
                  and getattr(scene.textures, "alpha_state_base", None)
                  is not None)
        weights, corners, meta_cols = interp.alpha_weights_and_uv(
            ptbl_a, tid, px, py, n_meta=4 if has_aq else 2)
        (u, dudx, dudy), (v, dvdx, dvdy) = interp.derivs_from_corners(
            corners, (0, 1), weights)
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        meta_a = tex.unpack_meta(f2i(meta_cols[0]), f2i(meta_cols[1]))
        if has_aq:
            # dedicated alpha-quad table: one flat take per bilinear
            # fetch, no RGBA-heap row-gather operand in the peel branch
            aqb = (f2i(meta_cols[3]) & (tex.F32_GUARD_BIT - 1)) - 1
            alpha = tex.sample_alpha_trilinear(
                scene.textures.alpha_quads, u, v, dudx, dvdx, dudy, dvdy,
                meta_a, aqb)
            return alpha
        (alpha,) = tex.sample_trilinear(scene.textures, None, u, v,
                                        dudx, dvdx, dudy, dvdy,
                                        channels=(3,), meta=meta_a)
        return alpha
    if ptbl is not None:
        weights, corners, matvals = interp.packed_weights_and_corners(
            ptbl, tid, px, py)
        (u, dudx, dudy), (v, dvdx, dvdy) = interp.derivs_from_corners(
            corners, (3, 4), weights)          # colorless layout: u v at 3,4
        aid = matvals[0].astype(jnp.int32)
        # albedo meta rode the packed row — no per-pixel meta gather
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        meta_a = tex.unpack_meta(f2i(matvals[7]), f2i(matvals[8]))
        (alpha,) = tex.sample_trilinear(scene.textures, aid, u, v,
                                        dudx, dvdx, dudy, dvdy,
                                        channels=(3,), meta=meta_a)
        return alpha
    weights = interp.interpolation_weights_rows(tid, rows[0], rows[1],
                                                px, py)
    uvc = (3, 4) if scene.colors is None else (6, 7)   # vattr layout
    (u, dudx, dudy), (v, dvdx, dvdy) = interp.interp_rows_with_derivs(
        vattr, uvc, weights)
    aid = jnp.take(scene.mat_tex_ids[:, 0], weights["mat_id"])
    (alpha,) = tex.sample_trilinear(scene.textures, aid, u, v,
                                    dudx, dvdx, dudy, dvdy, channels=(3,))
    return alpha


def _masked_accept_state(scene, t2_s, px, py, ptbl_a, unc_cap):
    """Alpha-cutoff accept mask for a compact candidate list via the baked
    3-state alpha-coverage pyramid (scene/textures.build_alpha_states —
    VERDICT r4 task 2): ONE packed-bit gather classifies each candidate
    as certain-accept / certain-reject / uncertain; only the uncertain
    band (alpha-edge texel cells) pays the trilinear, compacted to
    ``unc_cap``.  Beyond the cap a lax.cond runs the trilinear for the
    whole list instead — exact on every path (the miss count is returned
    as a fallback_px signal, not a deviation).  Bit-exact vs the
    trilinear path: the baked states are conservative bounds over the
    exact footprint (certainty argument in build_alpha_states)."""
    weights, corners, meta_cols = interp.alpha_weights_and_uv(
        ptbl_a, t2_s, px, py, n_meta=4)
    (u, dudx, dudy), (v, dvdx, dvdy) = interp.derivs_from_corners(
        corners, (0, 1), weights)
    f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    meta_a = tex.unpack_meta(f2i(meta_cols[0]), f2i(meta_cols[1]))
    # decode the guard-bit sbase encoding (see build_alpha_ptbl)
    sbase = (f2i(meta_cols[2]) & (tex.F32_GUARD_BIT - 1)) - 1
    aq_base = (f2i(meta_cols[3]) & (tex.F32_GUARD_BIT - 1)) - 1
    st = tex.alpha_state_lookup(scene.textures.alpha_states, u, v,
                                dudx, dvdx, dudy, dvdy, meta_a, sbase)
    dom = t2_s >= 0
    unc = dom & (st == 0)
    n_unc = jnp.sum(unc.astype(jnp.int32))
    n = t2_s.shape[0]

    def tri_sparse(_):
        from ..ops.common import compact_mask
        csel, _ = compact_mask(unc, unc_cap)
        cs = jnp.maximum(csel, 0)
        t2u = jnp.where(csel >= 0, jnp.take(t2_s, cs), -1)
        pxu = jnp.take(px, cs)
        pyu = jnp.take(py, cs)
        alpha_u = _winner_alpha(scene, t2u, None, None, pxu, pyu,
                                ptbl_a=ptbl_a)
        tgt = jnp.where(csel >= 0, csel, n)
        return jnp.zeros((n,), bool).at[tgt].set(alpha_u >= 0.5,
                                                 mode="drop")

    def tri_full(_):
        # cap miss: the whole list pays the alpha sample (exact;
        # u/v/derivs and meta are already in hand)
        alpha = tex.sample_alpha_trilinear(
            scene.textures.alpha_quads, u, v, dudx, dvdx, dudy, dvdy,
            meta_a, aq_base)
        return alpha >= 0.5

    tri_acc = jax.lax.cond(n_unc <= unc_cap, tri_sparse, tri_full, 0)
    accept = dom & ((st == tex.ALPHA_STATE_ACCEPT) | (unc & tri_acc))
    return accept, jnp.maximum(n_unc - unc_cap, 0)


def _masked_pass(scene, cfg, plan_m, padded, rows, vattr,
                 depth, tid, ptbl=None, ptbl_a=None):
    """Alpha-cutoff bucket resolved by depth peeling: rasterize the
    nearest not-yet-rejected masked fragment, evaluate its trilinear albedo
    alpha densely (planar), accept (alpha >= 0.5, mesh_pbr.frag:193) or
    peel past it.  Exact forward-pipeline semantics up to
    ``cfg.masked_peels`` discarded layers per pixel; pixels still carrying
    an unresolved rejected layer after the last peel are counted by a final
    depth-only probe raster and surfaced as ``peel_overflow``.

    The peel loop is UNROLLED straight-line code, not ``lax.scan`` — inside
    a scan body XLA:TPU serializes the per-peel gathers against the loop
    state and the same work costs ~10x more (round-1 profiling: 55 ms of
    ingredients became 400+ ms per peel).  The alpha evaluation runs
    SPARSELY on the compacted found pixels; a foliage-filling view that
    exceeds the cap falls back to the DENSE trilinear alpha for that peel
    via ``lax.cond`` — exact on every path (the beyond-cap count goes to
    ``fallback_px``, a sizing signal, not a deviation)."""
    w, h = cfg.width, cfg.height
    n_tris = scene.tris[0].shape[0]
    no_id = jnp.full((h, w), -1, jnp.int32)
    # the foliage quads are the widest sparse bucket (measured 25% of the
    # frame at the bench camera) — but only on the FIRST peel; later peels
    # only see pixels the previous peel rejected (a few % of the frame),
    # so the compact list is TIERED by the live count (compact-list gather
    # cost is CAP-proportional — pad slots gather like real pixels)
    cap = cfg.sparse_cap or max(8192, (w * h) // 3)
    # the first peel is the foliage bucket's full footprint (the bench
    # camera measures 64% of the frame, tools/diag_overflow.py) — a
    # 2/3-frame compact tier still beats the dense eval by the uncovered
    # fraction, since compact-list cost is CAP-proportional
    cap_huge = max(cap, (w * h * 2) // 3)
    cap_small = min(cap, max(8192, (w * h) // 24))
    # tiny tier for the deep-peel tail: pending sets shrink ~10x per peel
    # (acceptance stops most chains), so peels 2+ see a few thousand
    # pixels — an 8k list is ~10x cheaper than cap_small's
    cap_tiny = min(cap_small, 8192)

    # the baked 3-state path needs the alpha rows to carry the state-base
    # column AND the scene to carry the packed state words (both exist
    # together for scenes that classify masked triangles).  Opt-in
    # (cfg.alpha_state_accept): with the measured gather costs
    # (tools/bench_chain.py) the state eval (24-row + state word,
    # ~18 ns/slot) is only marginally cheaper than the trilinear
    # (24-row + 2 quad-rows, ~20 ns/slot) and its uncertain-band
    # sub-compaction pays the 2M-scatter tax — proven exact
    # (tests/test_alpha_state.py) but not a default win
    use_state = (cfg.alpha_state_accept and ptbl_a is not None
                 and getattr(scene.textures, "alpha_states", None) is not None
                 and getattr(scene.textures, "alpha_state_base", None)
                 is not None)

    def accept_sparse(t2, cap):
        sel, _ = _compact_covered(t2, cap)
        selc, t2_s, px, py = _sparse_pixels(sel, t2, w)
        if use_state:
            unc_cap = min(cap, max(8192, cap // 4))
            acc_s, over = _masked_accept_state(scene, t2_s, px, py, ptbl_a,
                                               unc_cap)
        else:
            alpha_s = _winner_alpha(scene, t2_s, rows, vattr, px, py, ptbl,
                                    ptbl_a=ptbl_a)
            acc_s = alpha_s >= 0.5
            over = jnp.int32(0)
        tgt = jnp.where(sel >= 0, sel, w * h)
        return (jnp.zeros((w * h,), bool).at[tgt].set(acc_s, mode="drop"),
                over)

    def accept_dense(t2):
        alpha_d = _winner_alpha(scene, t2, rows, vattr, ptbl=ptbl,
                                ptbl_a=ptbl_a)
        return (alpha_d >= 0.5).reshape(-1), jnp.int32(0)

    # mid tier between cap_small and cap: deep-peel pending sets on
    # foliage-row cameras (the replica bench view looks down 9 aligned
    # thorn bushes) measure 253k/147k at peels 2-3 — past cap_small
    # (w*h/24 = 86k at 1080p) but nowhere near dense; without this tier
    # those peels fell to the DENSE alpha eval (~240 ms each, the top of
    # the masked stage's measured 807 ms)
    cap_mid = min(cap, max(cap_small, (w * h) // 8))

    def tiered_accept(t2, n_found, peel_k: int):
        # PER-PEEL cap ladder: every lax.cond branch compiles its own
        # copy of the gather-heavy alpha eval, so each peel gets only the
        # tiers its measured coverage class can hit (first peel: the
        # bucket's full footprint; second: the first rejects, ~1/5 of it;
        # later: the decaying reject tail) — fewer compiled branches AND
        # a tighter cap than one shared ladder.  The dense eval remains
        # the exact fallback on every peel; a miss is counted by the
        # caller.  The state path compiles an extra inner cond per tier
        # (uncertain-band trilinear), so its ladders are kept shorter.
        if peel_k == 0:
            ladder = [cap, cap_huge] if not use_state else [cap_huge]
        elif peel_k == 1:
            ladder = ([cap_tiny, cap_small, cap_mid, cap] if not use_state
                      else [cap_small, cap])
        else:
            ladder = ([cap_tiny, cap_small, cap_mid] if not use_state
                      else [cap_tiny, cap_mid])
        ladder = sorted(set(ladder))

        def build(i):
            if i == len(ladder):
                return accept_dense
            return lambda t: jax.lax.cond(n_found <= ladder[i],
                                          lambda u: accept_sparse(u, ladder[i]),
                                          build(i + 1), t)

        # zero tier first: cameras not facing foliage skip the cap-sized
        # alpha evaluation entirely (no found pixel can be accepted)
        return jax.lax.cond(n_found == 0,
                            lambda t: (jnp.zeros((w * h,), bool),
                                       jnp.int32(0)),
                            build(0), t2)

    def ladder_max(peel_k: int) -> int:
        return cap_huge if peel_k == 0 else (cap if peel_k == 1 else cap_mid)

    fallback = jnp.int32(0)
    total_peels = cfg.masked_peels + max(0, cfg.masked_tail_rounds) * \
        cfg.masked_tail_peels
    if cfg.k_raster:
        # TILE-SPACE masked resolution (round 5).  Chained-in-jit TPU
        # measurements (tools/bench_chain.py) showed the old per-layer
        # PIXEL compaction paid ~10 ms per layer in compact_mask's
        # 2M-update scatter (~280 ms/frame across the 28 accept layers)
        # while TILE-granular compact+gather+scatter of the same data
        # measures at noise level.  The whole pass therefore lives in
        # tile space: the k-buffer layers are BORN tiled in the Pallas
        # kernel (rasterize_plan_k_tiled skips every [H, W] roundtrip),
        # the accept domain compacts at TILE granularity (cumsum over
        # ~510 tiles, ~free), and each tier's alpha evaluation runs over
        # the gathered [tcap, th, tw] tiles.  The tier ladder's TOP tier
        # is the full grid, so the accept needs no dense fallback and no
        # cap-miss accounting — exact by construction on every path.
        #
        # CONTINUATION ROUNDS: round 0 keeps cfg.masked_peels strict peel
        # layers from ONE record pass; pixels whose reject chains run
        # deeper re-enter the SAME record stream in tile-gated tail
        # rounds with floor = the deepest already-peeled layer, so
        # 20+-layer grazing stacks (the replica's aligned thorn-bush row)
        # resolve without one tall insertion stack.  The final round's
        # extra layer is the honest-cap probe (VERDICT r1 #6).
        from ..ops.common import compact_mask
        from ..ops.raster_pallas import _from_tiles, _to_tiles
        rows_t = cdiv(h, cfg.tile_h)
        cols_t = cdiv(w, cfg.tile_w)
        th, tw = cfg.tile_h, cfg.tile_w
        n_tile = rows_t * cols_t
        rounds = 1 + max(0, cfg.masked_tail_rounds)
        peel_plan = [cfg.masked_peels] + \
            [cfg.masked_tail_peels] * (rounds - 1)

        depth_t = _to_tiles(depth, rows_t, cols_t, th, tw, 2.0)
        tid_t = _to_tiles(tid, rows_t, cols_t, th, tw, -1)
        bound_t0 = depth_t
        # frame-extent mask: tile padding rows/cols must never enter the
        # accept domain or the overflow probe (trace-time constant)
        valid_t = _to_tiles(jnp.ones((h, w), bool), rows_t, cols_t, th, tw,
                            False)
        # 32-pixel cells: [n_tile, th, tw] reshapes row-major to
        # [n_cells, CELL] with cell c covering tile c // (th*tw/CELL),
        # tile row (c % (th*tw/CELL)) // (tw/CELL), x-run c % (tw/CELL)
        CELL = 32 if tw % 32 == 0 else tw
        cpr = tw // CELL                      # cells per tile row
        cpt = th * cpr                        # cells per tile
        n_cells = n_tile * cpt
        base_tiers = tuple(t for t in sorted(set(cfg.masked_cell_tiers))
                           if t < n_cells)

        def ladder_for(peel_k: int) -> tuple:
            if not base_tiers:
                return (n_cells,)
            if peel_k == 0:
                lad = base_tiers[-2:]
            elif peel_k == 1:
                lad = base_tiers[-3:]
            elif peel_k < cfg.masked_peels:
                lad = base_tiers[1:-1] or base_tiers
            else:
                lad = base_tiers[:2]
            return tuple(lad) + (n_cells,)

        def eval_cells(lt_t, dom, ccap):
            dom_c = dom.reshape(n_cells, CELL)
            csel, _ = compact_mask(dom_c.any(axis=1), ccap)
            selc = jnp.maximum(csel, 0)
            okm = (csel >= 0)[:, None]
            dom_s = dom_c[selc] & okm
            t2_f = jnp.where(dom_s, lt_t.reshape(n_cells, CELL)[selc],
                             -1).reshape(-1)
            g = selc // cpt
            rem = selc - g * cpt
            cy = rem // cpr
            cq = rem - cy * cpr
            px0 = ((g % cols_t) * tw + cq * CELL).astype(jnp.float32)
            py0 = ((g // cols_t) * th + cy).astype(jnp.float32)
            px_f = (px0[:, None] + 0.5 + jax.lax.broadcasted_iota(
                jnp.float32, (1, CELL), 1)).reshape(-1)
            py_f = jnp.broadcast_to(py0[:, None] + 0.5,
                                    (ccap, CELL)).reshape(-1)
            if use_state:
                unc_cap = max(8192, (ccap * CELL) // 4)
                acc_f, over = _masked_accept_state(scene, t2_f, px_f,
                                                   py_f, ptbl_a, unc_cap)
            else:
                alpha = _winner_alpha(scene, t2_f, rows, vattr, px_f,
                                      py_f, ptbl, ptbl_a=ptbl_a)
                acc_f = alpha >= 0.5
                over = jnp.int32(0)
            acc_s = acc_f.reshape(ccap, CELL) & dom_s
            tgt = jnp.where(csel >= 0, csel, n_cells)
            acc_full = jnp.zeros((n_cells, CELL), bool).at[tgt].set(
                acc_s, mode="drop")
            return acc_full.reshape(n_tile, th, tw), over

        def accept_tiles(lt_t, dom, peel_k):
            tiers = ladder_for(peel_k)
            n_c = jnp.sum(dom.reshape(n_cells, CELL).any(axis=1)
                          .astype(jnp.int32))

            def build(i):
                if tiers[i] >= n_cells:
                    return lambda _x: eval_cells(lt_t, dom, n_cells)
                return lambda x: jax.lax.cond(
                    n_c <= tiers[i],
                    lambda _u: eval_cells(lt_t, dom, tiers[i]),
                    build(i + 1), x)

            return jax.lax.cond(
                n_c == 0,
                lambda _x: (jnp.zeros((n_tile, th, tw), bool),
                            jnp.int32(0)),
                build(0), 0)

        def accept_layers(layers, peels_r, base_peel, carry, probe):
            depth_t, tid_t, pending, deepest, fallback = carry
            for k in range(peels_r):
                ld, lt = layers[k]
                dom = pending & (lt >= 0)
                acc, over = accept_tiles(lt, dom, base_peel + k)
                fallback = fallback + over
                depth_t = jnp.where(acc, ld, depth_t)
                tid_t = jnp.where(acc, lt, tid_t)
                pending = dom & ~acc
                deepest = jnp.where(dom, ld, deepest)
            if probe:
                p = jnp.sum((pending & (layers[-1][1] >= 0))
                            .astype(jnp.int32))
            else:
                p = jnp.int32(0)
            return (depth_t, tid_t, pending, deepest, fallback), p

        # round 0: always runs, over the full record stream
        last0 = rounds == 1
        layers = raster.rasterize_plan_k_tiled(
            plan_m, padded, w, h, n_tris, peel_plan[0] + (1 if last0 else 0),
            bound_t0, tile_w=tw, tile_h=th, chunk=cfg.masked_chunk)
        carry = (depth_t, tid_t, valid_t,
                 jnp.zeros((n_tile, th, tw), jnp.float32), fallback)
        carry, peel_ovf = accept_layers(layers, peel_plan[0], 0, carry,
                                        probe=last0)

        # tail rounds: SKIPPED by lax.cond when nothing is pending (the
        # common case once chains resolve) — a run round re-enters the
        # record stream over the compacted pending tiles
        base = peel_plan[0]
        for r in range(1, rounds):
            peels_r = peel_plan[r]
            last = r == rounds - 1

            def run_round(carry, peels_r=peels_r, last=last, base=base):
                depth_t, tid_t, pending, deepest, fallback = carry
                pend_tiles = pending.any(axis=(1, 2))
                floor_t = jnp.where(pending, deepest, 2.0)
                k_r = peels_r + (1 if last else 0)

                def full_grid(args):
                    floor_t, _ = args
                    plan_r = dict(plan_m)
                    plan_r["counts"] = jnp.where(
                        pend_tiles.reshape(plan_m["counts"].shape),
                        plan_m["counts"], 0)
                    return raster.rasterize_plan_k_tiled(
                        plan_r, padded, w, h, n_tris, k_r, bound_t0,
                        tile_w=tw, tile_h=th, chunk=cfg.masked_chunk,
                        floor_t=floor_t)

                if "records" in plan_m:
                    n_pt = jnp.sum(pend_tiles.astype(jnp.int32))
                    tsel, _ = compact_mask(pend_tiles,
                                           cfg.masked_tail_tile_cap)

                    def subset(args):
                        floor_t, tsel = args
                        return raster.rasterize_layers_subset_tiled(
                            plan_m, n_tris, k_r, bound_t0, floor_t, tsel,
                            tile_w=tw, tile_h=th)

                    layers = jax.lax.cond(
                        n_pt <= cfg.masked_tail_tile_cap, subset,
                        full_grid, (floor_t, tsel))
                else:
                    layers = full_grid((floor_t, None))
                return accept_layers(layers, peels_r, base, carry,
                                     probe=last)

            n_pend = jnp.sum(carry[2].astype(jnp.int32))
            carry, p_r = jax.lax.cond(
                n_pend > 0, run_round,
                lambda c: (c, jnp.int32(0)), carry)
            peel_ovf = peel_ovf + p_r
            base += peels_r
        depth_t, tid_t, _pending, _deepest, fallback = carry
        depth = _from_tiles(depth_t.reshape(rows_t, cols_t, th, tw)
                            )[:h, :w]
        tid = _from_tiles(tid_t.reshape(rows_t, cols_t, th, tw))[:h, :w]
        return depth, tid, peel_ovf, fallback

    floor = None
    for k in range(total_peels):
        d2, t2 = raster.rasterize_plan(
            plan_m, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.masked_chunk, init_depth=depth,
            init_id=no_id, floor_depth=floor)
        found = t2 >= 0
        n_found = jnp.sum(found.astype(jnp.int32))
        accept_flat, over = tiered_accept(t2, n_found, k)
        fallback = fallback + over + jnp.maximum(n_found - ladder_max(k), 0)
        accept = found & accept_flat.reshape(h, w)
        depth = jnp.where(accept, d2, depth)
        tid = jnp.where(accept, t2, tid)
        floor = jnp.where(found & ~accept, d2, 2.0)   # keep peeling rejects
    # honest-cap probe (VERDICT r1 #6): any masked candidate still behind
    # the last rejected layer means this pixel may be wrong
    _, t3 = raster.rasterize_plan(
        plan_m, padded, w, h, n_tris, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        chunk=cfg.masked_chunk, init_depth=depth, init_id=no_id,
        floor_depth=floor)
    peel_ovf = jnp.sum((t3 >= 0).astype(jnp.int32))
    return depth, tid, peel_ovf, fallback


def render_shadow_maps(scene, world_pos, tri_visible, light_viewproj,
                       cfg: FrameConfig, out_h: int | None = None):
    """Depth-only passes into the 2048^2 x NUM_CASCADES array
    (vk_engine_run.cpp:334-382): all camera-visible objects (reference quirk
    4 — the *culled* list feeds the shadow pass), front-face culling
    (vk_engine_init.cpp:441), no alpha test (no fragment shader).

    ``light_viewproj``: f32[NUM_CASCADES, 4, 4] (callers may pass
    row-slice-remapped matrices to raster a horizontal strip of height
    ``out_h`` — the multi-chip sharding path)."""
    s = cfg.shadow_size
    out_h = s if out_h is None else out_h
    # cfg.shadow_cascades maps are rastered (static, like the reference's
    # per-mode pipelines: one cascade for Hard/PCF/PCSS, 4 for CSM).  For
    # modes < 3 the host puts the single-light matrix at layer 0
    # (scenedata.py:128-130) which is the only layer those filters read;
    # the filters clamp their layer index to the rastered count.
    n_active = min(cfg.shadow_cascades, light_viewproj.shape[0])
    n_tris = scene.tris[0].shape[0]

    # gather the triangle corners' WORLD positions once; each cascade only
    # re-runs the (free) elementwise light-matrix transform on them
    # instead of 12 takes over 260k triangles per cascade
    cw = rsetup.gather_corner_positions(world_pos, scene.tris)

    sh_pair_cap = _resolve_pair_cap(
        cfg.shadow_pair_cap, n_tris, cfg.shadow_max_span,
        cfg.shadow_big_cap, cdiv(s, cfg.tile_w) * cdiv(out_h, cfg.tile_h))

    def one_cascade(lvp):
        corn = tuple([lvp[r, 0] * cw[0][k] + lvp[r, 1] * cw[1][k]
                      + lvp[r, 2] * cw[2][k] + lvp[r, 3] for k in range(3)]
                     for r in range(4))
        st = rsetup.triangle_setup(None, None, tri_visible, s, out_h,
                                   cull=rsetup.CULL_FRONT, corners=corn)
        (plan,) = raster.plan_view_buckets(
            st, ((0, n_tris),), s, out_h, cfg.tile_w, cfg.tile_h,
            (cfg.shadow_cap,), (cfg.rec_shadow,), big_cap=cfg.shadow_big_cap,
            max_span=cfg.shadow_max_span, pair_cap=sh_pair_cap)
        padded = raster.pad_setup(st)
        plan = raster.prepare_records(plan, padded, st["bbox"], s,
                                      cfg.tile_w, cfg.tile_h)
        d, _ = raster.rasterize_plan(plan, padded, s, out_h, n_tris,
                                     tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                                     chunk=cfg.raster_chunk)
        return d, plan["overflow"], plan.get("pair_fallback", jnp.int32(0))

    # UNROLLED over cascades (a lax.scan body serializes the setup/bin
    # gathers against the carry — the round-1 shadow pass cost ~2x its
    # standalone ingredients; straight-line cascades also let XLA overlap)
    results = [one_cascade(light_viewproj[i]) for i in range(n_active)]
    maps = jnp.stack([d for d, _, _ in results])
    overflow = sum(o for _, o, _ in results)
    fallback = sum(f for _, _, f in results)
    # pair-packed 16-bit form: halves the shadow filters' gather count
    # (tex.pack_shadow_maps)
    return tex.pack_shadow_maps(maps), overflow, fallback


@partial(jax.jit, static_argnames=("cfg",))
def render_frame(scene, scene_data: dict, settings: dict, cfg: FrameConfig):
    """One frame, single chip.  scene: SceneArrays (device pytree);
    scene_data: the GPUSceneData pytree; settings: traced toggles
    {enable_background f32, bg_top f32[4], bg_bottom f32[4],
     enable_postprocess f32}.

    Returns dict: color f32[3, H, W], depth f32[H, W], stats.

    ``cfg.enable_shadows`` statically compiles the shadow SUBSYSTEM in
    (the analog of creating the shadow pipelines at init); whether shading
    applies shadows and with which filter are traced per-frame toggles
    riding the reference's own UBO flag channels (sunlightColor.w /
    sunlightDirection.w), so the viewer's h / 1-4 keys never recompile.
    """
    if cfg.enable_shadows:
        planes = _frustum_planes(scene_data["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds, planes)
        tri_visible = jnp.take(visible, jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, _ = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world,
            scene_data["viewproj"])
        shadow_packed, shadow_ovf, shadow_fb = render_shadow_maps(
            scene, world_pos, tri_visible, scene_data["light_viewproj"], cfg)
        shadow_coarse = _build_classifier_tables(shadow_packed, cfg)
        # row-grouped form: every filter tap is ONE row-8 gather
        shadow_maps = tex.make_shadow_rows(shadow_packed)
        if cfg.pin_tables:
            # one materialization for every classified-filter cond branch
            # (cfg.pin_tables docstring)
            shadow_maps, shadow_coarse = jax.lax.optimization_barrier(
                (shadow_maps, shadow_coarse))
    else:
        shadow_maps = tex.pack_shadow_maps(
            jnp.ones((NUM_CASCADES, 1, 1), jnp.float32))
        shadow_coarse = None
        shadow_ovf = jnp.int32(0)
        shadow_fb = jnp.int32(0)
    return render_view(scene, scene_data, settings, cfg, shadow_maps,
                       shadow_coarse=shadow_coarse,
                       extra_bin_overflow=shadow_ovf,
                       extra_fallback=shadow_fb)


def render_view(scene, scene_data: dict, settings: dict, cfg: FrameConfig,
                shadow_maps, y_offset=0.0, full_height: int | None = None,
                shadow_coarse=None, extra_bin_overflow=None,
                extra_fallback=None):
    """Camera-view render (everything except the shadow pass) for a
    horizontal viewport strip of cfg.height rows starting at ``y_offset``
    within a ``full_height``-tall frame.  Single-chip path uses the whole
    frame (offset 0); the sharded path passes per-device strips with a
    row-remapped ``scene_data['viewproj']``.  ``extra_bin_overflow``: the
    shadow pass's bin/pair overflow, folded into the frame's
    bin_overflow stat (deviation counting must cover every raster)."""
    w, h = cfg.width, cfg.height
    full_height = h if full_height is None else full_height
    n_tris = scene.tris[0].shape[0]

    # ---- update_scene: device-side frustum culling (vk_engine_run.cpp:435-480)
    planes = _frustum_planes(scene_data["viewproj"])
    visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds, planes)
    tri_obj = jnp.take(scene.vert_obj, scene.tris[0])
    tri_visible = jnp.take(visible, tri_obj)
    # never-pass masked triangles (sorted to the masked range's tail,
    # scene.n_masked_raster) are invisible to the camera: their alpha
    # test provably never passes (textures.tri_alpha_bounds), so they
    # only ever produce rejected peel layers.  Exclude them from the
    # camera setup — the frame stats keep counting them (the reference
    # submits them too, vk_engine_run.cpp:309), and the shadow pass
    # keeps rastering them (no fragment stage there).
    n_mvis = scene.n_masked_vis
    tri_visible_cam = tri_visible
    if n_mvis < scene.n_masked:
        ids = jnp.arange(n_tris, dtype=jnp.int32)
        never = (ids >= scene.n_opaque + n_mvis) & \
            (ids < scene.n_opaque + scene.n_masked)
        tri_visible_cam = tri_visible & ~never

    # ---- vertex stage (mesh.vert)
    world_pos, clip = rsetup.transform_vertices(
        scene.positions, scene.vert_obj, scene.obj_world, scene_data["viewproj"])
    world_nrm = rsetup.transform_normals(scene.normals, scene.vert_obj,
                                         scene.obj_world)

    # ---- stats (triangles submitted per frame, vk_engine_run.cpp:309-310)
    stats_triangles = jnp.sum(tri_visible.astype(jnp.int32))
    stats_drawcalls = jnp.sum(visible.astype(jnp.int32))

    # ---- geometry raster: opaque bucket then masked bucket
    st = rsetup.triangle_setup(clip, scene.tris, tri_visible_cam, w, h,
                               cull=rsetup.CULL_BACK)
    padded = raster.pad_setup(st)
    zero_i = jnp.zeros((1,), jnp.int32)
    tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
    tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
    rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
    vattr, vpos = _build_vertex_rows(scene, world_pos, world_nrm)
    ptbl = build_ptbl(scene, cfg, padded, tris_p, tri_mat_p, vattr, vpos)
    ptbl_a = (build_alpha_ptbl(scene, padded, tris_p, tri_mat_p, vattr)
              if ptbl is not None and scene.n_masked_vis > 0 else None)
    if cfg.pin_tables:
        # one materialization for every masked/transparent tier branch
        # (cfg.pin_tables docstring)
        pinned = jax.lax.optimization_barrier(
            tuple(t for t in (ptbl, ptbl_a, rows, vattr) if t is not None))
        pinned = list(pinned)
        ptbl = pinned.pop(0) if ptbl is not None else None
        ptbl_a = pinned.pop(0) if ptbl_a is not None else None
        rows = pinned.pop(0)
        vattr = pinned.pop(0)

    # ---- bin ONCE for every camera-view bucket (one pair sort; buckets
    # are contiguous tri-id ranges sliced out by binary search), then
    # build each bucket's raster records once — peels and probes reuse them
    n_om = scene.n_opaque + scene.n_masked
    bounds = [(0, scene.n_opaque)]
    caps = [cfg.cap_opaque]
    rec_caps = [cfg.rec_opaque]
    if n_mvis > 0:
        # bucket covers only the can-pass masked range (never-pass tris
        # are camera-invalid and sorted past n_masked_vis).  A scene
        # whose masked triangles are ALL classified never-pass skips the
        # bucket — and the whole peel machinery — entirely (the shadow
        # pass still rasters the full masked range)
        bounds.append((scene.n_opaque, scene.n_opaque + n_mvis))
        caps.append(cfg.cap_masked)
        rec_caps.append(cfg.rec_masked)
    if scene.n_transparent > 0:
        bounds.append((n_om, n_tris))
        caps.append(cfg.cap_transparent)
        rec_caps.append(cfg.rec_transparent)
    plans = list(raster.plan_view_buckets(
        st, tuple(bounds), w, h, cfg.tile_w, cfg.tile_h, tuple(caps),
        tuple(rec_caps), big_cap=cfg.big_cap, max_span=cfg.max_span,
        pair_cap=_resolve_pair_cap(
            cfg.pair_cap, n_tris, cfg.max_span, cfg.big_cap,
            cdiv(w, cfg.tile_w) * cdiv(h, cfg.tile_h))))
    plan_o = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                    cfg.tile_w, cfg.tile_h)
    depth, tid = raster.rasterize_plan(plan_o, padded, w, h, n_tris,
                                       tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                                       chunk=cfg.raster_chunk)

    overflow = plan_o["overflow"]
    if extra_bin_overflow is not None:
        overflow = overflow + extra_bin_overflow
    peel_overflow = jnp.int32(0)
    sparse_overflow = jnp.int32(0)
    # camera-view pair_cap misses are shared across the buckets' plans —
    # count once; the shadow pass's misses arrive via extra_fallback
    fallback_px = plan_o.get("pair_fallback", jnp.int32(0))
    if extra_fallback is not None:
        fallback_px = fallback_px + extra_fallback
    if n_mvis > 0:
        plan_m = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid, peel_m, fb_m = _masked_pass(scene, cfg, plan_m, padded,
                                                rows, vattr, depth, tid,
                                                ptbl=ptbl, ptbl_a=ptbl_a)
        overflow = overflow + plan_m["overflow"]
        peel_overflow = peel_overflow + peel_m
        fallback_px = fallback_px + fb_m   # exact (dense cond fallback)

    # ---- G-buffer interpolation (fixed-function varyings, SURVEY F3)
    gbuf = _build_gbuffer(scene, scene_data, tid, rows, vattr, vpos,
                          ptbl=ptbl)

    # ---- shading (planar channels); shadow mode/enable are TRACED
    # (sunlightDirection.w / sunlightColor.w — the reference's UBO flag
    # packing, scenedata.py:132-135), so toggling never recompiles
    shader = shade.shade_pbr if cfg.shading == "pbr" else shade.shade_flat
    shadow_mode_t = scene_data["sunlight_direction"][3]
    enable_shadows_t = (scene_data["sunlight_color"][3]
                        if cfg.enable_shadows else False)
    # classified sparse filtering is the default (exact; only the provably
    # uncertain penumbra band runs the full filter); plain compaction
    # (cfg.shadow_sparse_cap) and dense remain as fallbacks
    classify_cap = _resolve_classify_cap(cfg)
    if shadow_coarse is not None and classify_cap > 0:
        rgb, _alpha, sp_sh = shader(gbuf, scene, scene_data, shadow_maps,
                                    shadow_mode_t, enable_shadows_t,
                                    shadow_sparse_cap=classify_cap,
                                    shadow_coarse=shadow_coarse,
                                    mr_nearest_mip=cfg.mr_nearest_mip,
                                    fused_mat_meta=cfg.fused_mat_meta,
                                    shadow_quad_lit=cfg.shadow_fine_classify)
        # classified path is exact (dense lax.cond fallback beyond cap);
        # the count is a cap-sizing signal, not a deviation
        fallback_px = fallback_px + sp_sh
    elif cfg.shadow_sparse_cap > 0:
        rgb, _alpha, sp_sh = shader(gbuf, scene, scene_data, shadow_maps,
                                    shadow_mode_t, enable_shadows_t,
                                    shadow_sparse_cap=cfg.shadow_sparse_cap,
                                    mr_nearest_mip=cfg.mr_nearest_mip,
                                    fused_mat_meta=cfg.fused_mat_meta)
        sparse_overflow = sparse_overflow + sp_sh
    else:
        rgb, _alpha = shader(gbuf, scene, scene_data, shadow_maps,
                             shadow_mode_t, enable_shadows_t,
                             mr_nearest_mip=cfg.mr_nearest_mip,
                             fused_mat_meta=cfg.fused_mat_meta)

    # ---- compose onto background (clear (0,0,0) or gradient;
    #      vk_engine_run.cpp:246-248)
    blend = ((jnp.arange(h, dtype=jnp.float32) + y_offset)
             / full_height)[:, None]
    covered = tid >= 0
    color = []
    for c in range(3):
        bg_c = (settings["bg_top"][c] * (1.0 - blend)
                + settings["bg_bottom"][c] * blend) * settings["enable_background"]
        color.append(jnp.where(covered, rgb[c], bg_c))
    color = tuple(color)

    # ---- skybox fills untouched depth (vk_engine_run.cpp:313); only the
    # compacted sky pixels pay the cubemap gathers (interior views leave
    # a few % of the frame uncovered; overflow counted, never silent)
    if cfg.use_skybox and scene.cubemap is not None:
        color, sky_ovf = skybox.composite_skybox(
            color, depth, scene.cubemap, scene_data["view"],
            scene_data["proj"], y_offset=y_offset, full_height=full_height,
            sparse_cap=_resolve_sky_cap(cfg))
        fallback_px = fallback_px + sky_ovf   # exact (dense cond fallback)

    # ---- additive transparent pass (depth peeling, order-independent sum)
    if scene.n_transparent > 0:
        plan_t = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        color, peel_t, sp_t = _transparent_pass(
            scene, scene_data, settings, cfg, plan_t, padded, rows, vattr,
            vpos, depth, shadow_maps, color, shadow_coarse=shadow_coarse,
            ptbl=ptbl)
        peel_overflow = peel_overflow + peel_t
        sparse_overflow = sparse_overflow + sp_t

    # ---- postprocess chain (registered-pass vector with functional
    # ping-pong, vk_engine_init.cpp:554-596; the reference registers only
    # tonemap), then pack planar -> [3, H, W]
    color = jnp.stack(color)
    processed = color
    for pass_name in cfg.post_chain:
        processed = POSTPROCESS_REGISTRY[pass_name](processed)
    color = jnp.where(settings["enable_postprocess"] > 0.5, processed, color)

    return {"color": color, "depth": depth,
            "stats": {"triangles": stats_triangles,
                      "drawcalls": stats_drawcalls,
                      "bin_overflow": overflow,
                      "peel_overflow": peel_overflow,
                      "sparse_overflow": sparse_overflow,
                      # exact-path cap misses (sky / classified shadow
                      # lax.cond dense fallbacks): a perf signal, never a
                      # deviation
                      "fallback_px": fallback_px},
            # apps fetch THIS with one np.asarray: one device->host pull
            # instead of five (each pull is a blocking round trip through
            # the TPU tunnel)
            "stats_vec": jnp.stack([stats_triangles, stats_drawcalls,
                                    overflow, peel_overflow,
                                    sparse_overflow, fallback_px]),
            "color_u8": _to_u8_device(color)}


STATS_KEYS = ("triangles", "drawcalls", "bin_overflow", "peel_overflow",
              "sparse_overflow", "fallback_px")


def stats_from_vec(vec) -> dict:
    """One-transfer host fetch of the frame stats."""
    import numpy as np
    v = np.asarray(vec)
    return {k: int(v[i]) for i, k in enumerate(STATS_KEYS)}


def _to_u8_device(color: jax.Array) -> jax.Array:
    """Swapchain blit analog ON DEVICE: f32[3, H, W] -> u8[H, W, 3].
    Readback over the TPU tunnel runs ~0.5 MB/s, so apps must transfer the
    quantized image (4x smaller), never the f32 framebuffer."""
    q = jnp.clip(color, 0.0, 1.0) * 255.0 + 0.5
    return q.astype(jnp.uint8).transpose(1, 2, 0)


def build_ptbl(scene, cfg, padded, tris_p, tri_mat_p, vattr, vpos):
    """Packed per-triangle interpolation rows (cfg.packed_rows): one
    [T+1, 48] row carrying edge planes, anchor, corner attributes and
    material scalars, so per-pixel interpolation is ONE wide row-gather
    (interp.build_packed_rows).  Colorless layout only (vpos None);
    returns None when the flag is off — bit-identical output either way.
    Scenes with custom glTF samplers also fall back to narrow rows: the
    general sampler path needs per-pixel texture IDS (ops/texture.
    _sample_general), which the packed row replaces with meta."""
    if not (cfg.packed_rows and vpos is None):
        return None
    if getattr(scene.textures, "has_custom_samplers", False):
        return None
    # cols 7:11 — BOTH textures' meta descriptors (base offset + packed
    # w0/h0/levels/srgb, texture.packed_meta_cols) ride the row too,
    # bitcast i32->f32: the shade/alpha trilinears skip their per-pixel
    # [T, 5] meta row-gathers entirely (docs/PERF.md "remaining fusion
    # candidate" — the row is already 48 wide, these replace zero pads)
    base_t, pack_t = tex.packed_meta_cols(scene.textures)
    aid = scene.mat_tex_ids[:, 0]
    mid = scene.mat_tex_ids[:, 2]
    i2f = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.int32), jnp.float32)
    mat_rows = jnp.stack(
        [scene.mat_tex_ids[:, 0].astype(jnp.float32),
         scene.mat_tex_ids[:, 2].astype(jnp.float32),
         scene.mat_color_factors[:, 0], scene.mat_color_factors[:, 1],
         scene.mat_color_factors[:, 2], scene.mat_metal_rough[:, 0],
         scene.mat_metal_rough[:, 1],
         i2f(base_t[aid]), i2f(pack_t[aid]),
         i2f(base_t[mid]), i2f(pack_t[mid])], axis=-1)
    return interp.build_packed_rows(padded, tris_p, tri_mat_p, vattr,
                                    mat_rows)


def build_alpha_ptbl(scene, padded, tris_p, tri_mat_p, vattr):
    """The masked alpha probe's 24-wide row table
    (interp.build_alpha_rows): edges + anchor + uv corners + albedo meta
    (+ the alpha-coverage state-base column when the scene carries baked
    states) — half the 48-wide packed row's gather transactions for the
    peel loop.  Colorless layout only (caller gates on ptbl existing)."""
    base_t, pack_t = tex.packed_meta_cols(scene.textures)
    aid = scene.mat_tex_ids[:, 0]
    i2f = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.int32), jnp.float32)
    cols = [i2f(base_t[aid]), i2f(pack_t[aid])]
    if (getattr(scene.textures, "alpha_state_base", None) is not None
            and getattr(scene.textures, "alpha_quad_base", None)
            is not None):
        # guard-bit encoding (tex.F32_GUARD_BIT): plain cell indices are
        # denormal f32 patterns and TPU moves flush them to zero.
        # sbase + 1 < 2^28, so exponent bits 28-29 stay clear — never NaN
        enc = (scene.textures.alpha_state_base[aid] + 1) | tex.F32_GUARD_BIT
        cols.append(i2f(enc))
        # col 20: the alpha-quad table base (built together with the
        # states in assembly.build), same encoding
        encq = ((scene.textures.alpha_quad_base[aid] + 1)
                | tex.F32_GUARD_BIT)
        cols.append(i2f(encq))
    mat_alpha = jnp.stack(cols, axis=-1)[tri_mat_p]
    return interp.build_alpha_rows(padded, tris_p, vattr, mat_alpha)


def _build_vertex_rows(scene, world_pos, world_nrm):
    """Per-frame packed vertex-attribute row tables.

    Without vertex colors (scene.colors is None — the glTF COLOR_0
    default; Sponza-class assets): ONE 8-wide table
      vattr [V, 8] = nx ny nz u v wx wy wz,  vpos = None
    so the G-buffer needs 3 corner row-gathers per pixel instead of 6.

    With vertex colors: vattr [V, 8] = nx ny nz cr cg cb u v;
    vpos [V, 4] = wx wy wz pad."""
    if scene.colors is None:
        vattr = jnp.stack([world_nrm[0], world_nrm[1], world_nrm[2],
                           scene.uvs[0], scene.uvs[1],
                           world_pos[0], world_pos[1], world_pos[2]],
                          axis=-1)
        return vattr, None
    vattr = jnp.stack([world_nrm[0], world_nrm[1], world_nrm[2],
                       scene.colors[0], scene.colors[1], scene.colors[2],
                       scene.uvs[0], scene.uvs[1]], axis=-1)
    vpos = jnp.stack([world_pos[0], world_pos[1], world_pos[2],
                      jnp.zeros_like(world_pos[0])], axis=-1)
    return vattr, vpos


def _build_gbuffer(scene, scene_data, tid, rows, vattr, vpos,
                   px=None, py=None, ptbl=None):
    """Planar G-buffer (see ops/shade.py docstring for the key list).
    ``px``/``py``: explicit pixel centers for SPARSE (compacted) shading;
    dense [H, W] grid when omitted.  ``ptbl`` (packed per-triangle rows,
    cfg.packed_rows): weights + corners + material scalars from ONE wide
    row-gather — colorless layout only, bit-identical output."""
    g = {}
    if ptbl is not None:
        assert vpos is None, "packed rows require the colorless layout"
        weights, corners, matvals = interp.packed_weights_and_corners(
            ptbl, tid, px, py)
        (g["m_albedo_id"], g["m_mr_id"], g["m_cf_r"], g["m_cf_g"],
         g["m_cf_b"], g["m_metal_f"], g["m_rough_f"]) = matvals[:7]
        # texture meta rode the packed row (build_ptbl cols 7:11): the
        # trilinears skip their per-pixel meta row-gathers
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        g["m_meta_a"] = (f2i(matvals[7]), f2i(matvals[8]))
        g["m_meta_m"] = (f2i(matvals[9]), f2i(matvals[10]))
    else:
        weights = interp.interpolation_weights_rows(tid, rows[0], rows[1],
                                                    px, py)
        # one corner-gather of the attribute rows serves BOTH the plain
        # interpolation and the UV-derivative quotient rule (round 1
        # gathered the same rows twice — 3 extra 2M-row-gathers per
        # G-buffer)
        corners = interp.gather_corners(vattr, weights["vidx"])
        g["mat_id"] = weights["mat_id"]
    lam = weights["lam"]
    a = interp.interp_from_corners(corners, lam)
    g["nx"], g["ny"], g["nz"] = a[0], a[1], a[2]
    if vpos is None:
        # colorless 8-wide layout: nx ny nz u v wx wy wz (see
        # _build_vertex_rows) — world position rides the SAME corner
        # gather; vertex color folds to 1
        one = jnp.ones_like(a[0])
        g["cr"], g["cg"], g["cb"] = one, one, one
        (g["u"], g["dudx"], g["dudy"]), (g["v"], g["dvdx"], g["dvdy"]) = \
            interp.derivs_from_corners(corners, (3, 4), weights)
        g["wx"], g["wy"], g["wz"] = a[5], a[6], a[7]
    else:
        g["cr"], g["cg"], g["cb"] = a[3], a[4], a[5]
        (g["u"], g["dudx"], g["dudy"]), (g["v"], g["dvdx"], g["dvdy"]) = \
            interp.derivs_from_corners(corners, (6, 7), weights)
        pz = interp.interp_rows(vpos, weights["vidx"], lam)
        g["wx"], g["wy"], g["wz"] = pz[0], pz[1], pz[2]
    view = scene_data["view"]
    g["view_z"] = (g["wx"] * view[2, 0] + g["wy"] * view[2, 1]
                   + g["wz"] * view[2, 2] + view[2, 3])
    g["covered"] = tid >= 0
    return g


def _compact_covered(tid: jax.Array, cap: int):
    """compact_mask over the covered (tid >= 0) pixels — the
    transparent/masked buckets cover a few percent of the frame, so their
    peel shading runs on the compacted set (round-1 shaded 2M pixels per
    peel densely: 6.0 s of the 11.3 s frame)."""
    from ..ops.common import compact_mask
    return compact_mask(tid >= 0, cap)


def _sparse_pixels(sel: jax.Array, tid: jax.Array, width: int):
    """Per-compact-slot pixel centers + winning triangle (-1 for pad)."""
    selc = jnp.maximum(sel, 0)
    tid_s = jnp.where(sel >= 0, jnp.take(tid.reshape(-1), selc), -1)
    px = (selc % width).astype(jnp.float32) + 0.5
    py = (selc // width).astype(jnp.float32) + 0.5
    return selc, tid_s, px, py


def _transparent_pass(scene, scene_data, settings, cfg, plan_t,
                      padded, rows, vattr, vpos, opaque_depth, shadow_maps,
                      color, shadow_coarse=None, ptbl=None):
    """Additive-blend transparent geometry (vk_pipelines.cpp:108-118:
    srcAlpha*src + dst; mesh_pbr always writes alpha=1 so effectively
    ONE/ONE), depth test against opaque LESS_OR_EQUAL, depth write off —
    implemented as K depth-peel layers.  Order-independent, so peel order
    is irrelevant.  UNROLLED, not a scan (see _masked_pass).  A final
    depth-only probe counts pixels with a (K+1)-th layer ->
    ``peel_overflow``.

    Each peel is shaded SPARSELY on the compacted covered pixels; the
    compact-list cost is CAP-proportional (pad slots gather like real
    ones), so the cap is TIERED by the live coverage count with lax.cond:
    most cameras see few transparent pixels (the bench camera sees zero —
    round 2 paid ~500 ms of cap-sized shading for them) and take the
    small-cap branch; pane-filling views fall back to the large cap.
    Covered pixels beyond the LARGE cap are counted in
    ``sparse_overflow``."""
    w, h = cfg.width, cfg.height
    n_tris = scene.tris[0].shape[0]
    no_id = jnp.full((h, w), -1, jnp.int32)
    cap_large = cfg.sparse_cap or max(8192, (w * h) // 8)
    cap_small = min(cap_large, max(8192, (w * h) // 32))

    shader = shade.shade_pbr if cfg.shading == "pbr" else shade.shade_flat

    def shade_peel(tidt, color_flat, cap):
        sel, ovf = _compact_covered(tidt, cap)
        selc, tid_s, px, py = _sparse_pixels(sel, tidt, w)
        gbuf = _build_gbuffer(scene, scene_data, tid_s, rows, vattr, vpos,
                              px, py, ptbl=ptbl)
        rgb, alpha, sp_sh = shader(
            gbuf, scene, scene_data, shadow_maps,
            scene_data["sunlight_direction"][3],
            (scene_data["sunlight_color"][3]
             if cfg.enable_shadows else False),
            shadow_sparse_cap=cap,      # the compact list can be fully active
            shadow_coarse=shadow_coarse,
            mr_nearest_mip=cfg.mr_nearest_mip,
            fused_mat_meta=cfg.fused_mat_meta,
            shadow_quad_lit=cfg.shadow_fine_classify)
        contrib = (tid_s >= 0) & (alpha >= 0.5)         # discard still applies
        # additive blend via scatter-add; pad slots (sel == -1) are routed
        # out of bounds POSITIVELY (w*h) so mode="drop" discards them
        # (a raw -1 would wrap to the last pixel, numpy-style)
        tgt = jnp.where(sel >= 0, sel, w * h)
        return (tuple(cf.at[tgt].add(jnp.where(contrib, rc, 0.0),
                                     mode="drop")
                      for cf, rc in zip(color_flat, rgb)),
                ovf + sp_sh)

    def shade_tiered(tidt, color_flat):
        if cap_small >= cap_large:
            return shade_peel(tidt, color_flat, cap_large)
        n_cov = jnp.sum((tidt >= 0).astype(jnp.int32))
        # zero tier: most cameras see NO transparent pixels at all
        # (the bench camera does) — skip the cap-sized shading whole
        return jax.lax.cond(
            n_cov == 0,
            lambda cf: (cf, jnp.int32(0)),
            lambda cf: jax.lax.cond(
                n_cov <= cap_small,
                lambda c2: shade_peel(tidt, c2, cap_small),
                lambda c2: shade_peel(tidt, c2, cap_large),
                cf),
            color_flat)

    sparse_ovf = jnp.int32(0)
    color_flat = tuple(c.reshape(-1) for c in color)
    if cfg.k_raster:
        # one record pass for all peel layers + the probe layer
        layers = raster.rasterize_plan_k(
            plan_t, padded, w, h, n_tris, cfg.transparent_peels + 1,
            opaque_depth, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            chunk=cfg.raster_chunk)
        for k in range(cfg.transparent_peels):
            color_flat, ovf = shade_tiered(layers[k][1], color_flat)
            sparse_ovf = sparse_ovf + ovf
        peel_ovf = jnp.sum((layers[-1][1] >= 0).astype(jnp.int32))
        color = tuple(cf.reshape(h, w) for cf in color_flat)
        return color, peel_ovf, sparse_ovf

    floor = None
    for _ in range(cfg.transparent_peels):
        d, tidt = raster.rasterize_plan(
            plan_t, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk,
            init_depth=opaque_depth, init_id=no_id, floor_depth=floor)
        color_flat, ovf = shade_tiered(tidt, color_flat)
        sparse_ovf = sparse_ovf + ovf
        floor = jnp.where(tidt >= 0, d, 2.0)            # peel past this layer
    _, t3 = raster.rasterize_plan(
        plan_t, padded, w, h, n_tris, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        chunk=cfg.raster_chunk, init_depth=opaque_depth, init_id=no_id,
        floor_depth=floor)
    peel_ovf = jnp.sum((t3 >= 0).astype(jnp.int32))
    color = tuple(cf.reshape(h, w) for cf in color_flat)
    return color, peel_ovf, sparse_ovf
