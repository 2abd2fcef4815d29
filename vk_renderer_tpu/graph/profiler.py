"""Per-pass timing breakdown — the BASELINE.md tracked-metric table.

The reference surfaces frametime/fps/triangles/drawcalls in its ImGui
stats overlay (src/vk_engine_run.cpp:208-211); BASELINE.md additionally
names "Per-pass ms (raster / PBR shade / shadow / tonemap)" as the
tracked metric set.  This module times each render stage as a standalone
jitted function (compile excluded, median of N timed runs) so perf work
can see exactly where a frame goes.

Stage boundaries mirror graph/frame.py's render_view/render_frame; the
stage callables reuse the same ops entry points, so a pipeline change
shows up here automatically (and loudly, if an interface drifts).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..ops import binning, interp, post, raster, shade, skybox
from ..ops import setup as rsetup
from . import frame as F


_synced = False


def _force_honest_mode():
    """One tiny device->host pull.  Through the tunneled-TPU transport,
    ``block_until_ready`` returns on dispatch-ack (timings are fiction)
    until the process's FIRST real pull switches dispatch to synchronous —
    after which timings are honest (~27 ms tunnel overhead per dispatch).
    Must run before any measurement."""
    global _synced
    if not _synced:
        import numpy as np
        np.asarray(jnp.zeros(()) + 1.0)
        _synced = True


def _sync_pull(out):
    """Wait for ``out`` to actually exist by pulling ONE scalar to host.
    Some tunnel transports return from ``block_until_ready`` on
    dispatch-ack even after the first-pull handshake (observed 2026-08-21:
    a 1 s fused frame 'measured' 0.17 ms); a real device->host transfer
    of the first leaf's first element cannot complete before the program
    that produced it, so timing around this is honest up to one ~10-30 ms
    tunnel round trip."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def _timed(fn, *args, iters: int = 5):
    """Compile, then median wall time of ``iters`` dispatches (ms),
    each closed by a one-scalar pull (_sync_pull) so transports whose
    block_until_ready lies cannot produce fiction."""
    _force_honest_mode()
    out = fn(*args)
    jax.block_until_ready(out)
    _sync_pull(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _sync_pull(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1000.0 * times[len(times) // 2], out


def profile_passes(scene, scene_data: dict, settings: dict,
                   cfg: F.FrameConfig, iters: int = 5) -> dict:
    """Return {stage_name: ms} for one frame's stages, in pass order.

    Stages are timed standalone (each a separate jitted program over
    device-resident inputs), so the sum can differ from the fused
    full-frame time — both are reported (``full_frame`` key).
    """
    w, h = cfg.width, cfg.height
    timings: dict[str, float] = {}
    jcfg = {"static_argnames": ()}
    del jcfg

    # ---- stage: vertex transform + triangle setup (+ row tables)
    def stage_setup(scene, sd):
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds, planes)
        tri_visible = jnp.take(visible, jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, clip = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world, sd["viewproj"])
        world_nrm = rsetup.transform_normals(scene.normals, scene.vert_obj,
                                             scene.obj_world)
        st = rsetup.triangle_setup(clip, scene.tris, tri_visible, w, h,
                                   cull=rsetup.CULL_BACK)
        padded = raster.pad_setup(st)
        zero_i = jnp.zeros((1,), jnp.int32)
        tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
        tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
        rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
        vattr, vpos = F._build_vertex_rows(scene, world_pos, world_nrm)
        ptbl = F.build_ptbl(scene, cfg, padded, tris_p, tri_mat_p, vattr,
                            vpos)
        ptbl_a = (F.build_alpha_ptbl(scene, padded, tris_p, tri_mat_p,
                                     vattr)
                  if ptbl is not None and scene.n_masked_vis > 0 else None)
        return {"st": st, "padded": padded, "rows": rows, "vattr": vattr,
                "vpos": vpos, "world_pos": world_pos,
                "tri_visible": tri_visible, "ptbl": ptbl,
                "ptbl_a": ptbl_a}

    ms, setup_out = _timed(jax.jit(stage_setup), scene, scene_data,
                           iters=iters)
    timings["setup"] = ms
    st = setup_out["st"]
    padded = setup_out["padded"]
    rows, vattr, vpos = setup_out["rows"], setup_out["vattr"], setup_out["vpos"]
    ptbl = setup_out["ptbl"]
    ptbl_a = setup_out["ptbl_a"]

    n_tris = scene.tris[0].shape[0]
    n_om = scene.n_opaque + scene.n_masked
    bounds = [(0, scene.n_opaque)]
    caps = [cfg.cap_opaque]
    rec_caps = [cfg.rec_opaque]
    if scene.n_masked_vis > 0:
        # can-pass sub-range only, matching render_view (never-pass tris
        # are camera-invalid and sorted past n_masked_vis)
        bounds.append((scene.n_opaque, scene.n_opaque + scene.n_masked_vis))
        caps.append(cfg.cap_masked)
        rec_caps.append(cfg.rec_masked)
    if scene.n_transparent > 0:
        bounds.append((n_om, n_tris))
        caps.append(cfg.cap_transparent)
        rec_caps.append(cfg.rec_transparent)

    # ---- stage: binning (all camera-view buckets, one sort)
    def stage_bin(st):
        return raster.plan_view_buckets(
            st, tuple(bounds), w, h, cfg.tile_w, cfg.tile_h, tuple(caps),
            tuple(rec_caps), big_cap=cfg.big_cap, max_span=cfg.max_span,
            pair_cap=F._resolve_pair_cap(
                cfg.pair_cap, n_tris, cfg.max_span, cfg.big_cap,
                (w // cfg.tile_w) * ((h + cfg.tile_h - 1) // cfg.tile_h)))

    ms, plan_out = _timed(jax.jit(stage_bin), st, iters=iters)
    timings["bin"] = ms
    plan_out = list(plan_out)

    # ---- stage: record build (per-bucket gather + tile fold; TPU path)
    def stage_records(plans, padded, st):
        return tuple(raster.prepare_records(p, padded, st["bbox"], w,
                                            cfg.tile_w, cfg.tile_h)
                     for p in plans)

    ms, plan_out = _timed(jax.jit(stage_records), tuple(plan_out), padded,
                          st, iters=iters)
    timings["records"] = ms
    plan_out = list(plan_out)
    plan_o = plan_out.pop(0)

    # ---- stage: opaque depth raster
    def stage_raster(plan_o, padded):
        return raster.rasterize_plan(plan_o, padded, w, h, n_tris,
                                     tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                                     chunk=cfg.raster_chunk)

    ms, (depth, tid) = _timed(jax.jit(stage_raster), plan_o, padded,
                              iters=iters)
    timings["raster_opaque"] = ms

    # ---- stage: masked (alpha-cutoff) pass (+ sub-stage decomposition)
    if scene.n_masked_vis > 0:
        plan_m = plan_out.pop(0)

        def stage_masked_kraster(plan_m, padded, depth):
            return raster.rasterize_plan_k(
                plan_m, padded, w, h, scene.tris[0].shape[0],
                cfg.masked_peels, depth, tile_w=cfg.tile_w,
                tile_h=cfg.tile_h, chunk=cfg.masked_chunk)

        ms, _layers = _timed(jax.jit(stage_masked_kraster), plan_m, padded,
                             depth, iters=iters)
        timings["masked_kraster0"] = ms

        def stage_masked(scene, plan_m, padded, rows, vattr, depth, tid,
                         ptbl, ptbl_a):
            return F._masked_pass(scene, cfg, plan_m, padded, rows,
                                  vattr, depth, tid, ptbl=ptbl,
                                  ptbl_a=ptbl_a)

        ms, (depth, tid, _, _sp) = _timed(jax.jit(stage_masked), scene, plan_m,
                                     padded, rows, vattr, depth, tid, ptbl,
                                     ptbl_a, iters=iters)
        timings["masked"] = ms

    # ---- stage: G-buffer interpolation
    def stage_gbuffer(scene, sd, tid, rows, vattr, vpos, ptbl):
        return F._build_gbuffer(scene, sd, tid, rows, vattr, vpos,
                                ptbl=ptbl)

    ms, gbuf = _timed(jax.jit(stage_gbuffer), scene, scene_data, tid, rows,
                      vattr, vpos, ptbl, iters=iters)
    timings["gbuffer"] = ms

    # ---- stage: shade (PBR or flat, incl. texture sampling + shadows)
    from ..ops import texture as _tex
    shadow_maps = _tex.pack_shadow_maps(
        jnp.ones((F.NUM_CASCADES, 1, 1), jnp.float32))

    def stage_shade(gbuf, scene, sd, shadow_maps):
        shader = shade.shade_pbr if cfg.shading == "pbr" else shade.shade_flat
        classify_cap = F._resolve_classify_cap(cfg)
        coarse = None
        cap_sh = cfg.shadow_sparse_cap if cfg.shadow_sparse_cap > 0 else None
        if cfg.enable_shadows and classify_cap > 0:
            # the frame path's FULL classifier table set (coarse + fine)
            coarse = F._build_classifier_tables(shadow_maps, cfg)
            cap_sh = classify_cap
        shadow_maps = _tex.make_shadow_rows(shadow_maps)   # frame-path form
        return shader(gbuf, scene, sd, shadow_maps,
                      sd["sunlight_direction"][3],
                      (sd["sunlight_color"][3] if cfg.enable_shadows
                       else False), shadow_sparse_cap=cap_sh,
                      shadow_coarse=coarse,
                      mr_nearest_mip=cfg.mr_nearest_mip,
                      fused_mat_meta=cfg.fused_mat_meta,
                      shadow_quad_lit=cfg.shadow_fine_classify)

    if cfg.enable_shadows:
        def stage_shadow(scene, world_pos, tri_visible, sd):
            return F.render_shadow_maps(scene, world_pos, tri_visible,
                                        sd["light_viewproj"], cfg)[0]

        ms, shadow_maps = _timed(jax.jit(stage_shadow), scene,
                                 setup_out["world_pos"],
                                 setup_out["tri_visible"], scene_data,
                                 iters=iters)
        timings["shadow"] = ms

    ms, _shade_out = _timed(jax.jit(stage_shade), gbuf, scene, scene_data,
                               shadow_maps, iters=iters)
    rgb = _shade_out[0]
    timings["shade"] = ms

    # ---- stage: background + skybox compose
    # (cubemap passed as an argument — closed-over device arrays embed as
    # multi-MB HLO constants, bloating the executable)
    def stage_compose(rgb, tid, depth, cubemap, sd, settings):
        blend = (jnp.arange(h, dtype=jnp.float32) / h)[:, None]
        covered = tid >= 0
        color = []
        for c in range(3):
            bg_c = (settings["bg_top"][c] * (1.0 - blend)
                    + settings["bg_bottom"][c] * blend) \
                * settings["enable_background"]
            color.append(jnp.where(covered, rgb[c], bg_c))
        color = tuple(color)
        if cfg.use_skybox and cubemap is not None:
            color, _sky_ovf = skybox.composite_skybox(
                color, depth, cubemap, sd["view"], sd["proj"],
                sparse_cap=F._resolve_sky_cap(cfg))
        return color

    ms, color = _timed(jax.jit(stage_compose), rgb, tid, depth,
                       scene.cubemap, scene_data, settings, iters=iters)
    timings["compose"] = ms

    # ---- stage: transparent additive pass
    if scene.n_transparent > 0:
        plan_t = plan_out.pop(0)

        def stage_transparent(scene, sd, settings, plan_t, padded,
                              rows, vattr, vpos, depth, shadow_maps, color,
                              ptbl):
            coarse = (F._build_classifier_tables(shadow_maps, cfg)
                      if cfg.enable_shadows
                      and F._resolve_classify_cap(cfg) > 0 else None)
            return F._transparent_pass(scene, sd, settings, cfg, plan_t,
                                       padded, rows, vattr, vpos, depth,
                                       _tex.make_shadow_rows(shadow_maps),
                                       color, shadow_coarse=coarse,
                                       ptbl=ptbl)

        ms, (color, _, _sp2) = _timed(jax.jit(stage_transparent), scene,
                                scene_data, settings, plan_t, padded,
                                rows, vattr, vpos, depth, shadow_maps, color,
                                ptbl, iters=iters)
        timings["transparent"] = ms

    # ---- stage: tonemap
    def stage_tonemap(color):
        return post.tonemap_xla(jnp.stack(color))

    ms, _ = _timed(jax.jit(stage_tonemap), color, iters=iters)
    timings["tonemap"] = ms

    # ---- the real, fused full frame
    def full(scene, sd, settings):
        return F.render_frame(scene, sd, settings, cfg)

    ms, _ = _timed(full, scene, scene_data, settings, iters=iters)
    timings["full_frame"] = ms
    return timings


def format_table(timings: dict) -> str:
    total = sum(v for k, v in timings.items() if k != "full_frame")
    lines = ["per-pass ms (standalone jitted stages; fused frame differs):"]
    for k, v in timings.items():
        if k == "full_frame":
            continue
        lines.append(f"  {k:<14} {v:9.2f} ms")
    lines.append(f"  {'stage sum':<14} {total:9.2f} ms")
    lines.append(f"  {'full_frame':<14} {timings['full_frame']:9.2f} ms")
    return "\n".join(lines)
