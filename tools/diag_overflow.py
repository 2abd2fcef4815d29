"""Attribute the frame's overflow counters at the bench camera: which
bucket's bins, which cascade, masked vs transparent peels, and the
classified-filter uncertain band vs its cap.  Run after any scene change
(the floor-winding fix resized every domain the round-2 caps were tuned
to) to re-derive honest FrameConfig defaults.

    python tools/diag_overflow.py [--width W --height H]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="replica",
                    choices=("replica", "procedural"),
                    help="replica = the bench flagship asset")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph import frame as F
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import interp, raster
    from vk_renderer_tpu.ops import setup as rsetup
    from vk_renderer_tpu.scene import procedural
    from vk_renderer_tpu.scene.camera import Camera

    if args.scene == "replica":
        from vk_renderer_tpu.scene import ktx, sponza_replica
        from vk_renderer_tpu.scene.assembly import SceneBuilder
        glb, kx = sponza_replica.ensure_assets()
        b = SceneBuilder()
        b.load_gltf(glb, "sponza")
        b.cubemap = ktx.load_cubemap(kx)
        scene = b.build().device_put()
    else:
        scene = procedural.build_sponza_like().build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cfg = dataclasses.replace(
        driver.config_from_settings(settings, args.width, args.height),
        mr_nearest_mip=True)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg)

    @jax.jit
    def measure(scene, sd):
        w, h = cfg.width, cfg.height
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds,
                                      planes)
        tri_visible = jnp.take(visible,
                               jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, clip = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world, sd["viewproj"])
        world_nrm = rsetup.transform_normals(scene.normals, scene.vert_obj,
                                             scene.obj_world)
        n_tris = scene.tris[0].shape[0]

        out = {}
        # ---- per-cascade shadow bin/record overflow + real pair counts
        cw = rsetup.gather_corner_positions(world_pos, scene.tris)
        s = cfg.shadow_size
        from vk_renderer_tpu.ops.binning import _emit_pairs
        from vk_renderer_tpu.ops.common import cdiv
        for i in range(cfg.shadow_cascades):
            lvp = sd["light_viewproj"][i]
            corn = tuple([lvp[r, 0] * cw[0][k] + lvp[r, 1] * cw[1][k]
                          + lvp[r, 2] * cw[2][k] + lvp[r, 3]
                          for k in range(3)] for r in range(4))
            st = rsetup.triangle_setup(None, None, tri_visible, s, s,
                                       cull=rsetup.CULL_FRONT, corners=corn)
            (plan,) = raster.plan_view_buckets(
                st, ((0, n_tris),), s, s, cfg.tile_w, cfg.tile_h,
                (cfg.shadow_cap,), (cfg.rec_shadow,),
                big_cap=cfg.shadow_big_cap, max_span=cfg.shadow_max_span)
            out[f"shadow{i}_overflow"] = plan["overflow"]
            # real pair count + worst tile occupancy for cap sizing
            (keys, real, *_rest) = _emit_pairs(
                tuple(st["bbox"]), st["valid"], s, s, cfg.tile_w, cfg.tile_h,
                cfg.shadow_max_span, edge=st.get("edge"),
                anchor=st.get("anchor"), big_cap=cfg.shadow_big_cap)
            out[f"shadow{i}_pairs"] = jnp.sum(real.astype(jnp.int32))
            n_tiles = cdiv(s, cfg.tile_w) * cdiv(s, cfg.tile_h)
            log2p = max(1, int(n_tris + 1).bit_length())
            tile_of = jnp.where(real, (keys >> log2p), n_tiles)
            occ = jnp.zeros((n_tiles + 1,), jnp.int32).at[tile_of].add(1)
            out[f"shadow{i}_maxtile"] = jnp.max(occ[:n_tiles])
            nk = (jnp.zeros((n_tiles,), jnp.int32)
                  .at[jnp.clip(tile_of, 0, n_tiles - 1)]
                  .add(jnp.where(real, 1, 0)))
            out[f"shadow{i}_chunks"] = jnp.sum((nk + 63) // 64
                                               + (nk > 0).astype(jnp.int32))

        # ---- camera-view buckets
        st = rsetup.triangle_setup(clip, scene.tris, tri_visible, w, h,
                                   cull=rsetup.CULL_BACK)
        padded = raster.pad_setup(st)
        zero_i = jnp.zeros((1,), jnp.int32)
        tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
        tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
        rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
        vattr, vpos = F._build_vertex_rows(scene, world_pos, world_nrm)

        n_om = scene.n_opaque + scene.n_masked
        bounds = ((0, scene.n_opaque), (scene.n_opaque, n_om),
                  (n_om, n_tris))
        caps = (cfg.cap_opaque, cfg.cap_masked, cfg.cap_transparent)
        rec_caps = (cfg.rec_opaque, cfg.rec_masked, cfg.rec_transparent)
        plans = list(raster.plan_view_buckets(
            st, bounds, w, h, cfg.tile_w, cfg.tile_h, caps, rec_caps,
            big_cap=cfg.big_cap, max_span=cfg.max_span))
        for name, plan in zip(("opaque", "masked", "transparent"), plans):
            out[f"{name}_overflow"] = plan["overflow"]
        # camera-view real pairs (for pair_cap sizing)
        (keys, real, *_rest) = _emit_pairs(
            tuple(st["bbox"]), st["valid"], w, h, cfg.tile_w, cfg.tile_h,
            cfg.max_span, edge=st.get("edge"), anchor=st.get("anchor"),
            big_cap=cfg.big_cap)
        out["camera_pairs"] = jnp.sum(real.astype(jnp.int32))

        # ---- camera-bucket worst-tile occupancy (cap sizing)
        log2p = max(1, int(n_tris + 1).bit_length())
        n_tiles_c = cdiv(w, cfg.tile_w) * cdiv(h, cfg.tile_h)
        tile_of = jnp.where(real, (keys >> log2p), n_tiles_c)
        tri_of = jnp.where(real, keys & ((1 << log2p) - 1), n_tris)
        for name, lo, hi in (("opaque", 0, scene.n_opaque),
                             ("masked", scene.n_opaque, n_om)):
            sel = real & (tri_of >= lo) & (tri_of < hi)
            occ = (jnp.zeros((n_tiles_c + 1,), jnp.int32)
                   .at[jnp.where(sel, tile_of, n_tiles_c)].add(1))
            out[f"{name}_maxtile"] = jnp.max(occ[:n_tiles_c])

        # ---- masked peel depth: how many strict layers per pixel?
        plan_o = raster.prepare_records(plans[0], padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid = raster.rasterize_plan(
            plan_o, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk)
        plan_m = raster.prepare_records(plans[1], padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        layers_m = raster.rasterize_plan_k(
            plan_m, padded, w, h, n_tris, 12, depth,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, chunk=cfg.masked_chunk)
        for k, (ld, lt) in enumerate(layers_m):
            out[f"masked_layer{k}"] = jnp.sum((lt >= 0).astype(jnp.int32))
        # acceptance-gated pending set per peel (dense alpha eval — diag
        # only): pending_k = every layer < k found-and-rejected; the
        # peel_overflow at masked_peels=K is |pending_K & layer_K exists|
        pending = None
        for k, (ld, lt) in enumerate(layers_m):
            if pending is not None:
                out[f"masked_pend{k}"] = jnp.sum(
                    (pending & (lt >= 0)).astype(jnp.int32))
            dom = (lt >= 0) if pending is None else pending & (lt >= 0)
            alpha = F._winner_alpha(scene, jnp.where(dom, lt, -1), rows,
                                    vattr)
            accept = dom & (alpha >= 0.5)
            pending = dom & ~accept
        plan_t = raster.prepare_records(plans[2], padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        layers_t = raster.rasterize_plan_k(
            plan_t, padded, w, h, n_tris, 4, depth,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, chunk=cfg.raster_chunk)
        for k, (ld, lt) in enumerate(layers_t):
            out[f"transparent_layer{k}"] = jnp.sum((lt >= 0).astype(jnp.int32))
        return {k: jnp.asarray(v) for k, v in out.items()}

    out = jax.device_get(measure(scene, sd))
    for k in sorted(out):
        print(f"{k:<22} {int(out[k]):>10}")
    print({"shadow_cap": cfg.shadow_cap, "rec_shadow": cfg.rec_shadow,
           "cap_masked": cfg.cap_masked, "rec_masked": cfg.rec_masked,
           "masked_peels": cfg.masked_peels,
           "transparent_peels": cfg.transparent_peels,
           "classify_cap(auto)": F._resolve_classify_cap(cfg)})


if __name__ == "__main__":
    main()
