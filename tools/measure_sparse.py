"""Measure the sparse-domain sizes at the bench camera (cap-sizing
evidence for docs/PERF.md): shadow-classifier certainty split, sky
coverage, masked/transparent peel coverage.

Run on any backend:  python tools/measure_sparse.py [--width W --height H]
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
                    choices=("replica", "procedural"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph import frame as F
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import shade
    from vk_renderer_tpu.ops import texture as tex
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
    cfg = driver.config_from_settings(settings, args.width, args.height)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg)

    @jax.jit
    def measure(scene, sd):
        from vk_renderer_tpu.ops import interp, raster
        from vk_renderer_tpu.ops import setup as rsetup
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
        shadow_maps, _, _ = F.render_shadow_maps(
            scene, world_pos, tri_visible, sd["light_viewproj"], cfg)
        coarse = tex.build_shadow_coarse(shadow_maps)

        st = rsetup.triangle_setup(clip, scene.tris, tri_visible, w, h,
                                   cull=rsetup.CULL_BACK)
        padded = raster.pad_setup(st)
        zero_i = jnp.zeros((1,), jnp.int32)
        tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
        tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
        rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
        vattr, vpos = F._build_vertex_rows(scene, world_pos, world_nrm)

        n_tris = scene.tris[0].shape[0]
        n_om = scene.n_opaque + scene.n_masked
        bounds = [(0, scene.n_opaque), (scene.n_opaque, n_om),
                  (n_om, n_tris)]
        caps = [cfg.cap_opaque, cfg.cap_masked, cfg.cap_transparent]
        rec_caps = [cfg.rec_opaque, cfg.rec_masked, cfg.rec_transparent]
        plans = list(raster.plan_view_buckets(
            st, tuple(bounds), w, h, cfg.tile_w, cfg.tile_h, tuple(caps),
            tuple(rec_caps), big_cap=cfg.big_cap))
        plan_o = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid = raster.rasterize_plan(
            plan_o, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk)
        plan_m = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid, _, _ = F._masked_pass(scene, cfg, plan_m, padded, rows,
                                          vattr, depth, tid)
        gbuf = F._build_gbuffer(scene, sd, tid, rows, vattr, vpos)

        # per-peel coverage of the masked/transparent buckets
        no_id = jnp.full((h, w), -1, jnp.int32)
        d_m, t_m = raster.rasterize_plan(
            plan_m, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.masked_chunk,
            init_depth=jnp.full((h, w), 1.0), init_id=no_id)
        plan_t = raster.prepare_records(plans.pop(0), padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        d_t, t_t = raster.rasterize_plan(
            plan_t, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk,
            init_depth=depth, init_id=no_id)

        nx, ny, nz = shade._normalize3(gbuf["nx"], gbuf["ny"], gbuf["nz"])
        sun = sd["sunlight_direction"]
        inv = jax.lax.rsqrt(jnp.maximum(
            sun[0] ** 2 + sun[1] ** 2 + sun[2] ** 2, 1e-40))
        n_dot_l = jnp.maximum(-(nx * sun[0] + ny * sun[1] + nz * sun[2])
                              * inv, 0.0)
        su, sv, sz, layer = shade.shadow_coords(
            gbuf["wx"], gbuf["wy"], gbuf["wz"], gbuf["view_z"], sd, 3)
        active = gbuf["covered"] & (n_dot_l > 0.0)
        crows = tex.make_coarse_rows(coarse)
        lit_c, blk_c, parts = shade._classify_shadow(
            crows, su, sv, sz, layer, shadow_maps.shape[-1], 3,
            return_parts=True)
        # three-stage classifier (the production default): receiver-quad
        # lit proof (full-res ShadowRows) + fine tap-footprint min/max
        srows = tex.make_shadow_rows(shadow_maps)
        fine = tex.make_coarse_rows(tex.build_shadow_coarse(
            shadow_maps, block=tex.fine_block_for(shadow_maps.shape[-1])))
        lit_2l, blk_2l = shade._classify_shadow(
            crows, su, sv, sz, layer, shadow_maps.shape[-1], 3,
            shadow_rows=srows, shadow_fine=fine)
        # ground-truth proxy: the 1-tap hard test at the window center
        hard = shade._shadow_hard(srows, su, sv, sz, layer)
        unc = active & ~lit_c & ~blk_c

        # trilinear LOD-fraction split for the albedo texture: pixels with
        # frac == 0 (magnified, lam clamps to 0, or integer lam) need NO
        # second-mip fetch — the exact-skip domain; frac near 0/1 sizes the
        # gated snap variant
        mat_id = gbuf["mat_id"]
        albedo_id = jnp.take(scene.mat_tex_ids[:, 0], mat_id)
        lam, _ = tex.compute_lod(scene.textures, albedo_id, gbuf["dudx"],
                                 gbuf["dvdx"], gbuf["dudy"], gbuf["dvdy"])
        frac = lam - jnp.floor(lam)
        cov = gbuf["covered"]

        cnt = lambda m: jnp.sum(m.astype(jnp.int32))
        return jnp.stack([
            cnt(gbuf["covered"]), cnt(active),
            cnt(active & lit_c), cnt(active & blk_c),
            cnt(active & ~lit_c & ~blk_c),
            cnt(depth >= 1.0),              # sky pixels
            cnt(t_m >= 0),                  # masked bucket first-peel cover
            cnt(t_t >= 0),                  # transparent first-peel cover
            cnt(cov & (frac == 0.0)),       # exact l1-skip domain
            cnt(cov & (frac < 0.1)),        # gated snap-to-l0 domain
            cnt(cov & (frac > 0.9)),        # gated snap-to-l1 domain
            # ---- classifier diagnostics over the UNCERTAIN band
            cnt(unc & ~parts["fits"]),                 # window > 2x2 cells
            cnt(unc & parts["fits"] & (hard == 0.0)),  # hard-lit, unproven
            cnt(unc & parts["fits"] & (hard == 1.0)),  # hard-blk, unproven
            cnt(unc & parts["fits"] & (hard == 1.0)
                & parts["blk_depth_ok"] & ~parts["in_region"]),
            cnt(unc & parts["border_lit"]),            # window off-map
            cnt(active & (hard == 0.0)),               # hard-lit among active
            # ---- two-level classifier (production default)
            cnt(active & lit_2l), cnt(active & blk_2l),
            cnt(active & ~lit_2l & ~blk_2l),
        ])

    v = np.asarray(measure(scene, sd))
    n = args.width * args.height
    names = ["covered", "shadow_active", "certain_lit", "certain_blocked",
             "uncertain", "sky", "masked_peel0", "transparent_peel0",
             "lod_frac0", "lod_frac_lo", "lod_frac_hi",
             "unc_nofits", "unc_hardlit", "unc_hardblk",
             "unc_blk_region_fail", "unc_border", "active_hardlit",
             "lit_2level", "blk_2level", "uncertain_2level"]
    for name, val in zip(names, v):
        print(f"{name:<18} {int(val):>9}  ({100.0 * int(val) / n:5.1f}% of frame)")
    caps = {"shadow_classify_cap": F._resolve_classify_cap(cfg),
            "sky_cap": F._resolve_sky_cap(cfg),
            "masked/transparent sparse_cap(auto)":
                (max(8192, n // 3), max(8192, n // 8))}
    print(caps)


if __name__ == "__main__":
    main()
