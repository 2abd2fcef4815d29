"""Per-layer masked accept domains on the replica bench camera: pixels,
32-px cells, and the tier each layer's accept would pick — plus pending
counts after round 0 (what the tail rounds actually face).  Directs the
cell-tier ladder with data instead of guesses.

Run: python tools/debug_masked_domains.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph import frame as F
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import interp, raster
    from vk_renderer_tpu.ops import setup as rsetup
    from vk_renderer_tpu.scene import ktx, sponza_replica
    from vk_renderer_tpu.scene.assembly import SceneBuilder
    from vk_renderer_tpu.scene.camera import Camera

    w, h = 1920, 1080
    glb, kx = sponza_replica.ensure_assets()
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)
    scene = b.build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cfg = driver.config_from_settings(settings, w, h)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg)

    @jax.jit
    def setup(scene, sd):
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds,
                                      planes)
        tri_visible = jnp.take(visible,
                               jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, clip = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world,
            sd["viewproj"])
        world_nrm = rsetup.transform_normals(scene.normals, scene.vert_obj,
                                             scene.obj_world)
        st = rsetup.triangle_setup(clip, scene.tris, tri_visible, w, h,
                                   cull=rsetup.CULL_BACK)
        padded = raster.pad_setup(st)
        zero_i = jnp.zeros((1,), jnp.int32)
        tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
        tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
        vattr, _ = F._build_vertex_rows(scene, world_pos, world_nrm)
        ptbl_a = F.build_alpha_ptbl(scene, padded, tris_p, tri_mat_p, vattr)
        n_tris = scene.tris[0].shape[0]
        (plan_o, plan_m) = raster.plan_view_buckets(
            st, ((0, scene.n_opaque),
                 (scene.n_opaque, scene.n_opaque + scene.n_masked_vis)),
            w, h, cfg.tile_w, cfg.tile_h,
            (cfg.cap_opaque, cfg.cap_masked),
            (cfg.rec_opaque, cfg.rec_masked), big_cap=cfg.big_cap,
            max_span=cfg.max_span, pair_cap=0)
        plan_o = raster.prepare_records(plan_o, padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        plan_m = raster.prepare_records(plan_m, padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid = raster.rasterize_plan(
            plan_o, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk)
        layers = raster.rasterize_plan_k(
            plan_m, padded, w, h, n_tris, cfg.masked_peels, depth,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, chunk=cfg.masked_chunk)
        return ptbl_a, layers

    ptbl_a, layers = setup(scene, sd)

    @jax.jit
    def layer_stats(scene, ptbl_a, t2, pending):
        dom = pending & (t2 >= 0)
        # cell counts at 32-px granularity (tile-space equivalent: the
        # [H, W] layout differs from tiles but run-length structure is
        # comparable for horizontal 32-px runs)
        dom_pad = jnp.pad(dom, ((0, 0), (0, 0)))
        cells = dom_pad.reshape(h, w // 32, 32).any(axis=2)
        n_px = jnp.sum(dom.astype(jnp.int32))
        n_cells = jnp.sum(cells.astype(jnp.int32))
        # the real accept to advance pending
        t2m = jnp.where(dom, t2, -1)
        alpha = F._winner_alpha(scene, t2m, None, None, ptbl_a=ptbl_a)
        acc = dom & (alpha >= 0.5)
        return n_px, n_cells, dom & ~acc

    pending = jnp.ones((h, w), bool)
    for k, (ld, lt) in enumerate(layers):
        n_px, n_cells, pending = layer_stats(scene, ptbl_a, lt, pending)
        print(f"layer {k}: dom_px={int(n_px)} dom_cells32={int(n_cells)} "
              f"(occ {int(n_px)/(max(1,int(n_cells))*32):.2f})",
              flush=True)
    n_pend = int(np.asarray(jnp.sum(pending.astype(jnp.int32))))
    pend_tiles = int(np.asarray(jnp.sum(
        jnp.pad(pending, ((0, 8), (0, 0))).reshape(34, 32, 15, 128)
        .any(axis=(1, 3)).astype(jnp.int32))))
    print(f"after round 0: pending_px={n_pend} pending_tiles={pend_tiles}",
          flush=True)


if __name__ == "__main__":
    main()
