"""Diagnose the alpha-state conservativeness on TPU at the replica bench
camera: for layer-0 masked candidates, compute the state AND the full
trilinear alpha IN ONE jitted program and count contract violations
(ACCEPT with alpha < 0.5 / REJECT with alpha >= 0.5), plus the uncertain
fraction per peel layer (the state table's usefulness metric).

Run: python tools/debug_alpha_state.py
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
    from vk_renderer_tpu.ops import texture as tex
    from vk_renderer_tpu.ops.common import compact_mask
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
    cap = (w * h * 2) // 3

    @jax.jit
    def check(scene, ptbl_a, t2):
        sel, _ = compact_mask(t2 >= 0, cap)
        selc, t2_s, px, py = F._sparse_pixels(sel, t2, w)
        weights, corners, meta_cols = interp.alpha_weights_and_uv(
            ptbl_a, t2_s, px, py, n_meta=3)
        (u, dudx, dudy), (v, dvdx, dvdy) = interp.derivs_from_corners(
            corners, (0, 1), weights)
        f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        meta_a = tex.unpack_meta(f2i(meta_cols[0]), f2i(meta_cols[1]))
        # guard-bit decode (frame.build_alpha_ptbl encoding)
        sbase = (f2i(meta_cols[2]) & (tex.F32_GUARD_BIT - 1)) - 1
        st = tex.alpha_state_lookup(scene.textures.alpha_states, u, v,
                                    dudx, dvdx, dudy, dvdy, meta_a, sbase)
        (alpha,) = tex.sample_trilinear(scene.textures, None, u, v,
                                        dudx, dvdx, dudy, dvdy,
                                        channels=(3,), meta=meta_a)
        dom = t2_s >= 0
        n_dom = jnp.sum(dom.astype(jnp.int32))
        acc_bad = jnp.sum((dom & (st == 1) & (alpha < 0.5))
                          .astype(jnp.int32))
        rej_bad = jnp.sum((dom & (st == 2) & (alpha >= 0.5))
                          .astype(jnp.int32))
        n_unc = jnp.sum((dom & (st == 0)).astype(jnp.int32))
        n_acc = jnp.sum((dom & (st == 1)).astype(jnp.int32))
        n_rej = jnp.sum((dom & (st == 2)).astype(jnp.int32))
        # where do violations sit?  sbase histogram of bad pixels
        bad = dom & (((st == 1) & (alpha < 0.5))
                     | ((st == 2) & (alpha >= 0.5)))
        bad_sb = jnp.where(bad, sbase, -1)
        return (n_dom, n_unc, n_acc, n_rej, acc_bad, rej_bad,
                jnp.max(bad_sb), jnp.min(jnp.where(bad, sbase, 2**30)))

    for k in range(len(layers)):
        r = [int(np.asarray(x)) for x in check(scene, ptbl_a, layers[k][1])]
        n_dom, n_unc, n_acc, n_rej, acc_bad, rej_bad, sb_max, sb_min = r
        print(f"layer {k}: dom={n_dom} unc={n_unc} "
              f"({0 if not n_dom else 100*n_unc//n_dom}%) acc={n_acc} "
              f"rej={n_rej} ACC_BAD={acc_bad} REJ_BAD={rej_bad} "
              f"bad_sbase=[{sb_min},{sb_max}]", flush=True)


if __name__ == "__main__":
    main()
