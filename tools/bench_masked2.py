"""Bisect the tile/cell-space masked pass: time cfg variants of the FULL
fused stage (one dispatch each, overhead ~constant) to locate the cost.

Run: python tools/bench_masked2.py
"""

import dataclasses
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
    from vk_renderer_tpu.graph.profiler import _timed
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import interp, raster
    from vk_renderer_tpu.ops import setup as rsetup
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
    cfg0 = driver.config_from_settings(settings, w, h)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg0)

    def stage_setup(scene, sd):
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
        rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
        vattr, vpos = F._build_vertex_rows(scene, world_pos, world_nrm)
        ptbl = F.build_ptbl(scene, cfg0, padded, tris_p, tri_mat_p, vattr,
                            vpos)
        ptbl_a = F.build_alpha_ptbl(scene, padded, tris_p, tri_mat_p, vattr)
        n_tris = scene.tris[0].shape[0]
        (plan_o, plan_m) = raster.plan_view_buckets(
            st, ((0, scene.n_opaque),
                 (scene.n_opaque, scene.n_opaque + scene.n_masked_vis)),
            w, h, cfg0.tile_w, cfg0.tile_h,
            (cfg0.cap_opaque, cfg0.cap_masked),
            (cfg0.rec_opaque, cfg0.rec_masked), big_cap=cfg0.big_cap,
            max_span=cfg0.max_span, pair_cap=0)
        plan_o = raster.prepare_records(plan_o, padded, st["bbox"], w,
                                        cfg0.tile_w, cfg0.tile_h)
        plan_m = raster.prepare_records(plan_m, padded, st["bbox"], w,
                                        cfg0.tile_w, cfg0.tile_h)
        depth, tid = raster.rasterize_plan(
            plan_o, padded, w, h, n_tris, tile_w=cfg0.tile_w,
            tile_h=cfg0.tile_h, chunk=cfg0.raster_chunk)
        return st, padded, rows, vattr, ptbl, ptbl_a, plan_m, depth, tid

    _, (st, padded, rows, vattr, ptbl, ptbl_a, plan_m, depth, tid) = \
        _timed(jax.jit(stage_setup), scene, sd, iters=1)

    def masked_with(cfg):
        def f(scene, plan_m, padded, depth, tid, rows, vattr, ptbl,
              ptbl_a):
            return F._masked_pass(scene, cfg, plan_m, padded, rows, vattr,
                                  depth, tid, ptbl=ptbl, ptbl_a=ptbl_a)
        return jax.jit(f)

    variants = [
        ("default (peels10 + 3 tails)", cfg0),
        ("tails=0 (round 0 only)",
         dataclasses.replace(cfg0, masked_tail_rounds=0)),
        ("tails=0, peels=4",
         dataclasses.replace(cfg0, masked_tail_rounds=0, masked_peels=4)),
        ("tails=0, peels=1",
         dataclasses.replace(cfg0, masked_tail_rounds=0, masked_peels=1)),
        ("tails=0, peels=0? (=1)",
         dataclasses.replace(cfg0, masked_tail_rounds=0, masked_peels=1,
                             masked_cell_tiers=(1024,))),
    ]
    for name, cfg in variants:
        fn = masked_with(cfg)
        try:
            mem = fn.lower(scene, plan_m, padded, depth, tid, rows, vattr,
                           ptbl, ptbl_a).compile().memory_analysis()
            print(f"{name:<34} temp={mem.temp_size_in_bytes/2**20:8.1f}MB "
                  f"args={mem.argument_size_in_bytes/2**20:8.1f}MB",
                  flush=True)
        except Exception as e:
            print(f"{name:<34} memory_analysis failed: {e}", flush=True)
        ms, out = _timed(fn, scene, plan_m, padded, depth,
                         tid, rows, vattr, ptbl, ptbl_a, iters=3)
        print(f"{name:<34} {ms:8.2f} ms  peel_ovf="
              f"{int(np.asarray(out[2]))}", flush=True)


if __name__ == "__main__":
    main()
